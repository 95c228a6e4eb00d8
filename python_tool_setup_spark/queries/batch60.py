"""Round-4 gates, batch 60: Hill tail-index estimator (q325 — HOW
heavy is the heavy tail, the quantitative follow-up to q301's Zipf
slope and q303's skew Gini) and inter-event burstiness (q326 — the
bursty-vs-periodic behavioral signature from inter-arrival moments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.queries.exactcast import dd_duck
from python_tool_setup_spark.tables import load_table

_HILL_K = 100


# ---------------------------------------------------------------- q325
@register(
    "q325_hill_estimator",
    f"""
    WITH freq AS (
        SELECT w, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY w
    ),
    top_ AS (
        SELECT n FROM freq ORDER BY n DESC, w LIMIT {_HILL_K + 1}
    ),
    xmin AS (SELECT MIN(n) AS x_min FROM top_),
    terms AS (
        SELECT CAST(ROUND(ln(CAST(n AS DOUBLE)
                   / CAST((SELECT x_min FROM xmin) AS DOUBLE))
                   * 1000000000.0) AS BIGINT) AS t
        FROM top_ WHERE n > (SELECT x_min FROM xmin)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
           CAST((SELECT x_min FROM xmin) AS BIGINT) AS x_min,
           CAST(SUM(t) AS BIGINT) AS sum_ln_nano,
           CAST(ROUND((1.0 + CAST(COUNT(*) AS DOUBLE)
               / (CAST(SUM(t) AS DOUBLE) / 1000000000.0))
               * 1000000.0) AS BIGINT) AS alpha_micro
    FROM terms
    """,
    doc="Hill tail-index estimator over the word-frequency "
    "distribution (alpha = 1 + k / sum(ln(x_i/x_min)) on the "
    "top-k order statistics — the standard maximum-likelihood "
    "answer to 'HOW heavy is the tail?', where q301's Zipf "
    "regression eyeballs the slope and q303's Gini summarizes "
    "inequality): the top k+1 frequencies come from a "
    "distributed TakeOrdered, x_min is the (k+1)-th, and each "
    "ln(x/x_min) term quantizes to nano before the exact integer "
    "sum (1-ulp posture; the one final division is correctly "
    "rounded). Ties at x_min are excluded on both engines by the "
    "same integer predicate, so k_used is pinned too. Scale: one "
    "word groupBy + top-k — the estimator itself is O(k) "
    "metadata.",
)
def q325_hill_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = freq.orderBy(F.col("n").desc(), "w").limit(_HILL_K + 1).select("n")
    xmin = top.agg(F.min("n").alias("x_min"))
    joined = top.crossJoin(F.broadcast(xmin))  # 1-row scalar attach
    terms = joined.filter(F.col("n") > F.col("x_min")).select(
        "x_min",
        F.round(
            F.log(F.col("n").cast("double") / F.col("x_min").cast("double"))
            * 1000000000.0
        )
        .cast("long")
        .alias("t"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("x_min").cast("long").alias("x_min"),
        F.sum("t").cast("long").alias("sum_ln_nano"),
        F.round(
            (
                F.lit(1.0)
                + F.count(F.lit(1)).cast("double")
                / (F.sum("t").cast("double") / 1000000000.0)
            )
            * 1000000.0
        )
        .cast("long")
        .alias("alpha_micro"),
    )


# ---------------------------------------------------------------- q326
@register(
    "q326_burstiness",
    f"""
    WITH gaps AS (
        SELECT user_id,
               CAST(date_diff('second', LAG(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id), ts) AS BIGINT) AS g
        FROM events
    ),
    s AS (
        SELECT user_id, COUNT(*) AS k, SUM(g) AS sg,
               SUM(CAST(g AS HUGEINT) * g) AS sgg
        FROM gaps WHERE g IS NOT NULL GROUP BY user_id
        HAVING COUNT(*) >= 20
    ),
    m AS (
        SELECT user_id, k,
               CAST(sg AS DOUBLE) / CAST(k AS DOUBLE) AS mu,
               sqrt(({dd_duck('sgg')}
                     - (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
                       / CAST(k AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
                   AS sigma
        FROM s
    )
    SELECT user_id, CAST(k AS BIGINT) AS n_gaps,
           CAST(ROUND(mu * 1000.0) AS BIGINT) AS mean_gap_milli_s,
           CAST(ROUND(((sigma - mu) / (sigma + mu)) * 1000000.0)
               AS BIGINT) AS burstiness_micro
    FROM m ORDER BY user_id
    """,
    doc="Inter-event burstiness per user (Goh & Barabasi's "
    "B = (sigma - mu)/(sigma + mu) over inter-arrival times: "
    "B -> -1 periodic, 0 Poisson, +1 bursty — the behavioral "
    "signature that separates machines from humans and feeds bot "
    "detection beside q290's transition matrix): inter-arrival "
    "gaps in integer seconds from one LAG window riding the "
    "user-key shuffle (event_id tiebreak = total order), then "
    "per-user exact integer moment sums (HUGEINT/DECIMAL "
    "squares) and the sigma/mu arithmetic in identical "
    "correctly-rounded double association, micro-quantized. "
    "Users under 20 gaps are excluded by the same integer "
    "predicate on both engines. Scale: one window + one groupBy "
    "on the key the events table already shuffles on.",
)
def q326_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
        ).alias("g"),
    )
    s = (
        gaps.filter(F.col("g").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum("g").alias("sg"),
            F.sum(F.col("g").cast("decimal(38,0)") * F.col("g")).alias("sgg"),
        )
        .filter(F.col("k") >= 20)
    )
    kd = F.col("k").cast("double")
    sg = F.col("sg").cast("double")
    sgg = F.col("sgg").cast("double")
    mu = sg / kd
    sigma = F.sqrt((sgg - (sg * sg) / kd) / (F.col("k") - 1).cast("double"))
    m = s.select("user_id", "k", mu.alias("mu"), sigma.alias("sigma"))
    return m.select(
        "user_id",
        F.col("k").cast("long").alias("n_gaps"),
        F.round(F.col("mu") * 1000.0).cast("long").alias("mean_gap_milli_s"),
        F.round(
            ((F.col("sigma") - F.col("mu")) / (F.col("sigma") + F.col("mu")))
            * 1000000.0
        )
        .cast("long")
        .alias("burstiness_micro"),
    ).orderBy("user_id")
