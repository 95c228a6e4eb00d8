"""Round-5 gates, batch 80: sample-ratio-mismatch check (q364 — the
first thing an experimentation platform validates before reading ANY
metric: did the 50/50 split actually deliver 50/50 users; a skewed
ratio invalidates the whole experiment) and trending tokens (q365 —
the smoothed log-lift mover list between corpus halves: what a
weekly corpus diff report leads with).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import prefix_rank
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_SRM_CRIT = 3.841  # chi-square 1-dof at alpha = 0.05
_TREND_TOP = 10
_TREND_MIN = 5


# ---------------------------------------------------------------- q364
@register(
    "q364_srm_check",
    f"""
    WITH arms AS (
        SELECT event_type, user_id % 2 AS arm, COUNT(DISTINCT user_id) AS n
        FROM events GROUP BY 1, 2
    ),
    wide AS (
        SELECT event_type,
               SUM(CASE WHEN arm = 0 THEN n ELSE 0 END) AS na,
               SUM(CASE WHEN arm = 1 THEN n ELSE 0 END) AS nb
        FROM arms GROUP BY event_type
    )
    SELECT event_type,
           CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           CAST(ROUND(CAST((na - nb) * (na - nb) AS DOUBLE)
               / CAST(na + nb AS DOUBLE) * 1000000.0) AS BIGINT)
               AS chi2_micro,
           CAST((na - nb) * (na - nb) AS DOUBLE) / CAST(na + nb AS DOUBLE)
               > {_SRM_CRIT} AS srm_detected
    FROM wide ORDER BY event_type
    """,
    doc="Sample-ratio-mismatch check per event stream (the gatekeeper "
    "test every experimentation platform runs before any metric "
    "read: users assigned 50/50 by user_id parity must ARRIVE "
    "50/50; a significant imbalance means broken assignment or "
    "differential logging and voids the experiment): the 1-dof "
    "chi-square against the even split collapses to the exact "
    "integer identity (na-nb)^2/(na+nb), micro-quantized with one "
    "division; the 5% critical flag compares the identical double "
    "on both engines. Scale: one distinct-user aggregate per arm.",
)
def q364_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arms = ev.groupBy(
        "event_type", (F.col("user_id") % 2).alias("arm")
    ).agg(F.count_distinct("user_id").alias("n"))
    wide = arms.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n")).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("arm") == 1, F.col("n")).otherwise(0)).alias("nb"),
    )
    d = F.col("na") - F.col("nb")
    chi2 = (d * d).cast("double") / (F.col("na") + F.col("nb")).cast("double")
    return wide.select(
        "event_type",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(chi2 * 1000000.0).cast("long").alias("chi2_micro"),
        (chi2 > _SRM_CRIT).alias("srm_detected"),
    ).orderBy("event_type")


# ---------------------------------------------------------------- q365
@register(
    "q365_trending_tokens",
    f"""
    WITH toks AS (
        SELECT doc_id % 2 = 1 AS is_new, tok
        FROM documents,
             UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
                 AS t(tok)
        WHERE tok <> ''
    ),
    tf AS (
        SELECT tok,
               SUM(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS ca,
               SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS cb
        FROM toks GROUP BY tok
        HAVING SUM(1) >= {_TREND_MIN}
    ),
    tot AS (SELECT SUM(ca) AS ta, SUM(cb) AS tb, COUNT(*) AS v FROM tf),
    lifted AS (
        SELECT tok, ca, cb,
               CAST(ROUND(1e6 * log2(((cb + 1.0) / (tb + v))
                   / ((ca + 1.0) / (ta + v)))) AS BIGINT) AS lift_micro
        FROM tf, tot
    ),
    top AS (
        SELECT tok, ca, cb, lift_micro
        FROM lifted ORDER BY ABS(lift_micro) DESC, tok LIMIT {_TREND_TOP}
    )
    SELECT tok, CAST(ca AS BIGINT) AS count_old,
           CAST(cb AS BIGINT) AS count_new, lift_micro,
           CAST(ROW_NUMBER() OVER (ORDER BY ABS(lift_micro) DESC, tok)
               AS BIGINT) AS rk
    FROM top ORDER BY rk
    """,
    doc="Trending-token movers between the old/new corpus halves "
    "(the weekly corpus-diff headline: which vocabulary surged or "
    "collapsed): per-token add-1-smoothed share log2-lift, "
    "micro-quantized per token (1-ulp posture), minimum-support "
    "filter, distributed TakeOrdered top-10 by absolute lift with "
    "deterministic token tie-break, final ranks via the "
    "block-offset rank over the 10-row shortlist (no global "
    "window). Scale: one tokenize pass, one token groupBy, "
    "metadata after.",
)
def q365_trending_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            (F.col("doc_id") % 2 == 1).alias("is_new"),
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    tf = (
        toks.groupBy("tok")
        .agg(
            F.sum(F.when(~F.col("is_new"), 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias("cb"),
        )
        .filter(F.col("ca") + F.col("cb") >= _TREND_MIN)
    )
    tot = tf.agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb"),
        F.count(F.lit(1)).alias("v"),
    )
    lift = F.round(
        F.lit(1e6)
        * F.log2(
            ((F.col("cb") + 1.0) / (F.col("tb") + F.col("v")))
            / ((F.col("ca") + 1.0) / (F.col("ta") + F.col("v")))
        )
    ).cast("long")
    lifted = tf.crossJoin(F.broadcast(tot)).select(
        "tok", "ca", "cb", lift.alias("lift_micro")
    )
    top = lifted.orderBy(
        F.abs(F.col("lift_micro")).desc(), "tok"
    ).limit(_TREND_TOP)
    ranked = prefix_rank(
        top.withColumn("_al", F.abs(F.col("lift_micro"))),
        [("_al", "desc"), ("tok", "asc")],
        alias="rk",
    )
    return ranked.select(
        "tok",
        F.col("ca").cast("long").alias("count_old"),
        F.col("cb").cast("long").alias("count_new"),
        "lift_micro",
        F.col("rk").cast("long").alias("rk"),
    ).orderBy("rk")
