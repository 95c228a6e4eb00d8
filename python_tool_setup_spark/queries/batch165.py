"""Round-5 gates, batch 165: Chao1 richness estimate (q541 — the
ecology estimator for "how many token types exist that we haven't
seen": S_hat = S_obs + n1^2/(2*n2) from singleton/doubleton counts
— the species-accumulation companion to q503's capture-recapture
(two-sample) and q504's unseen MASS (probability); this one
estimates the unseen TYPE count) and the Good-Turing discount
table (q542 — the actual smoothing every count-based LM applies:
r* = (r+1) * n_(r+1)/n_r reassigns probability from low counts to
the unseen; the r=1..5 table with discount ratios is the
Katz-backoff input, computed exactly from the count-of-counts
histogram).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


@register(
    "q541_chao1_richness",
    """
    WITH tok AS (
        SELECT UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS t
        FROM documents
    ),
    freq AS (
        SELECT t, COUNT(*) AS c FROM tok
        WHERE LENGTH(t) > 0 GROUP BY t
    ),
    s AS (
        SELECT COUNT(*) AS s_obs,
               SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
               SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
        FROM freq
    )
    SELECT CAST(s_obs AS BIGINT) AS observed_types,
           CAST(f1 AS BIGINT) AS singletons,
           CAST(f2 AS BIGINT) AS doubletons,
           CAST(s_obs + CAST(ROUND(CAST(f1 AS DOUBLE) * f1
               / (2.0 * GREATEST(f2, 1))) AS BIGINT) AS BIGINT)
               AS chao1_estimate,
           CAST(ROUND(s_obs * 1000000.0
               / (s_obs + ROUND(CAST(f1 AS DOUBLE) * f1
                  / (2.0 * GREATEST(f2, 1))))) AS BIGINT)
               AS type_coverage_ppm
    FROM s
    """,
    doc="Chao1 richness estimate (ecology's lower bound on the "
    "total TYPE count from singleton/doubleton frequencies: "
    "S_hat = S_obs + f1^2/(2 f2) — rare types imply unseen "
    "types; completes the unseen-estimation trio with q503's "
    "capture-recapture universe and q504's Good-Turing unseen "
    "MASS): token frequencies from one tokenize+count pass, the "
    "frequency-of-frequency counts from a 3-value aggregate, the "
    "estimator from a shared integer-input expression with the "
    "f2=0 guard Chao prescribes. Scale: the corpus pass is the "
    "same one every text gate pays; the estimator is a 1-row "
    "reduction.",
)
def q541_chao1_richness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .filter(F.length("t") > 0)
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = freq.agg(
        F.count(F.lit(1)).alias("s_obs"),
        F.sum((F.col("c") == 1).cast("long")).alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).alias("f2"),
    )
    unseen = F.round(
        F.col("f1").cast("double")
        * F.col("f1")
        / (2.0 * F.greatest(F.col("f2"), F.lit(1)))
    ).cast("long")
    return s.select(
        F.col("s_obs").cast("long").alias("observed_types"),
        F.col("f1").cast("long").alias("singletons"),
        F.col("f2").cast("long").alias("doubletons"),
        (F.col("s_obs") + unseen).cast("long").alias(
            "chao1_estimate"
        ),
        F.round(
            F.col("s_obs") * 1000000.0 / (F.col("s_obs") + unseen)
        )
        .cast("long")
        .alias("type_coverage_ppm"),
    )


# ---------------------------------------------------------------- q542
_GT_MAX_R = 5


@register(
    "q542_good_turing_discounts",
    f"""
    WITH tok AS (
        SELECT UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS t
        FROM documents
    ),
    freq AS (
        SELECT t, COUNT(*) AS c FROM tok
        WHERE LENGTH(t) > 0 GROUP BY t
    ),
    fof AS (SELECT c AS r, COUNT(*) AS n_r FROM freq GROUP BY c),
    low AS (SELECT r FROM fof ORDER BY r LIMIT {_GT_MAX_R})
    SELECT CAST(a.r AS BIGINT) AS r,
           CAST(a.n_r AS BIGINT) AS n_r,
           CAST(COALESCE(b.n_r, 0) AS BIGINT) AS n_r_plus_1,
           CAST(ROUND((a.r + 1) * CAST(COALESCE(b.n_r, 0) AS DOUBLE)
               / a.n_r * 1000000) AS BIGINT) AS r_star_micro,
           CAST(ROUND((a.r + 1) * CAST(COALESCE(b.n_r, 0) AS DOUBLE)
               / a.n_r / a.r * 1000000) AS BIGINT)
               AS discount_ratio_micro,
           (a.r + 1) * CAST(COALESCE(b.n_r, 0) AS DOUBLE) / a.n_r
               < a.r AS mass_released
    FROM fof a
    JOIN low ON low.r = a.r
    LEFT JOIN fof b ON b.r = a.r + 1
    ORDER BY a.r
    """,
    doc="Good-Turing discount table (the smoothing every count-"
    "based LM applies: r* = (r+1) n_(r+1)/n_r reassigns "
    "probability mass from low observed counts toward the unseen "
    "— the Katz-backoff input; q504 reported the unseen mass, "
    "this reports the per-count discounts that fund it): the "
    "count-of-counts histogram self-joins on r+1 (a |distinct "
    "counts|-row table), r* and the discount ratio micro-"
    "quantized from exact integers, and mass_released flags the "
    "counts that actually shed probability (r* < r — expected "
    "for small r in any Zipfian corpus). Scale: one corpus pass; "
    "the table is frequency-domain metadata.",
)
def q542_good_turing_discounts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .filter(F.length("t") > 0)
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    fof = freq.groupBy(F.col("c").alias("r")).agg(
        F.count(F.lit(1)).alias("n_r")
    )
    b = fof.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1")
    )
    low = fof.orderBy("r").limit(_GT_MAX_R).select("r")
    j = (
        fof.join(F.broadcast(low), "r", "left_semi")
        .join(F.broadcast(b), "r", "left")
        .select(
            "r",
            "n_r",
            F.coalesce("n_r1", F.lit(0)).alias("n_r1"),
        )
    )
    rstar = (
        (F.col("r") + 1)
        * F.col("n_r1").cast("double")
        / F.col("n_r")
    )
    return j.select(
        F.col("r").cast("long").alias("r"),
        F.col("n_r").cast("long").alias("n_r"),
        F.col("n_r1").cast("long").alias("n_r_plus_1"),
        F.round(rstar * 1000000).cast("long").alias("r_star_micro"),
        F.round(rstar / F.col("r") * 1000000)
        .cast("long")
        .alias("discount_ratio_micro"),
        (rstar < F.col("r")).alias("mass_released"),
    ).orderBy("r")
