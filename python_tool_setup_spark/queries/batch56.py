"""Round-4 gates, batch 56: k-anonymity / l-diversity audit (q317 —
the re-identification risk readout that belongs next to the GDPR
purge and PII redaction) and differential-privacy noisy counts with
derandomized Laplace noise (q318 — the release mechanism itself,
bit-reproducible so the oracle can check it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_K = 5


# ---------------------------------------------------------------- q317
@register(
    "q317_k_anonymity_audit",
    f"""
    WITH eq AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
               COUNT(DISTINCT CASE WHEN c_acctbal < 0
                     THEN 'neg' ELSE 'pos' END) AS l_div
        FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(n) AS BIGINT) AS k_anonymity,
           CAST(SUM(CASE WHEN n < {_K} THEN 1 ELSE 0 END) AS BIGINT)
               AS classes_below_k,
           CAST(SUM(CASE WHEN n < {_K} THEN n ELSE 0 END) AS BIGINT)
               AS rows_at_risk,
           CAST(MIN(l_div) AS BIGINT) AS l_diversity,
           CAST(SUM(CASE WHEN l_div < 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS homogeneous_classes
    FROM eq
    """,
    doc="Dataset-level k-anonymity summary + l-DIVERSITY audit "
    "(q187 LISTS the document cells below k; this gate adds the "
    "two readouts q187 doesn't have: the single dataset-k / "
    "rows-at-risk summary a release gate thresholds on, and "
    "l-diversity of a SENSITIVE attribute — homogeneous classes "
    "(l<2) leak the sensitive value even when k-anonymity holds, "
    "the classic attribute-disclosure gap): equivalence classes "
    "over (nation, market segment), smallest class k, classes "
    "and rows below the k=5 policy, minimum l and homogeneous-"
    "class count for the account-balance sign. All exact integer "
    "counts from one groupBy on the quasi-identifier tuple; the "
    "audit table is |QI-combinations| — metadata at any scale.",
)
def q317_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    eq = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(
            F.when(F.col("c_acctbal") < 0, "neg").otherwise("pos")
        ).alias("l_div"),
    )
    return eq.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("n").cast("long").alias("k_anonymity"),
        F.sum(F.when(F.col("n") < _K, 1).otherwise(0))
        .cast("long")
        .alias("classes_below_k"),
        F.sum(F.when(F.col("n") < _K, F.col("n")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("l_div").cast("long").alias("l_diversity"),
        F.sum(F.when(F.col("l_div") < 2, 1).otherwise(0))
        .cast("long")
        .alias("homogeneous_classes"),
    )


# ---------------------------------------------------------------- q318
@register(
    "q318_dp_noisy_counts",
    """
    WITH counts AS (
        SELECT c_mktsegment, COUNT(*) AS n FROM customer
        GROUP BY c_mktsegment
    ),
    noised AS (
        SELECT c_mktsegment, n,
               (CAST(CAST(('0x' || substr(md5('dp|' || c_mktsegment),
                    1, 15)) AS BIGINT) % 1000000 AS DOUBLE) + 0.5)
                   / 1000000.0 AS u
        FROM counts
    )
    SELECT c_mktsegment,
           CAST(n AS BIGINT) AS true_count,
           CAST(ROUND((CASE WHEN u < 0.5
                    THEN 2.0 * ln(2.0 * u)
                    ELSE -(2.0 * ln(2.0 - 2.0 * u)) END)
               * 1000000.0) AS BIGINT) AS noise_micro,
           CAST(ROUND(CAST(n AS DOUBLE)
               + (CASE WHEN u < 0.5
                    THEN 2.0 * ln(2.0 * u)
                    ELSE -(2.0 * ln(2.0 - 2.0 * u)) END)) AS BIGINT)
               AS released_count
    FROM noised ORDER BY c_mktsegment
    """,
    doc="Differential-privacy noisy counts (epsilon=0.5 Laplace "
    "mechanism on per-segment counts — the release mechanism for "
    "the aggregate stats q317 just audited): Laplace noise via "
    "the inverse CDF, scale b = sensitivity/epsilon = 1/0.5 = 2, "
    "noise = -b*sgn(u-1/2)*ln(1-2|u-1/2|) written as the "
    "two-branch form. The uniform u is md5-derandomized per "
    "segment (the repo's derandomization convention: the "
    "MECHANISM is exactly what a production DP layer computes, "
    "only the entropy source is pinned so the oracle can "
    "bit-check it), ln's 1-ulp wobble absorbed by micro "
    "quantization. Scale: noise is a per-group scalar projection "
    "on the already-aggregated table — zero extra shuffles.",
)
def q318_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    counts = c.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("dp|"), F.col("c_mktsegment"))), 1, 15),
        16,
        10,
    ).cast("long")
    u = ((h % 1000000).cast("double") + 0.5) / 1000000.0
    noised = counts.withColumn("u", u)
    un = F.col("u")
    noise = F.when(un < 0.5, F.lit(2.0) * F.log(F.lit(2.0) * un)).otherwise(
        -(F.lit(2.0) * F.log(F.lit(2.0) - F.lit(2.0) * un))
    )
    return noised.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("true_count"),
        F.round(noise * 1000000.0).cast("long").alias("noise_micro"),
        F.round(F.col("n").cast("double") + noise)
        .cast("long")
        .alias("released_count"),
    ).orderBy("c_mktsegment")
