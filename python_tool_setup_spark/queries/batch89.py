"""Round-5 gates, batch 89: approx-distinct accuracy audit (q382 —
Spark's HyperLogLog++ measured against the exact distinct count,
per stream, with its configured error bound asserted in-query: the
trust-but-verify gate for every approx_count_distinct in the repo)
and a sampling-error audit (q383 — the md5-bucket 10% sample's mean
vs the full-population mean, judged against the exact finite-
population standard error: the gate that certifies the sampling
pipeline before anyone reads a sampled dashboard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.queries.exactcast import dd_duck
from python_tool_setup_spark.tables import load_table

_RSD = 0.05  # approx_count_distinct relative standard deviation
_SAMPLE_PCT = 10  # md5-bucket percent


# ---------------------------------------------------------------- q382
@register(
    "q382_hll_accuracy",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS within_3rsd
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Approx-distinct accuracy audit: Spark's HyperLogLog++ "
    "(approx_count_distinct, rsd=0.05) per stream against the "
    "exact distinct-user count, asserting in-query that the "
    "estimate lands within 3 relative standard deviations — the "
    "trust-but-verify gate behind every sketch the repo uses "
    "(q08/q160 partial-HLL union rely on exactly this bound "
    "holding). The oracle pins the exact counts and the bound "
    "flag TRUE; Spark must PROVE the flag by computing both the "
    "sketch and the exact count (the estimate itself is "
    "implementation-specific, so it stays out of the compared "
    "columns — the audited CLAIM is engine-independent). Scale: "
    "the sketch is the scale path (mergeable, fixed size); the "
    "exact count is the verification cost you pay once per "
    "audit, not per query.",
)
def q382_hll_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct"),
        F.approx_count_distinct("user_id", _RSD).alias("est"),
    )
    err = F.abs(F.col("est") - F.col("exact_distinct")).cast("double")
    bound = F.lit(3 * _RSD) * F.col("exact_distinct").cast("double")
    return agg.select(
        "event_type",
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        (err <= bound).alias("within_3rsd"),
    ).orderBy("event_type")


# ---------------------------------------------------------------- q383
@register(
    "q383_sampling_error_audit",
    f"""
    WITH base AS (
        SELECT o_totalprice,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(('0x' || substr(md5('smp|' ||
                   CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
                   % 100 < {_SAMPLE_PCT} AS in_sample
        FROM orders
    ),
    pop AS (
        SELECT COUNT(*) AS n, SUM(cents) AS s,
               SUM(CAST(cents AS HUGEINT) * cents) AS ss
        FROM base
    ),
    smp AS (
        SELECT COUNT(*) AS m, SUM(cents) AS t FROM base WHERE in_sample
    )
    SELECT CAST(n AS BIGINT) AS n_pop,
           CAST(m AS BIGINT) AS n_sample,
           CAST(ROUND(CAST(s AS DOUBLE) / n) AS BIGINT) AS pop_mean_cents,
           CAST(ROUND(CAST(t AS DOUBLE) / m) AS BIGINT)
               AS sample_mean_cents,
           CAST(ROUND(ABS(CAST(t AS DOUBLE) / m - CAST(s AS DOUBLE) / n))
               AS BIGINT) AS abs_err_cents,
           CAST(ROUND(sqrt(({dd_duck('ss')} / n
                   - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
                   / m * (1.0 - CAST(m AS DOUBLE) / n))) AS BIGINT)
               AS se_cents,
           ABS(CAST(t AS DOUBLE) / m - CAST(s AS DOUBLE) / n)
               <= 3.0 * sqrt(({dd_duck('ss')} / n
                   - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
                   / m * (1.0 - CAST(m AS DOUBLE) / n)) AS within_3se
    FROM pop, smp
    """,
    doc="Sampling-error audit for the md5-bucket 10% sample (the "
    "q95/q68 derandomized sampling convention, audited: is the "
    "sampled mean within 3 finite-population standard errors of "
    "the true mean? — the certification a sampled dashboard "
    "needs before anyone reads it): population moments from "
    "exact integer cents sums (HUGEINT/DECIMAL squares), the "
    "FPC-corrected SE sqrt(var/m * (1 - m/n)) assembled in "
    "identical double shape, the sample itself deterministic so "
    "BOTH engines compute the identical sample mean — the audit "
    "is exact, not statistical. Scale: two conditional "
    "aggregates over one scan.",
)
def q383_sampling_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    in_sample = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("smp|"), F.col("o_orderkey").cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 100
        < _SAMPLE_PCT
    )
    base = o.select(cents.alias("cents"), in_sample.alias("in_sample"))
    pop = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "ss"
        ),
    )
    smp = base.filter("in_sample").agg(
        F.count(F.lit(1)).alias("m"), F.sum("cents").alias("t")
    )
    j = pop.crossJoin(F.broadcast(smp))
    pm = F.col("s").cast("double") / F.col("n")
    sm = F.col("t").cast("double") / F.col("m")
    var = F.col("ss").cast("double") / F.col("n") - pm * pm
    se = F.sqrt(
        var / F.col("m") * (1.0 - F.col("m").cast("double") / F.col("n"))
    )
    return j.select(
        F.col("n").cast("long").alias("n_pop"),
        F.col("m").cast("long").alias("n_sample"),
        F.round(pm).cast("long").alias("pop_mean_cents"),
        F.round(sm).cast("long").alias("sample_mean_cents"),
        F.round(F.abs(sm - pm)).cast("long").alias("abs_err_cents"),
        F.round(se).cast("long").alias("se_cents"),
        (F.abs(sm - pm) <= 3.0 * se).alias("within_3se"),
    )
