"""Round-5 gates, batch 78: distributed Poisson bootstrap confidence
interval (q360 — THE scalable bootstrap: instead of resampling n rows
B times (impossible distributed), each row draws an independent
Poisson(1) replicate weight — one pass, embarrassingly parallel, the
standard trick production A/B systems use) and an exact-dedup savings
report (q361 — what dedup would actually buy: cluster-size histogram
and the characters the non-canonical copies burn).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import prefix_rank
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_B = 100  # bootstrap replicates
# Poisson(1) inverse-CDF thresholds, micro-quantized (round(cdf*1e6)):
# both engines assign the SAME integer weight from the same md5 bucket.
_POIS_CUM = [367879, 735759, 919699, 981012, 996340, 999406, 999917]
_CI_LO_RANK = 3  # ceil(0.025 * B)
_CI_HI_RANK = 98  # ceil(0.975 * B)


def _w_sql() -> str:
    arms = " ".join(
        f"WHEN h < {t} THEN {k}" for k, t in enumerate(_POIS_CUM)
    )
    return f"CASE {arms} ELSE {len(_POIS_CUM)} END"


# ---------------------------------------------------------------- q360
@register(
    "q360_poisson_bootstrap",
    f"""
    WITH drawn AS (
        SELECT b, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                   || '|' || b), 1, 15)) AS BIGINT) % 1000000 AS h
        FROM orders, generate_series(0, {_B - 1}) AS t(b)
    ),
    weighted AS (SELECT b, cents, {_w_sql()} AS w FROM drawn),
    reps AS (
        SELECT b,
               CAST(ROUND(CAST(SUM(w * cents) AS DOUBLE)
                   / CAST(SUM(w) AS DOUBLE)) AS BIGINT) AS mean_cents
        FROM weighted GROUP BY b
    ),
    ranked AS (
        SELECT mean_cents,
               ROW_NUMBER() OVER (ORDER BY mean_cents, b) AS rk
        FROM reps
    ),
    point AS (
        SELECT CAST(ROUND(AVG(o_totalprice * 100)) AS BIGINT) AS mean_cents
        FROM orders
    )
    SELECT CAST({_B} AS BIGINT) AS b_reps,
           (SELECT mean_cents FROM point) AS mean_cents,
           (SELECT mean_cents FROM ranked WHERE rk = {_CI_LO_RANK})
               AS ci_lo_cents,
           (SELECT mean_cents FROM ranked WHERE rk = {_CI_HI_RANK})
               AS ci_hi_cents
    """,
    doc="Distributed Poisson bootstrap 95% CI for the mean order "
    "value: true multinomial resampling cannot be distributed (it "
    "needs n draws over all rows per replicate), but Poisson(1) "
    "per-row replicate weights converge to the same bootstrap "
    "distribution and need ONE pass — each (row, replicate) pair "
    "draws its weight from the md5-derandomized uniform bucket "
    "pushed through the integer micro-quantized Poisson inverse "
    "CDF (pure integer compares — engine-exact randomness), "
    "replicate means reduce per b, and the 2.5/97.5 order "
    "statistics come from the block-offset rank over the B-row "
    "replicate table. Scale: B scans' worth of cheap hashes in "
    "one shuffle-free pass + a B-row reduce; no driver RNG, "
    "resumable at any parallelism.",
)
def q360_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    drawn = o.select(
        F.col("o_orderkey").alias("k"), cents.alias("cents")
    ).select(
        "k",
        "cents",
        F.explode(F.array(*[F.lit(b) for b in range(_B)])).alias("b"),
    ).withColumn(
        "h",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("k").cast("string"),
                        F.lit("|"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1000000,
    )
    w = F.lit(len(_POIS_CUM))
    for k in reversed(range(len(_POIS_CUM))):
        w = F.when(F.col("h") < _POIS_CUM[k], F.lit(k)).otherwise(w)
    reps = (
        drawn.withColumn("w", w)
        .groupBy("b")
        .agg(
            F.round(
                F.sum(F.col("w") * F.col("cents")).cast("double")
                / F.sum("w").cast("double")
            )
            .cast("long")
            .alias("mean_cents")
        )
    )
    ranked = prefix_rank(
        reps, [("mean_cents", "asc"), ("b", "asc")], alias="rk"
    )
    point = o.agg(
        F.round(F.avg(F.col("o_totalprice") * 100)).cast("long").alias("m")
    )
    ci = ranked.agg(
        F.max(F.when(F.col("rk") == _CI_LO_RANK, F.col("mean_cents"))).alias(
            "lo"
        ),
        F.max(F.when(F.col("rk") == _CI_HI_RANK, F.col("mean_cents"))).alias(
            "hi"
        ),
    )
    return ci.crossJoin(F.broadcast(point)).select(
        F.lit(_B).cast("long").alias("b_reps"),
        F.col("m").cast("long").alias("mean_cents"),
        F.col("lo").cast("long").alias("ci_lo_cents"),
        F.col("hi").cast("long").alias("ci_hi_cents"),
    )


# ---------------------------------------------------------------- q361
@register(
    "q361_dedup_savings",
    """
    WITH clusters AS (
        SELECT md5(text) AS h, COUNT(*) AS sz, SUM(n_chars) AS chars,
               MIN(n_chars) AS canon_chars
        FROM documents GROUP BY md5(text)
    )
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(SUM(sz) - COUNT(*) AS BIGINT) AS dup_docs,
           CAST(SUM(chars - canon_chars) AS BIGINT) AS chars_saved
    FROM clusters GROUP BY sz ORDER BY cluster_size
    """,
    doc="Exact-dedup savings report (the business case for running "
    "q31 at all: before deduping 100 TB, price what it buys): "
    "content-hash clusters (one shuffle on md5(text), the q31 "
    "plan), then a cluster-SIZE histogram with duplicate-doc and "
    "characters-saved accounting — keeping each cluster's one "
    "canonical copy (identical text, so any copy's n_chars is the "
    "canonical size; MIN pins it deterministically). The histogram "
    "is the number a dedup design review needs: a heavy tail of "
    "big clusters says near-dup (q36) will pay too. Scale: two "
    "groupBys, second over cluster sizes (metadata).",
)
def q361_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    clusters = d.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("sz"),
        F.sum("n_chars").alias("chars"),
        F.min("n_chars").alias("canon_chars"),
    )
    return (
        clusters.groupBy("sz")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("sz").alias("n_docs"),
            F.sum(F.col("chars") - F.col("canon_chars")).alias("chars_saved"),
        )
        .select(
            F.col("sz").cast("long").alias("cluster_size"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
            F.col("n_docs").cast("long").alias("n_docs"),
            (F.col("n_docs") - F.col("n_clusters"))
            .cast("long")
            .alias("dup_docs"),
            F.col("chars_saved").cast("long").alias("chars_saved"),
        )
        .orderBy("cluster_size")
    )
