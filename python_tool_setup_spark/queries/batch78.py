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

_B = 102  # bootstrap replicates: 17 md5 hashes x 6 slices per row
_CHUNKS = 17
_SLICES = 6
# Poisson(1) inverse-CDF thresholds as 5-hex-char strings
# (round(cdf * 16^5) in hex): lowercase-hex string order IS numeric
# order, so both engines assign the weight with pure string compares —
# no hex-to-int conversion anywhere in the hot path.
_POIS_HEX = ["5e2d6", "bc5ab", "eb716", "fb239", "ff102", "ffd91", "fffa9"]
_CI_LO_RANK = 3  # ceil(0.025 * B)
_CI_HI_RANK = 100  # ceil(0.975 * B)


def _w_sql() -> str:
    arms = " ".join(
        f"WHEN u5 < '{t}' THEN {k}" for k, t in enumerate(_POIS_HEX)
    )
    return f"CASE {arms} ELSE {len(_POIS_HEX)} END"


# ---------------------------------------------------------------- q360
@register(
    "q360_poisson_bootstrap",
    f"""
    WITH hashed AS (
        SELECT o_orderkey, c,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               md5(CAST(o_orderkey AS VARCHAR) || '|' || c) AS h
        FROM orders, generate_series(0, {_CHUNKS - 1}) AS t(c)
    ),
    sliced AS (
        SELECT 6 * c + s AS b, cents,
               substr(h, 1 + 5 * s, 5) AS u5
        FROM hashed, generate_series(0, {_SLICES - 1}) AS t2(s)
    ),
    weighted AS (SELECT b, cents, {_w_sql()} AS w FROM sliced),
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
    "distribution and need ONE pass. Each row's 17 md5 hashes "
    "yield 102 replicate uniforms as 5-hex-char slices, and the "
    "Poisson inverse CDF is applied by comparing the slice "
    "against hex-string thresholds (lowercase-hex order IS "
    "numeric order) — engine-exact randomness with NO hex-to-int "
    "conversion in the hot path (6x fewer hashes and zero conv "
    "calls vs the naive per-(row,b) md5: 16s -> ~3s at sf0.1). "
    "Replicate means reduce per b; the 2.5/97.5 order statistics "
    "come from the block-offset rank over the B-row replicate "
    "table. Scale: one shuffle-free pass + a B-row reduce; no "
    "driver RNG, resumable at any parallelism.",
)
def q360_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    # repartition the slim base BEFORE the x17 fan-out: a single-file
    # scan would otherwise run the whole hash pass on one task
    hashed = o.select(
        F.col("o_orderkey").alias("k"), cents.alias("cents")
    ).repartition(32, "k").select(
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_CHUNKS - 1))).alias("c"),
        F.col("k"),
    ).withColumn(
        "h",
        F.md5(
            F.concat(
                F.col("k").cast("string"), F.lit("|"), F.col("c").cast("string")
            )
        ),
    )
    sliced = hashed.select(
        "cents",
        "c",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(_SLICES - 1))).alias("s"),
    ).select(
        (F.lit(6) * F.col("c") + F.col("s")).alias("b"),
        "cents",
        F.substring("h", F.lit(1) + F.lit(5) * F.col("s"), F.lit(5)).alias(
            "u5"
        ),
    )
    w = F.lit(len(_POIS_HEX))
    for k in reversed(range(len(_POIS_HEX))):
        w = F.when(F.col("u5") < _POIS_HEX[k], F.lit(k)).otherwise(w)
    reps = (
        sliced.withColumn("w", w)
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
