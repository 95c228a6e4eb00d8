"""Round-4 gates, batch 67: embedding-cluster diagnostics over the
embeddings table — per-label centroid cosine matrix (q338: are the
classes separable in embedding space?) and cluster compactness
(q339: within-label dispersion from the same one-pass sums) — the
embedding-quality readouts an ANN/SemDeDup pipeline (q41/q163)
checks before trusting its cells.

FP posture: every float element quantizes to integer micro BEFORE
any accumulation (float sums are order-dependent; integer sums are
exact), so centroids and all derived geometry come from exact
integers with correctly-rounded double arithmetic at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.queries.exactcast import dd_duck
from python_tool_setup_spark.tables import load_table


def _dim_sums_sql() -> str:
    return """
        SELECT label, i,
               SUM(CAST(ROUND(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT)) AS s,
               SUM(CAST(CAST(ROUND(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT) AS HUGEINT)
                   * CAST(ROUND(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT)) AS ss,
               COUNT(*) AS n
        FROM (
            SELECT label, unnest(embedding) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        )
        GROUP BY label, i
    """


# ---------------------------------------------------------------- q338
@register(
    "q338_centroid_cosine_matrix",
    f"""
    WITH dims AS ({_dim_sums_sql()}),
    pairs AS (
        SELECT a.label AS l1, b.label AS l2,
               SUM(CAST(a.s AS HUGEINT) * b.s) AS dot,
               SUM(CAST(a.s AS HUGEINT) * a.s) AS na,
               SUM(CAST(b.s AS HUGEINT) * b.s) AS nb
        FROM dims a JOIN dims b ON a.i = b.i AND a.label < b.label
        GROUP BY a.label, b.label
    )
    SELECT l1, l2,
           CAST(ROUND({dd_duck('dot')}
               / (sqrt({dd_duck('na')}) * sqrt({dd_duck('nb')}))
               * 1000000.0) AS BIGINT) AS cos_micro
    FROM pairs ORDER BY l1, l2
    """,
    doc="Per-label centroid cosine matrix over the embeddings table "
    "(the class-separability diagnostic an ANN / SemDeDup "
    "pipeline checks before trusting its cells — labels whose "
    "centroids sit near cosine 1 will collide in q41's buckets "
    "and q163's cells): per-(label, dim) element sums with every "
    "float quantized to integer micro BEFORE accumulation (float "
    "addition is order-dependent across partitions — the one "
    "place embedding pipelines silently lose determinism), then "
    "all 45 centroid pairs from ONE self-join of the 10x64 "
    "dim-sum table (n cancels out of cosine, so the integer sums "
    "feed it directly; HUGEINT/DECIMAL cross-products). Scale: "
    "one scan + a metadata self-join — |labels|^2 x dims cells.",
)
def q338_centroid_cosine_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dims = (
        emb.select("label", F.posexplode("embedding").alias("i0", "e"))
        .select(
            "label",
            (F.col("i0") + 1).alias("i"),
            F.round(F.col("e").cast("double") * 1000000.0)
            .cast("long")
            .alias("q"),
        )
        .groupBy("label", "i")
        .agg(F.sum("q").alias("s"))
    )
    a = dims.select(
        F.col("label").alias("l1"), F.col("i").alias("ia"), F.col("s").alias("sa")
    )
    b = dims.select(
        F.col("label").alias("l2"), F.col("i").alias("ib"), F.col("s").alias("sb")
    )
    pairs = (
        a.join(b, (F.col("ia") == F.col("ib")) & (F.col("l1") < F.col("l2")))
        .groupBy("l1", "l2")
        .agg(
            F.sum(F.col("sa").cast("decimal(38,0)") * F.col("sb")).alias("dot"),
            F.sum(F.col("sa").cast("decimal(38,0)") * F.col("sa")).alias("na"),
            F.sum(F.col("sb").cast("decimal(38,0)") * F.col("sb")).alias("nb"),
        )
    )
    return pairs.select(
        "l1",
        "l2",
        F.round(
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("na").cast("double"))
                * F.sqrt(F.col("nb").cast("double"))
            )
            * 1000000.0
        )
        .cast("long")
        .alias("cos_micro"),
    ).orderBy("l1", "l2")


# ---------------------------------------------------------------- q339
@register(
    "q339_cluster_compactness",
    f"""
    WITH dims AS ({_dim_sums_sql()}),
    per_label AS (
        SELECT label, MAX(n) AS n,
               SUM(CAST(s AS HUGEINT) * s) AS s2,
               SUM(ss) AS ss
        FROM dims GROUP BY label
    )
    SELECT label, CAST(n AS BIGINT) AS n_vectors,
           CAST(ROUND(sqrt({dd_duck('s2')})
               / CAST(n AS DOUBLE) / 1000000.0 * 1000000.0) AS BIGINT)
               AS centroid_norm_micro,
           CAST(ROUND(({dd_duck('ss')} / CAST(n AS DOUBLE)
               - {dd_duck('s2')} / (CAST(n AS DOUBLE)
                 * CAST(n AS DOUBLE)))
               / 1000000.0 / 1000000.0 * 1000000.0) AS BIGINT)
               AS avg_sq_dist_micro
    FROM per_label ORDER BY label
    """,
    doc="Cluster compactness per label (the within-cluster "
    "dispersion half of the separability readout — q338 measures "
    "BETWEEN-centroid geometry, this measures spread AROUND each "
    "centroid, together the Calinski-Harabasz-style diagnostic): "
    "mean squared distance to the centroid via the one-pass "
    "identity E||x - c||^2 = E||x||^2 - ||c||^2, entirely from "
    "the same (label, dim) integer sums and sum-of-squares q338 "
    "uses — no second pass over vectors, no per-vector distance "
    "materialization. Centroid norms reported alongside. All "
    "integer accumulations (micro-quantized elements, "
    "HUGEINT/DECIMAL squares), double arithmetic only at the "
    "final projection.",
)
def q339_cluster_compactness(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.round(F.col("e").cast("double") * 1000000.0).cast("long")
    dims = (
        emb.select("label", F.posexplode("embedding").alias("i0", "e"))
        .select("label", (F.col("i0") + 1).alias("i"), q.alias("q"))
        .groupBy("label", "i")
        .agg(
            F.sum("q").alias("s"),
            F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("ss"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    per_label = dims.groupBy("label").agg(
        F.max("n").alias("n"),
        F.sum(F.col("s").cast("decimal(38,0)") * F.col("s")).alias("s2"),
        F.sum("ss").alias("ss"),
    )
    nd = F.col("n").cast("double")
    s2 = F.col("s2").cast("double")
    ss = F.col("ss").cast("double")
    return per_label.select(
        "label",
        F.col("n").cast("long").alias("n_vectors"),
        F.round(F.sqrt(s2) / nd / 1000000.0 * 1000000.0)
        .cast("long")
        .alias("centroid_norm_micro"),
        F.round(
            (ss / nd - s2 / (nd * nd)) / 1000000.0 / 1000000.0 * 1000000.0
        )
        .cast("long")
        .alias("avg_sq_dist_micro"),
    ).orderBy("label")
