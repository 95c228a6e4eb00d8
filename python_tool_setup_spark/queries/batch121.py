"""Round-5 gates, batch 121: kNN-graph reciprocity (q451 — the
share of exact top-3 cosine edges that are MUTUAL: the
ANN-graph-quality diagnostic hub-dominated embedding spaces fail,
complementing q154's recall@10 and q433's effective rank), storage
showback (q452 — per-source corpus bytes priced at hot/cold
$/TB-month tiers: the FinOps table that makes q286's small-files
and q244's TTL advice actionable in dollars), and cross-source
duplication (q453 — normalized documents appearing in MORE THAN
ONE source: the inter-catalog contamination q361's global dedup
savings can't attribute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_SLICE = 200  # fixed audit slice (q384 convention)
_KNN = 3
# cents per TB-month: hot / cold tier price points
_HOT_CENTS_TB = 2300
_COLD_CENTS_TB = 400


# ---------------------------------------------------------------- q451
@register(
    "q451_knn_reciprocity",
    f"""
    WITH vecs AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_SLICE}
    ),
    elems AS (
        SELECT vec_id, i,
               CAST(ROUND(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT) AS q
        FROM (SELECT vec_id, unnest(embedding) AS e,
                     generate_subscripts(embedding, 1) AS i
              FROM vecs)
    ),
    norms AS (
        SELECT vec_id, SUM(CAST(q AS HUGEINT) * q) AS n2
        FROM elems GROUP BY vec_id
    ),
    dots AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               SUM(CAST(a.q AS HUGEINT) * b.q) AS dot
        FROM elems a JOIN elems b
          ON b.i = a.i AND a.vec_id <> b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ),
    scored AS (
        SELECT d.va, d.vb,
               CAST(ROUND(1e6 * CAST(d.dot AS DOUBLE)
                   / (sqrt(CAST(na.n2 AS DOUBLE))
                      * sqrt(CAST(nb.n2 AS DOUBLE)))) AS BIGINT)
                   AS cos_micro
        FROM dots d
        JOIN norms na ON na.vec_id = d.va
        JOIN norms nb ON nb.vec_id = d.vb
    ),
    ranked AS (
        SELECT va, vb,
               ROW_NUMBER() OVER (PARTITION BY va
                   ORDER BY cos_micro DESC, vb) AS rk
        FROM scored
    ),
    knn AS (SELECT va, vb FROM ranked WHERE rk <= {_KNN}),
    mutual AS (
        SELECT a.va, a.vb FROM knn a
        JOIN knn b ON b.va = a.vb AND b.vb = a.va
    )
    SELECT CAST((SELECT COUNT(*) FROM knn) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM mutual) AS BIGINT) AS mutual_edges,
           CAST(ROUND(1e6 * (SELECT COUNT(*) FROM mutual)
               / (SELECT COUNT(*) FROM knn)) AS BIGINT)
               AS reciprocity_micro
    FROM (SELECT 1)
    """,
    doc=f"kNN-graph reciprocity on the fixed vec_id<{_SLICE} audit "
    "slice (exact top-3 cosine neighbors per vector, then the "
    "share of directed edges whose reverse edge also exists — "
    "hub-dominated or collapsed embedding spaces show LOW "
    "reciprocity because everything points at the hubs; the "
    "ANN-graph diagnostic beside q154's recall@10 and q433's "
    "effective rank): micro-quantized elements so the cosine "
    "matrix is exact-integer-derived, neighbor ranks totally "
    "ordered by (cos, id), reciprocity by a self-join of the "
    "edge list. Scale: the audit runs on a fixed slice by "
    "design — at corpus scale the same reciprocity is measured "
    "on q42's IVF cells.",
)
def q451_knn_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _SLICE
    )
    # Quantized element table feeds the norms AND both dot-product
    # sides (q433/q375 shape): pin it so embeddings is exploded once;
    # norms likewise feeds both scored join sides.
    elems = pin(
        emb.select(
            "vec_id", F.posexplode("embedding").alias("i0", "e")
        ).select(
            "vec_id",
            (F.col("i0") + 1).alias("i"),
            F.round(F.col("e").cast("double") * F.lit(1000000.0))
            .cast("long")
            .alias("q"),
        )
    )
    # exact-integer sums in LONG, not DECIMAL(38): q <= 1e6 and dim=64
    # bound every dot/norm by 6.4e13 << 2^63, and long aggregation is
    # several times faster JVM-side than decimal
    dec = "long"
    norms = pin(
        elems.groupBy("vec_id").agg(
            F.sum(F.col("q").cast(dec) * F.col("q")).alias("n2")
        )
    )
    a = elems.select(F.col("vec_id").alias("va"), "i", F.col("q").alias("qa"))
    b = elems.select(F.col("vec_id").alias("vb"), "i", F.col("q").alias("qb"))
    dots = (
        a.join(b, "i")
        .where(F.col("va") != F.col("vb"))
        .groupBy("va", "vb")
        .agg(F.sum(F.col("qa").cast(dec) * F.col("qb")).alias("dot"))
    )
    scored = (
        dots.join(
            norms.select(F.col("vec_id").alias("va"), F.col("n2").alias("na")),
            "va",
        )
        .join(
            norms.select(F.col("vec_id").alias("vb"), F.col("n2").alias("nb")),
            "vb",
        )
        .select(
            "va",
            "vb",
            F.round(
                F.lit(1e6)
                * F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                )
            )
            .cast("long")
            .alias("cos_micro"),
        )
    )
    w = Window.partitionBy("va").orderBy(
        F.col("cos_micro").desc(), F.col("vb")
    )
    knn = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _KNN)
        .select("va", "vb")
    )
    mutual = knn.join(
        knn.select(F.col("va").alias("vb"), F.col("vb").alias("va")),
        ["va", "vb"],
    )
    n_edges = knn.count()
    n_mutual = mutual.count()
    return spark.createDataFrame(
        [
            (
                n_edges,
                n_mutual,
                round(1e6 * n_mutual / n_edges) if n_edges else 0,
            )
        ],
        "n_edges long, mutual_edges long, reciprocity_micro long",
    )


# ---------------------------------------------------------------- q452
@register(
    "q452_storage_showback",
    f"""
    WITH sizes AS (
        SELECT source,
               COUNT(*) AS n_docs,
               SUM(n_chars) AS bytes_est
        FROM documents GROUP BY source
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(bytes_est AS BIGINT) AS bytes_est,
           CAST(ROUND({_HOT_CENTS_TB} * 1e6 * bytes_est / 1099511627776e0)
               AS BIGINT) AS hot_cents_month_micro,
           CAST(ROUND({_COLD_CENTS_TB} * 1e6 * bytes_est / 1099511627776e0)
               AS BIGINT) AS cold_cents_month_micro
    FROM sizes ORDER BY source
    """,
    doc="Storage showback per source (measured corpus bytes priced "
    f"at hot ({_HOT_CENTS_TB}c) vs cold ({_COLD_CENTS_TB}c) per "
    "TB-month — the FinOps chargeback table that turns q286's "
    "small-files report and q244's TTL policy into a dollar "
    "argument; at 100 TB the hot/cold delta per source IS the "
    "tiering decision): one aggregate, deterministic integer "
    "bytes, prices as exact micro-cents. Scale: source-domain "
    "metadata after one scan.",
)
def q452_storage_showback(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sizes = d.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("bytes_est")
    )
    tb = F.lit(1099511627776.0)
    return sizes.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("bytes_est").cast("long").alias("bytes_est"),
        F.round(F.lit(_HOT_CENTS_TB) * F.lit(1e6) * F.col("bytes_est") / tb)
        .cast("long")
        .alias("hot_cents_month_micro"),
        F.round(F.lit(_COLD_CENTS_TB) * F.lit(1e6) * F.col("bytes_est") / tb)
        .cast("long")
        .alias("cold_cents_month_micro"),
    ).orderBy("source")


# ---------------------------------------------------------------- q453
@register(
    "q453_cross_source_duplicates",
    """
    WITH norm AS (
        SELECT source, md5(lower(trim(text))) AS h FROM documents
    ),
    per_hash AS (
        SELECT h, COUNT(DISTINCT source) AS n_sources, COUNT(*) AS n_docs
        FROM norm GROUP BY h
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS distinct_texts,
           CAST(SUM(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS cross_source_texts,
           CAST(SUM(CASE WHEN n_sources > 1 THEN n_docs ELSE 0 END)
               AS BIGINT) AS cross_source_docs,
           CAST(MAX(n_sources) AS BIGINT) AS max_sources,
           CAST(ROUND(1e6 * SUM(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END)
               / COUNT(*)) AS BIGINT) AS cross_share_micro
    FROM per_hash
    """,
    doc="Cross-source duplication audit (normalized documents whose "
    "md5 appears under MORE THAN ONE source — the inter-catalog "
    "contamination that inflates a source-stratified sample and "
    "double-counts provenance; q361 prices global dedup "
    "savings, q312 compares vocabularies, this counts the "
    "actual shared DOCUMENTS): normalize-hash-group, "
    "distinct-source counts per hash, share of the text space "
    "that is cross-source. Scale: one hash-domain groupBy — "
    "the q31/q119 dedup shuffle shape.",
)
def q453_cross_source_duplicates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    norm = d.select(
        "source", F.md5(F.lower(F.trim(F.col("text")))).alias("h")
    )
    per_hash = norm.groupBy("h").agg(
        F.count_distinct("source").alias("n_sources"),
        F.count("*").alias("n_docs"),
    )
    cross = F.sum(F.when(F.col("n_sources") > 1, 1).otherwise(0))
    return per_hash.agg(
        F.count("*").cast("long").alias("distinct_texts"),
        cross.cast("long").alias("cross_source_texts"),
        F.sum(F.when(F.col("n_sources") > 1, F.col("n_docs")).otherwise(0))
        .cast("long")
        .alias("cross_source_docs"),
        F.max("n_sources").cast("long").alias("max_sources"),
        F.round(F.lit(1e6) * cross / F.count("*"))
        .cast("long")
        .alias("cross_share_micro"),
    )
