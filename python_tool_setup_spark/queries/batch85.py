"""Round-5 gates, batch 85: embedding norm outliers (q374 — vectors
whose norm sits far outside their label's median±MAD band: the
broken-encoder / wrong-preprocessing smell test run before any ANN
build) and a Johnson-Lindenstrauss projection audit (q375 — project
64-d embeddings to 8-d with a deterministic ±1 matrix and measure
the pairwise-distance distortion the JL lemma promises to bound:
the evidence that cheap dimension reduction is safe BEFORE the ANN
index adopts it).

FP posture (batch67's): every float element quantizes to integer
micro BEFORE any accumulation; norms/distances/projections assemble
from exact integer sums, one double op at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_Q = "CAST(ROUND(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT)"
_JL_K = 8  # output dims
_MAD_MULT = 3


# ---------------------------------------------------------------- q374
@register(
    "q374_embedding_norm_outliers",
    f"""
    WITH dims AS (
        SELECT vec_id, label, {_Q} AS q
        FROM (SELECT vec_id, label, unnest(embedding) AS e FROM embeddings)
    ),
    norms AS (
        SELECT vec_id, label,
               CAST(ROUND(sqrt(CAST(SUM(CAST(q AS HUGEINT) * q) AS DOUBLE)))
                   AS BIGINT) AS norm_micro
        FROM dims GROUP BY vec_id, label
    ),
    med AS (
        SELECT label,
               CAST(ROUND(quantile_cont(norm_micro, 5e-1)) AS BIGINT) AS m
        FROM norms GROUP BY label
    ),
    mad AS (
        SELECT n.label,
               CAST(ROUND(quantile_cont(ABS(n.norm_micro - med.m), 5e-1))
                   AS BIGINT) AS mad_
        FROM norms n JOIN med USING (label) GROUP BY n.label
    )
    SELECT n.label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(med.m AS BIGINT) AS median_norm_micro,
           CAST(mad.mad_ AS BIGINT) AS mad_micro,
           CAST(SUM(CASE WHEN ABS(n.norm_micro - med.m)
               > {_MAD_MULT} * mad.mad_ THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers
    FROM norms n JOIN med USING (label) JOIN mad ON n.label = mad.label
    GROUP BY n.label, med.m, mad.mad_
    ORDER BY n.label
    """,
    doc="Embedding norm outliers per label (a vector whose norm sits "
    f"more than {_MAD_MULT} MADs from its label's median norm is a "
    "broken-encoder / truncated-input smell — the sanity pass an "
    "ANN build (q41/q42) runs before indexing): norms from "
    "micro-quantized elements (HUGEINT/DECIMAL squares of exact "
    "integers, one sqrt), median and MAD via the shared "
    "histogram-percentile operator (operators/percentiles.py — "
    "norms collapse to a value histogram per label; no label "
    "buffers raw vectors). Robust to the outliers it hunts, "
    "unlike a z-score. Scale: one unnest pass, two histogram "
    "reductions.",
)
def q374_embedding_norm_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from python_tool_setup_spark.operators.percentiles import (
        grouped_exact_percentiles,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        "label",
        F.explode("embedding").alias("e"),
    ).select(
        "vec_id",
        "label",
        F.round(F.col("e").cast("double") * 1000000.0).cast("long").alias("q"),
    )
    # MAD chain (q482 shape): norms feeds the median AND the deviation
    # join; dev feeds the MAD percentile AND the final flag pass. Pin
    # both O(vecs) frames so embeddings is exploded once.
    norms = pin(
        dims.groupBy("vec_id", "label").agg(
            F.round(
                F.sqrt(
                    F.sum(
                        F.col("q").cast("decimal(38,0)") * F.col("q")
                    ).cast("double")
                )
            )
            .cast("long")
            .alias("norm_micro")
        )
    )
    med = grouped_exact_percentiles(
        norms, ["label"], "norm_micro", {"p50": 0.5}
    ).select("label", F.round("p50").cast("long").alias("m"))
    dev = pin(
        norms.join(F.broadcast(med), "label").withColumn(
            "adev", F.abs(F.col("norm_micro") - F.col("m"))
        )
    )
    mad = grouped_exact_percentiles(dev, ["label"], "adev", {"p50": 0.5}).select(
        "label", F.round("p50").cast("long").alias("mad_")
    )
    joined = dev.join(F.broadcast(mad), "label")
    return (
        joined.groupBy("label", "m", "mad_")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(
                F.when(
                    F.col("adev") > _MAD_MULT * F.col("mad_"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .select(
            "label",
            F.col("n_vectors").cast("long").alias("n_vectors"),
            F.col("m").cast("long").alias("median_norm_micro"),
            F.col("mad_").cast("long").alias("mad_micro"),
            F.col("n_outliers").cast("long").alias("n_outliers"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------- q375
@register(
    "q375_jl_projection_audit",
    f"""
    WITH dims AS (
        SELECT vec_id, i, {_Q} AS q
        FROM (SELECT vec_id, unnest(embedding) AS e,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings)
    ),
    signs AS (
        SELECT j, i,
               CASE WHEN CAST(('0x' || substr(md5('jl|' || j || '|' || i),
                   1, 15)) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sgn
        FROM generate_series(1, {_JL_K}) AS a(j),
             generate_series(1, 64) AS b(i)
    ),
    proj AS (
        SELECT d.vec_id, s.j, SUM(CAST(s.sgn AS HUGEINT) * d.q) AS pj
        FROM dims d JOIN signs s ON d.i = s.i
        GROUP BY d.vec_id, s.j
    ),
    pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb
        FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id % 2 = 0
    ),
    orig_d AS (
        SELECT p.va, p.vb,
               SUM(CAST(da.q - db.q AS HUGEINT) * (da.q - db.q)) AS d2
        FROM pairs p
        JOIN dims da ON da.vec_id = p.va
        JOIN dims db ON db.vec_id = p.vb AND db.i = da.i
        GROUP BY p.va, p.vb
    ),
    proj_d AS (
        SELECT p.va, p.vb,
               SUM(CAST(pa.pj - pb.pj AS HUGEINT) * (pa.pj - pb.pj)) AS pd2
        FROM pairs p
        JOIN proj pa ON pa.vec_id = p.va
        JOIN proj pb ON pb.vec_id = p.vb AND pb.j = pa.j
        GROUP BY p.va, p.vb
    ),
    ratios AS (
        SELECT o.va,
               CAST(ROUND(CAST(p.pd2 AS DOUBLE) / {_JL_K}
                   / CAST(o.d2 AS DOUBLE) * 1000000.0) AS BIGINT) AS r
        FROM orig_d o JOIN proj_d p ON o.va = p.va AND o.vb = p.vb
        WHERE o.d2 > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(r) AS BIGINT) AS min_ratio_micro,
           CAST(MAX(r) AS BIGINT) AS max_ratio_micro,
           CAST(ROUND(AVG(CAST(r AS DOUBLE))) AS BIGINT)
               AS mean_ratio_micro
    FROM ratios
    """,
    doc="Johnson-Lindenstrauss projection audit: project the 64-d "
    f"embeddings to {_JL_K}-d with a DETERMINISTIC ±1 sign matrix "
    "(md5-derandomized — both engines build the identical matrix) "
    "and measure ||Pa-Pb||²/k over ||a-b||² on consecutive-id "
    "pairs — the JL lemma says these ratios concentrate near 1, "
    "and this gate reports their exact min/mean/max so an ANN "
    "pipeline (q41) can decide whether 8 cheap dimensions are "
    "safe BEFORE rebuilding its index. Projections are integer "
    "dot products of micro-quantized elements with ±1 signs "
    "(HUGEINT/DECIMAL sums — exact), one double division per "
    "pair. Scale: the sign matrix is k x 64 metadata broadcast; "
    "projection is one groupBy over the unnested dims.",
)
def q375_jl_projection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # Quantized (vec_id, dim, q) table feeds THREE consumers (the JL
    # projection plus both sides of the paired-distance joins): pin it
    # so embeddings is scanned once (q433 precedent).
    dims = pin(
        emb.select(
            "vec_id",
            F.posexplode("embedding").alias("i0", "e"),
        ).select(
            "vec_id",
            (F.col("i0") + 1).alias("i"),
            F.round(F.col("e").cast("double") * 1000000.0)
            .cast("long")
            .alias("q"),
        )
    )
    sign_rows = [
        (j, i)
        for j in range(1, _JL_K + 1)
        for i in range(1, 65)
    ]
    signs = spark.createDataFrame(sign_rows, "j int, i int").select(
        "j",
        "i",
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.lit("jl"), F.col("j").cast("string"),
                            F.col("i").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0,
            1,
        )
        .otherwise(-1)
        .alias("sgn"),
    )
    proj = pin(
        dims.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(
            F.sum(F.col("sgn").cast("decimal(38,0)") * F.col("q")).alias("pj")
        )
    )
    # (va even, vb = va+1) pairing expressed directly on the pinned
    # element/projection tables: db's join key is vec_id - 1, so the
    # equi-join on (va, i) keeps exactly the pairs whose even va and
    # odd va+1 both exist — the old emb-self-join "pairs" scaffold
    # re-scanned embeddings twice only to re-derive ids the pinned
    # frames already carry.
    da = dims.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("va"), "i", F.col("q").alias("qa")
    )
    db = dims.select(
        (F.col("vec_id") - 1).alias("va"),
        F.col("vec_id").alias("vb"),
        "i",
        F.col("q").alias("qb"),
    )
    orig_d = (
        da.join(db, ["va", "i"])
        .groupBy("va", "vb")
        .agg(
            F.sum(
                (F.col("qa") - F.col("qb")).cast("decimal(38,0)")
                * (F.col("qa") - F.col("qb"))
            ).alias("d2")
        )
    )
    pa = proj.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("va"), "j", F.col("pj").alias("pja")
    )
    pb = proj.select(
        (F.col("vec_id") - 1).alias("va"),
        F.col("vec_id").alias("vb"),
        "j",
        F.col("pj").alias("pjb"),
    )
    proj_d = (
        pa.join(pb, ["va", "j"])
        .groupBy("va", "vb")
        .agg(
            F.sum(
                (F.col("pja") - F.col("pjb")).cast("decimal(38,0)")
                * (F.col("pja") - F.col("pjb"))
            ).alias("pd2")
        )
    )
    ratios = (
        orig_d.join(proj_d, ["va", "vb"])
        .filter(F.col("d2") > 0)
        .select(
            F.round(
                F.col("pd2").cast("double")
                / _JL_K
                / F.col("d2").cast("double")
                * 1000000.0
            )
            .cast("long")
            .alias("r")
        )
    )
    return ratios.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min("r").cast("long").alias("min_ratio_micro"),
        F.max("r").cast("long").alias("max_ratio_micro"),
        F.round(F.avg(F.col("r").cast("double")))
        .cast("long")
        .alias("mean_ratio_micro"),
    )
