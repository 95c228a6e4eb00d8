"""Round-3 gates, batch 11: trained quality classifier (q184), IVF
index incremental update (q185), distributed triangle counting (q186),
k-anonymity audit (q187), and the row-level ForeachWriter streaming
sink (q188).

Oracle conventions as everywhere: identical aliases both sides,
integer aggregates cast to BIGINT, approximate/learned components
gated through deterministic booleans the oracle pins.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.staging import staging_dir
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q184
_QC_MARGIN = 0.2


@register(
    "q184_quality_classifier",
    f"""
    WITH feat AS (
        SELECT vec_id,
               CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
                   AS s
        FROM embeddings
        WHERE ABS(CAST(embedding[1] AS DOUBLE)
                  + CAST(embedding[2] AS DOUBLE)) > {_QC_MARGIN}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           TRUE AS accuracy_floor_met
    FROM feat
    """,
    doc="Trained quality classifier (the fastText/LR scorer every "
    "corpus pipeline runs: fit a model on labelled docs, score the "
    "whole corpus distributed): pyspark.ml LogisticRegression fitted "
    "on embeddings labelled by a linearly separable rule (sign of "
    "e[0]+e[1], margin-filtered so the classes are cleanly "
    "separable), then model.transform scores every vector — training "
    "is an iterative driver-coordinated job, INFERENCE is a pure "
    "scan-stage map at any scale. The gate pins class counts "
    "relationally and requires >= 95% train-set accuracy; the "
    "learned sign of a separable direction is seed-stable, so the "
    "boolean is deterministic.",
)
def q184_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings")
    s = F.col("embedding")[0].cast("double") + F.col("embedding")[1].cast(
        "double"
    )
    data = (
        e.select("vec_id", "embedding", s.alias("s"))
        .filter(F.abs(F.col("s")) > _QC_MARGIN)
        .select(
            "vec_id",
            (F.col("s") > 0).cast("double").alias("label"),
            array_to_vector(
                F.transform("embedding", lambda x: x.cast("double"))
            ).alias("features"),
        )
        # pin the partition layout AND in-partition row order: L-BFGS
        # gradient sums are floating-point reductions whose result
        # depends on both, and the gate must fit the same model no
        # matter what partitioning the surrounding session produced
        .repartition(4, "vec_id")
        .sortWithinPartitions("vec_id")
    )
    model = LogisticRegression(
        maxIter=25, regParam=0.0, featuresCol="features", labelCol="label"
    ).fit(data)
    # Score with the learned coefficients as plain Catalyst expressions
    # instead of model.transform: (a) the exported-model path is the
    # 100 TB inference story — a scan-stage dot product in codegen, no
    # per-row JVM-ML closure; (b) model.transform serializes the
    # model's trainingSummary, which drags the SparkSession's
    # (non-serializable) ObservationManager into the task closure and
    # crashes in any session where df.observe has run (q134).
    w = [float(x) for x in model.coefficients]
    b = float(model.intercept)
    margin = F.aggregate(
        F.zip_with(
            F.transform("embedding", lambda x: x.cast("double")),
            F.array(*[F.lit(x) for x in w]),
            lambda xi, wi: xi * wi,
        ),
        F.lit(b),
        lambda acc, x: acc + x,
    )
    raw = (
        e.select("vec_id", "embedding", s.alias("s"))
        .filter(F.abs(F.col("s")) > _QC_MARGIN)
        .select(
            "vec_id",
            (F.col("s") > 0).cast("double").alias("label"),
            "embedding",
        )
    )
    scored = raw.select(
        "vec_id", "label", (margin > 0).cast("double").alias("pred")
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scored"),
        F.sum(F.col("label").cast("int")).cast("bigint").alias("n_pos"),
        (
            F.sum((F.col("label") == F.col("pred")).cast("int"))
            >= F.count(F.lit(1)) * 0.95
        ).alias("accuracy_floor_met"),
    )


# ---------------------------------------------------------------- q185
_IVF_NEW = 10
_IVF_OFFSET = 2_000_000


@register(
    "q185_ivf_incremental_update",
    f"""
    SELECT CAST({_IVF_NEW} AS BIGINT) AS n_new,
           CAST({_IVF_NEW} AS BIGINT) AS n_found,
           TRUE AS all_new_searchable
    """,
    doc="Incremental ANN index update (the arrival path of a living "
    "vector store: new embeddings must become searchable WITHOUT "
    "refitting the quantizer): the IVF coarse quantizer is fitted "
    "once on the existing corpus, a batch of new vectors (planted "
    "copies of known rows) is assigned to cells with the FROZEN "
    "model — one scan-stage transform, no k-means rerun — and "
    "unioned into the assigned corpus; probing with the originals "
    "must surface every planted arrival (identical vectors share "
    "cells under any quantizer). This is the q42 build path split "
    "into build-once / append-many, which is what makes IVF viable "
    "for a corpus that grows by billions of vectors a day.",
)
def q185_ivf_incremental_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.llm.similarity import ivf_index, ivf_topk

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assigned, model = ivf_index(e, "embedding", num_cells=16)

    from pyspark.ml.functions import array_to_vector

    new_batch = e.filter(F.col("vec_id") < _IVF_NEW).select(
        (F.col("vec_id") + _IVF_OFFSET).alias("vec_id"), "embedding"
    )
    new_assigned = model.transform(
        new_batch.withColumn("__features", array_to_vector(F.col("embedding")))
    ).drop("__features")
    index = assigned.unionByName(new_assigned)

    queries = e.filter(F.col("vec_id") < _IVF_NEW)
    hits = ivf_topk(
        queries, index, model, "vec_id", "vec_id", "embedding", k=5, nprobe=2
    ).filter(F.col("neighbor_id") == F.col("vec_id") + _IVF_OFFSET)
    return hits.agg(
        F.lit(_IVF_NEW).cast("bigint").alias("n_new"),
        F.count(F.lit(1)).cast("bigint").alias("n_found"),
        (F.count(F.lit(1)) == _IVF_NEW).alias("all_new_searchable"),
    )


# ---------------------------------------------------------------- q186
_TRI_MOD = 200


@register(
    "q186_triangle_count",
    f"""
    WITH und AS (
        SELECT DISTINCT LEAST(l_orderkey % {_TRI_MOD},
                              l_partkey % {_TRI_MOD}) AS a,
               GREATEST(l_orderkey % {_TRI_MOD},
                        l_partkey % {_TRI_MOD}) AS b
        FROM lineitem
        WHERE l_orderkey % {_TRI_MOD} <> l_partkey % {_TRI_MOD}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
           CAST(SUM(e1.a) AS BIGINT) AS apex_sum
    FROM und e1 JOIN und e2 ON e1.b = e2.a
                JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
    doc="Distributed triangle counting (graph clustering-coefficient / "
    "spam-detection primitive) over the order-part projection graph: "
    "edges canonicalized to a < b (each undirected edge stored once), "
    "wedges built by one self-join on the middle vertex, closed by a "
    "second join against the edge set — the standard two-join "
    "formulation where every triangle a<b<c is counted exactly once. "
    "At 100 TB-scale graphs the wedge join is the hotspot; orienting "
    "edges from lower- to higher-degree endpoints (degree ordering "
    "instead of id ordering) bounds per-vertex wedge fan-out, and "
    "both joins remain plain equi-joins on vertex keys.",
)
def q186_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = F.col("l_orderkey") % _TRI_MOD
    b = F.col("l_partkey") % _TRI_MOD
    und = (
        li.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    tri = e1.join(e2, F.col("e1.b") == F.col("e2.a")).join(
        e3,
        (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
    )
    return tri.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles"),
        F.sum(F.col("e1.a")).cast("bigint").alias("apex_sum"),
    )


# ---------------------------------------------------------------- q187
@register(
    "q187_k_anonymity",
    """
    WITH cells AS (
        SELECT lang, source, CAST(FLOOR(n_chars / 200.0) AS BIGINT)
                   AS len_bucket,
               COUNT(*) AS n
        FROM documents GROUP BY 1, 2, 3
    )
    SELECT lang, source, len_bucket, CAST(n AS BIGINT) AS group_size
    FROM cells WHERE n < 5
    ORDER BY lang, source, len_bucket
    """,
    doc="k-anonymity audit (privacy governance over training data, "
    "complementing q82's PII redaction): documents grouped by their "
    "quasi-identifier cell (lang, source, length bucket); any cell "
    "with fewer than k=5 members is a re-identification risk and is "
    "reported for suppression or generalization. One map-side-"
    "combined aggregate over the quasi-identifier key — the audit "
    "costs exactly one pass regardless of corpus size.",
)
def q187_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy(
        "lang",
        "source",
        F.floor(F.col("n_chars") / 200.0).cast("bigint").alias("len_bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        cells.filter(F.col("n") < 5)
        .select(
            "lang",
            "source",
            "len_bucket",
            F.col("n").cast("bigint").alias("group_size"),
        )
        .orderBy("lang", "source", "len_bucket")
    )


# ---------------------------------------------------------------- q188
@register(
    "q188_foreach_row_sink",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(event_id) AS BIGINT) AS id_sum
    FROM events
    GROUP BY event_type
    """,
    doc="Row-level ForeachWriter sink (the per-row escape hatch when "
    "no batch sink fits — pushing rows to a key-value store or "
    "message bus): a class-based writer with the full open(partition, "
    "epoch) / process(row) / close(err) lifecycle appends every "
    "event row to a per-(partition, epoch) spool file, making the "
    "write idempotent under task retry (a retried partition rewrites "
    "its own spool, never double-appends). The drained spool is read "
    "back and aggregated; equality with the batch answer proves no "
    "row was lost or duplicated across the lifecycle. foreachBatch "
    "(q65/q178) remains the preferred sink — per-row Python calls "
    "are the slow path, which is why this gate bounds itself to one "
    "aggregate pass.",
)
def q188_foreach_row_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    spool = staging_dir("foreach_spool_")

    class SpoolWriter:
        def open(self, partition_id: int, epoch_id: int) -> bool:
            # one spool file per (partition, epoch): task retries
            # overwrite their own file -> idempotent, never appended
            self.path = os.path.join(
                spool, f"p{partition_id}_e{epoch_id}.csv"
            )
            self.fh = open(self.path, "w")
            return True

        def process(self, row) -> None:
            self.fh.write(f"{row['event_id']},{row['event_type']}\n")

        def close(self, error) -> None:
            self.fh.close()
            if error is not None:
                os.unlink(self.path)

    src = staging_dir("foreach_src_")
    ev.select("event_id", "event_type").coalesce(4).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(
        "event_id long, event_type string"
    ).parquet(src)
    q = (
        stream.writeStream.foreach(SpoolWriter())
        .option("checkpointLocation", staging_dir("ckpt_foreach_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.read.csv(
        spool, schema="event_id long, event_type string"
    )
    return rows.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("event_id").cast("bigint").alias("id_sum"),
    )
