"""Round-4 gates, batch 54: the Spark 4 state-store READER as a
first-class surface — q313 audits a live streaming aggregation's
checkpoint state against the batch truth (the state itself, not the
sink), q314 pins the state-metadata catalog a checkpoint advertises.

Reference parity note: the reference's streaming surface is
Auto-Loader-style ingestion (framework.py:45-302 equivalent covered
by S2/T1); state introspection is a beyond-reference operator the
OSS state data source (SPARK-45511) makes possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.staging import staging_dir


_CKPT_CACHE: dict[str, str] = {}


def _drain_agg_checkpoint(spark: SparkSession, sf_dir: str) -> str:
    """Run the canonical availableNow streaming aggregation (integer
    cents so state holds EXACT longs) and return its checkpoint dir.
    Memoized per sf_dir: q313 and q314 audit the SAME checkpoint, so
    the drain runs once per session (the q112/load_table memoization
    discipline — bench runs both gates back to back)."""
    from python_tool_setup_spark.queries.streaming import _events_stream

    cached = _CKPT_CACHE.get(sf_dir)
    if cached is not None:
        return cached

    stream, _ = _events_stream(spark, sf_dir)
    ckpt = staging_dir("state_reader_ckpt_")
    agg = (
        stream.withColumn(
            "cents", F.round(F.col("value") * 100).cast("long")
        )
        .groupBy("event_type")
        .agg(F.sum("cents").alias("total_cents"), F.count(F.lit(1)).alias("n"))
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            agg.writeStream.outputMode("complete")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    _CKPT_CACHE[sf_dir] = ckpt
    return ckpt


# ---------------------------------------------------------------- q313
@register(
    "q313_state_store_reader",
    """
    SELECT event_type,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="State-store reader audit (Spark 4's statestore data source, "
    "SPARK-45511): a real availableNow streaming aggregation "
    "drains into a checkpoint, then the gate reads the OPERATOR "
    "STATE itself — spark.read.format('statestore') — and returns "
    "per-key sum/count reassembled from the checkpoint files. The "
    "DuckDB oracle recomputes the same aggregate from the raw "
    "events, so the match proves end-to-end that checkpointed "
    "state equals batch truth — the debugging/forensics primitive "
    "q282's file-level checkpoint parse approximates, now through "
    "the supported reader (values are integer cents, so state "
    "holds exact longs — nothing FP crosses the checkpoint). "
    "Scale: the reader materializes state per shuffle partition — "
    "the same parallelism the operator itself ran with.",
)
def q313_state_store_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    ckpt = _drain_agg_checkpoint(spark, sf_dir)
    st = spark.read.format("statestore").load(ckpt)
    return st.select(
        F.col("key.event_type").alias("event_type"),
        F.col("value.sum").cast("long").alias("total_cents"),
        F.col("value.count").cast("long").alias("n"),
    ).orderBy("event_type")


# ---------------------------------------------------------------- q314
@register(
    "q314_state_metadata",
    """
    SELECT CAST(0 AS BIGINT) AS operator_id,
           'stateStoreSave' AS operator_name,
           'default' AS state_store_name,
           CAST(4 AS BIGINT) AS num_partitions,
           CAST(0 AS BIGINT) AS min_batch_id
    """,
    doc="State-metadata catalog contract (the state source's "
    "companion, state-metadata format): after the q313 drain, the "
    "checkpoint must advertise exactly one stateful operator — "
    "stateStoreSave, store 'default', 4 state partitions (the "
    "gate pins shuffle partitions to 4 for the drain), first "
    "batch 0. The oracle is the literal expected catalog row: "
    "any drift in operator registration, partition count, or "
    "batch accounting (e.g. a silent re-partition of state, which "
    "CORRUPTS recovery) fails the gate. This is the "
    "pre-conditions check an operator-state migration tool would "
    "run before rewriting checkpoints.",
)
def q314_state_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    ckpt = _drain_agg_checkpoint(spark, sf_dir)
    md = spark.read.format("state-metadata").load(ckpt)
    return md.select(
        F.col("operatorId").cast("long").alias("operator_id"),
        F.col("operatorName").alias("operator_name"),
        F.col("stateStoreName").alias("state_store_name"),
        F.col("numPartitions").cast("long").alias("num_partitions"),
        F.col("minBatchId").cast("long").alias("min_batch_id"),
    )
