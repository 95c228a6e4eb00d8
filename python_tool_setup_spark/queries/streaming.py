"""Streaming queries for the driver gate (T1/T4/T5).

Each runs a REAL Structured Streaming query (file source →
availableNow drain → memory sink) over the events fixture and returns
the drained result as a batch DataFrame, so the DuckDB oracle can check
the streaming pipeline's output exactly like any batch query.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.streaming import streaming_dedup, tumbling_window_agg
from python_tool_setup_spark.tables import load_table

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _events_stream(spark: SparkSession, sf_dir: str):
    """Replay the events table through a real file-stream source.

    The fixture parquet stores TIMESTAMP(NANOS) (unreadable by Spark's
    scan), so stage it once through a batch rewrite to micros, then
    stream from the staged dir.
    """
    staged = tempfile.mkdtemp(prefix="events_stream_")
    events = load_table(spark, sf_dir, "events")
    events.write.mode("overwrite").parquet(staged)
    return (
        spark.readStream.schema(events.schema).parquet(staged),
        events,
    )


def _drain(df: DataFrame, output_mode: str) -> DataFrame:
    name = f"q_{uuid.uuid4().hex[:10]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


@register(
    "q27_stream_tumbling_agg",
    """
    SELECT STRFTIME(time_bucket(INTERVAL '6 hours', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 3) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="REAL streaming tumbling-window aggregation (T1+T4): file-stream "
    "replay of events, watermark, availableNow drain; oracle checks the "
    "drained output equals the batch SQL result.",
)
def q27_stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream, _ = _events_stream(spark, sf_dir)
    agg = tumbling_window_agg(
        stream,
        "ts",
        "6 hours",
        group_cols=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        ],
        watermark="1 hour",
    ).select(
        F.date_format("window.start", TS_FMT).alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )
    return _drain(agg, "complete")


@register(
    "q28_stream_dedup",
    "SELECT DISTINCT user_id, event_type FROM events",
    doc="REAL streaming dedup (T5): dropDuplicatesWithinWatermark over the "
    "event replay; output is the distinct key set.",
)
def q28_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream, _ = _events_stream(spark, sf_dir)
    deduped = streaming_dedup(
        stream.select("user_id", "event_type", "ts"),
        ["user_id", "event_type"],
        ts_col="ts",
        watermark="365 days",
    ).select("user_id", "event_type")
    return _drain(deduped, "append")
