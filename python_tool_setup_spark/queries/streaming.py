"""Streaming queries for the driver gate (T1/T4/T5).

Each runs a REAL Structured Streaming query (file source →
availableNow drain → memory sink) over the events fixture and returns
the drained result as a batch DataFrame, so the DuckDB oracle can check
the streaming pipeline's output exactly like any batch query.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.streaming import streaming_dedup, tumbling_window_agg
from python_tool_setup_spark.tables import load_table
from python_tool_setup_spark.staging import staging_dir

TS_FMT = "yyyy-MM-dd HH:mm:ss"


_STAGED_EVENTS: dict[str, str] = {}


def _events_stream(spark: SparkSession, sf_dir: str):
    """Replay the events table through a real file-stream source.

    The fixture parquet stores TIMESTAMP(NANOS) (unreadable by Spark's
    scan), so stage it once through a batch rewrite to micros, then
    stream from the staged dir. The staged copy is cached per sf_dir —
    every streaming query replays the same immutable input.
    """
    events = load_table(spark, sf_dir, "events")
    staged = _STAGED_EVENTS.get(sf_dir)
    if staged is None:
        staged = staging_dir("events_stream_")
        events.write.mode("overwrite").parquet(staged)
        _STAGED_EVENTS[sf_dir] = staged
    return (
        spark.readStream.schema(events.schema).parquet(staged),
        events,
    )


def _drain(df: DataFrame, output_mode: str) -> DataFrame:
    name = f"q_{uuid.uuid4().hex[:10]}"
    ckpt = staging_dir("ckpt_")
    spark = df.sparkSession
    # Stateful ops allocate one state store PER shuffle partition (a
    # stream-stream join allocates four); at this input size 32
    # partitions is pure overhead. Each run gets a fresh checkpoint, so
    # re-binding the state partition count is safe.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


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
    "q52_stream_session_window",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, sid
    """,
    doc="REAL streaming session windows (T4): session_window over the "
    "event replay, complete-mode drain; oracle is the gaps-and-islands "
    "rewrite. At scale the watermark bounds per-key session state.",
)
def q52_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.streaming import session_window_agg

    stream, _ = _events_stream(spark, sf_dir)
    agg = session_window_agg(
        stream,
        "ts",
        "30 minutes",
        group_cols=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n_events")],
        watermark="1 hour",
    ).select(
        "user_id",
        F.date_format("window.start", TS_FMT).alias("session_start"),
        "n_events",
    )
    return _drain(agg, "complete")


@register(
    "q53_stream_late_data",
    """
    WITH ev AS (SELECT event_id, ts, value FROM events WHERE user_id % 20 = 0),
         wm AS (SELECT MAX(ts) - INTERVAL '1 hour' AS v FROM ev),
         cutoff AS (SELECT MAX(ts) - INTERVAL '24 hours' AS v FROM ev),
         kept AS (
            SELECT time_bucket(INTERVAL '6 hours', ts) AS ws, value
            FROM ev
            WHERE event_id % 2 = 0 OR ts >= (SELECT v FROM cutoff)
         )
    SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n,
           ROUND(SUM(value), 3) AS sum_value
    FROM kept
    WHERE ws + INTERVAL '6 hours' <= (SELECT v FROM wm)
    GROUP BY ws
    """,
    doc="Late-data drop under a watermark (T4): three-file replay with "
    "maxFilesPerTrigger=1 — even event_ids, then last-day odd rows "
    "(advancing the watermark to max(ts)-1h), then the remaining OLD odd "
    "rows, which arrive beyond the watermark and are DROPPED (Spark "
    "filters late events with the PREVIOUS batch's watermark — "
    "watermarkForLateEvents — hence the priming middle batch). Append "
    "emits windows closed by the final watermark; the oracle states "
    "exactly that: even + last-day rows, in windows ending <= max(ts)-1h. "
    "Replays ONE user shard (user_id % 20 = 0) — the late-drop semantics "
    "are per-watermark, not per-volume, so the slice proves the same "
    "contract without staging the full table three times.",
)
def q53_stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    staged = staging_dir("late_stream_")
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 20 == 0)
        .select("event_id", "ts", "value")
    )
    max_ts = events.agg(F.max("ts")).collect()[0][0]  # scalar bound, tiny
    cutoff = F.lit(max_ts) - F.expr("INTERVAL 24 HOURS")
    odd = F.col("event_id") % 2 != 0
    parts = [
        events.filter(~odd),                           # batch 0: on time
        events.filter(odd & (F.col("ts") >= cutoff)),  # batch 1: advances wm
        events.filter(odd & (F.col("ts") < cutoff)),   # batch 2: too late
    ]
    for i, sub_df in enumerate(parts):
        sub = staging_dir(f"late_part{i}_")
        sub_df.coalesce(1).write.mode("overwrite").parquet(sub)
        part = next(
            f for f in os.listdir(sub) if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = os.path.join(staged, f"{i:02d}.parquet")
        shutil.copyfile(os.path.join(sub, part), dst)
        # deterministic arrival order for the file-stream source
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", TS_FMT).alias("window_start"),
            "n",
            "sum_value",
        )
    )
    return _drain(agg, "append")


@register(
    "q54_stream_stateful",
    "SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id",
    doc="Custom stateful streaming operator (T5): applyInPandasWithState "
    "running-count per user over a single-batch replay; state is one "
    "counter per key (bounded by key cardinality, Arrow-batched).",
)
def q54_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    staged = staging_dir("stateful_stream_")
    events = load_table(spark, sf_dir, "events")
    # one file -> one micro-batch -> the per-batch emission IS the final
    # per-key count, so the batch oracle matches exactly
    events.select("user_id").coalesce(1).write.mode("overwrite").parquet(staged)

    def count_per_user(key, pdfs, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    stream = spark.readStream.schema("user_id long").parquet(staged)
    out = stream.groupBy("user_id").applyInPandasWithState(
        count_per_user,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _drain(out, "update")


@register(
    "q65_stream_merge",
    """
    WITH b1 AS (SELECT o_orderkey, ROUND(o_totalprice + 1000, 2) AS price
                FROM orders WHERE o_orderkey % 3 = 0)
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
    FROM orders
    WHERE o_orderkey % 3 != 0
    UNION ALL
    SELECT o_orderkey, price FROM b1
    """,
    doc="Streaming upsert (S5 x T1): two-file replay through the "
    "autoloader in merge mode — each micro-batch foreachBatch-merges "
    "into the path target (staged rewrite, idempotent on replay); "
    "batch 2's updated rows overwrite batch 1's by key.",
)
def q65_stream_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.config import IngestionConfig
    from python_tool_setup_spark.ingestion import make_ingestion

    staged = staging_dir("smerge_src_")
    target = staging_dir("smerge_tgt_") + "/t"
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    updates = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", F.round(F.col("o_totalprice") + 1000, 2).alias("price")
    )
    for i, sub_df in enumerate([base, updates]):
        sub = staging_dir(f"smerge_b{i}_")
        sub_df.coalesce(1).write.mode("overwrite").parquet(sub)
        part = next(
            f for f in os.listdir(sub) if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = os.path.join(staged, f"{i:02d}.parquet")
        shutil.copyfile(os.path.join(sub, part), dst)
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    cfg = IngestionConfig(
        source_path=staged,
        source_format="parquet",
        source_options={"maxFilesPerTrigger": "1"},
        schema="o_orderkey bigint, price double",
        target_path=target,
        write_mode="merge",
        ingest_mode="stream",
        merge_keys=["o_orderkey"],
        checkpoint_path=staging_dir("smerge_ckpt_"),
    )
    make_ingestion(spark, cfg).run()
    return spark.read.parquet(target)


@register(
    "q66_stream_stream_join",
    """
    SELECT a.user_id,
           a.event_id AS view_id,
           b.event_id AS purchase_id,
           STRFTIME(b.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'view' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '30 minutes'
    """,
    doc="Stream-stream inner join: views joined to purchases by the "
    "same user within 30 minutes, both sides watermarked so join state "
    "is evicted past the horizon; single-batch drain makes the full "
    "pair set deterministic and equal to the batch SQL join.",
)
def q66_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream, _ = _events_stream(spark, sf_dir)
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        F.date_format("p_ts", TS_FMT).alias("purchase_ts"),
    )
    return _drain(joined, "append")


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


@register(
    "q103_python_stream_source",
    """
    SELECT CAST(i % 10 AS INT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(LENGTH('doc ' || CAST(i AS VARCHAR) || ' body '
                           || repeat('x', CAST(i % 7 AS INT)))) AS BIGINT)
               AS total_body_chars
    FROM range(0, 400) t(i)
    GROUP BY 1
    """,
    doc="Custom Python STREAMING DataSource (Spark 4 datasource API): an "
    "offset-tracked synthetic stream (initialOffset/latestOffset/"
    "partitions/read) drained with availableNow under a checkpoint — "
    "exactly-once because any [start,end) offset range replays "
    "identically. Aggregated per bucket; the oracle regenerates every "
    "row arithmetically.",
)
def q103_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.sources.custom import register_synthetic_stream

    register_synthetic_stream(spark)
    stream = (
        spark.readStream.format("synthetic_stream")
        .option("rows", "400")
        .option("partitions", "2")
        .load()
    )
    agg = stream.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("body")).cast("bigint").alias("total_body_chars"),
    )
    return _drain(agg, "complete")
