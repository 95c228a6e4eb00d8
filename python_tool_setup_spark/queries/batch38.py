"""Round-4 gates, batch 38: streaming observability — the watermark
drop-accounting metric (q281: numRowsDroppedByWatermark must equal the
planted late rows, turning q53's behavioral proof into an auditable
counter) and checkpoint forensics (q282: the offsets/commits WAL pair
on disk must show every micro-batch committed exactly once).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.staging import local_rows_df, staging_dir
from python_tool_setup_spark.tables import load_table


def _stage_three_batches(spark, sf_dir):
    """q53's scripted arrival order: on-time rows, a watermark
    advancer, then too-late rows (>24h behind max ts)."""
    staged = staging_dir("wmobs_stream_")
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 20 == 0)
        .select("event_id", "ts", "value")
    )
    max_ts = events.agg(F.max("ts")).collect()[0][0]  # scalar bound
    cutoff = F.lit(max_ts) - F.expr("INTERVAL 24 HOURS")
    odd = F.col("event_id") % 2 != 0
    parts = [
        events.filter(~odd),
        events.filter(odd & (F.col("ts") >= cutoff)),
        events.filter(odd & (F.col("ts") < cutoff)),
    ]
    for i, sub_df in enumerate(parts):
        sub = staging_dir(f"wmobs_part{i}_")
        sub_df.coalesce(1).write.mode("overwrite").parquet(sub)
        part = next(
            f
            for f in os.listdir(sub)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = os.path.join(staged, f"{i:02d}.parquet")
        shutil.copyfile(os.path.join(sub, part), dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)
    return staged, events.schema


# ---------------------------------------------------------------- q281
@register(
    "q281_watermark_drop_metrics",
    """
    WITH ev AS (
        SELECT event_id, ts FROM events WHERE user_id % 20 = 0
    ),
    mx AS (SELECT MAX(ts) AS m FROM ev),
    ontime AS (
        SELECT ts FROM ev, mx
        WHERE NOT (event_id % 2 <> 0 AND ts < m - INTERVAL '24 hours')
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS rows_in_closed_windows,
           TRUE AS drops_surfaced
    FROM ontime, mx
    WHERE time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours'
          <= m - INTERVAL '1 hour'
    """,
    doc="Watermark drop OBSERVABILITY (q53 proves late rows vanish "
    "from the answer; this audits the operator-facing signal): the "
    "same scripted three-batch arrival — on-time rows, a watermark "
    "advancer, then rows >24h late against a 1-hour watermark — is "
    "drained; the gate returns the total events inside EMITTED "
    "(closed) windows, which the oracle states exactly: on-time rows "
    "whose 6h window end clears the final watermark — every planted "
    "late row excluded, unclosed head windows withheld (append-mode "
    "contract). Beside it, drops_surfaced pins that the engine's "
    "numRowsDroppedByWatermark counter is NONZERO across the drain — "
    "the counter splits drops between the pre-operator late filter "
    "(uncounted) and in-operator eviction (counted), so its exact "
    "value is engine bookkeeping, but an on-call watching a 100 TB "
    "stream must see it move when data is being lost to lateness, "
    "and that is what the gate asserts.",
)
def q281_watermark_drop_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    staged, schema = _stage_three_batches(spark, sf_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", staging_dir("ckpt_wm_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dropped = 0
        for p in q.recentProgress:
            for op in p["stateOperators"]:
                dropped += op.get("numRowsDroppedByWatermark", 0)
        emitted = spark.table(name).agg(F.sum("n")).collect()[0][0] or 0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return local_rows_df(
        spark,
        [(int(emitted), dropped > 0)],
        "rows_in_closed_windows long, drops_surfaced boolean",
    )


# ---------------------------------------------------------------- q282
@register(
    "q282_checkpoint_forensics",
    """
    SELECT CAST(3 AS BIGINT) AS n_batches,
           TRUE AS all_committed,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events WHERE user_id % 20 = 0
    """,
    doc="Checkpoint forensics — the write-ahead bookkeeping behind "
    "exactly-once (q153 proves resume WORKS; this pins the artifact "
    "that makes it work): a three-file stateless drain under "
    "maxFilesPerTrigger=1 must leave a checkpoint whose offsets/ WAL "
    "has exactly one entry per micro-batch (0,1,2) and whose "
    "commits/ directory matches it one-for-one — an offsets entry "
    "without a commit is an in-flight batch a restart must replay; "
    "a commit without offsets is corruption. The gate parses the "
    "checkpoint directory ITSELF (file names are the batch ids), "
    "returns the batch count and the offsets==commits check beside "
    "the row count delivered, and the oracle pins all three. This "
    "is the inspection an operator performs on any 100 TB stream "
    "before trusting a restart.",
)
def q282_checkpoint_forensics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 20 == 0)
        .select("event_id", "ts", "value")
    )
    staged = staging_dir("ckf_stream_")
    # three source files -> three micro-batches at maxFilesPerTrigger=1
    for i in range(3):
        sub = staging_dir(f"ckf_part{i}_")
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(sub)
        part = next(
            f
            for f in os.listdir(sub)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = os.path.join(staged, f"{i:02d}.parquet")
        shutil.copyfile(os.path.join(sub, part), dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)
    ckpt = staging_dir("ckpt_ckf_")
    name = f"ckf_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    offsets = sorted(
        f for f in os.listdir(os.path.join(ckpt, "offsets")) if f.isdigit()
    )
    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt, "commits")) if f.isdigit()
    )
    n_rows = spark.table(name).count()
    return local_rows_df(
        spark,
        [(len(offsets), offsets == commits, n_rows)],
        "n_batches long, all_committed boolean, n_rows long",
    )
