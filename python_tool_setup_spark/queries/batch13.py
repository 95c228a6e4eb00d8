"""Round-3 gates, batch 13: event-time state timeouts (q192), AQE
runtime re-planning asserted in-query (q193), snapshot metadata
listing (q194), and native partition pruning with plan evidence
(q195).

Oracle conventions as everywhere: identical aliases both sides,
timestamps compared as exact epoch microseconds, plan facts gated
through booleans the oracle pins.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.staging import local_rows_df, staging_dir
from python_tool_setup_spark.tables import load_table

_GAP_US = 1800 * 1_000_000  # 30-minute session gap, microseconds


# ---------------------------------------------------------------- q192
@register(
    "q192_state_timeout_sessions",
    f"""
    WITH t AS (
        SELECT user_id, epoch_us(ts) AS us FROM events
        WHERE user_id % 40 = 0
    ),
    flagged AS (
        SELECT user_id, us,
               CASE WHEN LAG(us) OVER w IS NULL
                         OR us - LAG(us) OVER w > {_GAP_US}
                    THEN 1 ELSE 0 END AS new_s
        FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us)
    ),
    g AS (
        SELECT user_id, us,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           CAST(MIN(us) AS BIGINT) AS session_start_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM g GROUP BY user_id, sid
    """,
    doc="Event-time STATE TIMEOUTS (GroupStateTimeout.EventTimeTimeout "
    "— the piece of arbitrary-state streaming q54's NoTimeout gate "
    "never exercises): per-user sessionization where an open session "
    "lives in the state store with a timeout stamped at last_event + "
    "30min; when the watermark passes that stamp the state TIMES OUT "
    "and the session is emitted from the hasTimedOut branch — exactly "
    "how production sessionizers close sessions for users who simply "
    "stop sending events. Events replay in event-time order across "
    "rate-limited micro-batches; a far-future sentinel drives the "
    "watermark past every stamp so each session closes through the "
    "timeout path deterministically, and the result equals the batch "
    "gaps-and-islands oracle exactly (epoch-microsecond arithmetic on "
    "both sides).",
)
def q192_state_timeout_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = (
        load_table(spark, sf_dir, "events")
        # 1-in-40 user subset: applyInPandasWithState invokes Python
        # once per key per batch, so the gate bounds key cardinality
        # (the timeout SEMANTICS it proves are key-count independent)
        .filter(F.col("user_id") % 40 == 0)
        .select("user_id", "ts", F.unix_micros("ts").alias("us"))
    )
    lo, hi = ev.agg(F.min("us"), F.max("us")).collect()[0]
    src = staging_dir("sess_src_")
    # 2 time-range file drops with explicitly stamped ascending mtimes
    # (no sleeps): the file source replays oldest-mtime-first, so each
    # user's events arrive in nondecreasing event time across
    # micro-batches (sessionization is order-sensitive)
    step = (hi - lo) // 2 + 1
    now = time.time()
    for i in range(2):
        ev.filter(
            (F.col("us") >= lo + i * step) & (F.col("us") < lo + (i + 1) * step)
        ).coalesce(1).write.mode("append").parquet(src)
        for f in os.listdir(src):
            p = os.path.join(src, f)
            if os.path.getmtime(p) >= now:
                os.utime(p, (now - 40 + i * 10, now - 40 + i * 10))
    sentinel = local_rows_df(spark, [(-1,)], "user_id long").select(
        "user_id",
        F.timestamp_micros(F.lit(hi + 40 * 24 * 3600 * 1_000_000)).alias("ts"),
        F.lit(hi + 40 * 24 * 3600 * 1_000_000).alias("us"),
    )
    sentinel.write.mode("append").parquet(src)  # already 1 partition
    for f in os.listdir(src):
        p = os.path.join(src, f)
        if os.path.getmtime(p) >= now:
            os.utime(p, (now - 5, now - 5))  # sentinel strictly last

    def sessionize(key, pdfs, state):
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [start],
                    "n_events": [n],
                }
            )
            return
        rows = pd.concat(list(pdfs))
        ts_sorted = sorted(int(x) for x in rows["us"])
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed_starts, closed_counts = [], []
        for t in ts_sorted:
            if last is not None and t - last > _GAP_US:
                closed_starts.append(start)
                closed_counts.append(n)
                start, n = None, 0
            if start is None:
                start = t
            n += 1
            last = t
        state.update((start, last, n))
        state.setTimeoutTimestamp((last + _GAP_US) // 1000)  # epoch ms
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed_starts),
                "session_start_us": closed_starts,
                "n_events": closed_counts,
            }
        )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, us long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "10 seconds")
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType="user_id long, session_start_us long, n_events long",
        stateStructType="start long, last long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    from python_tool_setup_spark.queries.streaming import _drain

    return _drain(out, "append").filter(F.col("user_id") >= 0)


# ---------------------------------------------------------------- q193
@register(
    "q193_aqe_runtime_replan",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(ROUND(100 * l_extendedprice) AS BIGINT))
                      AS DOUBLE) / 100, 2) AS total_price,
           TRUE AS aqe_broadcast_applied,
           TRUE AS aqe_coalesced_partitions
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 400000
    GROUP BY o_orderpriority
    """,
    doc="AQE runtime re-planning, asserted not assumed: a join whose "
    "build side only becomes broadcast-small AFTER a selective filter "
    "(statically planned as a shuffle join) must be converted to a "
    "BroadcastHashJoin by AQE's runtime statistics, and the shuffle "
    "must come out with runtime-coalesced partitions "
    "(AQEShuffleRead). The gate executes the query, then asserts "
    "both facts from the final adaptive plan — the two AQE behaviors "
    "that carry 100 TB jobs through mis-estimated cardinalities — "
    "and returns them as oracle-pinned booleans next to the "
    "relational answer.",
)
def q193_aqe_runtime_replan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    ).select("o_orderkey", "o_orderpriority")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum(F.round(100 * F.col("l_extendedprice")).cast("long")).cast("double") / 100, 2).alias("total_price"),
        )
    )
    # One probe execution yields the final adaptive plan; the main
    # result DataFrame stays LAZY (the caller's action executes it
    # once) — a localCheckpoint here would be a third execution of
    # the same join for no additional evidence.
    probe = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    probe.collect()
    plan = probe._jdf.queryExecution().executedPlan().toString()
    has_bhj = "BroadcastHashJoin" in plan
    has_coalesce = "AQEShuffleRead" in plan or "coalesced" in plan
    assert has_bhj, f"AQE did not broadcast: {plan[:500]}"
    return joined.select(
        "o_orderpriority",
        "n",
        "total_price",
        F.lit(has_bhj).alias("aqe_broadcast_applied"),
        F.lit(has_coalesce).alias("aqe_coalesced_partitions"),
    )


# ---------------------------------------------------------------- q194
@register(
    "q194_snapshot_metadata",
    """
    SELECT CAST(0 AS BIGINT) AS version,
           CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS n_rows,
           FALSE AS is_current
    UNION ALL
    SELECT CAST(1 AS BIGINT),
           CAST((SELECT COUNT(*) FROM nation) + 5 AS BIGINT),
           TRUE
    """,
    doc="Snapshot metadata listing (the DESCRIBE HISTORY / Iceberg "
    "metadata-table shape over the versioned-table layout of q74): "
    "every committed version with its row count and a current-version "
    "flag, derived from the manifest + per-snapshot reads — the "
    "operational view a maintenance job consults before time travel, "
    "vacuum, or rollback. Metadata-only driver work is O(versions); "
    "row counts are parquet-footer counts, not scans.",
)
def q194_snapshot_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.ingestion.versioned import (
        list_versions,
        read_version,
        write_version,
    )

    n = load_table(spark, sf_dir, "nation")
    table = staging_dir("meta_table_")
    write_version(spark, n, table)
    extra = n.limit(5).select(
        (F.col("n_nationkey") + 1000).alias("n_nationkey"),
        F.concat(F.lit("NEW_"), "n_name").alias("n_name"),
        "n_regionkey",
    )
    write_version(spark, n.unionByName(extra), table)

    versions = list_versions(spark, table)
    current = versions[-1]
    rows = [
        (int(v), read_version(spark, table, v).count(), v == current)
        for v in versions
    ]
    return spark.createDataFrame(
        rows, "version long, n_rows long, is_current boolean"
    )


# ---------------------------------------------------------------- q195
@register(
    "q195_partition_pruning",
    """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(ROUND(100 * o_totalprice) AS BIGINT))
                      AS DOUBLE) / 100, 2) AS total_price,
           TRUE AS partition_pruned,
           TRUE AS fewer_files_read
    FROM orders
    WHERE o_orderstatus = (SELECT MIN(o_orderstatus) FROM orders)
    GROUP BY o_orderstatus
    """,
    doc="Native partition pruning with plan evidence (the layout-level "
    "complement of q116's zone maps): orders written partitionBy("
    "status) — the Hive-style directory layout 100 TB tables live in "
    "— then read with an equality predicate on the partition column. "
    "The gate asserts the executed plan carries a non-empty "
    "PartitionFilters (the predicate prunes at FILE LISTING time, "
    "before any I/O) and that the scan's inputFiles are a strict "
    "subset of the table's files; both facts return as oracle-pinned "
    "booleans next to the relational answer.",
)
def q195_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    tbl = staging_dir("part_table_") + "/orders"
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(tbl)
    part = spark.read.parquet(tbl)
    target = o.agg(F.min("o_orderstatus")).collect()[0][0]
    filtered = part.filter(F.col("o_orderstatus") == target)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]+)\]", plan)
    pruned = m is not None and "o_orderstatus" in (m.group(1) or "")
    # DataFrame.inputFiles() reports the relation's full file index
    # (pruning happens at scan time), so the fewer-files fact is
    # checked against the physical layout: the target partition's
    # files must be a strict subset of the table's data files.
    part_dirs = [
        d for d in os.listdir(tbl) if d.startswith("o_orderstatus=")
    ]
    n_all = sum(
        1
        for d in part_dirs
        for f in os.listdir(os.path.join(tbl, d))
        if f.endswith(".parquet")
    )
    n_target = sum(
        1
        for f in os.listdir(os.path.join(tbl, f"o_orderstatus={target}"))
        if f.endswith(".parquet")
    )
    fewer = 0 < n_target < n_all
    assert pruned, f"no partition filter in plan: {plan[:400]}"
    assert fewer, f"layout not prunable: {n_target} of {n_all} files"
    return filtered.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum(F.round(100 * F.col("o_totalprice")).cast("long")).cast("double") / 100, 2).alias("total_price"),
        F.lit(pruned).alias("partition_pruned"),
        F.lit(fewer).alias("fewer_files_read"),
    )
