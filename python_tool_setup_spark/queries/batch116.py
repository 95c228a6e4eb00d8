"""Round-5 gates, batch 116: watermark-delay sweep (q441 — the
share of events each candidate watermark delay would DROP, from
the recorded stream replayed in arrival order: the design table
for q53/q281's runtime watermarks, computed BEFORE you commit a
delay to production) and a broadcast-threshold advisor (q442 —
each dimension table's measured in-memory bytes against candidate
autoBroadcastJoinThreshold settings: which joins in the star
schema go broadcast at 10 MB and which need 100 MB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import prefix_agg
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_DELAYS_H = [0, 1, 6, 24]
_THRESH_MB = [10, 100]


# ---------------------------------------------------------------- q441
@register(
    "q441_watermark_sweep_advisor",
    f"""
    WITH arr AS (
        SELECT event_id, epoch_ms(ts) AS t_ms,
               MAX(epoch_ms(ts)) OVER (
                   ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS hwm_ms
        FROM events
    ),
    lateness AS (
        SELECT CASE WHEN hwm_ms IS NULL OR hwm_ms <= t_ms THEN 0
                    ELSE hwm_ms - t_ms END AS late_ms
        FROM arr
    ),
    cfg AS (SELECT * FROM (VALUES {", ".join(f"({h})" for h in _DELAYS_H)})
            AS t(delay_h))
    SELECT CAST(c.delay_h AS BIGINT) AS delay_h,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN l.late_ms > c.delay_h * 3600000
                    THEN 1 ELSE 0 END) AS BIGINT) AS dropped,
           CAST(ROUND(1e6 * SUM(CASE WHEN l.late_ms > c.delay_h * 3600000
                    THEN 1 ELSE 0 END) / COUNT(*)) AS BIGINT)
               AS drop_share_micro
    FROM cfg c, lateness l
    GROUP BY c.delay_h ORDER BY c.delay_h
    """,
    doc="Watermark-delay design sweep (replay the recorded stream "
    "in ARRIVAL order — event_id — and measure, for candidate "
    "delays 0/1/6/24h, how many events arrive later than the "
    "running event-time high-water mark minus the delay, i.e. "
    "would be DROPPED by that watermark; q53 demonstrates the "
    "drop and q281 meters it at runtime — this gate picks the "
    "delay BEFORE production): the running high-water mark is "
    "an ordered prefix MAX — Spark routes it through the "
    "blockrank prefix (no unpartitioned window), the oracle's "
    "global window over the same integers proves it exact; the "
    "sweep is a broadcast 4-row cross join. Scale: one shuffle "
    "for the prefix, then counting.",
)
def q441_watermark_sweep_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    base = e.select("event_id", F.unix_millis("ts").alias("t_ms"))
    pre = prefix_agg(
        base, [("event_id", "asc")], {"hwm_ms": ("max", "t_ms")}
    )
    lateness = pre.select(
        F.when(
            F.col("hwm_ms").isNull() | (F.col("hwm_ms") <= F.col("t_ms")),
            0,
        )
        .otherwise(F.col("hwm_ms") - F.col("t_ms"))
        .alias("late_ms")
    )
    cfg = spark.createDataFrame([(h,) for h in _DELAYS_H], ["delay_h"])
    dropped = F.sum(
        F.when(
            F.col("late_ms") > F.col("delay_h") * 3600000, 1
        ).otherwise(0)
    )
    return (
        lateness.crossJoin(F.broadcast(cfg))
        .groupBy("delay_h")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            dropped.cast("long").alias("dropped"),
            F.round(F.lit(1e6) * dropped / F.count("*"))
            .cast("long")
            .alias("drop_share_micro"),
        )
        .select(
            F.col("delay_h").cast("long").alias("delay_h"),
            "n_events",
            "dropped",
            "drop_share_micro",
        )
        .orderBy("delay_h")
    )


# ---------------------------------------------------------------- q442
@register(
    "q442_broadcast_advisor",
    f"""
    WITH sizes AS (
        SELECT 'customer' AS tbl, COUNT(*) AS n_rows,
               SUM(8 + len(c_name) + 4 + 8 + len(c_mktsegment) + 20)
                   AS est_bytes
        FROM customer
        UNION ALL
        SELECT 'nation', COUNT(*), SUM(4 + len(n_name) + 4 + 20)
        FROM nation
        UNION ALL
        SELECT 'region', COUNT(*), SUM(4 + len(r_name) + 20) FROM region
        UNION ALL
        SELECT 'part', COUNT(*),
               SUM(8 + len(p_name) + len(p_brand) + len(p_type) + 4 + 8
                   + 20)
        FROM part
        UNION ALL
        SELECT 'supplier', COUNT(*),
               SUM(8 + len(s_name) + 4 + 8 + 20) FROM supplier
    ),
    cfg AS (SELECT * FROM (VALUES {", ".join(f"({t})" for t in _THRESH_MB)})
            AS t(thresh_mb))
    SELECT s.tbl, CAST(c.thresh_mb AS BIGINT) AS thresh_mb,
           CAST(s.n_rows AS BIGINT) AS n_rows,
           CAST(s.est_bytes AS BIGINT) AS est_bytes,
           s.est_bytes <= c.thresh_mb * 1048576 AS broadcastable
    FROM sizes s CROSS JOIN cfg c ORDER BY s.tbl, c.thresh_mb
    """,
    doc="Broadcast-threshold advisor for the star schema's "
    "dimension tables (measured in-memory byte estimates — "
    "fixed widths + actual string lengths + ~20B row overhead "
    "— against candidate autoBroadcastJoinThreshold settings; "
    "the table that says WHICH dim joins go broadcast at the "
    "default 10 MB and which need the threshold raised — the "
    "decision behind every F.broadcast() hint this repo "
    "places): five single-table aggregates stacked, "
    "deterministic integer estimates, the verdict an integer "
    "byte compare. Scale: dims are small by definition; the "
    "fact table never enters.",
)
def q442_broadcast_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ov = 20

    def est(tbl: str, expr):
        t = load_table(spark, sf_dir, tbl)
        return t.agg(
            F.lit(tbl).alias("tbl"),
            F.count("*").alias("n_rows"),
            F.sum(expr).alias("est_bytes"),
        )

    sizes = (
        est(
            "customer",
            F.lit(8)
            + F.length("c_name")
            + F.lit(4 + 8)
            + F.length("c_mktsegment")
            + F.lit(ov),
        )
        .unionByName(
            est("nation", F.lit(4) + F.length("n_name") + F.lit(4 + ov))
        )
        .unionByName(est("region", F.lit(4) + F.length("r_name") + F.lit(ov)))
        .unionByName(
            est(
                "part",
                F.lit(8)
                + F.length("p_name")
                + F.length("p_brand")
                + F.length("p_type")
                + F.lit(4 + 8 + ov),
            )
        )
        .unionByName(
            est("supplier", F.lit(8) + F.length("s_name") + F.lit(4 + 8 + ov))
        )
    )
    cfg = spark.createDataFrame([(t,) for t in _THRESH_MB], ["thresh_mb"])
    return (
        sizes.crossJoin(F.broadcast(cfg))
        .select(
            "tbl",
            F.col("thresh_mb").cast("long").alias("thresh_mb"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("est_bytes").cast("long").alias("est_bytes"),
            (F.col("est_bytes") <= F.col("thresh_mb") * 1048576).alias(
                "broadcastable"
            ),
        )
        .orderBy("tbl", "thresh_mb")
    )
