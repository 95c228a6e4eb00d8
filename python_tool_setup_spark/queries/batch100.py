"""Round-5 gates, batch 100: time-weighted average value (q404 —
TWAP over each user's event timeline, each reading held until the
next one: the duration-honest mean that a plain AVG gets wrong
whenever sampling is irregular, which event streams always are)
and session entry/exit/bounce analysis (q405 — which event type
OPENS and which CLOSES a 30-minute-gap session, and how often the
session is a single-event bounce: the landing/exit-page report of
web analytics re-expressed over the events table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_GAP_MS = 30 * 60 * 1000


# ---------------------------------------------------------------- q404
@register(
    "q404_time_weighted_average",
    """
    WITH seq AS (
        SELECT event_type, value,
               epoch_ms(ts) AS t_ms,
               LEAD(epoch_ms(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt_ms
        FROM events
    ),
    seg AS (
        SELECT event_type,
               nxt_ms - t_ms AS dt_ms,
               CAST(ROUND(1e6 * value) AS BIGINT) AS v_micro
        FROM seq WHERE nxt_ms IS NOT NULL
    ),
    agg AS (
        SELECT event_type,
               COUNT(*) AS n_segments,
               CAST(SUM(dt_ms) AS HUGEINT) AS dt_sum,
               SUM(CAST(v_micro AS HUGEINT) * dt_ms) AS vw
        FROM seg GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_segments AS BIGINT) AS n_segments,
           CAST(dt_sum AS BIGINT) AS dt_ms_sum,
           CAST(vw AS VARCHAR) AS vw_sum,
           CAST(CASE WHEN vw >= 0
                THEN (2 * vw + dt_sum) // (2 * dt_sum)
                ELSE -((2 * (-vw) + dt_sum) // (2 * dt_sum))
                END AS BIGINT) AS twap_micro
    FROM agg ORDER BY event_type
    """,
    doc="Time-weighted average value per event type (TWAP: each "
    "reading weighted by the milliseconds until the same user's "
    "next event — the duration-honest mean; a plain AVG "
    "over-counts burst periods and under-counts quiet ones, "
    "which is exactly backwards for a held-state metric): "
    "per-user lead(epoch_ms) windows (partitioned — no global "
    "window), value micro-quantized BEFORE the weighted sum so "
    "the accumulation is exact integer (DECIMAL(38,0), cast "
    "before multiply — v_micro*dt_ms reaches ~1e15 per segment), "
    "one double divide at the end. Scale: one shuffle on "
    "user_id, then type-domain output.",
)
def q404_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        "value",
        F.unix_millis("ts").alias("t_ms"),
        F.lead(F.unix_millis("ts")).over(w).alias("nxt_ms"),
    ).where(F.col("nxt_ms").isNotNull())
    seg = seq.select(
        "event_type",
        (F.col("nxt_ms") - F.col("t_ms")).alias("dt_ms"),
        F.round(F.lit(1e6) * F.col("value")).cast("long").alias("v_micro"),
    )
    # vw_sum leaves as a STRING, never DECIMAL: the weighted sum
    # passes 2^63 at modest SFs (~1e15 per segment) and a DECIMAL
    # final hash-diverges on the driver (DuckDB pandas fetch coerces
    # DECIMAL/HUGEINT to float64, Spark toPandas keeps Decimal — the
    # q521 class). twap_micro is the half-away round of the exact
    # fraction vw/dt via integer division on BOTH engines — the old
    # ROUND(CAST(vw AS DOUBLE)/...) re-entered the not-correctly-
    # rounded Decimal->double cast past 2^53.
    agg = seg.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_segments"),
        F.sum("dt_ms").cast("long").alias("dt_ms_sum"),
        F.sum(F.col("v_micro").cast("decimal(38,0)") * F.col("dt_ms"))
        .cast("decimal(38,0)")
        .alias("vw"),
    )
    return agg.select(
        "event_type",
        "n_segments",
        "dt_ms_sum",
        F.col("vw").cast("string").alias("vw_sum"),
        F.expr(
            "CAST(CASE WHEN vw >= 0"
            " THEN (2 * vw + dt_ms_sum)"
            "      div (2 * CAST(dt_ms_sum AS DECIMAL(38,0)))"
            " ELSE -((2 * (-vw) + dt_ms_sum)"
            "        div (2 * CAST(dt_ms_sum AS DECIMAL(38,0))))"
            " END AS BIGINT)"
        ).alias("twap_micro"),
    ).orderBy("event_type")


# ---------------------------------------------------------------- q405
@register(
    "q405_session_entry_exit",
    f"""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN epoch_ms(ts)
                         - LAG(epoch_ms(ts)) OVER (
                               PARTITION BY user_id
                               ORDER BY ts, event_id) > {_GAP_MS}
                    OR LAG(epoch_ms(ts)) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ),
    sess AS (
        SELECT user_id, event_type, ts, event_id,
               SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS sid
        FROM seq
    ),
    ranked AS (
        SELECT user_id, sid, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, sid
                   ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, sid
                   ORDER BY ts DESC, event_id DESC) AS rn_d,
               COUNT(*) OVER (PARTITION BY user_id, sid) AS n_events
        FROM sess
    ),
    per_session AS (
        SELECT user_id, sid,
               MAX(CASE WHEN rn_a = 1 THEN event_type END) AS entry_type,
               MAX(CASE WHEN rn_d = 1 THEN event_type END) AS exit_type,
               MAX(n_events) AS n_events
        FROM ranked GROUP BY user_id, sid
    )
    SELECT entry_type, exit_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS bounces,
           CAST(SUM(n_events) AS BIGINT) AS events_sum,
           CAST(ROUND(1e6 * SUM(n_events) / COUNT(*)) AS BIGINT)
               AS avg_events_micro
    FROM per_session GROUP BY entry_type, exit_type
    ORDER BY entry_type, exit_type
    """,
    doc="Session entry/exit/bounce analysis (which event type OPENS "
    "a 30-minute-gap session and which CLOSES it, plus the "
    "single-event bounce count per (entry, exit) pair — the "
    "landing/exit-page report of web analytics; complements "
    "q92's sessionize and q272's dynamic gaps, which never look "
    "at the boundary EVENTS themselves): gap flags via per-user "
    "lag windows, session ids via the per-user running flag sum "
    "(all windows partitioned), entry/exit via per-session "
    "row_number from both ends — (ts, event_id) is a total "
    "order, so both engines pick identical boundary rows. "
    "Scale: one shuffle on user_id feeds every window; output "
    "is |types|^2 metadata.",
)
def q405_session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ms = F.lag(F.unix_millis("ts")).over(wu)
    seq = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            prev_ms.isNull()
            | (F.unix_millis("ts") - prev_ms > F.lit(_GAP_MS)),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = seq.withColumn("sid", F.sum("new_s").over(wu))
    ws = Window.partitionBy("user_id", "sid")
    ranked = sess.select(
        "user_id",
        "sid",
        "event_type",
        F.row_number().over(ws.orderBy("ts", "event_id")).alias("rn_a"),
        F.row_number()
        .over(ws.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rn_d"),
        F.count("*").over(ws).alias("n_events"),
    )
    per_session = ranked.groupBy("user_id", "sid").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("event_type"))).alias(
            "entry_type"
        ),
        F.max(F.when(F.col("rn_d") == 1, F.col("event_type"))).alias(
            "exit_type"
        ),
        F.max("n_events").alias("n_events"),
    )
    return (
        per_session.groupBy("entry_type", "exit_type")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("long")
            .alias("bounces"),
            F.sum("n_events").cast("long").alias("events_sum"),
            F.round(F.lit(1e6) * F.sum("n_events") / F.count("*"))
            .cast("long")
            .alias("avg_events_micro"),
        )
        .orderBy("entry_type", "exit_type")
    )
