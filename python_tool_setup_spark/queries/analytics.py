"""Event-analytics gate queries (q92-q94): batch sessionization,
funnel conversion, retention cohorts. All oracle-checked over the
`events` fixture.

These are the batch counterparts of the streaming session windows
(q51/q52): the same gap-based semantics expressed as windows over
history, the way a warehouse backfills what the stream computes live.
Every query is one-or-two shuffles on user_id — the natural key — and
aggregates to small outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "q92_sessionize",
    """
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               -- gap compared at MICROSECOND precision on both engines
               -- (multi-seed catch #7, seed 2468: a 1800.119515 s gap
               -- truncates to exactly 1800 whole seconds, so a
               -- seconds-truncated engine keeps the session the
               -- full-precision engine splits)
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         > 1800 * 1000000
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, event_type,
               CAST(SUM(is_new) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS session_id
        FROM ordered
    )
    SELECT user_id, session_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="Batch sessionization: a new session starts after a >30-minute "
    "gap (lag + cumulative flag-sum per user — the standard two-window "
    "formulation, both windows on the same user_id partitioning so "
    "there is ONE shuffle). This is the batch backfill of the "
    "streaming session window (q51/q52).",
)
def q92_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # MICROSECOND-exact gap (matches the oracle's epoch_us convention;
    # ts.cast("long") truncates to whole seconds and masks boundary
    # gaps like 1800.1 s — multi-seed catch #7)
    gap = F.unix_micros(F.col("ts")) - F.lag(
        F.unix_micros(F.col("ts"))
    ).over(w)
    flagged = e.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > 30 * 60 * 1000000), 1).otherwise(0),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = flagged.withColumn("session_id", F.sum("is_new").over(ws))
    return sessions.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), _TS_FMT).alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
    )


@register(
    "q93_funnel",
    """
    WITH first_view AS (
        SELECT user_id, MIN(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    converted AS (
        SELECT DISTINCT f.user_id
        FROM first_view f JOIN events e
          ON e.user_id = f.user_id
         AND e.event_type = 'purchase' AND e.ts > f.v_ts
    )
    SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
           (SELECT COUNT(*) FROM first_view) AS n_viewers,
           (SELECT COUNT(*) FROM converted) AS n_converted
    """,
    doc="Funnel conversion: users -> viewed -> purchased-after-first-"
    "view. First-touch per user is a min-aggregate (map-side partial), "
    "conversion is a semi-join shaped aggregate on user_id; output is "
    "three scalars regardless of input size.",
)
def q93_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    first_view = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    converted = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_view, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .select("user_id")
        .distinct()
    )
    return (
        e.agg(F.countDistinct("user_id").alias("n_users"))
        .crossJoin(first_view.agg(F.count(F.lit(1)).alias("n_viewers")))
        .crossJoin(converted.agg(F.count(F.lit(1)).alias("n_converted")))
    )


@register(
    "q94_retention_cohort",
    """
    WITH firsts AS (
        SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS active_week
        FROM events
    )
    SELECT STRFTIME(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(DATEDIFF('day', f.cohort_week, a.active_week) / 7 AS BIGINT)
               AS week_offset,
           COUNT(DISTINCT f.user_id) AS n_users
    FROM firsts f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Retention cohorts: users grouped by first-activity week, "
    "counted in every later week they return. Two aggregates on "
    "user_id + one join on the same key — a co-partitioned plan; "
    "output is cohort x offset, tiny at any scale.",
)
def q94_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    joined = firsts.join(activity, "user_id")
    return joined.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        (F.datediff("active_week", "cohort_week") / 7)
        .cast("bigint")
        .alias("week_offset"),
    ).agg(F.countDistinct("user_id").alias("n_users"))


@register(
    "q108_resample_gapfill",
    """
    WITH ev AS (
        SELECT user_id, date_trunc('hour', ts) AS h, value
        FROM events WHERE user_id % 30 = 0
    ),
    hourly AS (
        SELECT user_id, h, COUNT(*) AS n_events,
               ROUND(SUM(value), 3) AS sum_value,
               SUM(value) / COUNT(*) AS av
        FROM ev GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM hourly GROUP BY 1
    ),
    grid AS (
        SELECT user_id, UNNEST(generate_series(mn, mx, INTERVAL '1 hour')) AS h
        FROM bounds
    )
    SELECT g.user_id,
           STRFTIME(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
           COALESCE(n_events, 0) AS n_events,
           COALESCE(sum_value, 0.0) AS sum_value,
           ROUND(last_value(av IGNORE NULLS)
                 OVER (PARTITION BY g.user_id ORDER BY g.h
                       ROWS UNBOUNDED PRECEDING), 6) AS carry_avg
    FROM grid g LEFT JOIN hourly USING (user_id, h)
    """,
    doc="Time-series resample + gap fill + LOCF: one row per (user, "
    "hour) from each user's first to last event — quiet hours carry "
    "explicit zeros and the last known hourly mean. Dense grid is "
    "generated executor-side (sequence+explode); agg, grid join and "
    "carry window all partition on the key, one exchange reused.",
)
def q108_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.operators.timeseries import resample_gapfill

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 30 == 0)
    out = resample_gapfill(e, "ts", ["user_id"], "value", "1 hour")
    return out.select(
        "user_id",
        F.date_format("bucket", _TS_FMT).alias("hour"),
        "n_events",
        "sum_value",
        "carry_avg",
    )
