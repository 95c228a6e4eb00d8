"""Round-4 gates, batch 35: dynamic-gap session windows (q272 — the
per-event gap expression session_window accepts since Spark 3.2),
salted two-stage aggregation (q273 — the skew-proof AGGREGATION
pattern completing q155's salted join), and rolling N-day distinct
users (q274 — the distinct-over-sliding-range metric windows can't
express directly in either engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

STRF = "%Y-%m-%d %H:%M:%S"
TS_FMT = "yyyy-MM-dd HH:mm:ss"


# ---------------------------------------------------------------- q272
@register(
    "q272_dynamic_gap_sessions",
    f"""
    WITH ev AS (
        SELECT user_id, ts, value,
               CASE WHEN event_type = 'purchase'
                    THEN INTERVAL '60 minutes'
                    ELSE INTERVAL '15 minutes' END AS gap
        FROM events WHERE user_id % 8 = 0
    ),
    flagged AS (
        SELECT user_id, ts, value, gap,
               CASE WHEN LAG(ts + gap) OVER w IS NULL
                         OR ts >= MAX(ts + gap) OVER
                             (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_sess
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '{STRF}') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 3) AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
    doc="DYNAMIC-gap session windows (session_window with a per-event "
    "gap EXPRESSION, Spark 3.2+ — q51's fixed 30-minute gap cannot "
    "express 'purchases hold a session open for an hour, views only "
    "15 minutes'): the gap column is evaluated per row and sessions "
    "merge while any prior event's (ts + its own gap) still covers "
    "the next event. Same single per-key shuffle as fixed-gap "
    "sessions. The oracle is the gaps-and-islands rewrite "
    "generalized to variable gaps: a new session starts when ts "
    "clears the RUNNING MAX of (ts + gap) over all earlier events — "
    "the exact semantics Spark implements by merging overlapping "
    "candidate windows.",
)
def q272_dynamic_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 8 == 0)
        .select(
            "user_id",
            "ts",
            "value",
            # session_window's dynamic gap needs CalendarIntervalType —
            # string durations cast per row; ANSI INTERVAL literals
            # (DayTimeIntervalType) are rejected
            F.when(F.col("event_type") == "purchase", F.lit("60 minutes"))
            .otherwise(F.lit("15 minutes"))
            .alias("gap"),
        )
    )
    return (
        ev.groupBy(
            F.session_window("ts", F.col("gap")).alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", TS_FMT).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------- q273
_SALT = 8


@register(
    "q273_salted_two_stage_agg",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 3) AS sum_value,
           ROUND(MAX(value), 3) AS max_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Salted TWO-STAGE aggregation — the skew-proof groupBy pattern "
    "(completing q155's salted JOIN): stage 1 aggregates on "
    f"(key, salt) with {_SALT} md5-derived salts so one hot key "
    "spreads over the cluster instead of melting a single reducer, "
    "stage 2 re-aggregates the per-salt partials on the bare key. "
    "Only decomposable aggregates ride this (count/sum re-sum, max "
    "re-maxes — the algebraic-aggregate contract); the final answer "
    "is IDENTICAL to the direct groupBy, which is exactly what the "
    "oracle states. events.event_type is the canonical hot-key "
    "distribution (4 values over the whole table), so at 100 TB the "
    "direct plan would hash all rows onto 4 reducers; the salted "
    f"plan fans each onto {_SALT}. Spark's partial aggregation "
    "already map-side-combines — the salt additionally splits the "
    "REDUCE side, the part AQE can't fix for aggregations.",
)
def q273_salted_two_stage_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn(
        "__salt", F.pmod(F.xxhash64("event_id"), F.lit(_SALT))
    )
    partial = salted.groupBy("event_type", "__salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("value").alias("psum"),
        F.max("value").alias("pmax"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").cast("bigint").alias("n"),
            F.round(F.sum("psum"), 3).alias("sum_value"),
            F.round(F.max("pmax"), 3).alias("max_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- q274
_ROLL_DAYS = 7


@register(
    "q274_rolling_distinct_users",
    f"""
    WITH daily AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM daily)
    SELECT STRFTIME(d.day, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_users_7d
    FROM days d
    JOIN daily u
      ON u.day > d.day - INTERVAL '{_ROLL_DAYS} days' AND u.day <= d.day
    GROUP BY d.day ORDER BY d.day
    """,
    doc=f"Rolling {_ROLL_DAYS}-day distinct active users — the classic "
    "engagement metric neither engine's window frames can express "
    "(COUNT(DISTINCT) over a RANGE frame is unsupported in both): "
    "realized as dedup-to-(day, user) first — the cheap exact "
    "pre-aggregation that shrinks the table to its distinct daily "
    "actives — then a bounded range self-join of the DAY DOMAIN "
    "(tiny) against it and one distinct count per anchor day. At "
    "100 TB the (day, user) dedup is the only full-data shuffle; "
    f"each day's rows fan to at most {_ROLL_DAYS} anchor days, so "
    "the join is O({_ROLL_DAYS}x daily-actives), not O(days x "
    "table); the sketch path swaps the distinct count for q160's "
    "mergeable HLL per day + rolling union when exactness can be "
    "traded.",
)
def q274_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = daily.select("day").distinct().withColumnRenamed("day", "anchor")
    joined = days.join(
        daily,
        (F.col("day") > F.date_sub(F.col("anchor"), _ROLL_DAYS))
        & (F.col("day") <= F.col("anchor")),
    )
    return (
        joined.groupBy("anchor")
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_users_7d"))
        .select(
            F.date_format("anchor", "yyyy-MM-dd").alias("day"),
            "active_users_7d",
        )
        .orderBy("day")
    )
