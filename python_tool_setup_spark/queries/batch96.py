"""Round-5 gates, batch 96: weekly growth accounting (q396 — every
active user classified new / retained / resurrected each week, plus
last week's non-returners as churned: the four-bucket identity
growth teams reconcile MAU deltas with) and the DAU/WAU stickiness
ratio (q397 — how many of the week's days the average weekly-active
user shows up: the engagement-intensity number beside q352's
retention matrix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q396
@register(
    "q396_growth_accounting",
    """
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS w
        FROM events
    ),
    tagged AS (
        SELECT user_id, w,
               MIN(w) OVER (PARTITION BY user_id) AS first_w,
               LAG(w) OVER (PARTITION BY user_id ORDER BY w) AS prev_w
        FROM uw
    ),
    classified AS (
        SELECT w, user_id,
               CASE WHEN w = first_w THEN 'new'
                    WHEN prev_w = w - INTERVAL 7 DAY THEN 'retained'
                    ELSE 'resurrected' END AS bucket
        FROM tagged
    ),
    churn AS (
        SELECT CAST(t.w + INTERVAL 7 DAY AS DATE) AS w,
               COUNT(*) AS churned
        FROM tagged t
        WHERE NOT EXISTS (
            SELECT 1 FROM uw n
            WHERE n.user_id = t.user_id
              AND n.w = CAST(t.w + INTERVAL 7 DAY AS DATE))
        GROUP BY 1
    )
    SELECT strftime(c.w, '%Y-%m-%d') AS week,
           CAST(SUM(CASE WHEN bucket = 'new' THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users,
           CAST(SUM(CASE WHEN bucket = 'retained' THEN 1 ELSE 0 END)
               AS BIGINT) AS retained,
           CAST(SUM(CASE WHEN bucket = 'resurrected' THEN 1 ELSE 0 END)
               AS BIGINT) AS resurrected,
           CAST(COUNT(*) AS BIGINT) AS active,
           CAST(COALESCE(MAX(ch.churned), 0) AS BIGINT) AS churned_in
    FROM classified c LEFT JOIN churn ch ON ch.w = c.w
    GROUP BY c.w ORDER BY week
    """,
    doc="Weekly growth accounting: each active user is exactly one "
    "of new (first week ever), retained (also active the prior "
    "week) or resurrected (returned after a gap), and last week's "
    "actives who did not return are this week's churn inflow — "
    "the four-bucket identity active_t = new + retained + "
    "resurrected and active_{t-1} = retained_t + churned_t that "
    "growth teams reconcile MAU movements with (q352's retention "
    "triangle is the cohort view of the same events). Windows "
    "PARTITIONED by user; churn via a next-week anti-probe. "
    "Scale: one distinct user-week shuffle, per-user windows, "
    "|weeks| output.",
)
def q396_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("w")
    ).distinct()
    wu = Window.partitionBy("user_id")
    tagged = uw.select(
        "user_id",
        "w",
        F.min("w").over(wu).alias("first_w"),
        F.lag("w").over(wu.orderBy("w")).alias("prev_w"),
    )
    bucket = (
        F.when(F.col("w") == F.col("first_w"), "new")
        .when(F.col("prev_w") == F.date_sub("w", 7), "retained")
        .otherwise("resurrected")
    )
    classified = tagged.select("w", bucket.alias("bucket"))
    nxt = uw.select(
        "user_id", F.date_sub("w", 7).alias("w")
    )  # user active in week w+7, keyed back to w
    churn = (
        tagged.select("user_id", "w")
        .join(nxt, ["user_id", "w"], "left_anti")
        .groupBy(F.date_add("w", 7).alias("w"))
        .agg(F.count(F.lit(1)).alias("churned"))
    )
    weekly = classified.groupBy("w").agg(
        F.sum(F.when(F.col("bucket") == "new", 1).otherwise(0)).alias(
            "new_users"
        ),
        F.sum(F.when(F.col("bucket") == "retained", 1).otherwise(0)).alias(
            "retained"
        ),
        F.sum(
            F.when(F.col("bucket") == "resurrected", 1).otherwise(0)
        ).alias("resurrected"),
        F.count(F.lit(1)).alias("active"),
    )
    return (
        weekly.join(F.broadcast(churn), "w", "left")
        .na.fill({"churned": 0})
        .select(
            F.date_format("w", "yyyy-MM-dd").alias("week"),
            F.col("new_users").cast("long").alias("new_users"),
            F.col("retained").cast("long").alias("retained"),
            F.col("resurrected").cast("long").alias("resurrected"),
            F.col("active").cast("long").alias("active"),
            F.col("churned").cast("long").alias("churned_in"),
        )
        .orderBy("week")
    )


# ---------------------------------------------------------------- q397
@register(
    "q397_stickiness_ratio",
    """
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d,
               CAST(date_trunc('week', ts) AS DATE) AS w
        FROM events
    ),
    per_user_week AS (
        SELECT w, user_id, COUNT(*) AS active_days FROM ud GROUP BY 1, 2
    )
    SELECT strftime(w, '%Y-%m-%d') AS week,
           CAST(COUNT(*) AS BIGINT) AS wau,
           CAST(SUM(active_days) AS BIGINT) AS user_days,
           CAST(ROUND(CAST(SUM(active_days) AS DOUBLE) / COUNT(*)
               * 1000.0) AS BIGINT) AS avg_active_days_milli,
           CAST(ROUND(CAST(SUM(active_days) AS DOUBLE) / COUNT(*) / 7.0
               * 1000000.0) AS BIGINT) AS stickiness_micro
    FROM per_user_week GROUP BY w ORDER BY week
    """,
    doc="DAU/WAU stickiness per week: mean active days per weekly- "
    "active user and its /7 normalization (the engagement- "
    "intensity number — 1.0 means daily habit, 1/7 means "
    "drive-by; the behavioral depth q396's buckets and q352's "
    "retention don't see): distinct user-days in one projection, "
    "per-(user, week) day counts, exact integer user-day masses "
    "with two quantized ratios. Scale: one distinct + two "
    "groupBys, all keyed on (user, week).",
)
def q397_stickiness_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        F.date_trunc("week", "ts").cast("date").alias("w"),
    ).distinct()
    puw = ud.groupBy("w", "user_id").agg(
        F.count(F.lit(1)).alias("active_days")
    )
    return (
        puw.groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("wau"),
            F.sum("active_days").alias("user_days"),
        )
        .select(
            F.date_format("w", "yyyy-MM-dd").alias("week"),
            F.col("wau").cast("long").alias("wau"),
            F.col("user_days").cast("long").alias("user_days"),
            F.round(
                F.col("user_days").cast("double") / F.col("wau") * 1000.0
            )
            .cast("long")
            .alias("avg_active_days_milli"),
            F.round(
                F.col("user_days").cast("double")
                / F.col("wau")
                / 7.0
                * 1000000.0
            )
            .cast("long")
            .alias("stickiness_micro"),
        )
        .orderBy("week")
    )
