"""Round-4 gates, batch 62: cross-table reconciliation audit (q329 —
the referential-integrity and totals-consistency report a warehouse
runs nightly, beside q291's content fingerprint) and cohort LTV
curve (q330 — cumulative revenue per cohort age, the unit-economics
readout on top of q94's retention grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q329
@register(
    "q329_reconciliation_audit",
    """
    WITH li AS (
        SELECT l_orderkey,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS li_cents,
               COUNT(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey
    ),
    joined AS (
        SELECT o.o_orderkey, li.l_orderkey,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS o_cents,
               li.li_cents
        FROM orders o FULL OUTER JOIN li ON o.o_orderkey = li.l_orderkey
    )
    SELECT CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS orders_without_lines,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS orphan_line_orders,
           CAST(SUM(CASE WHEN o_orderkey IS NOT NULL
                          AND l_orderkey IS NOT NULL
                          AND o_cents <> li_cents THEN 1 ELSE 0 END)
               AS BIGINT) AS totals_mismatched,
           CAST(SUM(CASE WHEN o_orderkey IS NOT NULL
                          AND l_orderkey IS NOT NULL
                          AND o_cents = li_cents THEN 1 ELSE 0 END)
               AS BIGINT) AS totals_matched,
           CAST(SUM(CASE WHEN o_orderkey IS NOT NULL
                          AND l_orderkey IS NOT NULL
                    THEN abs(o_cents - li_cents) ELSE 0 END)
               AS BIGINT) AS abs_drift_cents
    FROM joined
    """,
    doc="Cross-table reconciliation audit (the nightly warehouse "
    "consistency report — q291 fingerprints ONE table's content, "
    "this checks the INVARIANTS BETWEEN tables that loaders "
    "break: headers without lines, orphan lines, and header "
    "totals vs the sum of their lines): one full-outer join of "
    "orders against per-order lineitem sums (both sides "
    "pre-aggregated to the join key — the join input is one row "
    "per order, never raw lines), exact integer cents "
    "everywhere, absolute drift summed so the magnitude of "
    "disagreement is pinned, not just its count. Scale: one "
    "groupBy + one key-aligned full-outer join; both shuffles on "
    "the same key.",
)
def q329_reconciliation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    li_agg = li.groupBy("l_orderkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "li_cents"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )
    o_slim = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("o_cents"),
    )
    j = o_slim.join(
        li_agg, o_slim["o_orderkey"] == li_agg["l_orderkey"], "full_outer"
    )
    both = F.col("o_orderkey").isNotNull() & F.col("l_orderkey").isNotNull()
    return j.agg(
        F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("orders_without_lines"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("orphan_line_orders"),
        F.sum(
            F.when(both & (F.col("o_cents") != F.col("li_cents")), 1).otherwise(0)
        )
        .cast("long")
        .alias("totals_mismatched"),
        F.sum(
            F.when(both & (F.col("o_cents") == F.col("li_cents")), 1).otherwise(0)
        )
        .cast("long")
        .alias("totals_matched"),
        F.sum(
            F.when(both, F.abs(F.col("o_cents") - F.col("li_cents"))).otherwise(
                0
            )
        )
        .cast("long")
        .alias("abs_drift_cents"),
    )


# ---------------------------------------------------------------- q330
@register(
    "q330_cohort_ltv_curve",
    """
    WITH cohorts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events
        GROUP BY user_id
    ),
    rev AS (
        SELECT e.user_id, c.cohort_day,
               CAST(date_diff('day', c.cohort_day, CAST(e.ts AS DATE))
                   AS BIGINT) // 7 AS age_week,
               CAST(ROUND(e.value * 100) AS BIGINT) AS cents
        FROM events e JOIN cohorts c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
    ),
    sizes AS (
        SELECT CAST(date_diff('day', DATE '2024-01-01', cohort_day)
                   AS BIGINT) // 7 AS cohort_week,
               COUNT(*) AS cohort_users
        FROM cohorts GROUP BY 1
    ),
    weekly AS (
        SELECT CAST(date_diff('day', DATE '2024-01-01', cohort_day)
                   AS BIGINT) // 7 AS cohort_week,
               age_week, SUM(cents) AS cents
        FROM rev GROUP BY 1, 2
    ),
    cum AS (
        SELECT cohort_week, age_week,
               SUM(cents) OVER (PARTITION BY cohort_week ORDER BY age_week
                                ROWS UNBOUNDED PRECEDING) AS cum_cents
        FROM weekly
    )
    SELECT c.cohort_week, c.age_week,
           CAST(s.cohort_users AS BIGINT) AS cohort_users,
           CAST(c.cum_cents AS BIGINT) AS cum_cents,
           CAST(ROUND(CAST(c.cum_cents AS DOUBLE)
               / CAST(s.cohort_users AS DOUBLE)) AS BIGINT)
               AS ltv_cents_per_user
    FROM cum c JOIN sizes s ON s.cohort_week = c.cohort_week
    ORDER BY c.cohort_week, c.age_week
    """,
    doc="Cohort LTV curve (cumulative purchase revenue per user by "
    "cohort age — the unit-economics readout that sits on top of "
    "q94's retention grid: retention says WHO comes back, LTV "
    "says what they're WORTH): users cohorted by first-activity "
    "week, purchase cents bucketed by age week, one cumulative "
    "window per cohort over the (cohort, age) cell table "
    "(metadata — weeks x weeks), normalized by cohort size with "
    "one correctly-rounded division. Exact integer cents "
    "throughout. Scale: two user-key aggregates + windows over "
    "the cell table; the curve is |cohorts| x |ages| rows.",
)
def q330_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    jan1 = F.lit("2024-01-01").cast("date")
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(cohorts, "user_id")
        .select(
            F.expr(
                "div(datediff(cast(ts as date), cohort_day), 7)"
            ).alias("age_week"),
            F.expr("div(datediff(cohort_day, date'2024-01-01'), 7)").alias(
                "cohort_week"
            ),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    sizes = cohorts.groupBy(
        F.expr("div(datediff(cohort_day, date'2024-01-01'), 7)").alias(
            "cohort_week"
        )
    ).agg(F.count(F.lit(1)).alias("cohort_users"))
    weekly = rev.groupBy("cohort_week", "age_week").agg(
        F.sum("cents").alias("cents")
    )
    wcum = Window.partitionBy("cohort_week").orderBy("age_week").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = weekly.select(
        "cohort_week",
        "age_week",
        F.sum("cents").over(wcum).alias("cum_cents"),
    )
    return (
        cum.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "age_week",
            F.col("cohort_users").cast("long").alias("cohort_users"),
            F.col("cum_cents").cast("long").alias("cum_cents"),
            F.round(
                F.col("cum_cents").cast("double")
                / F.col("cohort_users").cast("double")
            )
            .cast("long")
            .alias("ltv_cents_per_user"),
        )
        .orderBy("cohort_week", "age_week")
    )
