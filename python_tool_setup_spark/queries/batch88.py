"""Round-5 gates, batch 88: rolling-median anomaly days (q380 — each
day judged against its trailing-week robust baseline: the pager
alert that doesn't fire on a single outlier poisoning its own
mean) and a referential-integrity audit (q381 — orphan foreign
keys across the star schema: the first query a warehouse health
check runs, and the reason merge pipelines (S5) exist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_DEV_PCT = 50  # alarm when |count - rolling median| > 50% of median


# ---------------------------------------------------------------- q380
@register(
    "q380_rolling_median_anomaly",
    f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    based AS (
        SELECT event_type, day, n,
               quantile_cont(n, 5e-1) OVER (PARTITION BY event_type
                   ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                   AS med,
               COUNT(*) OVER (PARTITION BY event_type
                   ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                   AS w
        FROM daily
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN w = 7
               AND ABS(n - med) * 100 > {_DEV_PCT} * med
               THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           CAST(ROUND(AVG(CAST(n AS DOUBLE))) AS BIGINT) AS mean_daily,
           CAST(ROUND(MAX(CASE WHEN w = 7
               THEN ABS(n - med) * 100.0 / med ELSE 0 END) * 10.0)
               AS BIGINT) AS worst_dev_pct_x10
    FROM based GROUP BY event_type ORDER BY event_type
    """,
    doc="Rolling-median anomaly days per stream: each day's event "
    "count is judged against the MEDIAN of its trailing 7-day "
    f"window (anomaly = deviation > {_DEV_PCT}% of the median, "
    "only once the window is full) — the robust baseline that a "
    "mean-based monitor gets wrong, because yesterday's spike "
    "inflates its own threshold; the daily operational companion "
    "to q265's offline CUSUM. Windows are PARTITIONED by stream "
    "(per-type series are independent); the frame median is an "
    "exact 7-value quantile_cont on both engines; the deviation "
    "test cross-multiplies integers (|n-med|*100 > 50*med) so no "
    "division enters the flag. Scale: one daily aggregate, then "
    "metadata-sized series per stream.",
)
def q380_rolling_median_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    based = daily.select(
        "event_type",
        "day",
        "n",
        F.percentile("n", F.lit(0.5)).over(w).alias("med"),
        F.count(F.lit(1)).over(w).alias("w"),
    )
    full = F.col("w") == 7
    dev = F.abs(F.col("n") - F.col("med"))
    is_anom = full & (dev * 100 > _DEV_PCT * F.col("med"))
    return (
        based.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(F.when(is_anom, 1).otherwise(0)).alias("n_anomalies"),
            F.round(F.avg(F.col("n").cast("double"))).alias("mean_daily"),
            F.round(
                F.max(
                    F.when(full, dev * 100.0 / F.col("med")).otherwise(0)
                )
                * 10.0
            ).alias("worst_dev_pct_x10"),
        )
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.col("n_anomalies").cast("long").alias("n_anomalies"),
            F.col("mean_daily").cast("long").alias("mean_daily"),
            F.col("worst_dev_pct_x10").cast("long").alias("worst_dev_pct_x10"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- q381
@register(
    "q381_referential_integrity",
    """
    WITH checks AS (
        SELECT 'lineitem->orders' AS fk,
               (SELECT COUNT(*) FROM lineitem) AS n_child,
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
                   AS n_orphans
        UNION ALL
        SELECT 'orders->customer',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'customer->nation',
               (SELECT COUNT(*) FROM customer),
               (SELECT COUNT(*) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM nation n
                                  WHERE n.n_nationkey = c.c_nationkey))
    )
    SELECT fk,
           CAST(n_child AS BIGINT) AS n_child,
           CAST(n_orphans AS BIGINT) AS n_orphans,
           n_orphans = 0 AS intact
    FROM checks ORDER BY fk
    """,
    doc="Referential-integrity audit across the star schema: orphan "
    "counts for lineitem->orders, orders->customer and "
    "customer->nation via LEFT-ANTI probes (the first query a "
    "warehouse health check runs after any load, and the "
    "invariant the S5 merge pipelines exist to preserve; a "
    "non-zero row here means an ingest wrote children before "
    "parents or deleted parents with live children). Spark side "
    "is three anti-joins — each one shuffle on its key, "
    "broadcast where the parent side is small — unioned into "
    "one report. Scale: anti-join is the cheapest possible "
    "integrity probe; at 100 TB each check rides the same "
    "key-partitioned layout the merges maintain.",
)
def q381_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    def check(name, child, child_key, parent, parent_key):
        # ONE pass per FK: a left join against the deduped parent keys
        # yields both the child count and the orphan count (NOT EXISTS
        # == no match == null probe key) in a single aggregation — the
        # old anti-join + separate COUNT(*) re-scanned every child
        # table twice.
        pk = parent.select(F.col(parent_key).alias("_pk")).distinct()
        return (
            child.join(pk, child[child_key] == F.col("_pk"), "left")
            .agg(
                F.count(F.lit(1)).alias("n_child"),
                F.count_if(F.col("_pk").isNull()).alias("n_orphans"),
            )
            .select(
                F.lit(name).alias("fk"),
                F.col("n_child").cast("long").alias("n_child"),
                F.col("n_orphans").cast("long").alias("n_orphans"),
                (F.col("n_orphans") == 0).alias("intact"),
            )
        )

    out = (
        check("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(check("orders->customer", o, "o_custkey", c, "c_custkey"))
        .unionByName(
            check("customer->nation", c, "c_nationkey", n, "n_nationkey")
        )
    )
    return out.orderBy("fk")
