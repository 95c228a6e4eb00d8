"""Round-4 gates, batch 68: Mann-Kendall trend test (q340) and
Theil-Sen slope (q341) — the ROBUST trend pair beside q319's OLS
(outlier-resistant, distribution-free: what monitoring systems use
when one bad day shouldn't flip the trend call).

Both operate on the per-type DAILY series — the quadratic pair
enumeration is over |days|^2 cells of an already-aggregated
metadata table, never over raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_DAILY_SQL = """
        SELECT event_type,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                   AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(F.count(F.lit(1)).alias("x"))


# ---------------------------------------------------------------- q340
@register(
    "q340_mann_kendall",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    pairs AS (
        SELECT a.event_type,
               SUM(CASE WHEN b.x > a.x THEN 1
                        WHEN b.x < a.x THEN -1 ELSE 0 END) AS s,
               COUNT(*) AS n_pairs
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.d > a.d
        GROUP BY a.event_type
    ),
    npts AS (
        SELECT event_type, COUNT(*) AS n FROM daily GROUP BY event_type
    ),
    ties AS (
        SELECT event_type, SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
        FROM (SELECT event_type, x, COUNT(*) AS t FROM daily
              GROUP BY event_type, x)
        GROUP BY event_type
    )
    SELECT p.event_type,
           CAST(n.n AS BIGINT) AS n_days,
           CAST(p.s AS BIGINT) AS s_stat,
           CAST(ROUND((CASE
               WHEN p.s > 0 THEN (CAST(p.s AS DOUBLE) - 1.0)
               WHEN p.s < 0 THEN (CAST(p.s AS DOUBLE) + 1.0)
               ELSE 0.0 END)
               / sqrt((CAST(n.n AS DOUBLE) * (CAST(n.n AS DOUBLE) - 1.0)
                       * (2.0 * CAST(n.n AS DOUBLE) + 5.0)
                       - CAST(t.tie_term AS DOUBLE)) / 18.0)
               * 1000000.0) AS BIGINT) AS z_micro
    FROM pairs p
    JOIN npts n ON n.event_type = p.event_type
    JOIN ties t ON t.event_type = p.event_type
    ORDER BY p.event_type
    """,
    doc="Mann-Kendall trend test per event type (the distribution-"
    "free monotonic-trend detector monitoring stacks run where "
    "q319's OLS would be dragged by one outlier day): S = sum of "
    "sign(x_j - x_i) over all day pairs — exact integers from a "
    "within-type self-join of the DAILY table (|days|^2 cells of "
    "metadata, never raw events), the tie-corrected variance "
    "n(n-1)(2n+5)/18 - sum t(t-1)(2t+5)/18 from exact tie "
    "counts, and the continuity-corrected z in identical "
    "correctly-rounded double association, micro-quantized. "
    "Scale: one event scan; the quadratic lives on the "
    "calendar-bounded series.",
)
def q340_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O(types x days) aggregate read four times (both self-join
    # sides, the point count, the tie term): pin it so events is
    # scanned once.
    daily = pin(_daily(spark, sf_dir))
    a = daily.select(
        F.col("event_type"), F.col("d").alias("da"), F.col("x").alias("xa")
    )
    b = daily.select(
        F.col("event_type").alias("etb"),
        F.col("d").alias("db"),
        F.col("x").alias("xb"),
    )
    pairs = (
        a.join(
            b, (F.col("event_type") == F.col("etb")) & (F.col("db") > F.col("da"))
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            ).alias("s"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    npts = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    j = pairs.join(npts, "event_type").join(ties, "event_type")
    sd = F.col("s").cast("double")
    nd = F.col("n").cast("double")
    var = (
        nd * (nd - 1.0) * (2.0 * nd + 5.0) - F.col("tie_term").cast("double")
    ) / 18.0
    znum = (
        F.when(F.col("s") > 0, sd - 1.0)
        .when(F.col("s") < 0, sd + 1.0)
        .otherwise(F.lit(0.0))
    )
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("s").cast("long").alias("s_stat"),
        F.round(znum / F.sqrt(var) * 1000000.0).cast("long").alias("z_micro"),
    ).orderBy("event_type")


# ---------------------------------------------------------------- q341
@register(
    "q341_theil_sen",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    slopes AS (
        SELECT a.event_type,
               CAST(ROUND(CAST(b.x - a.x AS DOUBLE)
                   / CAST(b.d - a.d AS DOUBLE) * 1000000.0) AS BIGINT)
                   AS slope_micro
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.d > a.d
    ),
    ranked AS (
        SELECT event_type, slope_micro,
               ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY slope_micro) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM slopes
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_slopes,
           CAST(MIN(CASE WHEN 2 * rk >= n + 1 THEN slope_micro END)
               AS BIGINT) AS theil_sen_slope_micro
    FROM ranked GROUP BY event_type ORDER BY event_type
    """,
    doc="Theil-Sen slope per event type (the robust companion to "
    "q340: the MEDIAN of all pairwise day-to-day slopes — up to "
    "~29% of the days can be corrupted before the estimate "
    "moves, where q319's OLS breaks on one): every (i<j) pair of "
    "the daily series contributes (x_j-x_i)/(d_j-d_i), "
    "micro-quantized per pair (one correctly-rounded division "
    "each — no accumulation of anything non-integer), and the "
    "per-type LOWER MEDIAN is taken by rank crossing over the "
    "quantized integers (the q316 weighted-median discipline, "
    "unit weights). Scale: the pair table is |days|^2 metadata "
    "per type; ranks ride the type-partitioned window.",
)
def q341_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same daily aggregate, both sides of the slope self-join:
    # pin it so events is scanned once.
    daily = pin(_daily(spark, sf_dir))
    a = daily.select(
        F.col("event_type"), F.col("d").alias("da"), F.col("x").alias("xa")
    )
    b = daily.select(
        F.col("event_type").alias("etb"),
        F.col("d").alias("db"),
        F.col("x").alias("xb"),
    )
    slopes = a.join(
        b, (F.col("event_type") == F.col("etb")) & (F.col("db") > F.col("da"))
    ).select(
        "event_type",
        F.round(
            (F.col("xb") - F.col("xa")).cast("double")
            / (F.col("db") - F.col("da")).cast("double")
            * 1000000.0
        )
        .cast("long")
        .alias("slope_micro"),
    )
    w = Window.partitionBy("event_type").orderBy("slope_micro")
    wc = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope_micro",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_slopes"),
            F.min(
                F.when(2 * F.col("rk") >= F.col("n") + 1, F.col("slope_micro"))
            )
            .cast("long")
            .alias("theil_sen_slope_micro"),
        )
        .orderBy("event_type")
    )
