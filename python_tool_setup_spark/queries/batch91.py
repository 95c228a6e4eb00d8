"""Round-5 gates, batch 91: global peak concurrency (q386 — the
capacity-planning number: the most 5-minute activity intervals ever
open at once across ALL users, found by a fully distributed endpoint
sweep — the global cousin of q356's per-user sweep, and the gate
that exercises operators/blockrank.py on DATA-scale input, not a
histogram) and lead-lag cross-correlation (q387 — Pearson
correlation of two streams' daily volumes at lags -3..+3: which
stream moves first; the ops question behind every 'did signups
drive purchases' debate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import prefix_agg
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_IV_SEC = 300
_TYPE_A = "view"
_TYPE_B = "purchase"
_MAX_LAG = 3


# ---------------------------------------------------------------- q386
@register(
    "q386_peak_concurrency",
    f"""
    WITH pts AS (
        SELECT date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
                   AS t, 1 AS delta, event_id
        FROM events
        UNION ALL
        SELECT date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
                   + {_IV_SEC}, -1, event_id
        FROM events
    ),
    swept AS (
        SELECT t,
               SUM(delta) OVER (ORDER BY t, delta DESC, event_id
                   ROWS UNBOUNDED PRECEDING) AS active
        FROM pts
    ),
    peak AS (SELECT MAX(active) AS peak_active FROM swept)
    SELECT CAST((SELECT peak_active FROM peak) AS BIGINT) AS peak_active,
           CAST(MIN(t) AS BIGINT) AS first_peak_epoch_sec,
           CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS n_intervals
    FROM swept WHERE active = (SELECT peak_active FROM peak)
    """,
    doc="Global peak concurrency: the maximum number of 5-minute "
    "activity intervals simultaneously open across the WHOLE "
    "event stream, plus when it first happens — the capacity- "
    "planning sweep (q356's per-user version answers billing; "
    "this answers 'how big must the fleet be'). The running "
    "active count is an ordered prefix sum over ALL 2n endpoints "
    "— exactly the single-partition trap — computed with the "
    "block-offset prefix (operators/blockrank.py) on data-scale "
    "input: range-partitioned endpoint blocks, per-block sums, "
    "triangular offsets, block-partitioned windows; the peak and "
    "its first time are then one aggregate. The DuckDB oracle "
    "uses the plain global window — matching it proves the "
    "distributed sweep exact. Scale: no task ever holds more "
    "than one time-range block.",
)
def q386_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t = F.col("ts").cast("long")
    pts = ev.select(
        t.alias("t"), F.lit(1).alias("delta"), "event_id"
    ).unionByName(
        ev.select(
            (t + _IV_SEC).alias("t"), F.lit(-1).alias("delta"), "event_id"
        )
    )
    pre = prefix_agg(
        pts,
        [("t", "asc"), ("delta", "desc"), ("event_id", "asc")],
        {"before": ("sum", "delta")},
    )
    swept = pre.select(
        "t", (F.col("before") + F.col("delta")).alias("active")
    )
    # Single-pass argmax: max(struct(active, -t)) yields the peak AND
    # its earliest timestamp in one aggregation — the old
    # peak-broadcast + equality-join re-ran the whole sweep pipeline
    # a second time (15 Exchange in the r10-before plan). Identical
    # result: struct ordering is (active desc, then -t desc = t asc).
    n = ev.agg(F.count(F.lit(1)).alias("n_intervals"))
    return (
        swept.agg(
            F.max(F.struct(F.col("active"), (-F.col("t")).alias("negt")))
            .alias("pk")
        )
        .select(
            F.col("pk.active").cast("long").alias("peak_active"),
            (-F.col("pk.negt")).cast("long").alias("first_peak_epoch_sec"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "peak_active",
            "first_peak_epoch_sec",
            F.col("n_intervals").cast("long").alias("n_intervals"),
        )
    )


# ---------------------------------------------------------------- q387
@register(
    "q387_lead_lag_correlation",
    f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CASE WHEN event_type = '{_TYPE_A}' THEN 1 ELSE 0 END)
                   AS a,
               SUM(CASE WHEN event_type = '{_TYPE_B}' THEN 1 ELSE 0 END)
                   AS b
        FROM events GROUP BY 1
    ),
    lags AS (
        SELECT lag FROM (VALUES (-3), (-2), (-1), (0), (1), (2), (3))
            AS t(lag)
    ),
    aligned AS (
        SELECT l.lag, d1.a AS x, d2.b AS y
        FROM lags l
        JOIN daily d1 ON TRUE
        JOIN daily d2 ON d2.day = d1.day + CAST(l.lag AS INTEGER)
    ),
    s AS (
        SELECT lag, COUNT(*) AS m,
               SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy
        FROM aligned GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag_days,
           CAST(m AS BIGINT) AS n_days,
           CAST(ROUND(CAST(m * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                      * CAST(m * syy - sy * sy AS DOUBLE))
               * 1000000.0) AS BIGINT) AS corr_micro
    FROM s ORDER BY lag_days
    """,
    doc=f"Lead-lag cross-correlation between the '{_TYPE_A}' and "
    f"'{_TYPE_B}' daily volumes at lags -{_MAX_LAG}..+{_MAX_LAG} "
    "(corr(a[day], b[day+lag]) — the peak's SIGN says which stream "
    "leads, the first question behind any 'did X drive Y' ops "
    "debate, and the precursor to any Granger-style claim): daily "
    "volumes in one conditional aggregate, lag alignment by a "
    "date-shift self-join on the metadata-sized daily table, "
    "per-lag Pearson from HUGEINT/DECIMAL moment products (the "
    "q301/q367 overflow posture), one sqrt per lag. Scale: one "
    "scan to days, then |days| x 7 metadata.",
)
def q387_lead_lag_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == _TYPE_A, 1).otherwise(0)).alias(
            "a"
        ),
        F.sum(F.when(F.col("event_type") == _TYPE_B, 1).otherwise(0)).alias(
            "b"
        ),
    )
    lags = spark.createDataFrame(
        [(lag,) for lag in range(-_MAX_LAG, _MAX_LAG + 1)], "lag int"
    )
    d1 = daily.select(F.col("day").alias("day1"), F.col("a").alias("x"))
    d2 = daily.select(F.col("day").alias("day2"), F.col("b").alias("y"))
    aligned = (
        d1.crossJoin(F.broadcast(lags))
        .withColumn("day2", F.date_add("day1", F.col("lag")))
        .join(d2, "day2")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    s = aligned.groupBy("lag").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    dx = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    dy = (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return s.select(
        F.col("lag").cast("long").alias("lag_days"),
        F.col("m").cast("long").alias("n_days"),
        F.round(num / F.sqrt(dx * dy) * 1000000.0)
        .cast("long")
        .alias("corr_micro"),
    ).orderBy("lag_days")
