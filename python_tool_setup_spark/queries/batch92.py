"""Round-5 gates, batch 92: weekday seasonality index (q388 — the
day-of-week profile and how much variance it explains: the first
decomposition any daily-metric anomaly triage applies before
trusting a 'drop') and attribution-scheme comparison (q389 —
first-touch vs last-touch vs linear credit per channel on the SAME
journeys: the disagreement table that explains why marketing and
product report different numbers; completes the family with q255's
linear and q343's Shapley).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

# 2024-01-01 is a Monday: dow = datediff(day, 2024-01-01) % 7 is a pure
# integer day-of-week (0=Mon) identical on both engines — no reliance
# on engine-specific DOW numbering.
_EPOCH_MON = "2024-01-01"


# ---------------------------------------------------------------- q388
@register(
    "q388_weekday_seasonality",
    f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events
        GROUP BY 1
    ),
    dowd AS (
        SELECT date_diff('day', DATE '{_EPOCH_MON}', day) % 7 AS dow, n
        FROM daily
    ),
    tot AS (SELECT COUNT(*) AS nd, SUM(n) AS s FROM dowd),
    per_dow AS (
        SELECT dow, COUNT(*) AS n_days, SUM(n) AS sn FROM dowd GROUP BY dow
    ),
    idx AS (
        SELECT d.dow, d.n_days, d.sn,
               CAST(ROUND((CAST(d.sn AS DOUBLE) / d.n_days)
                   / (CAST(t.s AS DOUBLE) / t.nd) * 1000.0) AS BIGINT)
                   AS index_milli
        FROM per_dow d, tot t
    ),
    deseason AS (
        SELECT CAST(ROUND(CAST(w.n AS DOUBLE)
                   / ((CAST(p.sn AS DOUBLE) / p.n_days)
                      / (CAST(t.s AS DOUBLE) / t.nd)) * 1000.0) AS BIGINT)
                   AS dz_milli,
               CAST(w.n AS BIGINT) * 1000 AS raw_milli
        FROM dowd w
        JOIN per_dow p ON p.dow = w.dow, tot t
    ),
    vr AS (
        SELECT CAST(ROUND((1.0 -
               (CAST(SUM(CAST(dz_milli AS HUGEINT) * dz_milli) AS DOUBLE)
                    / COUNT(*)
                - (CAST(SUM(dz_milli) AS DOUBLE) / COUNT(*))
                  * (CAST(SUM(dz_milli) AS DOUBLE) / COUNT(*)))
             / (CAST(SUM(CAST(raw_milli AS HUGEINT) * raw_milli) AS DOUBLE)
                    / COUNT(*)
                - (CAST(SUM(raw_milli) AS DOUBLE) / COUNT(*))
                  * (CAST(SUM(raw_milli) AS DOUBLE) / COUNT(*))))
               * 1000000.0) AS BIGINT) AS var_explained_micro
        FROM deseason
    )
    SELECT CAST(i.dow AS BIGINT) AS dow,
           CAST(i.n_days AS BIGINT) AS n_days,
           CAST(ROUND(CAST(i.sn AS DOUBLE) / i.n_days * 1000.0) AS BIGINT)
               AS mean_count_milli,
           i.index_milli,
           (SELECT var_explained_micro FROM vr) AS var_explained_micro
    FROM idx i ORDER BY dow
    """,
    doc="Weekday seasonality index + variance explained: per "
    "day-of-week (computed as an integer datediff-mod-7 from a "
    "known Monday — no engine DOW numbering involved) the mean "
    "daily volume relative to the overall mean, plus how much of "
    "the daily variance dividing out that index removes — the "
    "decomposition an on-call runs before believing a Monday "
    "'drop'. Deseasonalized values milli-quantized per day "
    "BEFORE the variance sums (HUGEINT/DECIMAL squares of exact "
    "integers), one ratio at the end. Scale: one daily "
    "aggregate, then 7-row metadata.",
)
def q388_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # O(days) aggregate feeding the grand total, the per-dow means AND
    # the variance pass: pin it so events is scanned once.
    daily = pin(
        ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
            F.count(F.lit(1)).alias("n")
        )
    )
    dowd = daily.select(
        (F.datediff("day", F.lit(_EPOCH_MON).cast("date")) % 7).alias("dow"),
        "n",
    )
    tot = dowd.agg(F.count(F.lit(1)).alias("nd"), F.sum("n").alias("s"))
    per_dow = dowd.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("n").alias("sn")
    )
    overall = F.col("s").cast("double") / F.col("nd")
    dmean = F.col("sn").cast("double") / F.col("n_days")
    idx = per_dow.crossJoin(F.broadcast(tot)).select(
        "dow",
        "n_days",
        "sn",
        F.round(dmean / overall * 1000.0).cast("long").alias("index_milli"),
    )
    dz = dowd.join(F.broadcast(per_dow), "dow").crossJoin(
        F.broadcast(tot)
    ).select(
        F.round(F.col("n").cast("double") / (dmean / overall) * 1000.0)
        .cast("long")
        .alias("dz_milli"),
        (F.col("n").cast("long") * 1000).alias("raw_milli"),
    )

    def var_of(col):
        dec = F.col(col).cast("decimal(38,0)")
        return (
            F.sum(dec * F.col(col)).cast("double") / F.count(F.lit(1))
            - (F.sum(col).cast("double") / F.count(F.lit(1)))
            * (F.sum(col).cast("double") / F.count(F.lit(1)))
        )

    vr = dz.agg(
        F.round((1.0 - var_of("dz_milli") / var_of("raw_milli")) * 1000000.0)
        .cast("long")
        .alias("var_explained_micro")
    )
    return (
        idx.crossJoin(F.broadcast(vr))
        .select(
            F.col("dow").cast("long").alias("dow"),
            F.col("n_days").cast("long").alias("n_days"),
            F.round(F.col("sn").cast("double") / F.col("n_days") * 1000.0)
            .cast("long")
            .alias("mean_count_milli"),
            "index_milli",
            "var_explained_micro",
        )
        .orderBy("dow")
    )


# ---------------------------------------------------------------- q389
@register(
    "q389_attribution_comparison",
    """
    WITH purch AS (
        SELECT user_id, MIN(ts) AS pt FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touches AS (
        SELECT e.user_id, e.event_type, e.ts, e.event_id
        FROM events e JOIN purch p ON e.user_id = p.user_id
        WHERE e.ts < p.pt AND e.event_type <> 'purchase'
    ),
    ranked AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS rk_first,
               ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rk_last,
               COUNT(*) OVER (PARTITION BY user_id) AS k
        FROM touches
    ),
    credit AS (
        SELECT event_type,
               SUM(CASE WHEN rk_first = 1 THEN 1 ELSE 0 END)
                   AS first_touch,
               SUM(CASE WHEN rk_last = 1 THEN 1 ELSE 0 END) AS last_touch,
               SUM(CAST(ROUND(1000000.0 / k) AS BIGINT)) AS linear_micro
        FROM ranked GROUP BY event_type
    )
    SELECT event_type AS channel,
           CAST(first_touch AS BIGINT) AS first_touch,
           CAST(last_touch AS BIGINT) AS last_touch,
           CAST(linear_micro AS BIGINT) AS linear_micro,
           CAST(ABS(first_touch - last_touch) AS BIGINT)
               AS first_last_gap
    FROM credit ORDER BY channel
    """,
    doc="Attribution-scheme comparison on identical journeys "
    "(pre-first-purchase touches per user, deterministic (ts, "
    "event_id) order): first-touch, last-touch and linear credit "
    "per channel side by side, plus the first-vs-last gap — the "
    "disagreement table that explains why two teams 'measure' "
    "different channel values from the same data, and the "
    "motivation for q343's Shapley (which splits the difference "
    "principledly). All windows PARTITIONED by user; linear "
    "credit micro-quantized per touch before summing. Scale: one "
    "join to purchasers, per-user windows, |channels| output.",
)
def q389_attribution_comparison(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    touches = (
        ev.join(purch, "user_id")
        .filter((F.col("ts") < F.col("pt")) & (F.col("event_type") != "purchase"))
        .select("user_id", "event_type", "ts", "event_id")
    )
    wu = Window.partitionBy("user_id")
    wf = wu.orderBy("ts", "event_id")
    wl = wu.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ranked = touches.select(
        "event_type",
        F.row_number().over(wf).alias("rk_first"),
        F.row_number().over(wl).alias("rk_last"),
        F.count(F.lit(1)).over(wu).alias("k"),
    )
    credit = ranked.groupBy("event_type").agg(
        F.sum(F.when(F.col("rk_first") == 1, 1).otherwise(0)).alias(
            "first_touch"
        ),
        F.sum(F.when(F.col("rk_last") == 1, 1).otherwise(0)).alias(
            "last_touch"
        ),
        F.sum(F.round(1000000.0 / F.col("k")).cast("long")).alias(
            "linear_micro"
        ),
    )
    return credit.select(
        F.col("event_type").alias("channel"),
        F.col("first_touch").cast("long").alias("first_touch"),
        F.col("last_touch").cast("long").alias("last_touch"),
        F.col("linear_micro").cast("long").alias("linear_micro"),
        F.abs(F.col("first_touch") - F.col("last_touch"))
        .cast("long")
        .alias("first_last_gap"),
    ).orderBy("channel")
