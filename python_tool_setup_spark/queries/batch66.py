"""Round-4 gates, batch 66: rolling-origin forecast backtest (q336 —
the evaluation HARNESS around q279's seasonal-naive model: many
train/test splits, error by horizon) and a data-freshness SLA
monitor (q337 — the staleness readout every ingestion dashboard
leads with).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_ORIGIN_LO, _ORIGIN_HI = 14, 25  # rolling origins (day index)
_MAX_H = 3
_AS_OF = "2024-01-31 00:00:00"
_SLA_MIN = 2880


# ---------------------------------------------------------------- q336
@register(
    "q336_rolling_backtest",
    f"""
    WITH daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                   AS BIGINT) AS d,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT o.o AS origin, h.h AS horizon
        FROM generate_series({_ORIGIN_LO}, {_ORIGIN_HI}) AS o(o),
             generate_series(1, {_MAX_H}) AS h(h)
    ),
    scored AS (
        SELECT g.horizon, a.event_type,
               abs(a.x - f.x) AS abs_err
        FROM grid g
        JOIN daily a ON a.d = g.origin + g.horizon
        JOIN daily f ON f.event_type = a.event_type
                    AND f.d = g.origin + g.horizon - 7
    )
    SELECT CAST(horizon AS BIGINT) AS horizon,
           CAST(COUNT(*) AS BIGINT) AS n_evals,
           CAST(SUM(abs_err) AS BIGINT) AS sum_abs_err,
           CAST(ROUND(CAST(SUM(abs_err) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS BIGINT)
               AS mae_micro
    FROM scored GROUP BY horizon ORDER BY horizon
    """,
    doc="Rolling-origin forecast backtest (the evaluation harness "
    "q279's one-split holdout lacks: 12 origins x 3 horizons, the "
    "way forecast accuracy is actually certified so one lucky "
    "split can't flatter the model): seasonal-naive forecasts "
    "(value 7 days before the target) scored against actuals for "
    "every (origin, horizon) cell, absolute errors on exact "
    "integer counts, MAE per horizon with one division. The "
    "origin/horizon grid is generated metadata CROSS-joined onto "
    "the daily table — the daily table is aggregated ONCE and "
    "reused for both actuals and forecasts (two aliases of the "
    "same metadata-sized relation), never a per-origin rescan of "
    "the events. Scale: one event scan; everything after is "
    "|types| x |days| cells.",
)
def q336_rolling_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(F.count(F.lit(1)).alias("x"))
    grid = spark.range(_ORIGIN_LO, _ORIGIN_HI + 1).select(
        F.col("id").alias("origin"),
        F.explode(F.array(*[F.lit(h) for h in range(1, _MAX_H + 1)])).alias(
            "horizon"
        ),
    )
    a = daily.select(
        F.col("event_type"), F.col("d").alias("da"), F.col("x").alias("xa")
    )
    f = daily.select(
        F.col("event_type").alias("etf"),
        F.col("d").alias("df"),
        F.col("x").alias("xf"),
    )
    scored = (
        F.broadcast(grid)
        .join(a, F.col("da") == F.col("origin") + F.col("horizon"))
        .join(
            f,
            (F.col("etf") == F.col("event_type"))
            & (F.col("df") == F.col("origin") + F.col("horizon") - 7),
        )
        .select("horizon", F.abs(F.col("xa") - F.col("xf")).alias("abs_err"))
    )
    return (
        scored.groupBy("horizon")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_evals"),
            F.sum("abs_err").cast("long").alias("sum_abs_err"),
        )
        .select(
            F.col("horizon").cast("long").alias("horizon"),
            "n_evals",
            "sum_abs_err",
            F.round(
                F.col("sum_abs_err").cast("double")
                / F.col("n_evals").cast("double")
                * 1000000.0
            )
            .cast("long")
            .alias("mae_micro"),
        )
        .orderBy("horizon")
    )


# ---------------------------------------------------------------- q337
@register(
    "q337_freshness_sla",
    f"""
    SELECT event_type,
           CAST(date_diff('second', MAX(ts),
                TIMESTAMP '{_AS_OF}') // 60 AS BIGINT) AS lag_minutes,
           CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_AS_OF}'
                    - INTERVAL 24 HOUR THEN 1 ELSE 0 END) AS BIGINT)
               AS rows_last_24h,
           CAST(COUNT(*) AS BIGINT) AS rows_total,
           date_diff('second', MAX(ts), TIMESTAMP '{_AS_OF}') // 60
               > {_SLA_MIN} AS sla_breached
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Data-freshness SLA monitor (the staleness readout every "
    "ingestion dashboard leads with — reference-lifecycle "
    "pipelines page on it before anything else): per stream "
    "(event type), minutes of lag between the newest record and "
    "the pinned as-of instant, last-24h arrival volume, and the "
    "SLA-breach flag at a 48h policy. Integer-minute lag on both "
    "engines (timestamp truncation conventions match by the "
    "epoch-arithmetic posture); the as-of is pinned so the gate "
    "is deterministic — production swaps in now(). Scale: one "
    "map-side-combined aggregate per stream; at 100 TB the same "
    "query runs on partition-level max stats instead of raw rows "
    "(the q116 zone-map discipline).",
)
def q337_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    as_of = F.lit(_AS_OF).cast("timestamp")
    lag_min = F.floor(
        (as_of.cast("long") - F.max(F.col("ts")).cast("long")) / 60
    ).cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            lag_min.alias("lag_minutes"),
            F.sum(
                F.when(
                    F.col("ts") >= as_of - F.expr("INTERVAL 24 HOURS"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("rows_last_24h"),
            F.count(F.lit(1)).cast("long").alias("rows_total"),
        )
        .select(
            "event_type",
            "lag_minutes",
            "rows_last_24h",
            "rows_total",
            (F.col("lag_minutes") > _SLA_MIN).alias("sla_breached"),
        )
        .orderBy("event_type")
    )
