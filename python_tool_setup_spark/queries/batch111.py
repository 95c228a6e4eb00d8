"""Round-5 gates, batch 111: quantile treatment effect (q430 — the
md5-split arms' p50/p90 DIFFERENCES per stream: the distributional
readout that catches a tail-only effect q426's mean-based MDE
would size wrong) and cohort activation rate (q431 — share of
each signup-week cohort that reaches a purchase within 7 days:
the activation funnel metric between q396's growth accounting
and q411's time-to-convert clock).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.percentiles import (
    grouped_exact_percentiles,
)
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_ACT_DAYS = 7


# ---------------------------------------------------------------- q430
@register(
    "q430_quantile_treatment_effect",
    """
    WITH assign AS (
        SELECT event_type,
               CAST(('0x' || substr(md5('arm|' ||
                   CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2
                   AS arm,
               CAST(ROUND(1e6 * value) AS BIGINT) AS v
        FROM events
    ),
    pct AS (
        SELECT event_type, arm,
               COUNT(*) AS n,
               ROUND(quantile_cont(v, 5e-1), 4) AS p50,
               ROUND(quantile_cont(v, 9e-1), 4) AS p90
        FROM assign GROUP BY event_type, arm
    )
    SELECT a.event_type,
           CAST(a.n AS BIGINT) AS n_control,
           CAST(b.n AS BIGINT) AS n_treat,
           CAST(ROUND(b.p50 - a.p50, 4) AS DOUBLE) AS qte_p50_micro,
           CAST(ROUND(b.p90 - a.p90, 4) AS DOUBLE) AS qte_p90_micro
    FROM pct a JOIN pct b
      ON b.event_type = a.event_type AND a.arm = 0 AND b.arm = 1
    ORDER BY a.event_type
    """,
    doc="Quantile treatment effect per stream (p50/p90 differences "
    "between the md5-split arms — the distributional lens that "
    "catches a tail-only effect a mean comparison dilutes away; "
    "q426 sizes the test for MEANS, this reads the quantiles "
    "the SLA actually cares about): values micro-quantized so "
    "each arm's exact interpolated percentiles (histogram order "
    "statistics, per-(stream, arm) partitioned — no global "
    "window) are identical in both engines under ROUND(4), "
    "differences taken after. The same-user arm assignment as "
    "q426 — one experiment, two readouts. Scale: per-arm "
    "distinct-value histograms; the QTE join is metadata.",
)
def q430_quantile_treatment_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("arm|"), F.col("user_id").cast("string"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    assign = e.select(
        "event_type",
        arm.alias("arm"),
        F.round(F.lit(1e6) * F.col("value")).cast("long").alias("v"),
    )
    pct = grouped_exact_percentiles(
        assign, ["event_type", "arm"], "v", {"p50": 0.5, "p90": 0.9}
    ).select(
        "event_type",
        "arm",
        "n",
        F.round(F.col("p50"), 4).alias("p50"),
        F.round(F.col("p90"), 4).alias("p90"),
    )
    # conditional-agg pivot: ONE pass over the percentile table (an
    # a/b self-join would duplicate the whole windowed subtree)
    def side(col: str, arm: int):
        return F.max(F.when(F.col("arm") == arm, F.col(col)))

    return (
        pct.groupBy("event_type")
        .agg(
            side("n", 0).cast("long").alias("n_control"),
            side("n", 1).cast("long").alias("n_treat"),
            F.round(side("p50", 1) - side("p50", 0), 4)
            .cast("double")
            .alias("qte_p50_micro"),
            F.round(side("p90", 1) - side("p90", 0), 4)
            .cast("double")
            .alias("qte_p90_micro"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- q431
@register(
    "q431_activation_rate",
    f"""
    WITH signups AS (
        SELECT user_id, MIN(epoch_ms(ts)) AS su_ms
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    cohorts AS (
        SELECT user_id, su_ms,
               date_diff('day', DATE '1970-01-05',
                   CAST(to_timestamp(su_ms // 1000) AS DATE)) // 7
                   AS cohort_week
        FROM signups
    ),
    activated AS (
        SELECT c.user_id, c.cohort_week,
               MAX(CASE WHEN e.event_type = 'purchase'
                        AND epoch_ms(e.ts) >= c.su_ms
                        AND epoch_ms(e.ts)
                            < c.su_ms + {_ACT_DAYS} * 86400000
                        THEN 1 ELSE 0 END) AS act
        FROM cohorts c JOIN events e ON e.user_id = c.user_id
        GROUP BY c.user_id, c.cohort_week
    )
    SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
           CAST(COUNT(*) AS BIGINT) AS signups,
           CAST(SUM(act) AS BIGINT) AS activated,
           CAST(ROUND(1e6 * SUM(act) / COUNT(*)) AS BIGINT)
               AS activation_micro
    FROM activated GROUP BY cohort_week ORDER BY cohort_week
    """,
    doc="Signup-cohort activation rate (share of each signup week's "
    "users reaching a purchase within 7 days of THEIR signup — "
    "the activation funnel metric product teams steer by; "
    "q396 accounts for growth states, q411 clocks converters, "
    "this measures the COHORT follow-through): first signup per "
    "user, Monday-epoch week bucketing (q388's engine-neutral "
    "datediff idiom), activation via one user-keyed join with "
    "the purchase window as integer epoch-ms arithmetic. "
    "Scale: two user-keyed aggregates on the same shuffle key.",
)
def q431_activation_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    signups = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_millis("ts")).alias("su_ms"))
    )
    cohort_week = F.floor(
        F.datediff(
            F.timestamp_seconds(
                F.floor(F.col("su_ms") / 1000)
            ).cast("date"),
            F.lit("1970-01-05").cast("date"),
        )
        / 7
    )
    cohorts = signups.select("user_id", "su_ms", cohort_week.alias("cohort_week"))
    ems = F.unix_millis("ts")
    act = F.max(
        F.when(
            (F.col("event_type") == "purchase")
            & (ems >= F.col("su_ms"))
            & (ems < F.col("su_ms") + _ACT_DAYS * 86400000),
            1,
        ).otherwise(0)
    )
    activated = (
        cohorts.join(e, "user_id")
        .groupBy("user_id", "cohort_week")
        .agg(act.alias("act"))
    )
    return (
        activated.groupBy("cohort_week")
        .agg(
            F.count("*").cast("long").alias("signups"),
            F.sum("act").cast("long").alias("activated"),
            F.round(F.lit(1e6) * F.sum("act") / F.count("*"))
            .cast("long")
            .alias("activation_micro"),
        )
        .select(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            "signups",
            "activated",
            "activation_micro",
        )
        .orderBy("cohort_week")
    )
