"""Round-5 gates, batch 94: audience co-engagement overlap (q392 —
pairwise Jaccard of the user sets behind each event type: which
behaviors share an audience — the 5x5 matrix a growth team reads
before bundling features) and inter-arrival percentiles (q393 —
p50/p90 of the gap between a user's consecutive same-type events,
per type, via the shared histogram-percentile operator: the
cadence profile that sets session timeouts and retention windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q392
@register(
    "q392_co_engagement_overlap",
    """
    WITH ut AS (
        SELECT DISTINCT user_id, event_type FROM events
    ),
    sizes AS (
        SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type
    ),
    inter AS (
        SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS c
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT i.t1, i.t2,
           CAST(s1.n AS BIGINT) AS n1,
           CAST(s2.n AS BIGINT) AS n2,
           CAST(i.c AS BIGINT) AS n_both,
           CAST(ROUND(CAST(i.c AS DOUBLE)
               / CAST(s1.n + s2.n - i.c AS DOUBLE) * 1000000.0) AS BIGINT)
               AS jaccard_micro
    FROM inter i
    JOIN sizes s1 ON s1.event_type = i.t1
    JOIN sizes s2 ON s2.event_type = i.t2
    ORDER BY t1, t2
    """,
    doc="Audience co-engagement overlap: pairwise Jaccard of the "
    "distinct-user sets behind each event type (the who-does-both "
    "matrix a growth team reads before bundling two features or "
    "targeting one audience with the other's campaign): one "
    "distinct (user, type) projection — the only data-sized "
    "shuffle — then a self-join keyed on user with the type-pair "
    "inequality, exact integer set algebra, one division per "
    "pair. The same shape as q312's source-vocab Jaccard, over "
    "users instead of tokens. Scale: |types|^2 output; the "
    "user-keyed join co-partitions with the distinct.",
)
def q392_co_engagement_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Distinct (user, type) pairs feed the sizes aggregate AND both
    # self-join sides: pin so events is scanned (and deduped) once.
    ut = pin(ev.select("user_id", "event_type").distinct())
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("t1"))
    b = ut.select("user_id", F.col("event_type").alias("t2"))
    inter = (
        a.join(b, "user_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s1 = sizes.select(F.col("event_type").alias("t1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("event_type").alias("t2"), F.col("n").alias("n2"))
    return (
        inter.join(F.broadcast(s1), "t1")
        .join(F.broadcast(s2), "t2")
        .select(
            "t1",
            "t2",
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.col("c").cast("long").alias("n_both"),
            F.round(
                F.col("c").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("c")).cast("double")
                * 1000000.0
            )
            .cast("long")
            .alias("jaccard_micro"),
        )
        .orderBy("t1", "t2")
    )


# ---------------------------------------------------------------- q393
@register(
    "q393_interarrival_percentiles",
    """
    WITH gaps AS (
        SELECT event_type,
               date_diff('second', LAG(ts) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id), ts) AS gap_sec
        FROM events
    ),
    g AS (SELECT event_type, gap_sec FROM gaps WHERE gap_sec IS NOT NULL),
    ordg AS (
        SELECT event_type, gap_sec,
               ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY gap_sec) - 1 AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM g
    ),
    sel AS (
        SELECT event_type, MAX(n) AS n,
               MAX(CASE WHEN rk = (n - 1) // 2 THEN gap_sec END) AS lo50,
               MAX(CASE WHEN rk = LEAST(n - 1, (n - 1) // 2 + 1)
                   THEN gap_sec END) AS hi50,
               MAX(CASE WHEN rk = ((n - 1) * 9) // 10 THEN gap_sec END)
                   AS lo90,
               MAX(CASE WHEN rk = LEAST(n - 1, ((n - 1) * 9) // 10 + 1)
                   THEN gap_sec END) AS hi90
        FROM ordg GROUP BY event_type
    )
    -- exact-rational quantiles over integer seconds (the q524 class:
    -- 10*p90 = lo*(10-r) + hi*r lands exactly on X.5 whenever the
    -- bracketing gap is odd); half-up = (num + b/2) // b
    SELECT event_type,
           CAST(n AS BIGINT) AS n_gaps,
           CAST((lo50 * (2 - (n - 1) % 2) + hi50 * ((n - 1) % 2) + 1)
                // 2 AS BIGINT) AS p50_gap_sec,
           CAST((lo90 * (10 - ((n - 1) * 9) % 10)
                 + hi90 * (((n - 1) * 9) % 10) + 5) // 10 AS BIGINT)
               AS p90_gap_sec
    FROM sel ORDER BY event_type
    """,
    doc="Inter-arrival percentiles per event type: the gap between a "
    "user's consecutive same-type events (per-user LAG windows — "
    "partitioned, deterministic (ts, event_id) order), pooled per "
    "type and reduced to exact p50/p90 through the shared "
    "histogram-percentile operator (operators/percentiles.py — "
    "the gap domain collapses to a distinct-seconds histogram, no "
    "type buffers raw gaps). This is the number session-timeout "
    "and freshness-SLA configs (q272/q337) should be DERIVED "
    "from rather than guessed. Scale: one per-user window pass + "
    "histogram reduction.",
)
def q393_interarrival_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from python_tool_setup_spark.operators.percentiles import (
        grouped_exact_percentiles_frac,
    )

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
        ).alias("gap_sec"),
    ).filter(F.col("gap_sec").isNotNull())
    # exact-rational quantiles: see the oracle comment
    pct = grouped_exact_percentiles_frac(
        gaps, ["event_type"], "gap_sec", {"p50": (1, 2), "p90": (9, 10)}
    )
    return pct.select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.floor((F.col("p50_num") + 1) / 2)
        .cast("long")
        .alias("p50_gap_sec"),
        F.floor((F.col("p90_num") + 5) / 10)
        .cast("long")
        .alias("p90_gap_sec"),
    ).orderBy("event_type")
