"""Round-4 gates, batch 42: golden-record survivorship (q289 — the
master-data-management merge: one canonical row per entity assembled
field-by-field from conflicting sources) and event-transition mining
(q290 — per-user behavioral bigrams, the Markov-chain substrate of
journey analytics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q289
@register(
    "q289_golden_record",
    """
    WITH crm AS (
        SELECT c_custkey AS k, c_name AS name,
               CASE WHEN c_custkey % 7 = 0 THEN NULL
                    ELSE ROUND(c_acctbal, 2) END AS bal,
               2 AS prio
        FROM customer WHERE c_custkey % 3 <> 0
    ),
    billing AS (
        SELECT c_custkey AS k, upper(c_name) AS name,
               ROUND(c_acctbal + 50, 2) AS bal,
               1 AS prio
        FROM customer WHERE c_custkey % 2 = 0
    ),
    unioned AS (
        SELECT * FROM crm UNION ALL SELECT * FROM billing
    )
    SELECT k,
           arg_min(name, prio) AS name,
           min_by(bal, CASE WHEN bal IS NULL THEN 9 ELSE prio END) AS bal,
           CAST(COUNT(*) AS BIGINT) AS n_sources
    FROM unioned GROUP BY k ORDER BY k
    """,
    doc="Golden-record survivorship (the master-data-management merge "
    "q239/q240's entity RESOLUTION feeds into): two overlapping "
    "extracts of the customer entity — a 'billing' system "
    "(priority 1, shifted balances, shouty names) and a 'crm' "
    "system (priority 2, some balances missing) — are unioned and "
    "collapsed to ONE canonical row per key with FIELD-LEVEL "
    "survivorship: each attribute independently takes the value "
    "from the highest-priority source that actually HAS it (a NULL "
    "in the winning source falls through to the next, via a "
    "priority key that demotes NULL holders — min_by, no joins, no "
    "per-field subqueries). One shuffle on the entity key for any "
    "number of sources and fields; at 100 TB this replaces the "
    "N-way full-outer-join ladder MDM tools generate. n_sources "
    "per entity is pinned too, so coverage is value-checked.",
)
def q289_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    crm = c.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.round("c_acctbal", 2))
        .alias("bal"),
        F.lit(2).alias("prio"),
    )
    billing = c.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("k"),
        F.upper("c_name").alias("name"),
        F.round(F.col("c_acctbal") + 50, 2).alias("bal"),
        F.lit(1).alias("prio"),
    )
    unioned = crm.unionByName(billing)
    bal_prio = F.when(F.col("bal").isNull(), F.lit(9)).otherwise(
        F.col("prio")
    )
    return (
        unioned.groupBy("k")
        .agg(
            F.min_by("name", "prio").alias("name"),
            F.min_by("bal", bal_prio).alias("bal"),
            F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------- q290
@register(
    "q290_event_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS prev
        FROM events
    )
    SELECT prev AS from_type, event_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE prev IS NOT NULL
    GROUP BY prev, event_type ORDER BY from_type, to_type
    """,
    doc="Event-transition mining — per-user behavioral bigrams (the "
    "Markov-chain substrate journey analytics, next-action models, "
    "and bot detection all start from; q92 sessionizes, q93 matches "
    "a FIXED funnel, this measures EVERY observed transition): one "
    "LAG window per user over the event-time order (event_id "
    "tiebreak = total order), then a count + distinct-user count "
    "per (from, to) pair. The window rides the per-user "
    "partitioning the event table already shuffles on for "
    "sessionization, and the transition matrix is bounded by "
    "event-type cardinality squared — tiny metadata at any scale.",
)
def q290_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    return (
        seq.groupBy(
            F.col("prev").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("from_type", "to_type")
    )
