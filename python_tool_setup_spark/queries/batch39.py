"""Round-4 gates, batch 39: point-in-time SCD2 fact enrichment (q283
— every fact joined to the dimension version valid AT ITS OWN event
time) and full-sync MERGE with not-matched-by-source DELETE (q284 —
the third MERGE clause, Delta's whenNotMatchedBySourceDelete, as a
join rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q283
@register(
    "q283_scd2_point_in_time_join",
    """
    WITH dim AS (
        SELECT c_custkey AS k, ROUND(c_acctbal, 2) AS bal,
               TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
               TIMESTAMP '2024-01-15 00:00:00' AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, ROUND(c_acctbal, 2) + 500,
               TIMESTAMP '2024-01-15 00:00:00',
               TIMESTAMP '9999-12-31 00:00:00'
        FROM customer
    ),
    facts AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE user_id % 6 = 0
    )
    SELECT f.event_id,
           f.user_id,
           d.bal AS balance_at_event,
           ROUND(f.value + d.bal, 2) AS enriched
    FROM facts f
    JOIN dim d
      ON d.k = f.user_id AND f.ts >= d.valid_from AND f.ts < d.valid_to
    """,
    doc="Point-in-time SCD2 enrichment — the fact-side consumer of "
    "q76's SCD2 history (q246 answers 'what did we believe at time "
    "T'; this stamps EVERY fact with the dimension version valid at "
    "its own event time): a two-version balance dimension "
    "(restatement at Jan 15) joined to an events shard on key "
    "equality PLUS the half-open validity interval "
    "[valid_from, valid_to). The join is the q23 range-join shape — "
    "equi-key first (prunes to each user's ≤2 versions), interval "
    "residual after — so at 100 TB it shuffles once on the key and "
    "never expands beyond versions-per-key; exactly-one-version "
    "coverage is structural (intervals partition the timeline). "
    "The oracle states the identical join.",
)
def q283_scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    v1 = c.select(
        F.col("c_custkey").alias("k"),
        F.round("c_acctbal", 2).alias("bal"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit("2024-01-15 00:00:00").cast("timestamp").alias("valid_to"),
    )
    v2 = c.select(
        F.col("c_custkey").alias("k"),
        (F.round("c_acctbal", 2) + 500).alias("bal"),
        F.lit("2024-01-15 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit("9999-12-31 00:00:00").cast("timestamp").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    facts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 6 == 0)
        .select("event_id", "user_id", "ts", "value")
    )
    j = facts.join(
        dim,
        (F.col("user_id") == F.col("k"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("ts") < F.col("valid_to")),
    )
    return j.select(
        "event_id",
        "user_id",
        F.col("bal").alias("balance_at_event"),
        F.round(F.col("value") + F.col("bal"), 2).alias("enriched"),
    )


# ---------------------------------------------------------------- q284
@register(
    "q284_merge_full_sync",
    """
    WITH target AS (
        SELECT c_custkey AS k, ROUND(c_acctbal, 2) AS v
        FROM customer WHERE c_custkey % 3 <> 2
    ),
    source AS (
        SELECT c_custkey AS k, ROUND(c_acctbal, 2) + 10 AS v
        FROM customer WHERE c_custkey % 2 = 0
    )
    SELECT COALESCE(s.k, t.k) AS k,
           COALESCE(s.v, t.v) AS v,
           CASE WHEN t.k IS NULL THEN 'inserted'
                ELSE 'updated' END AS action
    FROM target t JOIN source s ON t.k = s.k
    UNION ALL
    SELECT s.k, s.v, 'inserted'
    FROM source s LEFT JOIN target t ON t.k = s.k
    WHERE t.k IS NULL
    """,
    doc="Full-sync MERGE — the THIRD merge clause "
    "(whenNotMatchedBySourceDelete, Delta 2.3+/SQL:2016 MERGE "
    "DELETE) completing q24's matched-update/unmatched-insert and "
    "q144's CDC ops: the target becomes an exact mirror of the "
    "source — matched rows updated, source-only rows inserted, and "
    "TARGET rows absent from the source DELETED (the clause a "
    "mirror-sync of a dimension extract needs; without it, deletes "
    "upstream leave zombies downstream). Realized as the join "
    "rewrite: full-outer on the key, keep source-side rows only — "
    "which the gate labels per row (updated/inserted) so the oracle "
    "pins each row's provenance, and deleted keys are provably "
    "absent (they appear in neither branch). One shuffle on the "
    "merge key, the same cost class as q24.",
)
def q284_merge_full_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    target = c.filter(F.col("c_custkey") % 3 != 2).select(
        F.col("c_custkey").alias("k"), F.round("c_acctbal", 2).alias("v")
    )
    source = c.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("k"),
        (F.round("c_acctbal", 2) + 10).alias("v"),
    )
    t = target.alias("t")
    s = source.alias("s")
    merged = t.join(s, F.col("t.k") == F.col("s.k"), "full_outer").select(
        F.coalesce(F.col("s.k"), F.col("t.k")).alias("k"),
        F.coalesce(F.col("s.v"), F.col("t.v")).alias("v"),
        F.when(F.col("s.k").isNull(), "deleted")
        .when(F.col("t.k").isNull(), "inserted")
        .otherwise("updated")
        .alias("action"),
    )
    # whenNotMatchedBySourceDelete: target-only rows leave the table
    return merged.filter(F.col("action") != "deleted")
