"""Round-5 gates, batch 97: categorical value drift (q398 — enum
values that appear in the new half of the data but never existed in
the old half, and vice versa: the schema-VALUE drift a contract
test misses because the column type never changed; q288's vocab
churn for categorical columns) and an event idempotency audit
(q399 — duplicate (user, type, timestamp) groups per day: the
operational double-fire/replay smell that exactly-once sinks (q27/
q153/q263) exist to prevent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q398
@register(
    "q398_categorical_value_drift",
    """
    WITH tagged AS (
        SELECT 'o_orderpriority' AS col, o_orderpriority AS v,
               o_orderkey % 2 = 1 AS is_new
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', o_orderstatus, o_orderkey % 2 = 1
        FROM orders
    ),
    counts AS (
        SELECT col, v,
               SUM(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS c_old,
               SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS c_new
        FROM tagged GROUP BY col, v
    )
    SELECT col,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(CASE WHEN c_old = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS appeared,
           CAST(SUM(CASE WHEN c_new = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS disappeared,
           CAST(SUM(CASE WHEN c_old > 0 AND c_new > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS stable
    FROM counts GROUP BY col ORDER BY col
    """,
    doc="Categorical value drift for enum-ish columns (values "
    "APPEARING only in the new half or DISAPPEARING from it — the "
    "schema-VALUE drift that breaks downstream CASE statements "
    "and dashboards while every type-level contract test stays "
    "green; q288's vocabulary churn applied to categorical "
    "columns, the audit a new-enum rollout should trip): "
    "per-(column, value) old/new counts in one conditional "
    "aggregate over a stacked projection, drift classes counted "
    "per column. Scale: one scan, value-domain metadata after.",
)
def q398_categorical_value_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    is_new = (F.col("o_orderkey") % 2 == 1).alias("is_new")
    tagged = o.select(
        F.lit("o_orderpriority").alias("col"),
        F.col("o_orderpriority").alias("v"),
        is_new,
    ).unionByName(
        o.select(
            F.lit("o_orderstatus").alias("col"),
            F.col("o_orderstatus").alias("v"),
            is_new,
        )
    )
    counts = tagged.groupBy("col", "v").agg(
        F.sum(F.when(~F.col("is_new"), 1).otherwise(0)).alias("c_old"),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias("c_new"),
    )
    return (
        counts.groupBy("col")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum(F.when(F.col("c_old") == 0, 1).otherwise(0)).alias(
                "appeared"
            ),
            F.sum(F.when(F.col("c_new") == 0, 1).otherwise(0)).alias(
                "disappeared"
            ),
            F.sum(
                F.when((F.col("c_old") > 0) & (F.col("c_new") > 0), 1)
                .otherwise(0)
            ).alias("stable"),
        )
        .select(
            "col",
            F.col("n_values").cast("long").alias("n_values"),
            F.col("appeared").cast("long").alias("appeared"),
            F.col("disappeared").cast("long").alias("disappeared"),
            F.col("stable").cast("long").alias("stable"),
        )
        .orderBy("col")
    )


# ---------------------------------------------------------------- q399
@register(
    "q399_event_idempotency_audit",
    """
    WITH groups AS (
        SELECT CAST(ts AS DATE) AS day, user_id, event_type, ts,
               COUNT(*) AS copies
        FROM events GROUP BY 1, 2, 3, 4
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(SUM(copies) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_logical,
           CAST(SUM(copies) - COUNT(*) AS BIGINT) AS n_duplicates,
           CAST(MAX(copies) AS BIGINT) AS worst_copies,
           CAST(ROUND(CAST(SUM(copies) - COUNT(*) AS DOUBLE)
               / SUM(copies) * 1000000.0) AS BIGINT) AS dup_rate_micro
    FROM groups GROUP BY day ORDER BY day
    """,
    doc="Event idempotency audit: duplicate (user, type, exact "
    "timestamp) groups per day — the double-fire / replay / "
    "at-least-once-retry signature that an exactly-once pipeline "
    "(q27 checkpointing, q153 restart, q263 idempotent spool) is "
    "supposed to make impossible, measured so the claim is "
    "checkable: physical events vs logical (deduped) events, "
    "worst duplication factor, daily dup rate with one division. "
    "A nonzero row here is the ingestion bug ticket. Scale: one "
    "groupBy on the natural key — the same shuffle q28's "
    "streaming dedup pays.",
)
def q399_event_idempotency_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    groups = ev.groupBy(
        F.col("ts").cast("date").alias("day"),
        "user_id",
        "event_type",
        "ts",
    ).agg(F.count(F.lit(1)).alias("copies"))
    return (
        groups.groupBy("day")
        .agg(
            F.sum("copies").alias("n_events"),
            F.count(F.lit(1)).alias("n_logical"),
            F.max("copies").alias("worst_copies"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_logical").cast("long").alias("n_logical"),
            (F.col("n_events") - F.col("n_logical"))
            .cast("long")
            .alias("n_duplicates"),
            F.col("worst_copies").cast("long").alias("worst_copies"),
            F.round(
                (F.col("n_events") - F.col("n_logical")).cast("double")
                / F.col("n_events").cast("double")
                * 1000000.0
            )
            .cast("long")
            .alias("dup_rate_micro"),
        )
        .orderBy("day")
    )
