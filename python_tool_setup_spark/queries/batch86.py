"""Round-5 gates, batch 86: group-aware k-fold assignment (q376 —
cross-validation folds keyed on the GROUP so all of a user's rows
land in one fold: the split that makes CV honest when rows within a
group correlate) and time-based split with embargo (q377 — train
strictly before a cutoff, test strictly after cutoff + embargo gap,
the leakage-safe protocol for temporally correlated data; the purged
split financial ML insists on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_K_FOLDS = 5
_CUTOFF = "2024-01-20 00:00:00"
_EMBARGO_HOURS = 24


# ---------------------------------------------------------------- q376
@register(
    "q376_group_kfold",
    f"""
    WITH assigned AS (
        SELECT event_id, user_id,
               CAST(('0x' || substr(md5('fold|' ||
                   CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   % {_K_FOLDS} AS fold
        FROM events
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_groups,
           CAST((SELECT COUNT(*) FROM (
               SELECT user_id FROM assigned
               GROUP BY user_id HAVING COUNT(DISTINCT fold) > 1
           )) AS BIGINT) AS groups_spanning_folds
    FROM assigned GROUP BY fold ORDER BY fold
    """,
    doc="Group-aware k-fold assignment: the fold is a function of the "
    "GROUP key (md5-derandomized, q95's convention), never the row "
    "— all of a user's events land in one fold, so cross- "
    "validation cannot leak a user's behavior from train into "
    "test (the row-level-split mistake that inflates every "
    "correlated-data CV score). The gate reports per-fold row and "
    "group counts AND the leakage guard itself: the count of "
    "groups spanning >1 fold, which the construction pins to 0 "
    "(oracle-checked, invariant-tested). Scale: fold assignment "
    "is a pure per-row projection — no shuffle, no join, "
    "scan-speed at 100 TB; the audit is one groupBy.",
)
def q376_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fold = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("fold|"), F.col("user_id").cast("string"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _K_FOLDS
    )
    assigned = ev.select("event_id", "user_id", fold.alias("fold"))
    spanning = (
        assigned.groupBy("user_id")
        .agg(F.count_distinct("fold").alias("nf"))
        .filter(F.col("nf") > 1)
        .agg(F.count(F.lit(1)).alias("bad"))
    )
    return (
        assigned.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("user_id").alias("n_groups"),
        )
        .crossJoin(F.broadcast(spanning))
        .select(
            F.col("fold").cast("long").alias("fold"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_groups").cast("long").alias("n_groups"),
            F.col("bad").cast("long").alias("groups_spanning_folds"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------- q377
@register(
    "q377_time_embargo_split",
    f"""
    WITH tagged AS (
        SELECT event_id, ts,
               CASE
                 WHEN ts < TIMESTAMP '{_CUTOFF}' THEN 'train'
                 WHEN ts >= TIMESTAMP '{_CUTOFF}'
                      + INTERVAL {_EMBARGO_HOURS} HOUR THEN 'test'
                 ELSE 'embargo'
               END AS split
        FROM events
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
           MAX(ts) < TIMESTAMP '{_CUTOFF}'
               OR MIN(ts) >= TIMESTAMP '{_CUTOFF}'
               OR split = 'embargo' AS boundary_clean
    FROM tagged GROUP BY split ORDER BY split
    """,
    doc="Time-based split with embargo: train takes rows strictly "
    f"before the cutoff, test strictly after cutoff + {_EMBARGO_HOURS}h, "
    "and the embargo gap between them is EXCLUDED — the purged "
    "protocol that stops temporally-autocorrelated rows (and "
    "label-lookahead features) from leaking across the boundary; "
    "a plain random split on time-series data is the q259 leakage "
    "bug in miniature. Reports per-split counts, time spans, and "
    "a boundary-cleanliness assertion the oracle re-proves. "
    "Scale: pure per-row projection + one 3-group aggregate; "
    "with date-partitioned storage the split IS partition "
    "pruning.",
)
def q377_time_embargo_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    test_start = cutoff + F.expr(f"INTERVAL {_EMBARGO_HOURS} HOURS")
    split = (
        F.when(F.col("ts") < cutoff, "train")
        .when(F.col("ts") >= test_start, "test")
        .otherwise("embargo")
    )
    tagged = ev.select("event_id", "ts", split.alias("split"))
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .select(
            "split",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.date_format("min_ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.date_format("max_ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            (
                (F.col("max_ts") < cutoff)
                | (F.col("min_ts") >= cutoff)
                | (F.col("split") == "embargo")
            ).alias("boundary_clean"),
        )
        .orderBy("split")
    )
