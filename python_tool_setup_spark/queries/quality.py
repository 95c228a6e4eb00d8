"""Warehouse-pattern gate queries (q76-q78): SCD2 history, data-quality
expectations, quarantine routing. All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.quality import (
    expectation_report,
    quarantine,
)
from python_tool_setup_spark.operators.scd import scd2_apply, scd2_init
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_T1, _T2 = "2024-01-01 00:00:00", "2024-02-01 00:00:00"
_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "q76_scd2_history",
    f"""
    WITH base AS (
        SELECT c_custkey AS k, c_nationkey AS nat, ROUND(c_acctbal, 2) AS bal
        FROM customer
    ),
    changed AS (SELECT * FROM base WHERE k % 4 = 0 AND k % 10 != 9)
    SELECT k, nat, bal, '{_T1}' AS valid_from, '{_T2}' AS valid_to,
           FALSE AS is_current
    FROM changed
    UNION ALL
    SELECT k, nat, bal, '{_T1}', '9999-12-31 00:00:00', TRUE
    FROM base WHERE NOT (k % 4 = 0 AND k % 10 != 9)
    UNION ALL
    SELECT k, nat, bal + 100, '{_T2}', '9999-12-31 00:00:00', TRUE
    FROM changed
    UNION ALL
    SELECT k + 1000000, nat, bal, '{_T2}', '9999-12-31 00:00:00', TRUE
    FROM base WHERE k % 17 = 0
    """,
    doc="SCD2 dimension history: snapshot 1 bootstraps, snapshot 2 "
    "changes some balances, drops some keys from the batch (no news, "
    "not a delete) and adds new keys. Changed keys get their current "
    "row closed at t2 and a new current row; history rows pass "
    "through untouched. One equi-join per batch on the business key.",
)
def q76_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("nat"),
        F.round("c_acctbal", 2).alias("bal"),
    )
    hist = scd2_init(c, ["k"], _T1)
    upd = (
        c.filter(F.col("k") % 10 != 9)
        .withColumn(
            "bal",
            F.when(F.col("k") % 4 == 0, F.col("bal") + 100).otherwise(F.col("bal")),
        )
        .unionByName(
            c.filter(F.col("k") % 17 == 0).withColumn("k", F.col("k") + 1000000)
        )
    )
    out = scd2_apply(hist, upd, ["k"], ["nat", "bal"], _T2)
    return out.select(
        "k",
        "nat",
        "bal",
        F.date_format("valid_from", _TS_FMT).alias("valid_from"),
        F.date_format("valid_to", _TS_FMT).alias("valid_to"),
        "is_current",
    )


_RULES_SQL = """
        CAST(SUM(CASE WHEN NOT (l_quantity <= 30) THEN 1 ELSE 0 END)
             AS BIGINT) AS qty_le_30,
        CAST(SUM(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.05)
                 THEN 1 ELSE 0 END) AS BIGINT) AS disc_range,
        CAST(SUM(CASE WHEN NOT (l_shipdate < TIMESTAMP '1998-06-01')
                 THEN 1 ELSE 0 END) AS BIGINT) AS ship_in_range,
        CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS key_not_null,
        COUNT(*) AS total
"""


def _rules() -> dict[str, F.Column]:
    return {
        "qty_le_30": F.col("l_quantity") <= 30,
        "disc_range": F.col("l_discount").between(0.0, 0.05),
        "ship_in_range": F.col("l_shipdate") < F.lit("1998-06-01").cast("timestamp"),
        "key_not_null": F.col("l_orderkey").isNotNull(),
    }


@register(
    "q77_expectations",
    f"""
    WITH wide AS (SELECT {_RULES_SQL} FROM lineitem)
    SELECT rule, violations, total AS total_rows,
           -- scale-first round (q208 recipe): decimal-reachable ties
           ROUND(1000000 * (CAST(violations AS DOUBLE) / total))
               / 1000000.0 AS violation_rate
    FROM wide, LATERAL (VALUES
        ('qty_le_30', qty_le_30), ('disc_range', disc_range),
        ('ship_in_range', ship_in_range),
        ('key_not_null', key_not_null)) AS v(rule, violations)
    """,
    doc="Data-quality expectations: N named rules checked in ONE scan "
    "(conditional-sum aggregate, map-side partials, no extra shuffle "
    "per rule); emits per-rule violation counts and rates. NULL "
    "predicate results fail closed.",
)
def q77_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return expectation_report(load_table(spark, sf_dir, "lineitem"), _rules())


@register(
    "q78_quarantine",
    """
    SELECT failed, COUNT(*) AS n FROM (
        SELECT concat_ws(',',
            CASE WHEN NOT (l_quantity <= 30) THEN 'qty_le_30' END,
            CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.05)
                 THEN 'disc_range' END,
            CASE WHEN NOT (l_shipdate < TIMESTAMP '1998-06-01')
                 THEN 'ship_in_range' END,
            CASE WHEN l_orderkey IS NULL THEN 'key_not_null' END) AS failed
        FROM lineitem
    ) WHERE failed != '' GROUP BY failed
    """,
    doc="Quarantine routing: bad rows carry the list of failed rules "
    "(dead-letter pattern — route, don't fail the pipeline); the gate "
    "aggregates quarantined rows by failure signature. Good and bad "
    "splits derive from one projection.",
)
def q78_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, bad = quarantine(load_table(spark, sf_dir, "lineitem"), _rules())
    return bad.groupBy(
        F.concat_ws(",", "_failed_rules").alias("failed")
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "q105_outlier_zscore",
    """
    WITH stats AS (
        -- exact integer moments (q212 recipe): int64 cent sum +
        -- HUGEINT square-sum are order-free, so mu/sigma/z are
        -- bit-identical across engines; float AVG/STDDEV drift by
        -- summation order and a z near a .00005 midpoint flips
        SELECT o_orderstatus,
               COUNT(*) AS cnt,
               SUM(CAST(ROUND(100 * o_totalprice) AS BIGINT)) AS sc,
               SUM(CAST(CAST(ROUND(100 * o_totalprice) AS BIGINT)
                        AS HUGEINT)
                   * CAST(ROUND(100 * o_totalprice) AS BIGINT)) AS sc2
        FROM orders GROUP BY o_orderstatus
    ),
    m AS (
        SELECT o_orderstatus,
               CAST(sc AS DOUBLE) / (100.0 * cnt) AS mu,
               SQRT(CAST(cnt * sc2 - CAST(sc AS HUGEINT) * sc AS DOUBLE)
                    / (CAST(cnt AS DOUBLE) * (cnt - 1) * 10000))
                   AS sigma
        FROM stats
    ),
    z AS (
        -- scale-first round (q208 recipe)
        SELECT o.o_orderstatus,
               ROUND(10000 * ((o.o_totalprice - m.mu) / m.sigma))
                   / 10000.0 AS zr
        FROM orders o JOIN m USING (o_orderstatus)
    )
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN ABS(zr) > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
           MAX(ABS(zr)) AS max_abs_z
    FROM z
    GROUP BY o_orderstatus
    """,
    doc="Statistical outlier detection: per-group z-score against "
    "mergeable one-pass moments (count/mean/stddev), group stats "
    "broadcast back — the big side is scanned once, never shuffled. "
    "The statistical sibling of the rule-based expectations (q77).",
)
def q105_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.operators.quality import outlier_zscore

    o = load_table(spark, sf_dir, "orders")
    # quantum=0.01 -> exact integer moments; see the oracle comment
    flagged = outlier_zscore(
        o, "o_totalprice", ["o_orderstatus"], 3.0, quantum=0.01
    )
    return flagged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_outlier").cast("int")).cast("bigint").alias("n_outliers"),
        # z is already on the 1e-4 lattice; the max needs no re-round
        F.max(F.abs("z")).alias("max_abs_z"),
    )
