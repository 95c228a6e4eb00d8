"""Round-5 gates, batch 163: McNemar's test (q537 — the paired
BINARY companion to q532: per customer, "ordered in 1996?" vs
"ordered in 1997?" are paired outcomes, and only the DISCORDANT
pairs carry information — chi2 = (b-c)^2/(b+c) with continuity
correction; the test behind "did the same population's behavior
flip?") and the Cochran-Armitage trend test (q538 — ordered-group
proportions deserve a TREND test, not k-1 pairwise comparisons:
linear scores over order years, z from exact integer sufficient
statistics — the dose-response statistic of epidemiology, applied
to urgent-order share drifting across years).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.queries.exactcast import dd_duck, dd_spark
from python_tool_setup_spark.tables import load_table

_MCN_Y1, _MCN_Y2 = 1996, 1997
# chi-square critical at df=1, alpha=0.05
_CHI2_1_MICRO = 3_841_459


@register(
    "q537_mcnemar_test",
    f"""
    WITH per_cust AS (
        SELECT c.c_custkey,
               MAX(CASE WHEN YEAR(o.o_orderdate) = {_MCN_Y1}
                   THEN 1 ELSE 0 END) AS y1,
               MAX(CASE WHEN YEAR(o.o_orderdate) = {_MCN_Y2}
                   THEN 1 ELSE 0 END) AS y2
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    ),
    cells AS (
        SELECT SUM(y1 * y2) AS both_y,
               SUM(y1 * (1 - y2)) AS b,
               SUM((1 - y1) * y2) AS c,
               SUM((1 - y1) * (1 - y2)) AS neither
        FROM per_cust
    )
    SELECT CAST(both_y AS BIGINT) AS n_both,
           CAST(b AS BIGINT) AS n_only_{_MCN_Y1},
           CAST(c AS BIGINT) AS n_only_{_MCN_Y2},
           CAST(neither AS BIGINT) AS n_neither,
           CAST(ROUND((ABS(b - c) - 1.0) * (ABS(b - c) - 1.0)
               / GREATEST(b + c, 1) * 1000000) AS BIGINT)
               AS chi2_micro,
           ROUND((ABS(b - c) - 1.0) * (ABS(b - c) - 1.0)
               / GREATEST(b + c, 1) * 1000000) > {_CHI2_1_MICRO}
               AS behavior_shifted
    FROM cells
    """,
    doc="McNemar's test (paired binary outcomes on the SAME "
    "population: per customer, ordered-in-1996 vs ordered-in-1997 "
    "flags; only discordant pairs carry information, chi2 = "
    "(|b-c|-1)^2/(b+c) with continuity correction — the 'did "
    "behavior flip?' test a two-proportion z gets wrong because "
    "the samples aren't independent): the 2x2 paired table comes "
    "from ONE customer-level aggregate of exact integer flags, "
    "the statistic from a shared integer-input expression. "
    "Scale: one left-join aggregate at any size; the test is "
    "4-cell metadata.",
)
def q537_mcnemar_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.max(
                F.when(
                    F.year("o_orderdate") == _MCN_Y1, 1
                ).otherwise(0)
            ).alias("y1"),
            F.max(
                F.when(
                    F.year("o_orderdate") == _MCN_Y2, 1
                ).otherwise(0)
            ).alias("y2"),
        )
    )
    cells = per_cust.agg(
        F.sum(F.col("y1") * F.col("y2")).alias("both_y"),
        F.sum(F.col("y1") * (1 - F.col("y2"))).alias("b"),
        F.sum((1 - F.col("y1")) * F.col("y2")).alias("c"),
        F.sum((1 - F.col("y1")) * (1 - F.col("y2"))).alias(
            "neither"
        ),
    )
    chi = F.round(
        (F.abs(F.col("b") - F.col("c")) - 1.0)
        * (F.abs(F.col("b") - F.col("c")) - 1.0)
        / F.greatest(F.col("b") + F.col("c"), F.lit(1))
        * 1000000
    )
    return cells.select(
        F.col("both_y").cast("long").alias("n_both"),
        F.col("b").cast("long").alias(f"n_only_{_MCN_Y1}"),
        F.col("c").cast("long").alias(f"n_only_{_MCN_Y2}"),
        F.col("neither").cast("long").alias("n_neither"),
        chi.cast("long").alias("chi2_micro"),
        (chi > _CHI2_1_MICRO).alias("behavior_shifted"),
    )


# ---------------------------------------------------------------- q538
# Cochran-Armitage trend z from exact integer sufficient stats:
# T = sum w_i (p_i - pbar) n_i = sum w_i r_i - pbar sum w_i n_i;
# Var = pbar(1-pbar) [sum w_i^2 n_i - (sum w_i n_i)^2 / n]
def _ca_z_expr(dd) -> str:
    return (
        f"ROUND(({dd('swr')} - CAST(r AS DOUBLE) / n * {dd('swn')})"
        " / SQRT((CAST(r AS DOUBLE) / n) * (1 - CAST(r AS DOUBLE) / n)"
        f"   * ({dd('sw2n')}"
        f"      - {dd('swn')} * {dd('swn')} / n)), 4)"
    )


@register(
    "q538_cochran_armitage_trend",
    f"""
    WITH base AS (
        SELECT YEAR(o_orderdate) - 1995 AS w,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    g AS (
        SELECT w, COUNT(*) AS nw, SUM(y) AS rw
        FROM base GROUP BY w
    ),
    s AS (
        SELECT SUM(nw) AS n, SUM(rw) AS r,
               SUM(CAST(w AS HUGEINT) * rw) AS swr,
               SUM(CAST(w AS HUGEINT) * nw) AS swn,
               SUM(CAST(w AS HUGEINT) * w * nw) AS sw2n
        FROM g
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           CAST(r AS BIGINT) AS n_urgent,
           CAST((SELECT COUNT(*) FROM g) AS BIGINT) AS n_year_groups,
           CAST({_ca_z_expr(dd_duck)} AS DOUBLE) AS z,
           ABS({_ca_z_expr(dd_duck)}) > 1.96 AS trend_present
    FROM s
    """,
    doc="Cochran-Armitage trend test (ordered-group proportions "
    "deserve ONE trend test, not k-1 pairwise z's: linear scores "
    "over order years, T = sum w(r - pbar n) against its "
    "null variance — the dose-response statistic, here asking "
    "whether urgent-order share drifts across years): the "
    "per-year 2-cell table comes from one conditional aggregate, "
    "all five sufficient statistics stay in exact HUGEINT/"
    "DECIMAL(38) integers, z through shared expression text. "
    "Priorities are date-independent in the fixture, so the "
    "trend must NOT be detected — the null calibration. Scale: "
    "one scan + year-domain metadata.",
)
def q538_cochran_armitage_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        (F.year("o_orderdate") - 1995).alias("w"),
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("long")
        .alias("y"),
    )
    g = base.groupBy("w").agg(
        F.count(F.lit(1)).alias("nw"), F.sum("y").alias("rw")
    )
    s = g.agg(
        F.sum("nw").alias("n"),
        F.sum("rw").alias("r"),
        F.sum(F.col("w").cast("decimal(38,0)") * F.col("rw")).alias(
            "swr"
        ),
        F.sum(F.col("w").cast("decimal(38,0)") * F.col("nw")).alias(
            "swn"
        ),
        F.sum(
            F.col("w").cast("decimal(38,0)")
            * F.col("w")
            * F.col("nw")
        ).alias("sw2n"),
    )
    ng = g.agg(F.count(F.lit(1)).alias("n_year_groups"))
    return s.crossJoin(F.broadcast(ng)).select(
        F.col("n").cast("long").alias("n_orders"),
        F.col("r").cast("long").alias("n_urgent"),
        F.col("n_year_groups").cast("long").alias("n_year_groups"),
        F.expr(_ca_z_expr(dd_spark)).cast("double").alias("z"),
        (F.abs(F.expr(_ca_z_expr(dd_spark))) > 1.96).alias("trend_present"),
    )
