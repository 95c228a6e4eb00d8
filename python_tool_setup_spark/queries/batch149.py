"""Round-5 gates, batch 149: market-basket affinity (q509 — the
association-rule staple: for brand pairs co-occurring in one
order, support, confidence and LIFT = P(A,B)/(P(A)P(B)); lift > 1
is the cross-sell signal, and the whole rule table reduces to one
distinct-pair self-join on the basket key plus broadcast margins)
and price elasticity of demand (q510 — log-log OLS of quantity on
effective price across the discount ladder: elasticity = d ln Q /
d ln P, THE pricing number; the regression runs on the 11-point
discount domain with every moment micro-quantized from exact
integers, so a full OLS costs one groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.queries.exactcast import dd_duck, dd_spark
from python_tool_setup_spark.tables import load_table

_BASKET_TOP = 15
_MIN_PAIR_SUPPORT = 20


@register(
    "q509_market_basket_lift",
    f"""
    WITH items AS (
        SELECT DISTINCT l.l_orderkey AS k, p.p_brand AS b
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n_orders AS (SELECT COUNT(DISTINCT k) AS n FROM items),
    margin AS (SELECT b, COUNT(*) AS c FROM items GROUP BY b),
    pairs AS (
        SELECT a.b AS brand_a, c.b AS brand_b, COUNT(*) AS both_c
        FROM items a JOIN items c ON a.k = c.k AND a.b < c.b
        GROUP BY a.b, c.b
    )
    SELECT brand_a, brand_b,
           CAST(both_c AS BIGINT) AS n_both,
           CAST(ROUND(both_c * 1000000.0 / t.n) AS BIGINT)
               AS support_ppm,
           CAST(ROUND(both_c * 1000000.0 / ma.c) AS BIGINT)
               AS confidence_a_to_b_ppm,
           CAST(ROUND(CAST(both_c AS DOUBLE) * t.n * 1000000
               / (CAST(ma.c AS DOUBLE) * mb.c)) AS BIGINT)
               AS lift_micro,
           CAST(both_c AS DOUBLE) * t.n
               > CAST(ma.c AS DOUBLE) * mb.c AS positive_affinity
    FROM pairs
    JOIN margin ma ON ma.b = brand_a
    JOIN margin mb ON mb.b = brand_b
    CROSS JOIN n_orders t
    WHERE both_c >= {_MIN_PAIR_SUPPORT}
    ORDER BY lift_micro DESC, brand_a, brand_b
    LIMIT {_BASKET_TOP}
    """,
    doc="Market-basket affinity (association rules over orders: for "
    "brand pairs co-occurring in a basket, support, confidence "
    "and lift = P(A,B)/(P(A)P(B)) — lift > 1 is the cross-sell "
    "signal): distinct (order, brand) items from one join+dedup, "
    "pair counts from a self-equi-join ON THE BASKET KEY (never "
    "a cartesian — each order contributes only its own pairs, "
    "and the brand domain bounds the fanout), margins and the "
    "order total broadcast back, lift micro-quantized from exact "
    "integers with the affinity verdict cross-multiplied. Top-15 "
    "rules by lift with a minimum-support floor (the standard "
    "noise gate). Scale: one shuffle on the basket key; pair "
    "state per order is |distinct brands in order| choose 2.",
)
def q509_market_basket_lift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # Pin the (order, brand) item set once: it feeds four consumers
    # (the order count, the per-brand margin, and BOTH sides of the
    # pair self-join), and without the pin each consumer re-runs the
    # join + distinct shuffle (10 parquet scans in the r10-before
    # plan). It is the algorithm's working set at any scale.
    items = pin(
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("b"))
        .distinct()
    )
    n_orders = items.agg(F.countDistinct("k").alias("n"))
    margin = items.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    a = items.select(F.col("k"), F.col("b").alias("brand_a"))
    c = items.select(F.col("k").alias("k2"), F.col("b").alias("brand_b"))
    pairs = (
        a.join(c, (a.k == c.k2) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("both_c"))
        .filter(F.col("both_c") >= _MIN_PAIR_SUPPORT)
    )
    ma = margin.select(
        F.col("b").alias("brand_a"), F.col("c").alias("ca")
    )
    mb = margin.select(
        F.col("b").alias("brand_b"), F.col("c").alias("cb")
    )
    lift = F.round(
        F.col("both_c").cast("double")
        * F.col("n")
        * 1000000
        / (F.col("ca").cast("double") * F.col("cb"))
    )
    return (
        pairs.join(F.broadcast(ma), "brand_a")
        .join(F.broadcast(mb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            F.col("both_c").cast("long").alias("n_both"),
            F.round(F.col("both_c") * 1000000.0 / F.col("n"))
            .cast("long")
            .alias("support_ppm"),
            F.round(F.col("both_c") * 1000000.0 / F.col("ca"))
            .cast("long")
            .alias("confidence_a_to_b_ppm"),
            lift.cast("long").alias("lift_micro"),
            (
                F.col("both_c").cast("double") * F.col("n")
                > F.col("ca").cast("double") * F.col("cb")
            ).alias("positive_affinity"),
        )
        .orderBy(
            F.col("lift_micro").desc(), "brand_a", "brand_b"
        )
        .limit(_BASKET_TOP)
    )


# ---------------------------------------------------------------- q510
# log quantities nano-quantized per discount bucket from exact
# integers; OLS over the 11-point discount ladder.
_LN_Q_EXPR = "CAST(ROUND(LN(CAST(qty AS DOUBLE)) * 1000000000) AS BIGINT)"
_LN_P_EXPR = (
    "CAST(ROUND(LN(1.0 - disc_bp / 10000.0) * 1000000000) AS BIGINT)"
)
def _slope_micro_expr(dd) -> str:
    return (
        f"CAST(ROUND((CAST(n AS DOUBLE) * {dd('sxy')} - {dd('sx')} * {dd('sy')})"
        f" / (CAST(n AS DOUBLE) * {dd('sxx')} - {dd('sx')} * {dd('sx')})"
        " * 1000000) AS BIGINT)"
    )


@register(
    "q510_price_elasticity",
    f"""
    WITH bucket AS (
        SELECT CAST(ROUND(l_discount * 10000) AS BIGINT) AS disc_bp,
               SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS qty
        FROM lineitem GROUP BY 1
    ),
    pts AS (
        SELECT disc_bp, qty, {_LN_Q_EXPR} AS y, {_LN_P_EXPR} AS x
        FROM bucket WHERE disc_bp > 0
    ),
    s AS (
        SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(x AS HUGEINT) * y) AS sxy
        FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_price_points,
           {_slope_micro_expr(dd_duck)} AS elasticity_micro,
           {_slope_micro_expr(dd_duck)} < 0 AS demand_downward_sloping,
           ABS({_slope_micro_expr(dd_duck)}) > 1000000 AS elastic
    FROM s
    """,
    doc="Price elasticity of demand (log-log OLS of total quantity "
    "on effective price across the discount ladder: elasticity = "
    "d ln Q / d ln P — THE pricing number; |e| > 1 means revenue "
    "rises when price falls): per-discount-bucket quantity from "
    "one map-side-combined groupBy (the regression's row domain "
    "is the 11-point discount ladder, not the fact table), both "
    "logs nano-quantized from exact integers BEFORE the moment "
    "sums (FP-order-free, HUGEINT/DECIMAL(38) cross products), "
    "the OLS slope in one shared integer-input expression. "
    "Scale: one scan + ladder-domain metadata; a synthetic "
    "uniform fixture measures ~zero elasticity — the estimator, "
    "not the fixture, is what's gated.",
)
def q510_price_elasticity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bucket = li.groupBy(
        F.round(F.col("l_discount") * 10000)
        .cast("long")
        .alias("disc_bp")
    ).agg(
        F.sum(F.round("l_quantity").cast("long")).alias("qty")
    )
    pts = bucket.filter(F.col("disc_bp") > 0).select(
        "disc_bp",
        "qty",
        F.expr(_LN_Q_EXPR).alias("y"),
        F.expr(_LN_P_EXPR).alias("x"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias(
            "sxx"
        ),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias(
            "sxy"
        ),
    )
    return s.select(
        F.col("n").cast("long").alias("n_price_points"),
        F.expr(_slope_micro_expr(dd_spark)).alias("elasticity_micro"),
        (F.expr(_slope_micro_expr(dd_spark)) < 0).alias(
            "demand_downward_sloping"
        ),
        (F.abs(F.expr(_slope_micro_expr(dd_spark))) > 1000000).alias(
            "elastic"
        ),
    )
