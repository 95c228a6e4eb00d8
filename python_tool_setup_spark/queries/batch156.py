"""Round-5 gates, batch 156: join-order benefit estimator (q523 —
what a cost-based optimizer actually weighs: for the 3-table chain
lineitem-orders-customer, the EXACT intermediate cardinality of
each join order, computed from per-key count histograms (sum of
count products — the q483 trick) without materializing any join;
the recommended order minimizes the intermediate, and the benefit
ratio is the measured win a join reorder would deliver) and nested
percentiles (q524 — the SRE staple "p95 of per-user p95s": a plain
global p95 lets heavy users dominate, so aggregate latency per
user FIRST, then take percentiles over users; both levels run on
value-domain histograms — the q47 shape — so no per-group row
buffering at either level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.percentiles import (
    grouped_exact_percentiles,
)
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


@register(
    "q523_join_order_benefit",
    """
    WITH lo AS (
        -- |lineitem JOIN orders| = rows of lineitem (FK), exactly
        SELECT SUM(lc.c * oc.c) AS rows_out
        FROM (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem
              GROUP BY 1) lc
        JOIN (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders
              GROUP BY 1) oc ON lc.k = oc.k
    ),
    oc_ AS (
        SELECT SUM(oc.c * cc.c) AS rows_out
        FROM (SELECT o_custkey AS k, COUNT(*) AS c FROM orders
              GROUP BY 1) oc
        JOIN (SELECT c_custkey AS k, COUNT(*) AS c FROM customer
              GROUP BY 1) cc ON oc.k = cc.k
    ),
    final AS (
        -- both orders end at the same final cardinality
        SELECT SUM(lc.c * occ.c) AS rows_out
        FROM (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem
              GROUP BY 1) lc
        JOIN (SELECT o.o_orderkey AS k, COUNT(*) AS c
              FROM orders o JOIN customer c2
                ON c2.c_custkey = o.o_custkey
              GROUP BY 1) occ ON lc.k = occ.k
    ),
    plans AS (
        SELECT 'a_lineitem_orders_first' AS plan_order,
               (SELECT rows_out FROM lo) AS intermediate_rows,
               (SELECT rows_out FROM final) AS final_rows
        UNION ALL
        SELECT 'b_orders_customer_first',
               (SELECT rows_out FROM oc_),
               (SELECT rows_out FROM final)
    ),
    best AS (SELECT MIN(intermediate_rows) AS mn FROM plans)
    SELECT plan_order,
           CAST(intermediate_rows AS BIGINT) AS intermediate_rows,
           CAST(final_rows AS BIGINT) AS final_rows,
           intermediate_rows = b.mn AS recommended,
           CAST(ROUND(intermediate_rows * 1000000.0 / b.mn)
               AS BIGINT) AS cost_ratio_micro
    FROM plans CROSS JOIN best b
    ORDER BY plan_order
    """,
    doc="Join-order benefit estimator (what a CBO actually weighs: "
    "the intermediate cardinality of each join order for the "
    "lineitem-orders-customer chain, EXACT from per-key count "
    "histograms — sum of count products, the q483 device — so no "
    "candidate join is ever materialized; the recommended order "
    "minimizes the intermediate and cost_ratio is the measured "
    "win a reorder delivers): per-key histograms are map-side-"
    "combined groupBys, the product-sums are histogram joins, "
    "and the final cardinality (identical for both orders) is "
    "computed once. Scale: three histogram aggregates replace "
    "two candidate joins — the estimator costs less than either "
    "plan it prices.",
)
def q523_join_order_benefit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def hist(df, key):
        return df.groupBy(F.col(key).alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        )

    def prod(a, b):
        return a.join(
            b.select(F.col("k"), F.col("c").alias("c2")), "k"
        ).agg(
            F.sum(F.col("c") * F.col("c2")).alias("rows_out")
        )

    lo = prod(hist(li, "l_orderkey"), hist(o, "o_orderkey"))
    oc = prod(hist(o, "o_custkey"), hist(c, "c_custkey"))
    occ = (
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    final = prod(hist(li, "l_orderkey"), occ)
    pa = lo.crossJoin(F.broadcast(final.select(
        F.col("rows_out").alias("final_rows")
    ))).select(
        F.lit("a_lineitem_orders_first").alias("plan_order"),
        F.col("rows_out").alias("intermediate_rows"),
        "final_rows",
    )
    pb = oc.crossJoin(F.broadcast(final.select(
        F.col("rows_out").alias("final_rows")
    ))).select(
        F.lit("b_orders_customer_first").alias("plan_order"),
        F.col("rows_out").alias("intermediate_rows"),
        "final_rows",
    )
    plans = pa.unionByName(pb)
    best = plans.agg(F.min("intermediate_rows").alias("mn"))
    return (
        plans.crossJoin(F.broadcast(best))
        .select(
            "plan_order",
            F.col("intermediate_rows").cast("long").alias(
                "intermediate_rows"
            ),
            F.col("final_rows").cast("long").alias("final_rows"),
            (F.col("intermediate_rows") == F.col("mn")).alias(
                "recommended"
            ),
            F.round(
                F.col("intermediate_rows") * 1000000.0 / F.col("mn")
            )
            .cast("long")
            .alias("cost_ratio_micro"),
        )
        .orderBy("plan_order")
    )


# ---------------------------------------------------------------- q524
@register(
    "q524_nested_percentiles",
    """
    WITH per_user AS (
        SELECT user_id,
               CAST(ROUND(QUANTILE_CONT(value, 0.95) * 1000)
                   AS BIGINT) AS p95_milli,
               COUNT(*) AS n_ev
        FROM events GROUP BY user_id
    ),
    over_users AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(ROUND(QUANTILE_CONT(p95_milli, 0.5)) AS BIGINT)
                   AS p50_of_p95_milli,
               CAST(ROUND(QUANTILE_CONT(p95_milli, 0.95)) AS BIGINT)
                   AS p95_of_p95_milli
        FROM per_user
    ),
    global_p AS (
        SELECT CAST(ROUND(QUANTILE_CONT(value, 0.95) * 1000)
                   AS BIGINT) AS global_p95_milli
        FROM events
    )
    SELECT o.n_users, o.p50_of_p95_milli, o.p95_of_p95_milli,
           g.global_p95_milli,
           o.p95_of_p95_milli >= g.global_p95_milli
               AS heavy_users_hide_tail
    FROM over_users o CROSS JOIN global_p g
    """,
    doc="Nested percentiles (the SRE staple 'p95 of per-user p95s': "
    "a global p95 lets heavy users dominate the sample, so "
    "aggregate per user FIRST, then take percentiles over users; "
    "the gap between global p95 and p95-of-p95s is the measured "
    "heavy-user distortion): level 1 computes each user's exact "
    "p95 from their value histogram (quantile_cont semantics via "
    "the q47 histogram operator — per-task state is one user's "
    "distinct values), milli-quantized so level 2's input is "
    "integer; level 2 runs the same histogram machinery over the "
    "user domain. Scale: two histogram aggregations, no per-"
    "group row buffering at either level.",
)
def q524_nested_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    per_user = grouped_exact_percentiles(
        e.select("user_id", "value"), ["user_id"], "value",
        {"p95": 0.95},
    ).select(
        "user_id",
        F.round(F.col("p95") * 1000).cast("long").alias("p95_milli"),
    )
    over = grouped_exact_percentiles(
        per_user.withColumn("one", F.lit(1)),
        ["one"],
        "p95_milli",
        {"p50": 0.5, "p95": 0.95},
    ).select(
        F.col("n").cast("long").alias("n_users"),
        F.round("p50").cast("long").alias("p50_of_p95_milli"),
        F.round("p95").cast("long").alias("p95_of_p95_milli"),
    )
    gp = grouped_exact_percentiles(
        e.select(F.lit(1).alias("one"), "value"),
        ["one"],
        "value",
        {"p95": 0.95},
    ).select(
        F.round(F.col("p95") * 1000)
        .cast("long")
        .alias("global_p95_milli")
    )
    return over.crossJoin(F.broadcast(gp)).select(
        "n_users",
        "p50_of_p95_milli",
        "p95_of_p95_milli",
        "global_p95_milli",
        (
            F.col("p95_of_p95_milli") >= F.col("global_p95_milli")
        ).alias("heavy_users_hide_tail"),
    )
