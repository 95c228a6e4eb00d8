"""Round-4 gates, batch 63: time-window-constrained funnel (q331 —
the Amplitude-style cascade q93's unconstrained funnel can't
express) and a universe-sampling join-cardinality estimator (q332 —
the optimizer-style pre-flight estimate, derandomized so the gate
pins BOTH the estimate and its error against the exact count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_WINDOW_S = 1800


# ---------------------------------------------------------------- q331
@register(
    "q331_windowed_funnel",
    f"""
    WITH v1 AS (
        SELECT user_id, MIN(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c1 AS (
        SELECT e.user_id, MIN(e.ts) AS c_ts
        FROM events e JOIN v1 ON e.user_id = v1.user_id
        WHERE e.event_type = 'click' AND e.ts > v1.v_ts
          AND date_diff('second', v1.v_ts, e.ts) <= {_WINDOW_S}
        GROUP BY e.user_id
    ),
    p1 AS (
        SELECT e.user_id, MIN(e.ts) AS p_ts
        FROM events e JOIN c1 ON e.user_id = c1.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c1.c_ts
          AND date_diff('second', c1.c_ts, e.ts) <= {_WINDOW_S}
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT)
               AS n_users,
           CAST((SELECT COUNT(*) FROM v1) AS BIGINT) AS step_view,
           CAST((SELECT COUNT(*) FROM c1) AS BIGINT) AS step_click_30m,
           CAST((SELECT COUNT(*) FROM p1) AS BIGINT) AS step_purchase_30m
    """,
    doc="Time-window-constrained cascade funnel (view -> click "
    "within 30 min -> purchase within 30 min of the click — the "
    "product-analytics funnel with per-step conversion windows "
    "that q93's unconstrained version can't express): first-touch "
    "semantics at every step (the anchor is each user's FIRST "
    "view, then the first qualifying click after it, then the "
    "first qualifying purchase — the deterministic greedy "
    "cascade Amplitude-style tools compute; a user with a later "
    "view that would have converted doesn't count, and that's "
    "pinned by the oracle). Each step is a min-aggregate semi-"
    "join on the user key — three user-key shuffles, scalars "
    "out. Timestamps compare in integer seconds on both engines.",
)
def q331_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def first_after(prev: DataFrame, prev_ts: str, etype: str, out: str) -> DataFrame:
        j = e.filter(F.col("event_type") == etype).join(prev, "user_id")
        return (
            j.filter(
                (F.col("ts") > F.col(prev_ts))
                & (
                    F.col("ts").cast("long") - F.col(prev_ts).cast("long")
                    <= _WINDOW_S
                )
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(out))
        )

    # Pin the two fan-out funnel stages (each O(users), narrow): v1
    # feeds both the click join and its own count, c1 both the
    # purchase join and its count — unpinned every count re-ran the
    # whole upstream chain (7 events scans in the r10-before plan).
    v1 = pin(
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c1 = pin(first_after(v1, "v_ts", "click", "c_ts"))
    p1 = first_after(c1, "c_ts", "purchase", "p_ts")
    n_users = e.agg(F.countDistinct("user_id").alias("n_users"))
    nv = v1.agg(F.count(F.lit(1)).alias("step_view"))
    nc = c1.agg(F.count(F.lit(1)).alias("step_click_30m"))
    np_ = p1.agg(F.count(F.lit(1)).alias("step_purchase_30m"))
    return (
        n_users.crossJoin(F.broadcast(nv))  # 1-row scalar attaches
        .crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            F.col("n_users").cast("long").alias("n_users"),
            F.col("step_view").cast("long").alias("step_view"),
            F.col("step_click_30m").cast("long").alias("step_click_30m"),
            F.col("step_purchase_30m").cast("long").alias("step_purchase_30m"),
        )
    )


# ---------------------------------------------------------------- q332
_SAMPLE_MOD = 16


@register(
    "q332_join_cardinality_estimate",
    f"""
    WITH exact AS (
        SELECT COUNT(*) AS n FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    sl AS (
        SELECT * FROM lineitem
        WHERE CAST(('0x' || substr(md5('univ|' ||
              CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
              % {_SAMPLE_MOD} = 0
    ),
    so AS (
        SELECT * FROM orders
        WHERE CAST(('0x' || substr(md5('univ|' ||
              CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
              % {_SAMPLE_MOD} = 0
    ),
    est AS (
        SELECT COUNT(*) * {_SAMPLE_MOD} AS n FROM sl
        JOIN so ON sl.l_orderkey = so.o_orderkey
    )
    SELECT CAST((SELECT n FROM exact) AS BIGINT) AS exact_rows,
           CAST((SELECT n FROM est) AS BIGINT) AS estimated_rows,
           CAST(ROUND(abs(CAST((SELECT n FROM est) AS DOUBLE)
               - CAST((SELECT n FROM exact) AS DOUBLE))
               / CAST((SELECT n FROM exact) AS DOUBLE)
               * 1000000.0) AS BIGINT) AS rel_err_micro
    FROM exact
    """,
    doc="Join-cardinality estimation by UNIVERSE (correlated key) "
    "sampling — the optimizer-style pre-flight answer to 'how big "
    "will this join be?' without running it: hash the JOIN KEY "
    "with the same md5 on BOTH sides and keep keys in the same "
    "1/16 universe slice, so sampled tuples that would join still "
    "meet (independent Bernoulli row-sampling would keep only "
    "1/256 of joining pairs and square the variance — the classic "
    "result universe sampling fixes); estimate = sampled join "
    "count x 16. The gate runs the real join too and pins the "
    "relative error, so the estimator's accuracy on this "
    "key-distribution is itself value-checked. Derandomized via "
    "the md5 convention — both engines slice the identical "
    "universe. Scale: the sampled join touches 1/16 of each side "
    "with the same plan shape as the real one.",
)
def q332_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def in_universe(col: str) -> F.Column:
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit("univ|"), F.col(col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        return h % _SAMPLE_MOD == 0

    exact = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .agg(F.count(F.lit(1)).alias("exact_rows"))
    )
    est = (
        li.filter(in_universe("l_orderkey"))
        .join(
            o.filter(in_universe("o_orderkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .agg((F.count(F.lit(1)) * _SAMPLE_MOD).alias("estimated_rows"))
    )
    out = exact.crossJoin(F.broadcast(est))  # 1-row scalar attach
    return out.select(
        F.col("exact_rows").cast("long").alias("exact_rows"),
        F.col("estimated_rows").cast("long").alias("estimated_rows"),
        F.round(
            F.abs(
                F.col("estimated_rows").cast("double")
                - F.col("exact_rows").cast("double")
            )
            / F.col("exact_rows").cast("double")
            * 1000000.0
        )
        .cast("long")
        .alias("rel_err_micro"),
    )
