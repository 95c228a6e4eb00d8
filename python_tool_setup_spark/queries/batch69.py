"""Round-4 gates, batch 69: Mantel-Haenszel stratified odds ratio
(q342 — the Simpson's-paradox-safe pooled effect estimate, the
epidemiology-grade companion to q335's mix-shift decomposition) and
exact Shapley-value channel attribution (q343 — the game-theoretic
upgrade of q255's linear multi-touch credit).
"""

from __future__ import annotations

from itertools import combinations
from math import factorial

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.staging import local_rows_df
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q342
@register(
    "q342_mantel_haenszel",
    """
    WITH labeled AS (
        SELECT c.c_mktsegment AS stratum,
               CASE WHEN o.o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS e,
               CASE WHEN o.o_orderpriority = '1-URGENT'
                    THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cells AS (
        SELECT stratum,
               SUM(CASE WHEN e = 1 AND y = 1 THEN 1 ELSE 0 END) AS a,
               SUM(CASE WHEN e = 1 AND y = 0 THEN 1 ELSE 0 END) AS b,
               SUM(CASE WHEN e = 0 AND y = 1 THEN 1 ELSE 0 END) AS c,
               SUM(CASE WHEN e = 0 AND y = 0 THEN 1 ELSE 0 END) AS d,
               COUNT(*) AS n
        FROM labeled GROUP BY stratum
    ),
    terms AS (
        SELECT CAST(ROUND(CAST(a * d AS DOUBLE) / CAST(n AS DOUBLE)
                   * 1000000000.0) AS BIGINT) AS ad_nano,
               CAST(ROUND(CAST(b * c AS DOUBLE) / CAST(n AS DOUBLE)
                   * 1000000000.0) AS BIGINT) AS bc_nano,
               a, b, c, d
        FROM cells
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(ROUND(CAST(SUM(a) * SUM(d) AS DOUBLE)
               / CAST(SUM(b) * SUM(c) AS DOUBLE) * 1000000.0) AS BIGINT)
               AS crude_or_micro,
           CAST(ROUND(CAST(SUM(ad_nano) AS DOUBLE)
               / CAST(SUM(bc_nano) AS DOUBLE) * 1000000.0) AS BIGINT)
               AS mh_or_micro
    FROM terms
    """,
    doc="Mantel-Haenszel pooled odds ratio across strata (the "
    "Simpson's-paradox-safe effect estimate — q335 DECOMPOSES a "
    "rate change into mix vs within effects; MH POOLS a 2x2 "
    "effect across confounding strata the way epidemiology and "
    "trust-and-safety teams do): per-segment 2x2 cells (arm x "
    "urgent-outcome) as exact integers from one conditional-sum "
    "scan over the broadcast-joined dimension, the crude "
    "(confounded) OR alongside OR_MH = sum(a_i d_i/n_i) / "
    "sum(b_i c_i/n_i) with each stratum term nano-quantized "
    "before the integer sums (one division per stratum, one at "
    "the end). Scale: one scan + a |strata|-row reduce.",
)
def q342_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    e = F.when(F.col("o_orderkey") % 2 == 0, 1).otherwise(0)
    y = F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
    labeled = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("stratum"), e.alias("e"), y.alias("y")
    )
    cells = labeled.groupBy("stratum").agg(
        F.sum(F.when((F.col("e") == 1) & (F.col("y") == 1), 1).otherwise(0)).alias("a"),
        F.sum(F.when((F.col("e") == 1) & (F.col("y") == 0), 1).otherwise(0)).alias("b"),
        F.sum(F.when((F.col("e") == 0) & (F.col("y") == 1), 1).otherwise(0)).alias("c"),
        F.sum(F.when((F.col("e") == 0) & (F.col("y") == 0), 1).otherwise(0)).alias("d"),
        F.count(F.lit(1)).alias("n"),
    )
    terms = cells.select(
        "a",
        "b",
        "c",
        "d",
        F.round(
            (F.col("a") * F.col("d")).cast("double")
            / F.col("n").cast("double")
            * 1000000000.0
        )
        .cast("long")
        .alias("ad_nano"),
        F.round(
            (F.col("b") * F.col("c")).cast("double")
            / F.col("n").cast("double")
            * 1000000000.0
        )
        .cast("long")
        .alias("bc_nano"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.round(
            (F.sum("a") * F.sum("d")).cast("double")
            / (F.sum("b") * F.sum("c")).cast("double")
            * 1000000.0
        )
        .cast("long")
        .alias("crude_or_micro"),
        F.round(
            F.sum("ad_nano").cast("double")
            / F.sum("bc_nano").cast("double")
            * 1000000.0
        )
        .cast("long")
        .alias("mh_or_micro"),
    )


# ---------------------------------------------------------------- q343
_CHANNELS = ["click", "error", "signup", "view"]


def _subset_rows():
    """(channel, S_key, S_with_channel_key, weight*24) for every
    channel i and every subset S of the other channels; weights
    |S|!(n-1-|S|)!/n! with n=4, scaled by 24 to integers."""
    rows = []
    n = len(_CHANNELS)
    for ch in _CHANNELS:
        others = [c for c in _CHANNELS if c != ch]
        for k in range(len(others) + 1):
            for S in combinations(others, k):
                w24 = factorial(k) * factorial(n - 1 - k)
                s_key = ",".join(sorted(S))
                si_key = ",".join(sorted(S + (ch,)))
                rows.append((ch, s_key, si_key, w24))
    return rows


def _subset_values_sql() -> str:
    return ", ".join(
        f"('{ch}', '{s}', '{si}', {w})" for ch, s, si, w in _subset_rows()
    )


@register(
    "q343_shapley_attribution",
    f"""
    WITH fp AS (
        SELECT user_id, MIN(ts) AS p_ts FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touches AS (
        SELECT e.user_id, e.event_type
        FROM events e LEFT JOIN fp ON e.user_id = fp.user_id
        WHERE e.event_type <> 'purchase'
          AND (fp.p_ts IS NULL OR e.ts < fp.p_ts)
        GROUP BY e.user_id, e.event_type
    ),
    journeys AS (
        SELECT u.user_id,
               COALESCE(string_agg(t.event_type, ','
                   ORDER BY t.event_type), '') AS s_key,
               CASE WHEN fp.user_id IS NOT NULL THEN 1 ELSE 0 END AS conv
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN touches t ON t.user_id = u.user_id
        LEFT JOIN fp ON fp.user_id = u.user_id
        GROUP BY u.user_id, fp.user_id
    ),
    v AS (
        SELECT s_key,
               CAST(ROUND(CAST(SUM(conv) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) * 1000000000.0) AS BIGINT)
                   AS v_nano
        FROM journeys GROUP BY s_key
    ),
    grid(channel, s_key, si_key, w24) AS (
        VALUES {_subset_values_sql()}
    )
    SELECT g.channel,
           CAST(SUM(g.w24 * (COALESCE(vi.v_nano, 0)
               - COALESCE(vs.v_nano, 0))) AS BIGINT) AS phi24_nano,
           CAST(ROUND(CAST(SUM(g.w24 * (COALESCE(vi.v_nano, 0)
               - COALESCE(vs.v_nano, 0))) AS DOUBLE) / 24.0 / 1000.0)
               AS BIGINT) AS phi_micro
    FROM grid g
    LEFT JOIN v vs ON vs.s_key = g.s_key
    LEFT JOIN v vi ON vi.s_key = g.si_key
    GROUP BY g.channel ORDER BY g.channel
    """,
    doc="Exact Shapley-value channel attribution (the game-theoretic "
    "credit split q255's linear model approximates — each "
    "channel's marginal contribution averaged over all orderings, "
    "the standard data-driven attribution in marketing "
    "platforms): a user's coalition is the SET of non-purchase "
    "channels touched before their first purchase, v(S) is the "
    "conversion rate of users with exactly that touch-set "
    "(unobserved coalitions contribute 0 — the standard "
    "practical simplification, identical on both engines), and "
    "phi_i = sum over S of |S|!(n-1-|S|)!/n! * (v(S+i) - v(S)) "
    "runs ENTIRELY in integers: v quantized to nano, the 4!-"
    "scaled weights {{6,2,2,6}} exact, one division at the end. "
    "Efficiency (sum phi = v(full) - v(empty)) is asserted by "
    "the unit test. Scale: journeys are one user groupBy; the "
    "Shapley grid is 32 metadata rows joined to the |observed "
    "coalitions| table — constant work beyond the scan.",
)
def q343_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    touches = (
        ev.filter(F.col("event_type") != "purchase")
        .join(fp, "user_id", "left")
        .filter(F.col("p_ts").isNull() | (F.col("ts") < F.col("p_ts")))
        .select("user_id", "event_type")
        .distinct()
    )
    users = ev.select("user_id").distinct()
    journeys = (
        users.join(touches, "user_id", "left")
        .join(fp.select("user_id", F.lit(1).alias("conv")), "user_id", "left")
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.concat_ws(
                    ",", F.array_sort(F.collect_list("event_type"))
                ),
                F.lit(""),
            ).alias("s_key"),
            F.coalesce(F.max("conv"), F.lit(0)).alias("conv"),
        )
    )
    # Pin the ≤|subsets|-row coalition-value table: it is broadcast
    # TWICE below (v_s and v_si), and unpinned each broadcast re-ran
    # the whole journeys pipeline (3 events scans each — 8 scans in
    # the r10-before plan).
    v = pin(
        journeys.groupBy("s_key").agg(
            F.round(
                F.sum("conv").cast("double")
                / F.count(F.lit(1)).cast("double")
                * 1000000000.0
            )
            .cast("long")
            .alias("v_nano")
        )
    )
    grid = local_rows_df(
        spark,
        _subset_rows(),
        "channel string, s_key string, si_key string, w24 bigint",
    )
    vs = v.select(F.col("s_key"), F.col("v_nano").alias("v_s"))
    vi = v.select(F.col("s_key").alias("si_key"), F.col("v_nano").alias("v_si"))
    j = (
        grid.join(F.broadcast(vs), "s_key", "left")
        .join(F.broadcast(vi), "si_key", "left")
        .select(
            "channel",
            (
                F.col("w24")
                * (
                    F.coalesce(F.col("v_si"), F.lit(0))
                    - F.coalesce(F.col("v_s"), F.lit(0))
                )
            ).alias("term"),
        )
    )
    return (
        j.groupBy("channel")
        .agg(
            F.sum("term").cast("long").alias("phi24_nano"),
            F.round(F.sum("term").cast("double") / 24.0 / 1000.0)
            .cast("long")
            .alias("phi_micro"),
        )
        .orderBy("channel")
    )
