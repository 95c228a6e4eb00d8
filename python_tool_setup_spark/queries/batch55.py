"""Round-4 gates, batch 55: CUPED variance-reduced experiment
readout (q315 — the pre-period covariate adjustment every mature
experimentation stack applies before q293's t-test) and exact
weighted median per group (q316 — the order statistic where every
row votes with its weight).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.queries.exactcast import dd_duck
from python_tool_setup_spark.tables import load_table

_MID_TS = "2024-01-16 00:00:00"


# ---------------------------------------------------------------- q315
@register(
    "q315_cuped_adjustment",
    f"""
    WITH per_user AS (
        SELECT user_id,
               SUM(CASE WHEN ts < TIMESTAMP '{_MID_TS}'
                   THEN 1 ELSE 0 END) AS x,
               SUM(CASE WHEN ts >= TIMESTAMP '{_MID_TS}'
                   THEN 1 ELSE 0 END) AS y,
               user_id % 2 = 0 AS arm_a
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy,
               SUM(CASE WHEN arm_a THEN 1 ELSE 0 END) AS na,
               SUM(CASE WHEN arm_a THEN y ELSE 0 END) AS sya,
               SUM(CASE WHEN arm_a THEN x ELSE 0 END) AS sxa,
               SUM(CASE WHEN arm_a THEN 0 ELSE 1 END) AS nb,
               SUM(CASE WHEN arm_a THEN 0 ELSE y END) AS syb,
               SUM(CASE WHEN arm_a THEN 0 ELSE x END) AS sxb
        FROM per_user
    ),
    d AS (
        SELECT CAST(n AS DOUBLE) AS n, CAST(sx AS DOUBLE) AS sx,
               CAST(sy AS DOUBLE) AS sy, {dd_duck('sxy')} AS sxy,
               {dd_duck('sxx')} AS sxx, {dd_duck('syy')} AS syy,
               CAST(na AS DOUBLE) AS na, CAST(sya AS DOUBLE) AS sya,
               CAST(sxa AS DOUBLE) AS sxa, CAST(nb AS DOUBLE) AS nb,
               CAST(syb AS DOUBLE) AS syb, CAST(sxb AS DOUBLE) AS sxb
        FROM s
    ),
    t AS (
        SELECT *,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta
        FROM d
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(ROUND(theta * 1000000.0) AS BIGINT) AS theta_micro,
           CAST(ROUND((sya / na - syb / nb) * 1000000.0) AS BIGINT)
               AS raw_diff_micro,
           CAST(ROUND(((sya / na - theta * (sxa / na - sx / n))
               - (syb / nb - theta * (sxb / nb - sx / n)))
               * 1000000.0) AS BIGINT) AS adj_diff_micro,
           CAST(ROUND((1.0 - ((n * sxy - sx * sy) * (n * sxy - sx * sy))
               / ((n * sxx - sx * sx) * (n * syy - sy * sy)))
               * 1000000.0) AS BIGINT) AS var_ratio_micro
    FROM t
    """,
    doc="CUPED variance reduction for experiments (Deng et al.'s "
    "pre-period covariate adjustment — the standard trick that "
    "shrinks A/B confidence intervals by regressing out what "
    "users already did BEFORE the experiment; feeds q293's "
    "t-test): per-user pre-period (x) and in-period (y) activity "
    "counts, theta = cov(x,y)/var(x) from one-pass exact integer "
    "moment sums (HUGEINT/DECIMAL products), arm means adjusted "
    "as y - theta*(x - mean(x)), plus the achieved variance "
    "ratio 1 - corr^2 — all derived in identical "
    "correctly-rounded double association and micro-quantized. "
    "Scale: one groupBy on user + a 1-row conditional-moment "
    "reduce; the adjustment itself never materializes per-user "
    "adjusted values.",
)
def q315_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mid = F.to_timestamp(F.lit(_MID_TS))
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < mid, 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("ts") >= mid, 1).otherwise(0)).alias("y"),
    ).withColumn("arm_a", F.col("user_id") % 2 == 0)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec(F.col("x")) * F.col("y")).alias("sxy"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("sxx"),
        F.sum(dec(F.col("y")) * F.col("y")).alias("syy"),
        F.sum(F.when(F.col("arm_a"), 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("arm_a"), F.col("y")).otherwise(0)).alias("sya"),
        F.sum(F.when(F.col("arm_a"), F.col("x")).otherwise(0)).alias("sxa"),
        F.sum(F.when(F.col("arm_a"), 0).otherwise(1)).alias("nb"),
        F.sum(F.when(F.col("arm_a"), 0).otherwise(F.col("y"))).alias("syb"),
        F.sum(F.when(F.col("arm_a"), 0).otherwise(F.col("x"))).alias("sxb"),
    )
    cols = ["n", "sx", "sy", "sxy", "sxx", "syy", "na", "sya", "sxa", "nb", "syb", "sxb"]
    d = s.select(*[F.col(c).cast("double").alias(c) for c in cols])
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    na, sya, sxa = F.col("na"), F.col("sya"), F.col("sxa")
    nb, syb, sxb = F.col("nb"), F.col("syb"), F.col("sxb")
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    t = d.withColumn("theta", theta)
    th = F.col("theta")
    return t.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(th * 1000000.0).cast("long").alias("theta_micro"),
        F.round((sya / na - syb / nb) * 1000000.0)
        .cast("long")
        .alias("raw_diff_micro"),
        F.round(
            (
                (sya / na - th * (sxa / na - sx / n))
                - (syb / nb - th * (sxb / nb - sx / n))
            )
            * 1000000.0
        )
        .cast("long")
        .alias("adj_diff_micro"),
        F.round(
            (
                F.lit(1.0)
                - ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                / ((n * sxx - sx * sx) * (n * syy - sy * sy))
            )
            * 1000000.0
        )
        .cast("long")
        .alias("var_ratio_micro"),
    )


# ---------------------------------------------------------------- q316
@register(
    "q316_weighted_median",
    """
    WITH vals AS (
        SELECT l_returnflag AS g,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
               CAST(l_quantity AS BIGINT) AS w
        FROM lineitem
    ),
    grouped AS (
        SELECT g, v, SUM(w) AS w FROM vals GROUP BY g, v
    ),
    cum AS (
        SELECT g, v, w,
               SUM(w) OVER (PARTITION BY g ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(w) OVER (PARTITION BY g) AS tw
        FROM grouped
    )
    SELECT g AS l_returnflag,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN v END) AS BIGINT)
               AS wmedian_cents,
           CAST(MAX(tw) AS BIGINT) AS total_weight
    FROM cum GROUP BY g ORDER BY g
    """,
    doc="Exact weighted median per group (every row votes with its "
    "weight — the robust center for 'median price weighted by "
    "quantity', where the plain median (q47) over-counts "
    "single-unit lines): lower weighted median = smallest value "
    "whose cumulative weight reaches half the total. Values "
    "quantize to integer cents and weights are integers, so the "
    "2*cw >= tw crossing test is EXACT integer arithmetic — no "
    "FP at all. Plan: collapse to (group, value) with summed "
    "weights first (bounds the window input to distinct values "
    "per group), then one cumulative window partitioned by group "
    "and a MIN-over-crossing aggregate — same "
    "distinct-value-histogram discipline as q302's AUC, no "
    "global sort, no percentile UDF.",
)
def q316_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.select(
        F.col("l_returnflag").alias("g"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    grouped = vals.groupBy("g", "v").agg(F.sum("w").alias("w"))
    wcum = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("g")
    cum = grouped.select(
        "g",
        "v",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wall).alias("tw"),
    )
    return (
        cum.groupBy(F.col("g").alias("l_returnflag"))
        .agg(
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("v")))
            .cast("long")
            .alias("wmedian_cents"),
            F.max("tw").cast("long").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )
