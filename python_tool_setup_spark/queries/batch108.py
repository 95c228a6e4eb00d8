"""Round-5 gates, batch 108: Simpson's-paradox reversal detector
(q424 — priority pairs whose pooled return-rate ordering is
contradicted by the per-nation strata: q342's Mantel-Haenszel
ADJUSTS for confounding, this gate DETECTS where the naive pooled
comparison would reverse the verdict) and an anomaly-consensus
ensemble (q425 — daily volumes flagged by z-score, MAD, and
IQR-fence detectors with a >=2-votes consensus: the
false-positive-resistant monitor that no single detector family
gives you; every comparison cross-multiplied to exact integers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.percentiles import (
    grouped_exact_percentiles,
)
from python_tool_setup_spark.operators.blockrank import pin
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q424
@register(
    "q424_simpson_reversal_detector",
    """
    WITH cells AS (
        SELECT n.n_name, o.o_orderpriority AS pr,
               COUNT(*) AS n,
               SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name, o.o_orderpriority
    ),
    pooled AS (
        SELECT pr, SUM(n) AS n, SUM(r) AS r FROM cells GROUP BY pr
    ),
    pairs AS (
        SELECT a.pr AS pa, b.pr AS pb,
               a.r * b.n > b.r * a.n AS pooled_a_gt
        FROM pooled a JOIN pooled b ON a.pr < b.pr
    ),
    strata AS (
        SELECT a.pr AS pa, b.pr AS pb,
               SUM(CASE WHEN a.r * b.n > b.r * a.n
                        THEN 1 ELSE 0 END) AS a_gt,
               SUM(CASE WHEN b.r * a.n > a.r * b.n
                        THEN 1 ELSE 0 END) AS b_gt,
               COUNT(*) AS n_strata
        FROM cells a
        JOIN cells b ON b.n_name = a.n_name AND a.pr < b.pr
        GROUP BY a.pr, b.pr
    )
    SELECT s.pa, s.pb,
           CAST(s.n_strata AS BIGINT) AS n_strata,
           CAST(s.a_gt AS BIGINT) AS strata_a_gt,
           CAST(s.b_gt AS BIGINT) AS strata_b_gt,
           p.pooled_a_gt,
           (p.pooled_a_gt AND s.b_gt > s.a_gt)
               OR ((NOT p.pooled_a_gt) AND s.a_gt > s.b_gt) AS reversal
    FROM strata s JOIN pairs p ON p.pa = s.pa AND p.pb = s.pb
    ORDER BY s.pa, s.pb
    """,
    doc="Simpson's-paradox reversal detector over return rates "
    "(priority pairs where the POOLED rate ordering contradicts "
    "the MAJORITY of per-nation strata — the aggregation trap "
    "q342's Mantel-Haenszel quietly adjusts away, surfaced as "
    "an explicit audit so nobody ships the pooled number): "
    "per-(nation, priority) 2-cell counts, every rate "
    "comparison CROSS-MULTIPLIED (r1*n2 > r2*n1) so no division "
    "ever happens — the whole gate is exact integer arithmetic "
    "and the booleans cannot diverge between engines. Scale: "
    "one star-join aggregate; pairs/strata are |priorities|^2 x "
    "|nations| metadata.",
)
def q424_simpson_reversal_detector(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cells = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy(F.col("n_name"), F.col("o_orderpriority").alias("pr"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
                "r"
            ),
        )
    )
    # Pin the ≤(nations × priorities) contingency cells once: pooled,
    # ca and cb all re-reference them, and unpinned each re-ran the
    # lineitem-orders join (16 parquet scans in the r10-before plan).
    cells = pin(cells)
    pooled = cells.groupBy("pr").agg(F.sum("n").alias("n"), F.sum("r").alias("r"))
    pa = pooled.select(
        F.col("pr").alias("pa"), F.col("n").alias("na"), F.col("r").alias("ra")
    )
    pb = pooled.select(
        F.col("pr").alias("pb"), F.col("n").alias("nb"), F.col("r").alias("rb")
    )
    pairs = pa.crossJoin(pb).where(F.col("pa") < F.col("pb")).select(
        "pa",
        "pb",
        (F.col("ra") * F.col("nb") > F.col("rb") * F.col("na")).alias(
            "pooled_a_gt"
        ),
    )
    ca = cells.select(
        "n_name",
        F.col("pr").alias("pa"),
        F.col("n").alias("na"),
        F.col("r").alias("ra"),
    )
    cb = cells.select(
        "n_name",
        F.col("pr").alias("pb"),
        F.col("n").alias("nb"),
        F.col("r").alias("rb"),
    )
    strata = (
        ca.join(cb, "n_name")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(
            F.sum(
                F.when(
                    F.col("ra") * F.col("nb") > F.col("rb") * F.col("na"), 1
                ).otherwise(0)
            ).alias("a_gt"),
            F.sum(
                F.when(
                    F.col("rb") * F.col("na") > F.col("ra") * F.col("nb"), 1
                ).otherwise(0)
            ).alias("b_gt"),
            F.count("*").alias("n_strata"),
        )
    )
    return (
        strata.join(pairs, ["pa", "pb"])
        .select(
            "pa",
            "pb",
            F.col("n_strata").cast("long").alias("n_strata"),
            F.col("a_gt").cast("long").alias("strata_a_gt"),
            F.col("b_gt").cast("long").alias("strata_b_gt"),
            "pooled_a_gt",
            (
                (F.col("pooled_a_gt") & (F.col("b_gt") > F.col("a_gt")))
                | (~F.col("pooled_a_gt") & (F.col("a_gt") > F.col("b_gt")))
            ).alias("reversal"),
        )
        .orderBy("pa", "pb")
    )


# ---------------------------------------------------------------- q425
@register(
    "q425_anomaly_consensus",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, COUNT(*) AS n, SUM(x) AS s,
               SUM(CAST(x AS HUGEINT) * x) AS ss,
               CAST(ROUND(2 * quantile_cont(x, 5e-1), 0) AS BIGINT) AS med2,
               CAST(ROUND(4 * quantile_cont(x, 25e-2), 0) AS BIGINT) AS q25x4,
               CAST(ROUND(4 * quantile_cont(x, 75e-2), 0) AS BIGINT) AS q75x4
        FROM daily GROUP BY event_type
    ),
    mad AS (
        SELECT d.event_type,
               CAST(ROUND(2 * quantile_cont(
                   ABS(2 * d.x - st.med2), 5e-1), 0) AS BIGINT) AS d4
        FROM daily d JOIN stats st ON st.event_type = d.event_type
        GROUP BY d.event_type
    ),
    flags AS (
        SELECT d.event_type,
               CASE WHEN CAST(st.n * d.x - st.s AS HUGEINT)
                         * (st.n * d.x - st.s)
                       > 4 * (st.n * st.ss - CAST(st.s AS HUGEINT) * st.s)
                    THEN 1 ELSE 0 END AS f_z,
               CASE WHEN 2 * ABS(2 * d.x - st.med2) > 3 * m.d4
                    THEN 1 ELSE 0 END AS f_mad,
               CASE WHEN 2 * 4 * d.x > 2 * st.q75x4
                              + 3 * (st.q75x4 - st.q25x4)
                    THEN 1 ELSE 0 END AS f_iqr
        FROM daily d
        JOIN stats st ON st.event_type = d.event_type
        JOIN mad m ON m.event_type = d.event_type
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(f_z) AS BIGINT) AS flagged_z,
           CAST(SUM(f_mad) AS BIGINT) AS flagged_mad,
           CAST(SUM(f_iqr) AS BIGINT) AS flagged_iqr,
           CAST(SUM(CASE WHEN f_z + f_mad + f_iqr >= 2 THEN 1 ELSE 0 END)
               AS BIGINT) AS consensus2
    FROM flags GROUP BY event_type ORDER BY event_type
    """,
    doc="Anomaly-consensus ensemble over daily volumes per stream "
    "(three detector families — z-score |z|>2, MAD |x-med|>3MAD, "
    "IQR fence x>q75+1.5IQR — voted with a >=2 consensus: the "
    "false-positive-resistant monitor; q105/q149/q380 each run "
    "ONE family, this is the production pattern of running them "
    "together): every test CROSS-MULTIPLIED to exact integers — "
    "z via (n*x-s)^2 > 4(n*ss-s^2) in HUGEINT/DECIMAL, MAD and "
    "IQR via 2x/4x-scaled order statistics (integer daily "
    "counts make quantile_cont values exact quarter-multiples, "
    "so the scaled thresholds are integers in both engines). "
    "Scale: day-domain metadata after one scan; the quantile "
    "state is per-stream day histograms.",
)
def q425_anomaly_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # Pin the per-(type, day) counts once: three consumers (moments,
    # percentiles, deviations) re-ran the events scan + groupBy
    # unpinned (15 Exchange / 6 scans in the r10-before plan).
    daily = pin(
        e.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        ).agg(F.count("*").alias("x"))
    )
    dec = "decimal(38,0)"
    mom = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("ss"),
    )
    pct = grouped_exact_percentiles(
        daily, ["event_type"], "x", {"p25": 0.25, "p50": 0.5, "p75": 0.75}
    ).select(
        "event_type",
        F.round(2 * F.col("p50")).cast("long").alias("med2"),
        F.round(4 * F.col("p25")).cast("long").alias("q25x4"),
        F.round(4 * F.col("p75")).cast("long").alias("q75x4"),
    )
    stats = mom.join(pct, "event_type")
    # Pin deviations: both the MAD percentile pass and the flag pass
    # re-reference them.
    dev = pin(
        daily.join(F.broadcast(stats), "event_type").withColumn(
            "dev2", F.abs(2 * F.col("x") - F.col("med2"))
        )
    )
    mad = grouped_exact_percentiles(
        dev, ["event_type"], "dev2", {"dm": 0.5}
    ).select(
        "event_type", F.round(2 * F.col("dm")).cast("long").alias("d4")
    )
    zlhs = (F.col("n") * F.col("x") - F.col("s")).cast(dec)
    zrhs = (
        F.lit(4).cast(dec)
        * (F.col("n").cast(dec) * F.col("ss") - F.col("s").cast(dec) * F.col("s"))
    )
    flags = dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        F.when(zlhs * zlhs > zrhs, 1).otherwise(0).alias("f_z"),
        F.when(2 * F.col("dev2") > 3 * F.col("d4"), 1)
        .otherwise(0)
        .alias("f_mad"),
        F.when(
            2 * 4 * F.col("x")
            > 2 * F.col("q75x4") + 3 * (F.col("q75x4") - F.col("q25x4")),
            1,
        )
        .otherwise(0)
        .alias("f_iqr"),
    )
    return (
        flags.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum("f_z").cast("long").alias("flagged_z"),
            F.sum("f_mad").cast("long").alias("flagged_mad"),
            F.sum("f_iqr").cast("long").alias("flagged_iqr"),
            F.sum(
                F.when(
                    F.col("f_z") + F.col("f_mad") + F.col("f_iqr") >= 2, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("consensus2"),
        )
        .orderBy("event_type")
    )
