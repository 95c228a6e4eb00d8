"""Round-5 gates, batch 119: Apdex scoring (q447 — the satisfied/
tolerating/frustrated split of event values against a T / 4T
threshold pair, per stream: the industry's one-number UX summary,
beside q443's SLO burn) and an overdispersion index (q448 — the
variance-to-mean ratio of daily volumes per stream with a
cross-multiplied Poisson test: the dispersion diagnostic that
says whether q417-style count models are even admissible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.queries.exactcast import dd_duck
from python_tool_setup_spark.tables import load_table

_T_MICRO = 50_000_000  # Apdex threshold T on micro-quantized value


# ---------------------------------------------------------------- q447
@register(
    "q447_apdex_score",
    f"""
    WITH vals AS (
        SELECT event_type,
               CAST(ROUND(1e6 * value) AS BIGINT) AS v
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN v <= {_T_MICRO} THEN 1 ELSE 0 END)
               AS BIGINT) AS satisfied,
           CAST(SUM(CASE WHEN v > {_T_MICRO} AND v <= 4 * {_T_MICRO}
                    THEN 1 ELSE 0 END) AS BIGINT) AS tolerating,
           CAST(SUM(CASE WHEN v > 4 * {_T_MICRO} THEN 1 ELSE 0 END)
               AS BIGINT) AS frustrated,
           CAST(ROUND(1e6 * (SUM(CASE WHEN v <= {_T_MICRO} THEN 1
                                 ELSE 0 END)
                 + SUM(CASE WHEN v > {_T_MICRO} AND v <= 4 * {_T_MICRO}
                       THEN 1 ELSE 0 END) / 2e0)
               / COUNT(*)) AS BIGINT) AS apdex_micro
    FROM vals GROUP BY event_type ORDER BY event_type
    """,
    doc="Apdex score per stream (satisfied <= T, tolerating <= 4T, "
    "frustrated beyond; Apdex = (satisfied + tolerating/2)/n — "
    "the industry's one-number experience summary, treating the "
    "events value column as a latency; q443 watches the SLO "
    "budget, this watches the users): micro-quantized values so "
    "all three buckets are integer comparisons, the half-credit "
    "in one shared double divide. Scale: one scan, stream-domain "
    "conditional counts — the canonical mergeable monitor.",
)
def q447_apdex_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = F.round(F.lit(1e6) * F.col("value")).cast("long")
    vals = e.select("event_type", v.alias("v"))
    sat = F.sum(F.when(F.col("v") <= _T_MICRO, 1).otherwise(0))
    tol = F.sum(
        F.when(
            (F.col("v") > _T_MICRO) & (F.col("v") <= 4 * _T_MICRO), 1
        ).otherwise(0)
    )
    fru = F.sum(F.when(F.col("v") > 4 * _T_MICRO, 1).otherwise(0))
    return (
        vals.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            sat.cast("long").alias("satisfied"),
            tol.cast("long").alias("tolerating"),
            fru.cast("long").alias("frustrated"),
            F.round(
                F.lit(1e6) * (sat + tol / F.lit(2.0)) / F.count("*")
            )
            .cast("long")
            .alias("apdex_micro"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- q448
@register(
    "q448_overdispersion_index",
    f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
        FROM events GROUP BY 1, 2
    ),
    mom AS (
        SELECT event_type, COUNT(*) AS n, SUM(x) AS s,
               SUM(CAST(x AS HUGEINT) * x) AS ss
        FROM daily GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           CAST(s AS BIGINT) AS total_events,
           CAST(ROUND(1e3 * (CAST(n AS DOUBLE) * {dd_duck('ss')}
                   - CAST(s AS DOUBLE) * s)
               / (CAST(n AS DOUBLE) * s)) AS BIGINT)
               AS dispersion_milli,
           n * ss - CAST(s AS HUGEINT) * s
               > 2 * CAST(n AS HUGEINT) * s AS overdispersed
    FROM mom ORDER BY event_type
    """,
    doc="Overdispersion index of daily volumes per stream "
    "(dispersion = variance/mean; Poisson arrivals give exactly "
    "1, clustered/bursty arrivals exceed it — the admissibility "
    "check for ANY Poisson-flavored model, including q417's fit "
    "family and q360's Poisson bootstrap; flagged when the "
    "index exceeds 2): the index assembled from exact "
    "HUGEINT/DECIMAL moments as (n*ss - s^2)/(n*s) and "
    "milli-rounded, the flag CROSS-MULTIPLIED entirely in "
    "integers (n*ss - s^2 > 2*n*s <=> dispersion > 2) so no "
    "division decides it. Scale: day-domain metadata after one "
    "scan.",
)
def q448_overdispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("x"))
    dec = "decimal(38,0)"
    mom = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("ss"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    ssd = F.col("ss").cast("double")
    s_dec = F.col("s").cast(dec)
    lhs = F.col("n") * F.col("ss") - s_dec * F.col("s")
    return mom.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("s").cast("long").alias("total_events"),
        F.round(F.lit(1e3) * (nd * ssd - sd * sd) / (nd * sd))
        .cast("long")
        .alias("dispersion_milli"),
        (
            lhs > F.lit(2).cast(dec) * F.col("n").cast(dec) * F.col("s")
        ).alias("overdispersed"),
    ).orderBy("event_type")
