"""Round-5 gates, batch 151: KMV sketch intersection estimate
(q513 — the mergeable distinct sketch BEYOND counting: k-minimum-
values sketches support union and Jaccard, so two crawls' overlap
is estimated from two k-row summaries instead of a distinct-join;
the gate computes the KMV estimate AND the exact truth side by
side, so the recorded error ppm is the sketch's measured accuracy
— the q382 HLL-accuracy pattern extended to set algebra) and
source freshness / volume anomaly audit (q514 — the dbt-style
orchestration health check: per source table its row count, last
event date, staleness in days, trailing-30-day volume vs the
historical 30-day mean, and an anomaly flag when the ratio leaves
[0.5, 2] — the first alarm every pipeline pages on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_KMV_K = 64
_HEX_BITS = 48  # 12 hex digits -> [0, 2^48)

# 48-bit integer hash from the md5 hex prefix, written with INSTR /
# SUBSTRING only (identical name, argument order and semantics in
# Spark SQL and DuckDB) so the expression text is shared verbatim.
_H_EXPR = " + ".join(
    f"(INSTR('0123456789abcdef', SUBSTRING(MD5(text), {i + 1}, 1))"
    f" - 1) * CAST({16 ** (11 - i)} AS BIGINT)"
    for i in range(12)
)


@register(
    "q513_kmv_intersection_estimate",
    f"""
    WITH h AS (
        SELECT DISTINCT CAST(SUBSTRING(source, 4) AS INT) % 2 = 0
                   AS side_a,
               CAST({_H_EXPR} AS BIGINT) AS h
        FROM documents
    ),
    ranked AS (
        SELECT side_a, h,
               ROW_NUMBER() OVER (PARTITION BY side_a ORDER BY h)
                   AS r
        FROM h
    ),
    kmv AS (SELECT side_a, h FROM ranked WHERE r <= {_KMV_K}),
    merged AS (
        SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r
        FROM (SELECT DISTINCT h FROM kmv)
    ),
    mk AS (SELECT h FROM merged WHERE r <= {_KMV_K}),
    kth AS (SELECT MAX(h) AS hk FROM mk),
    jacc AS (
        SELECT COUNT(*) AS inter_k
        FROM mk
        WHERE h IN (SELECT h FROM kmv WHERE side_a)
          AND h IN (SELECT h FROM kmv WHERE NOT side_a)
    ),
    exact AS (
        SELECT COUNT(DISTINCT CASE WHEN side_a THEN h END) AS na,
               COUNT(DISTINCT CASE WHEN NOT side_a THEN h END) AS nb,
               COUNT(DISTINCT CASE WHEN side_a THEN h END)
                   + COUNT(DISTINCT CASE WHEN NOT side_a THEN h END)
                   - COUNT(DISTINCT h) AS ninter
        FROM h
    ),
    est AS (
        SELECT CAST(ROUND(({_KMV_K} - 1) * POW(2.0, {_HEX_BITS})
                   / k.hk) AS BIGINT) AS est_union,
               j.inter_k,
               CAST(ROUND(CAST(j.inter_k AS DOUBLE) / {_KMV_K}
                   * ROUND(({_KMV_K} - 1) * POW(2.0, {_HEX_BITS})
                           / k.hk)) AS BIGINT) AS est_inter
        FROM kth k CROSS JOIN jacc j
    )
    SELECT CAST(e.na AS BIGINT) AS exact_a,
           CAST(e.nb AS BIGINT) AS exact_b,
           CAST(e.ninter AS BIGINT) AS exact_intersection,
           CAST(s.est_union AS BIGINT) AS kmv_union_estimate,
           CAST(s.inter_k AS BIGINT) AS kmv_intersection_k,
           s.est_inter AS kmv_intersection_estimate,
           CAST(ABS(s.est_inter - e.ninter) * 1000000
               / GREATEST(e.ninter, 1) AS BIGINT) AS inter_err_ppm
    FROM exact e CROSS JOIN est s
    """,
    doc="KMV sketch intersection estimate (k-minimum-values is the "
    "mergeable distinct sketch with SET ALGEBRA: union by merging "
    "the k smallest hashes, Jaccard as the shared fraction of the "
    "merged sketch, intersection = J * U-hat — two crawls' overlap "
    "from two 64-row summaries instead of a distinct-join): the "
    "48-bit hash comes from the md5 hex prefix through an INSTR/"
    "SUBSTRING expression shared verbatim by both engines (no "
    "engine-specific hash), per-side k-minima are distributed "
    "top-ks, and the exact truth is computed alongside so the "
    "reported error ppm IS the sketch's measured accuracy (the "
    "q382 HLL pattern extended to set algebra). Scale: the full "
    "pass is one hash+distinct; everything after runs on 2k "
    "sketch rows — that's the entire point of KMV.",
)
def q513_kmv_intersection_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    h = d.select(
        (F.substring("source", 4, 10).cast("int") % 2 == 0).alias(
            "side_a"
        ),
        F.expr(_H_EXPR).cast("long").alias("h"),
    ).distinct()
    w = Window.partitionBy("side_a").orderBy("h")
    # Pin the ≤2K-row KMV sketch: merged, a_set and b_set all
    # re-reference it, and unpinned each re-ran the documents scan +
    # distinct + window chain (5 scans in the r10-before plan).
    from python_tool_setup_spark.operators.blockrank import pin

    kmv = pin(
        h.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _KMV_K)
        .select("side_a", "h")
    )
    merged = (
        kmv.select("h")
        .distinct()
        .orderBy("h")
        .limit(_KMV_K)
    )
    kth = merged.agg(F.max("h").alias("hk"))
    a_set = kmv.filter("side_a").select("h")
    b_set = kmv.filter(~F.col("side_a")).select("h")
    jacc = (
        merged.join(a_set, "h", "left_semi")
        .join(b_set, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("inter_k"))
    )
    exact = h.agg(
        F.countDistinct(F.when(F.col("side_a"), F.col("h"))).alias(
            "na"
        ),
        F.countDistinct(
            F.when(~F.col("side_a"), F.col("h"))
        ).alias("nb"),
        (
            F.countDistinct(F.when(F.col("side_a"), F.col("h")))
            + F.countDistinct(F.when(~F.col("side_a"), F.col("h")))
            - F.countDistinct("h")
        ).alias("ninter"),
    )
    est_union = F.round(
        (_KMV_K - 1) * F.pow(F.lit(2.0), F.lit(_HEX_BITS)) / F.col("hk")
    )
    est = kth.crossJoin(F.broadcast(jacc)).select(
        est_union.cast("long").alias("est_union"),
        "inter_k",
        F.round(
            F.col("inter_k").cast("double") / _KMV_K * est_union
        )
        .cast("long")
        .alias("est_inter"),
    )
    return exact.crossJoin(F.broadcast(est)).select(
        F.col("na").cast("long").alias("exact_a"),
        F.col("nb").cast("long").alias("exact_b"),
        F.col("ninter").cast("long").alias("exact_intersection"),
        F.col("est_union").alias("kmv_union_estimate"),
        F.col("inter_k").cast("long").alias("kmv_intersection_k"),
        F.col("est_inter").alias("kmv_intersection_estimate"),
        (
            F.abs(F.col("est_inter") - F.col("ninter"))
            * 1000000
            / F.greatest(F.col("ninter"), F.lit(1))
        )
        .cast("long")
        .alias("inter_err_ppm"),
    )


# ---------------------------------------------------------------- q514
# (label, table, date column needing cast)
_FRESH_TABLES = [
    ("events", "events", "CAST(ts AS DATE)"),
    ("lineitem", "lineitem", "CAST(l_shipdate AS DATE)"),
    ("orders", "orders", "CAST(o_orderdate AS DATE)"),
]


def _fresh_block(label: str, table: str, dcol: str) -> str:
    return f"""
    SELECT '{label}' AS table_name, n_rows, last_day, span_days,
           last30, hist30_micro,
           CAST(ROUND(last30 * 1000000.0
               / GREATEST(hist30_micro / 1000000.0, 1))
               AS BIGINT) AS volume_ratio_micro,
           last30 * 2000000 < hist30_micro
               OR CAST(last30 AS HUGEINT) * 1000000
                  > 2 * CAST(hist30_micro AS HUGEINT) AS volume_anomaly
    FROM (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               MAX({dcol}) AS last_day,
               CAST(DATEDIFF('day', MIN({dcol}), MAX({dcol}))
                   AS BIGINT) AS span_days,
               CAST(SUM(CASE WHEN DATEDIFF('day', {dcol},
                        (SELECT MAX({dcol}) FROM {table})) < 30
                        THEN 1 ELSE 0 END) AS BIGINT) AS last30,
               CAST(ROUND(COUNT(*) * 30.0 * 1000000
                   / GREATEST(DATEDIFF('day', MIN({dcol}),
                              MAX({dcol})) + 1, 1)) AS BIGINT)
                   AS hist30_micro
        FROM {table}
    )
    """


@register(
    "q514_source_freshness_audit",
    "SELECT * FROM (\n"
    + "\nUNION ALL\n".join(_fresh_block(*t) for t in _FRESH_TABLES)
    + "\n) ORDER BY table_name",
    doc="Source freshness / volume anomaly audit (dbt-style "
    "orchestration health: per source table the row count, last "
    "event day, history span, trailing-30-day row volume vs the "
    "historical 30-day mean, the volume ratio, and an anomaly "
    "flag when the trailing window leaves [0.5x, 2x] of history "
    "— the first alarm a pipeline pages on): per table one "
    "aggregate computes all five statistics (the trailing window "
    "is a conditional count against the max date, no second "
    "scan), ratios micro-quantized from exact integers and the "
    "anomaly verdict cross-multiplied. Scale: one scan per "
    "audited table, 3 metadata rows out.",
)
def q514_source_freshness_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    out = None
    for label, table, dcol in _FRESH_TABLES:
        t = load_table(spark, sf_dir, table)
        col = dcol.split("(")[1].split(" ")[0]
        d = F.col(col).cast("date")
        # trailing-30d count needs the max date first: one extra tiny
        # aggregate, broadcast back (still one pass over the table for
        # the heavy count; the max-date probe reads only the column)
        mx = t.agg(F.max(d).alias("mx"))
        stats = (
            t.crossJoin(F.broadcast(mx))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.max(d).alias("last_day"),
                F.datediff(F.max(d), F.min(d))
                .cast("long")
                .alias("span_days"),
                F.sum(
                    (F.datediff(F.col("mx"), d) < 30).cast("long")
                )
                .cast("long")
                .alias("last30"),
                F.round(
                    F.count(F.lit(1))
                    * 30.0
                    * 1000000
                    / F.greatest(
                        F.datediff(F.max(d), F.min(d)) + 1, F.lit(1)
                    )
                )
                .cast("long")
                .alias("hist30_micro"),
            )
        )
        row = stats.select(
            F.lit(label).alias("table_name"),
            "n_rows",
            "last_day",
            "span_days",
            "last30",
            "hist30_micro",
            F.round(
                F.col("last30")
                * 1000000.0
                / F.greatest(
                    F.col("hist30_micro") / 1000000.0, F.lit(1)
                )
            )
            .cast("long")
            .alias("volume_ratio_micro"),
            (
                (F.col("last30") * 2000000 < F.col("hist30_micro"))
                | (
                    F.col("last30").cast("decimal(38,0)") * 1000000
                    > 2 * F.col("hist30_micro").cast("decimal(38,0)")
                )
            ).alias("volume_anomaly"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("table_name")
