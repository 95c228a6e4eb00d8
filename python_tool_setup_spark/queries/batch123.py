"""Round-5 gates, batch 123: blocking quality evaluation (q456 —
reduction ratio AND pair completeness of a first-2-token blocking
key on the planted dup corpus: the two-number scorecard every
blocked record-linkage design (q239/q240) is judged by, measured
against ground truth instead of assumed) and a near-zero-variance
feature screen (q457 — frequency ratio + distinct share per
numeric column: caret's nzv filter, the first thing to run before
any encoder or model sees the table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_NDOCS = 60  # planted corpus base (q72's convention)


# ---------------------------------------------------------------- q456
@register(
    "q456_blocking_quality_eval",
    f"""
    WITH base AS (
        SELECT doc_id, text FROM documents WHERE doc_id < {_NDOCS}
        UNION ALL
        SELECT doc_id + 100000, text || ' zz qq' FROM documents
        WHERE doc_id < {_NDOCS}
        UNION ALL
        SELECT doc_id + 200000, text || ' zz qq ww' FROM documents
        WHERE doc_id < {_NDOCS}
    ),
    keyed AS (
        SELECT doc_id, doc_id % 100000 AS truth,
               array_to_string((list_filter(string_split_regex(
                   lower(text), '\\s+'), t -> t <> ''))[1:2], ' ') AS bk
        FROM base
    ),
    n_tot AS (SELECT COUNT(*) AS n FROM keyed),
    cand AS (
        SELECT a.doc_id AS da, b.doc_id AS db,
               a.truth = b.truth AS is_true
        FROM keyed a JOIN keyed b
          ON b.bk = a.bk AND a.doc_id < b.doc_id
    ),
    truth_pairs AS (
        SELECT COUNT(*) AS tp FROM keyed a JOIN keyed b
          ON b.truth = a.truth AND a.doc_id < b.doc_id
    )
    SELECT CAST((SELECT n FROM n_tot) AS BIGINT) AS n_records,
           CAST((SELECT tp FROM truth_pairs) AS BIGINT) AS true_pairs,
           CAST(COUNT(*) AS BIGINT) AS candidate_pairs,
           CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT)
               AS true_candidates,
           CAST(ROUND(1e6 * (1e0 - COUNT(*)
               / ((SELECT n FROM n_tot)
                  * ((SELECT n FROM n_tot) - 1e0) / 2e0))) AS BIGINT)
               AS reduction_ratio_micro,
           CAST(ROUND(1e6 * SUM(CASE WHEN is_true THEN 1 ELSE 0 END)
               / (SELECT tp FROM truth_pairs)) AS BIGINT)
               AS pair_completeness_micro
    FROM cand
    """,
    doc="Blocking quality evaluation on the planted dup corpus "
    "(blocking key = first two tokens; reduction ratio = 1 - "
    "candidates/all-pairs, pair completeness = share of TRUE "
    "dup pairs surviving the blocking — the two numbers every "
    "blocked linkage design (q239's blocks, q240's sorted "
    "neighborhood) trades off, here MEASURED against the "
    "planted truth instead of assumed; a key that's too fine "
    "loses completeness, too coarse loses reduction): candidate "
    "pairs from the block self-join, truth pairs from the "
    "planted family id, both exact integer counts. Scale: the "
    "eval runs the blocking exactly as production would — the "
    "block self-join IS the measured cost.",
)
def q456_blocking_quality_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _NDOCS
    )
    c1 = d.withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
        "text", F.concat("text", F.lit(" zz qq"))
    )
    c2 = d.withColumn("doc_id", F.col("doc_id") + 200000).withColumn(
        "text", F.concat("text", F.lit(" zz qq ww"))
    )
    base = d.unionByName(c1).unionByName(c2)
    toks = F.filter(
        F.split(F.lower(F.col("text")), "\\s+"), lambda t: t != ""
    )
    keyed = base.select(
        "doc_id",
        (F.col("doc_id") % 100000).alias("truth"),
        F.concat_ws(" ", F.slice(toks, 1, 2)).alias("bk"),
    )
    n_tot = keyed.count()
    a = keyed.select(
        F.col("doc_id").alias("da"), F.col("truth").alias("ta"), "bk"
    )
    b = keyed.select(
        F.col("doc_id").alias("db"), F.col("truth").alias("tb"), "bk"
    )
    cand = (
        a.join(b, "bk")
        .where(F.col("da") < F.col("db"))
        .select((F.col("ta") == F.col("tb")).alias("is_true"))
    )
    ta = keyed.select("doc_id", "truth")
    truth_pairs = (
        ta.alias("x")
        .join(ta.alias("y"), F.col("x.truth") == F.col("y.truth"))
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .count()
    )
    agg = cand.agg(
        F.count("*").alias("cp"),
        F.sum(F.when(F.col("is_true"), 1).otherwise(0)).alias("tc"),
    ).collect()[0]
    cp, tc = int(agg["cp"]), int(agg["tc"])
    all_pairs = n_tot * (n_tot - 1) / 2.0
    return spark.createDataFrame(
        [
            (
                n_tot,
                truth_pairs,
                cp,
                tc,
                round(1e6 * (1.0 - cp / all_pairs)),
                round(1e6 * tc / truth_pairs),
            )
        ],
        "n_records long, true_pairs long, candidate_pairs long,"
        " true_candidates long, reduction_ratio_micro long,"
        " pair_completeness_micro long",
    )


# ---------------------------------------------------------------- q457
@register(
    "q457_nzv_feature_screen",
    """
    WITH stacked AS (
        SELECT 'l_discount' AS col,
               CAST(ROUND(1e6 * l_discount) AS BIGINT) AS v FROM lineitem
        UNION ALL
        SELECT 'l_tax', CAST(ROUND(1e6 * l_tax) AS BIGINT) FROM lineitem
        UNION ALL
        SELECT 'l_quantity', CAST(ROUND(1e6 * l_quantity) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_linenumber', CAST(l_linenumber AS BIGINT) FROM lineitem
    ),
    counts AS (
        SELECT col, v, COUNT(*) AS c FROM stacked GROUP BY col, v
    ),
    ranked AS (
        SELECT col, c,
               ROW_NUMBER() OVER (PARTITION BY col
                                  ORDER BY c DESC, v) AS rk
        FROM counts
    ),
    prof AS (
        SELECT col,
               SUM(c) AS n,
               COUNT(*) AS n_distinct,
               MAX(CASE WHEN rk = 1 THEN c END) AS c1,
               MAX(CASE WHEN rk = 2 THEN c END) AS c2
        FROM ranked GROUP BY col
    )
    SELECT col,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(ROUND(1e3 * c1 / COALESCE(c2, 1)) AS BIGINT)
               AS freq_ratio_milli,
           CAST(ROUND(1e6 * n_distinct / n) AS BIGINT)
               AS distinct_share_micro,
           c1 * 100 > n * 95 OR n_distinct * 100 < n
               AS nzv_flag
    FROM prof ORDER BY col
    """,
    doc="Near-zero-variance feature screen (caret's nzv: frequency "
    "ratio of the two most common values + distinct-value share "
    "per column — a feature that is 95% one value or has "
    "near-zero distinct share carries no signal and destabilizes "
    "encoders; the pre-model screen that runs BEFORE q445's "
    "rare-category collapse and q378's target encoding): "
    "micro-quantized values stacked into one relation, top-2 "
    "frequencies via per-column partitioned rank with a total "
    "(count, value) order, the flag CROSS-MULTIPLIED "
    "(c1*100 > n*95, distinct*100 < n) so it is engine-exact. "
    "Scale: value-domain histograms after one stacked scan.",
)
def q457_nzv_feature_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")

    def col_sel(name, expr):
        return li.select(F.lit(name).alias("col"), expr.alias("v"))

    stacked = (
        col_sel("l_discount", F.round(F.lit(1e6) * F.col("l_discount")).cast("long"))
        .unionByName(
            col_sel("l_tax", F.round(F.lit(1e6) * F.col("l_tax")).cast("long"))
        )
        .unionByName(
            col_sel(
                "l_quantity",
                F.round(F.lit(1e6) * F.col("l_quantity")).cast("long"),
            )
        )
        .unionByName(
            col_sel("l_linenumber", F.col("l_linenumber").cast("long"))
        )
    )
    counts = stacked.groupBy("col", "v").agg(F.count("*").alias("c"))
    w = Window.partitionBy("col").orderBy(F.col("c").desc(), F.col("v"))
    ranked = counts.withColumn("rk", F.row_number().over(w))
    prof = ranked.groupBy("col").agg(
        F.sum("c").alias("n"),
        F.count("*").alias("n_distinct"),
        F.max(F.when(F.col("rk") == 1, F.col("c"))).alias("c1"),
        F.max(F.when(F.col("rk") == 2, F.col("c"))).alias("c2"),
    )
    return prof.select(
        "col",
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.round(
            F.lit(1e3) * F.col("c1") / F.coalesce(F.col("c2"), F.lit(1))
        )
        .cast("long")
        .alias("freq_ratio_milli"),
        F.round(F.lit(1e6) * F.col("n_distinct") / F.col("n"))
        .cast("long")
        .alias("distinct_share_micro"),
        (
            (F.col("c1") * 100 > F.col("n") * 95)
            | (F.col("n_distinct") * 100 < F.col("n"))
        ).alias("nzv_flag"),
    ).orderBy("col")
