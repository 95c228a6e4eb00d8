"""Round-4 gates, batch 52: expected calibration error (q308 — is a
classifier's confidence honest?) and exact average precision (q309 —
the PR-side ranking metric beside q302's ROC-AUC, computed with the
distributed block-offset ranking pattern instead of a global
window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q308
@register(
    "q308_calibration_ece",
    """
    WITH scored AS (
        SELECT CAST(ROUND((1.0 / (1.0 + exp(-(CAST(n_chars AS DOUBLE)
                    - 250.0) / 50.0))) * 1000000.0) AS BIGINT) AS p_micro,
               CASE WHEN text LIKE '%data%' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    binned AS (
        SELECT LEAST(9, p_micro // 100000) AS bin,
               COUNT(*) AS n, SUM(y) AS n_pos,
               SUM(p_micro) AS sum_p_micro
        FROM scored GROUP BY 1
    ),
    tot AS (
        SELECT SUM(n) AS n_total,
               SUM(abs(n_pos * 1000000 - sum_p_micro)) AS numer
        FROM binned
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(n AS BIGINT) AS n,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(ROUND(CAST(sum_p_micro AS DOUBLE) / CAST(n AS DOUBLE))
               AS BIGINT) AS conf_micro,
           CAST(ROUND(CAST(n_pos AS DOUBLE) * 1000000.0
               / CAST(n AS DOUBLE)) AS BIGINT) AS acc_micro,
           CAST(ROUND(CAST((SELECT numer FROM tot) AS DOUBLE)
               / CAST((SELECT n_total FROM tot) AS DOUBLE)) AS BIGINT)
               AS ece_micro
    FROM binned ORDER BY bin
    """,
    doc="Expected calibration error over confidence deciles (is the "
    "classifier's probability honest? — the deployment-gate "
    "metric beside q302's AUC, which only measures ranking): a "
    "deterministic logistic score of doc length against the "
    "'mentions data' label, binned by confidence decile, with "
    "per-bin confidence vs accuracy and the |acc-conf|-weighted "
    "ECE. Engine-exact: the per-item probability is quantized to "
    "integer micro BEFORE any sum (exp's 1-ulp wobble never "
    "reaches an accumulator), so bin sums are exact integers and "
    "ECE's numerator Sum|n_pos*1e6 - sum_p| is exact, with ONE "
    "correctly-rounded division at the end. Scale: one scan, a "
    "10-cell aggregate — map-side partials all the way.",
)
def q308_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    p = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(-(F.col("n_chars").cast("double") - 250.0) / 50.0)
    )
    scored = d.select(
        F.round(p * 1000000.0).cast("long").alias("p_micro"),
        F.when(F.col("text").contains("data"), 1).otherwise(0).alias("y"),
    )
    binned = (
        scored.groupBy(
            F.least(F.lit(9), F.expr("div(p_micro, 100000)")).alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("n_pos"),
            F.sum("p_micro").alias("sum_p_micro"),
        )
    )
    tot = binned.agg(
        F.sum("n").alias("n_total"),
        F.sum(F.abs(F.col("n_pos") * 1000000 - F.col("sum_p_micro"))).alias(
            "numer"
        ),
    )
    out = binned.crossJoin(F.broadcast(tot))  # 1-row scalar attach
    return out.select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.round(F.col("sum_p_micro").cast("double") / F.col("n").cast("double"))
        .cast("long")
        .alias("conf_micro"),
        F.round(
            F.col("n_pos").cast("double") * 1000000.0 / F.col("n").cast("double")
        )
        .cast("long")
        .alias("acc_micro"),
        F.round(F.col("numer").cast("double") / F.col("n_total").cast("double"))
        .cast("long")
        .alias("ece_micro"),
    ).orderBy("bin")


# ---------------------------------------------------------------- q309
@register(
    "q309_average_precision",
    """
    WITH scored AS (
        SELECT doc_id, n_chars AS s,
               CASE WHEN text LIKE '%data%' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    ranked AS (
        SELECT y,
               ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS k,
               SUM(y) OVER (ORDER BY s DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum_pos
        FROM scored
    ),
    terms AS (
        SELECT CAST(ROUND(CAST(cum_pos AS DOUBLE) / CAST(k AS DOUBLE)
                   * 1000000000.0) AS BIGINT) AS t
        FROM ranked WHERE y = 1
    )
    SELECT CAST((SELECT COUNT(*) FROM scored) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_pos,
           CAST(SUM(t) AS BIGINT) AS sum_term_nano,
           CAST(ROUND(CAST(SUM(t) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * 1000.0)) AS BIGINT)
               AS ap_micro
    FROM terms
    """,
    doc="Exact average precision (the PR-curve area under the "
    "rank-by-length retrieval of 'mentions data' docs — the other "
    "half of the eval pair with q302's ROC-AUC; AP is what you "
    "report when positives are rare): AP = mean over positives of "
    "precision@its-rank, under the deterministic total order "
    "(score desc, doc_id). The Spark plan never opens a GLOBAL "
    "window: ranks come from the distributed block-offset "
    "pattern — a score-histogram cumsum (metadata) broadcast back, "
    "plus per-score-block partitioned windows, so k and "
    "cumulative-positives are exact integers assembled from "
    "block offset + within-block position while every window "
    "stays partitioned by score. Per-positive precision terms "
    "quantize to nano before the sum; one final division. The "
    "DuckDB oracle uses plain global windows — agreeing with it "
    "proves the block-offset decomposition is exactly the global "
    "ranking.",
)
def q309_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.col("n_chars").alias("s"),
        F.when(F.col("text").contains("data"), 1).otherwise(0).alias("y"),
    )
    hist = scored.groupBy("s").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("cnt_pos")
    )
    wh = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    offsets = hist.select(
        "s",
        (F.sum("cnt").over(wh) - F.col("cnt")).alias("cnt_gt"),
        (F.sum("cnt_pos").over(wh) - F.col("cnt_pos")).alias("pos_gt"),
    )
    joined = scored.join(F.broadcast(offsets), "s")
    wb = Window.partitionBy("s").orderBy("doc_id")
    wbc = wb.rowsBetween(Window.unboundedPreceding, 0)
    ranked = joined.select(
        "y",
        (F.col("cnt_gt") + F.row_number().over(wb)).alias("k"),
        (F.col("pos_gt") + F.sum("y").over(wbc)).alias("cum_pos"),
    )
    terms = ranked.filter(F.col("y") == 1).select(
        F.round(
            F.col("cum_pos").cast("double") / F.col("k").cast("double")
            * 1000000000.0
        )
        .cast("long")
        .alias("t")
    )
    n_docs = scored.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    agg = terms.agg(
        F.count(F.lit(1)).alias("n_pos"), F.sum("t").alias("sum_term_nano")
    )
    return (
        agg.crossJoin(F.broadcast(n_docs))  # 1-row scalar attach
        .select(
            "n_docs",
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("sum_term_nano").cast("long").alias("sum_term_nano"),
            F.round(
                F.col("sum_term_nano").cast("double")
                / (F.col("n_pos").cast("double") * 1000.0)
            )
            .cast("long")
            .alias("ap_micro"),
        )
    )
