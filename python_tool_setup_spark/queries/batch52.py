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
    from python_tool_setup_spark.operators.evalmetrics import calibration_ece

    d = load_table(spark, sf_dir, "documents")
    p = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(-(F.col("n_chars").cast("double") - 250.0) / 50.0)
    )
    scored = d.select(
        F.round(p * 1000000.0).cast("long").alias("p_micro"),
        F.when(F.col("text").contains("data"), 1).otherwise(0).alias("y"),
    )
    return calibration_ece(scored, "p_micro", "y", n_bins=10)


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
    from python_tool_setup_spark.operators.evalmetrics import average_precision

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.col("n_chars").alias("s"),
        F.when(F.col("text").contains("data"), 1).otherwise(0).alias("y"),
    )
    return average_precision(scored, "s", "doc_id", "y")
