"""Round-5 gates, batch 87: out-of-fold target encoding (q378 — the
leakage-free way to turn a categorical into its label mean: each
fold's encoding is computed from the OTHER folds, the trap everyone
falls into done right — pairs with q376's group folds) and a label-
shift prior estimator (q379 — BBSE/Saerens confusion-matrix
inversion: estimate the unlabeled target population's positive rate
from a classifier's source-measured tpr/fpr; the monitoring number
for silent class drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_K = 5
_PRICE_CUT = 150000


# ---------------------------------------------------------------- q378
@register(
    "q378_oof_target_encoding",
    f"""
    WITH rows_ AS (
        SELECT o_orderpriority AS cat,
               CAST(('0x' || substr(md5('te|' ||
                   CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
                   % {_K} AS fold,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    cf AS (
        SELECT cat, fold, COUNT(*) AS n, SUM(y) AS s
        FROM rows_ GROUP BY 1, 2
    ),
    ct AS (SELECT cat, SUM(n) AS nt, SUM(s) AS st FROM cf GROUP BY cat)
    SELECT cf.cat, CAST(cf.fold AS BIGINT) AS fold,
           CAST(cf.n AS BIGINT) AS n_rows,
           CAST(ct.nt - cf.n AS BIGINT) AS n_oof,
           CAST(ROUND(CAST(ct.st - cf.s AS DOUBLE)
               / CAST(ct.nt - cf.n AS DOUBLE) * 1000000.0) AS BIGINT)
               AS encoding_micro
    FROM cf JOIN ct USING (cat)
    ORDER BY cat, fold
    """,
    doc="Out-of-fold target encoding (the leakage-free categorical "
    "encoder: the value a row sees for its category is the label "
    "mean of the OTHER folds, never its own — naive whole-table "
    "target encoding copies the label into a feature and the CV "
    "score lies; this is the construction that doesn't): fold "
    "from the md5-derandomized key (q95 convention), per-(cat, "
    "fold) integer sums, OOF mean = (total - own fold) by exact "
    "integer subtraction, one division per cell. Pairs with "
    "q376's group folds. Scale: one groupBy to |cats| x k cells — "
    "the encoding table is broadcast metadata for the join back.",
)
def q378_oof_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    fold = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("te|"), F.col("o_orderkey").cast("string"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _K
    )
    rows = o.select(
        F.col("o_orderpriority").alias("cat"),
        fold.alias("fold"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    cf = rows.groupBy("cat", "fold").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    ct = cf.groupBy("cat").agg(
        F.sum("n").alias("nt"), F.sum("s").alias("st")
    )
    return (
        cf.join(F.broadcast(ct), "cat")
        .select(
            "cat",
            F.col("fold").cast("long").alias("fold"),
            F.col("n").cast("long").alias("n_rows"),
            (F.col("nt") - F.col("n")).cast("long").alias("n_oof"),
            F.round(
                (F.col("st") - F.col("s")).cast("double")
                / (F.col("nt") - F.col("n")).cast("double")
                * 1000000.0
            )
            .cast("long")
            .alias("encoding_micro"),
        )
        .orderBy("cat", "fold")
    )


# ---------------------------------------------------------------- q379
@register(
    "q379_label_shift_estimate",
    f"""
    WITH scored AS (
        SELECT o_orderkey % 2 = 0 AS is_source,
               CASE WHEN o_totalprice > {_PRICE_CUT} THEN 1 ELSE 0 END
                   AS pred,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                   AS y
        FROM orders
    ),
    src AS (
        SELECT SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS tp,
               SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS pos,
               SUM(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS fp,
               SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS neg
        FROM scored WHERE is_source
    ),
    tgt AS (
        SELECT COUNT(*) AS n, SUM(pred) AS np, SUM(y) AS ny
        FROM scored WHERE NOT is_source
    )
    SELECT CAST(ROUND(CAST(tp AS DOUBLE) / pos * 1000000.0) AS BIGINT)
               AS tpr_micro,
           CAST(ROUND(CAST(fp AS DOUBLE) / neg * 1000000.0) AS BIGINT)
               AS fpr_micro,
           CAST(ROUND(CAST(np AS DOUBLE) / n * 1000000.0) AS BIGINT)
               AS target_pred_rate_micro,
           CAST(ROUND((CAST(np AS DOUBLE) / n - CAST(fp AS DOUBLE) / neg)
               / (CAST(tp AS DOUBLE) / pos - CAST(fp AS DOUBLE) / neg)
               * 1000000.0) AS BIGINT) AS est_prior_micro,
           CAST(ROUND(CAST(ny AS DOUBLE) / n * 1000000.0) AS BIGINT)
               AS true_prior_micro
    FROM src, tgt
    """,
    doc="Label-shift prior estimation by confusion-matrix inversion "
    "(BBSE/Saerens-Latinne-Decaestecker for the binary case: on "
    "the labeled source half measure the classifier's tpr and "
    "fpr, on the unlabeled target half measure only the predicted-"
    "positive rate, then est_prior = (pred_rate - fpr)/(tpr - fpr) "
    "— the monitoring estimator that detects class drift WITHOUT "
    "target labels; the gate also reports the true target prior "
    "the estimator is trying to recover, since the fixture has "
    "it): all rates from exact integer counts, identical double "
    "expressions both engines, micro-quantized once each. Scale: "
    "two conditional aggregates over one scan.",
)
def q379_label_shift_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    scored = o.select(
        (F.col("o_orderkey") % 2 == 0).alias("is_source"),
        F.when(F.col("o_totalprice") > _PRICE_CUT, 1).otherwise(0).alias(
            "pred"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias(
            "y"
        ),
    )
    src = scored.filter("is_source").agg(
        F.sum(F.when((F.col("y") == 1) & (F.col("pred") == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("pos"),
        F.sum(F.when((F.col("y") == 0) & (F.col("pred") == 1), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("neg"),
    )
    tgt = scored.filter(~F.col("is_source")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pred").alias("np"),
        F.sum("y").alias("ny"),
    )
    tpr = F.col("tp").cast("double") / F.col("pos")
    fpr = F.col("fp").cast("double") / F.col("neg")
    pr = F.col("np").cast("double") / F.col("n")
    return src.crossJoin(F.broadcast(tgt)).select(
        F.round(tpr * 1000000.0).cast("long").alias("tpr_micro"),
        F.round(fpr * 1000000.0).cast("long").alias("fpr_micro"),
        F.round(pr * 1000000.0).cast("long").alias("target_pred_rate_micro"),
        F.round((pr - fpr) / (tpr - fpr) * 1000000.0)
        .cast("long")
        .alias("est_prior_micro"),
        F.round(F.col("ny").cast("double") / F.col("n") * 1000000.0)
        .cast("long")
        .alias("true_prior_micro"),
    )
