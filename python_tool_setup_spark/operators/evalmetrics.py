"""Reusable model-evaluation metrics over DataFrames.

Each function takes (df, column names) and returns a small result
DataFrame — the gates q302/q308/q309/q310 are thin callers with
fixture-specific scoring expressions, so any user pipeline can point
these at its own score/label columns.

Design rules shared by all metrics (the repo's engine-exact
posture):
- counts/ranks stay integers end to end (midrank ties via DOUBLED
  ranks; per-score-block offsets instead of global windows);
- anything transcendental (log2) quantizes per item BEFORE summing;
- exactly one correctly-rounded division at the end of each ratio.

Scale: every metric reduces over a distinct-score histogram or a
top-k TakeOrdered — no global sort of data rows anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin, prefix_agg, prefix_rank


def exact_auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC-AUC via the Mann-Whitney rank-sum identity with
    midrank tie handling. ``label_col`` must be 0/1 int. Returns one
    row: n_pos, n_neg, sum_ranks_x2, auc_micro, gini_micro."""
    grp = df.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(label_col).alias("cnt_pos")
    )
    # exclusive prefix over the distinct-score histogram — block-offset
    # decomposition, so even millions of distinct float scores never
    # funnel one partition (no unpartitioned window in the plan)
    cum = prefix_agg(grp, [("s", "asc")], {"cnt_lt": ("sum", "cnt")})
    agg = cum.agg(
        F.sum(F.col("cnt_pos") * (2 * F.col("cnt_lt") + F.col("cnt") + 1)).alias(
            "sum_r2"
        ),
        F.sum("cnt_pos").alias("n1"),
        (F.sum("cnt") - F.sum("cnt_pos")).alias("n0"),
    )
    auc = (F.col("sum_r2") - F.col("n1") * (F.col("n1") + 1)).cast("double") / (
        2 * F.col("n1") * F.col("n0")
    ).cast("double")
    return agg.select(
        F.col("n1").cast("long").alias("n_pos"),
        F.col("n0").cast("long").alias("n_neg"),
        F.col("sum_r2").cast("long").alias("sum_ranks_x2"),
        F.round(auc * 1000000.0).cast("long").alias("auc_micro"),
        F.round((auc * 2.0 - 1.0) * 1000000.0).cast("long").alias("gini_micro"),
    )


def average_precision(
    df: DataFrame, score_col: str, id_col: str, label_col: str
) -> DataFrame:
    """Exact average precision under the deterministic total order
    (score desc, id asc), ranks assembled from a broadcast
    score-histogram cumsum + per-block partitioned windows (never a
    global window). Returns one row: n_docs, n_pos, sum_term_nano,
    ap_micro."""
    # Three consumers (score histogram, rank join-back, doc count) each
    # re-instantiated the caller's input plan: pin the narrow triple so
    # the source is scanned once.
    scored = pin(
        df.select(
            F.col(id_col).alias("_id"),
            F.col(score_col).alias("s"),
            F.col(label_col).alias("y"),
        )
    )
    hist = scored.groupBy("s").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("cnt_pos")
    )
    offsets = prefix_agg(
        hist,
        [("s", "desc")],
        {"cnt_gt": ("sum", "cnt"), "pos_gt": ("sum", "cnt_pos")},
    ).select("s", "cnt_gt", "pos_gt")
    joined = scored.join(F.broadcast(offsets), "s")
    wb = Window.partitionBy("s").orderBy("_id")
    wbc = wb.rowsBetween(Window.unboundedPreceding, 0)
    ranked = joined.select(
        "y",
        (F.col("cnt_gt") + F.row_number().over(wb)).alias("k"),
        (F.col("pos_gt") + F.sum("y").over(wbc)).alias("cum_pos"),
    )
    terms = ranked.filter(F.col("y") == 1).select(
        F.round(
            F.col("cum_pos").cast("double")
            / F.col("k").cast("double")
            * 1000000000.0
        )
        .cast("long")
        .alias("t")
    )
    n_docs = scored.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    agg = terms.agg(
        F.count(F.lit(1)).alias("n_pos"), F.sum("t").alias("sum_term_nano")
    )
    return agg.crossJoin(F.broadcast(n_docs)).select(
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


def ndcg_at_k(
    df: DataFrame, score_col: str, id_col: str, gain_col: str, k: int
) -> DataFrame:
    """NDCG@k with integer gains: DCG over (score desc, id) top-k,
    IDCG over (gain desc, id) top-k; per-rank gain/log2(rank+1)
    nano-quantized. Returns one row: dcg_nano, idcg_nano,
    ndcg_micro."""

    # Both the DCG and IDCG top-k passes read the caller's plan: pin
    # the narrow projection so the source is scanned once.
    base = pin(df.select(score_col, id_col, gain_col))

    def _dcg(sort_col: str, alias: str) -> DataFrame:
        top = base.orderBy(F.col(sort_col).desc(), F.col(id_col)).limit(k)
        ranked = prefix_rank(
            top, [(sort_col, "desc"), (id_col, "asc")], alias="r"
        ).select(F.col(gain_col).alias("g"), "r")
        term = F.round(
            F.col("g").cast("double")
            / F.log2((F.col("r") + 1).cast("double"))
            * 1000000000.0
        ).cast("long")
        return ranked.agg(F.sum(term).alias(alias))

    dcg = _dcg(score_col, "dcg_nano")
    idcg = _dcg(gain_col, "idcg_nano")
    return dcg.crossJoin(F.broadcast(idcg)).select(
        F.col("dcg_nano").cast("long").alias("dcg_nano"),
        F.col("idcg_nano").cast("long").alias("idcg_nano"),
        F.round(
            F.col("dcg_nano").cast("double")
            / F.col("idcg_nano").cast("double")
            * 1000000.0
        )
        .cast("long")
        .alias("ndcg_micro"),
    )


def calibration_ece(
    df: DataFrame, p_micro_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """Expected calibration error over equal-width confidence bins.
    ``p_micro_col`` must already be micro-quantized (integer in
    [0, 1e6]) so bin sums are exact. Returns per-bin rows with the
    shared ece_micro column."""
    width = 1000000 // n_bins
    # O(bins) aggregate read by the ECE total AND the per-bin output:
    # pin it so the caller's plan runs once.
    binned = pin(
        df.select(F.col(p_micro_col).alias("p"), F.col(label_col).alias("y"))
        .groupBy(
            F.least(F.lit(n_bins - 1), F.expr(f"div(p, {width})")).alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("n_pos"),
            F.sum("p").alias("sum_p_micro"),
        )
    )
    tot = binned.agg(
        F.sum("n").alias("n_total"),
        F.sum(F.abs(F.col("n_pos") * 1000000 - F.col("sum_p_micro"))).alias(
            "numer"
        ),
    )
    out = binned.crossJoin(F.broadcast(tot))
    return out.select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.round(
            F.col("sum_p_micro").cast("double") / F.col("n").cast("double")
        )
        .cast("long")
        .alias("conf_micro"),
        F.round(
            F.col("n_pos").cast("double")
            * 1000000.0
            / F.col("n").cast("double")
        )
        .cast("long")
        .alias("acc_micro"),
        F.round(F.col("numer").cast("double") / F.col("n_total").cast("double"))
        .cast("long")
        .alias("ece_micro"),
    ).orderBy("bin")
