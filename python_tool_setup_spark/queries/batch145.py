"""Round-5 gates, batch 145: Brier score with Murphy decomposition
(q501 — the proper-scoring-rule health check for any probabilistic
classifier: Brier = reliability - resolution + uncertainty, so one
number splits into "are the probabilities honest" (reliability),
"do they separate outcomes" (resolution), and the irreducible base
rate; computed over binned predictions exactly like a production
calibration report) and Kish effective sample size (q502 — what
importance weighting actually costs: after weighting (DSIR-style
quality weights, inverse-propensity weights, mixture reweighting)
the statistical information is n_eff = (sum w)^2 / sum w^2, not n;
the per-group design effect n/n_eff is the factor your variance
grew by — the measured "how much data did the weights burn").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.queries.exactcast import dd_duck
from python_tool_setup_spark.tables import load_table

# Outcome: an order is "urgent" (priority 1-2). Prediction: the
# nation-level urgent share fitted on the pre-cutoff half — a real
# (if simple) probabilistic model, binned to ppm for determinism.
_BRIER_CUTOFF = "1997-01-01"


@register(
    "q501_brier_decomposition",
    f"""
    WITH base AS (
        SELECT n.n_nationkey AS nk,
               CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS y,
               o.o_orderdate < DATE '{_BRIER_CUTOFF}' AS is_fit
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    model AS (
        SELECT nk,
               CAST(ROUND(SUM(y) * 1000000.0 / COUNT(*)) AS BIGINT)
                   AS p_ppm
        FROM base WHERE is_fit GROUP BY nk
    ),
    test AS (
        SELECT m.p_ppm, b.y
        FROM base b JOIN model m ON m.nk = b.nk
        WHERE NOT b.is_fit
    ),
    bins AS (
        SELECT p_ppm, COUNT(*) AS n_k, SUM(y) AS o_k
        FROM test GROUP BY p_ppm
    ),
    tot AS (SELECT SUM(n_k) AS n, SUM(o_k) AS o FROM bins),
    terms AS (
        -- per-bin reliability and resolution terms, nano-quantized
        -- from exact integers BEFORE the sum (FP-order-free)
        SELECT CAST(ROUND(n_k * ((p_ppm / 1000000.0
                   - CAST(o_k AS DOUBLE) / n_k)
                   * (p_ppm / 1000000.0 - CAST(o_k AS DOUBLE) / n_k))
                   * 1000000000.0 / t.n) AS BIGINT) AS rel_nano,
               CAST(ROUND(n_k * ((CAST(o_k AS DOUBLE) / n_k
                   - CAST(t.o AS DOUBLE) / t.n)
                   * (CAST(o_k AS DOUBLE) / n_k
                      - CAST(t.o AS DOUBLE) / t.n))
                   * 1000000000.0 / t.n) AS BIGINT) AS res_nano
        FROM bins CROSS JOIN tot t
    ),
    unc AS (
        SELECT CAST(ROUND((CAST(o AS DOUBLE) / n)
                   * (1 - CAST(o AS DOUBLE) / n) * 1000000000)
                   AS BIGINT) AS unc_nano,
               CAST(n AS BIGINT) AS n_test,
               CAST(o AS BIGINT) AS n_pos
        FROM tot
    )
    SELECT u.n_test, u.n_pos,
           CAST((SELECT COUNT(*) FROM bins) AS BIGINT) AS n_bins,
           CAST((SELECT SUM(rel_nano) FROM terms) AS BIGINT)
               AS reliability_nano,
           CAST((SELECT SUM(res_nano) FROM terms) AS BIGINT)
               AS resolution_nano,
           u.unc_nano AS uncertainty_nano,
           CAST((SELECT SUM(rel_nano) - SUM(res_nano) FROM terms)
               + u.unc_nano AS BIGINT) AS brier_nano
    FROM unc u
    """,
    doc="Brier score with Murphy decomposition (proper-scoring-rule "
    "health check: Brier = reliability - resolution + uncertainty "
    "— 'are the probabilities honest', 'do they separate "
    "outcomes', and the irreducible base rate): the model is the "
    "nation-level urgent-share fitted on the pre-cutoff half and "
    "ppm-binned (a real calibration-report shape — predictions "
    "arrive binned); per-bin reliability/resolution terms are "
    "nano-quantized from exact integer (n_k, o_k, p_ppm) inputs "
    "BEFORE the bin sum, so FP order never touches the result, "
    "and the decomposition identity is assembled in integer "
    "nanos. Scale: one fit aggregate, one test aggregate, "
    "bin-domain metadata after — adding data sharpens the bins "
    "without changing the plan.",
)
def q501_brier_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    base = (
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .select(
            F.col("n_nationkey").alias("nk"),
            F.col("o_orderpriority")
            .isin("1-URGENT", "2-HIGH")
            .cast("long")
            .alias("y"),
            (F.col("o_orderdate") < F.lit(_BRIER_CUTOFF)).alias(
                "is_fit"
            ),
        )
    )
    # Pin the labeled base once: the fit/test split means two passes
    # over it by construction, and unpinned each pass re-ran the
    # 3-table join (24 parquet scans in the r10-before plan).
    base = pin(base)
    model = (
        base.filter("is_fit")
        .groupBy("nk")
        .agg(
            F.round(F.sum("y") * 1000000.0 / F.count(F.lit(1)))
            .cast("long")
            .alias("p_ppm")
        )
    )
    test = base.filter(~F.col("is_fit")).join(
        F.broadcast(model), "nk"
    )
    # Pin the ≤|model bins| calibration histogram: tot/bt/nbins all
    # re-reference it.
    bins = pin(
        test.groupBy("p_ppm").agg(
            F.count(F.lit(1)).alias("n_k"), F.sum("y").alias("o_k")
        )
    )
    tot = bins.agg(
        F.sum("n_k").alias("n"), F.sum("o_k").alias("o")
    )
    bt = bins.crossJoin(F.broadcast(tot))
    p = F.col("p_ppm") / 1000000.0
    ok = F.col("o_k").cast("double") / F.col("n_k")
    ob = F.col("o").cast("double") / F.col("n")
    terms = bt.select(
        F.round(
            F.col("n_k") * ((p - ok) * (p - ok)) * 1000000000.0
            / F.col("n")
        )
        .cast("long")
        .alias("rel_nano"),
        F.round(
            F.col("n_k") * ((ok - ob) * (ok - ob)) * 1000000000.0
            / F.col("n")
        )
        .cast("long")
        .alias("res_nano"),
    )
    tsum = terms.agg(
        F.sum("rel_nano").alias("reliability_nano"),
        F.sum("res_nano").alias("resolution_nano"),
    )
    nbins = bins.agg(F.count(F.lit(1)).alias("n_bins"))
    unc = tot.select(
        F.col("n").cast("long").alias("n_test"),
        F.col("o").cast("long").alias("n_pos"),
        F.round(ob * (1 - ob) * 1000000000)
        .cast("long")
        .alias("uncertainty_nano"),
    )
    return (
        unc.crossJoin(F.broadcast(nbins))
        .crossJoin(F.broadcast(tsum))
        .select(
            "n_test",
            "n_pos",
            F.col("n_bins").cast("long").alias("n_bins"),
            "reliability_nano",
            "resolution_nano",
            "uncertainty_nano",
            (
                F.col("reliability_nano")
                - F.col("resolution_nano")
                + F.col("uncertainty_nano")
            )
            .cast("long")
            .alias("brier_nano"),
        )
    )


# ---------------------------------------------------------------- q502
@register(
    "q502_kish_effective_sample_size",
    f"""
    WITH w AS (
        -- importance weight: quality-style weighting by document
        -- length relative to its source (longer docs upweighted)
        SELECT source, CAST(n_chars AS BIGINT) AS wt FROM documents
    ),
    g AS (
        SELECT source, COUNT(*) AS n, SUM(wt) AS s,
               SUM(wt * wt) AS q
        FROM w GROUP BY source
    )
    SELECT source,
           CAST(n AS BIGINT) AS n,
           CAST(ROUND(CAST(s AS DOUBLE) * s / {dd_duck('q')}) AS BIGINT)
               AS n_eff,
           CAST(ROUND(CAST(n AS DOUBLE) * {dd_duck('q')} * 1000000 / (CAST(s
               AS DOUBLE) * s)) AS BIGINT) AS design_effect_micro,
           CAST(ROUND(CAST(s AS DOUBLE) * s * 1000000
               / ({dd_duck('q')} * n)) AS BIGINT)
               AS efficiency_ppm
    FROM g ORDER BY source
    """,
    doc="Kish effective sample size (what importance weighting "
    "costs: after DSIR-style quality weights / inverse-propensity "
    "weights / mixture reweighting, the statistical information "
    "is n_eff = (sum w)^2 / sum w^2, not n; the design effect "
    "n/n_eff is the factor the variance grew by — the measured "
    "'how much data did the weights burn' every weighted-training "
    "run should report): per-source sufficient statistics (count, "
    "exact integer weight sum, sum of squared weights) from one "
    "map-side-combined groupBy; n_eff, design effect, and "
    "efficiency derived through shared expression text so both "
    "engines round identically. Scale: one aggregate, "
    "source-domain output.",
)
def q502_kish_effective_sample_size(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    g = d.select(
        "source", F.col("n_chars").cast("long").alias("wt")
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("wt").alias("s"),
        F.sum(F.col("wt") * F.col("wt")).alias("q"),
    )
    s_d = F.col("s").cast("double")
    q_d = F.col("q").cast("double")
    n_d = F.col("n").cast("double")
    return g.select(
        "source",
        F.col("n").cast("long").alias("n"),
        F.round(s_d * F.col("s") / F.col("q"))
        .cast("long")
        .alias("n_eff"),
        F.round(n_d * F.col("q") * 1000000 / (s_d * F.col("s")))
        .cast("long")
        .alias("design_effect_micro"),
        F.round(s_d * F.col("s") * 1000000 / (q_d * F.col("n")))
        .cast("long")
        .alias("efficiency_ppm"),
    ).orderBy("source")
