"""Round-5 gates, batch 105: within-part price dispersion (q416 —
the parts whose transaction prices vary most across lineitems: the
pricing-inconsistency audit a catalog team runs before blaming the
market; coefficient-of-variation ranked, exact integer moments)
and a geometric distribution fit of order sizes (q417 — MLE-fitted
geometric law against the observed lines-per-order histogram with
a chi-square readout: the parametric cousin of q410's
goodness-of-fit, and the sanity check behind any synthetic-data
generator that claims to mimic order shapes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_TOPK = 10
_KMAX = 7  # explicit geometric pmf terms; k > _KMAX pools into a tail


# ---------------------------------------------------------------- q416
@register(
    "q416_price_dispersion_topk",
    f"""
    WITH m AS (
        SELECT l_partkey,
               COUNT(*) AS n,
               SUM(CAST(ROUND(100 * l_extendedprice / l_quantity)
                   AS BIGINT)) AS s,
               SUM(CAST(CAST(ROUND(100 * l_extendedprice / l_quantity)
                   AS BIGINT) AS HUGEINT)
                   * CAST(ROUND(100 * l_extendedprice / l_quantity)
                     AS BIGINT)) AS ss
        FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 3
    )
    SELECT l_partkey,
           CAST(n AS BIGINT) AS n,
           CAST(ROUND(CAST(s AS DOUBLE) / n) AS BIGINT) AS mean_cents,
           CAST(ROUND(1e6 * sqrt(CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)
               / CAST(s AS DOUBLE)) AS BIGINT) AS cv_micro
    FROM m
    ORDER BY cv_micro DESC, l_partkey LIMIT {_TOPK}
    """,
    doc="Within-part price-dispersion ranking (top-10 parts by "
    "coefficient of variation of the realized unit price — the "
    "pricing-inconsistency audit that separates 'volatile "
    "market' from 'broken price list'; q105/q149 flag outlier "
    "ROWS, this flags outlier KEYS): unit price cent-quantized "
    "per line, per-part count/sum/sum-of-squares in exact "
    "integers (HUGEINT/DECIMAL squares), CV as "
    "sqrt(n*ss - s^2)/s in identical double shape, "
    "deterministic (cv, partkey) TakeOrdered. Scale: one "
    "partkey aggregate, then a bounded top-k — no sort of the "
    "full key domain.",
)
def q416_price_dispersion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(
        100 * F.col("l_extendedprice") / F.col("l_quantity")
    ).cast("long")
    m = (
        li.groupBy("l_partkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents).alias("s"),
            F.sum(cents.cast("decimal(38,0)") * cents).alias("ss"),
        )
        .where(F.col("n") >= 3)
    )
    cv = (
        F.lit(1e6)
        * F.sqrt(
            F.col("n").cast("double") * F.col("ss")
            - F.col("s").cast("double") * F.col("s")
        )
        / F.col("s").cast("double")
    )
    return (
        m.select(
            "l_partkey",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("s").cast("double") / F.col("n"))
            .cast("long")
            .alias("mean_cents"),
            F.round(cv).cast("long").alias("cv_micro"),
        )
        .orderBy(F.col("cv_micro").desc(), "l_partkey")
        .limit(_TOPK)
    )


def _geom_pow_sql(q: str, e: int) -> str:
    """q**e as an explicit left-associated product (IEEE-exact in
    both engines; libm pow is not)."""
    if e == 0:
        return "1e0"
    out = q
    for _ in range(e - 1):
        out = f"({out} * {q})"
    return out


def _geom_pow_col(q, e: int):
    if e == 0:
        return F.lit(1.0)
    out = q
    for _ in range(e - 1):
        out = out * q
    return out


# ---------------------------------------------------------------- q417
@register(
    "q417_geometric_fit_order_sizes",
    f"""
    WITH sizes AS (
        SELECT l_orderkey, COUNT(*) AS k FROM lineitem GROUP BY l_orderkey
    ),
    hist AS (
        SELECT LEAST(k, {_KMAX + 1}) AS kb, COUNT(*) AS obs
        FROM sizes GROUP BY LEAST(k, {_KMAX + 1})
    ),
    fit AS (SELECT COUNT(*) AS n, SUM(k) AS tot FROM sizes),
    par AS (
        SELECT n, CAST(n AS DOUBLE) / tot AS p,
               1e0 - CAST(n AS DOUBLE) / tot AS q
        FROM fit
    ),
    expect AS (
        SELECT h.kb, h.obs, par.n,
               CASE h.kb
                   {" ".join(
                       f"WHEN {k} THEN CAST(ROUND(par.n * par.p "
                       f"* {_geom_pow_sql('par.q', k - 1)} * 1e6) AS BIGINT)"
                       for k in range(1, _KMAX + 1)
                   )}
                   ELSE CAST(ROUND(par.n
                       * {_geom_pow_sql('par.q', _KMAX)} * 1e6) AS BIGINT)
               END AS exp_micro
        FROM hist h, par
    )
    SELECT CAST(kb AS BIGINT) AS k_bucket,
           CAST(obs AS BIGINT) AS observed,
           exp_micro AS expected_micro,
           CAST(ROUND(1e3
               * (CAST(obs AS DOUBLE) - exp_micro / 1e6)
               * (CAST(obs AS DOUBLE) - exp_micro / 1e6)
               / (exp_micro / 1e6)) AS BIGINT) AS chisq_term_milli
    FROM expect ORDER BY kb
    """,
    doc="Geometric-law fit of the lines-per-order distribution "
    "(MLE p = 1/mean; expected bucket masses n*p*(1-p)^(k-1) "
    "with the k>7 tail pooled by the complement identity "
    "(1-p)^7 — per-bucket chi-square terms quantify where the "
    "real order-shape distribution departs from the memoryless "
    "model; q410 tests against a POOLED empirical profile, this "
    "tests against a FITTED parametric one, the audit a "
    "synthetic-data generator must pass): powers as explicit "
    "left-associated products (libm pow is last-ulp "
    "engine-dependent; products are IEEE-exact), expectations "
    "micro-quantized, chi terms milli-quantized from the "
    "quantized expectations so both engines compare identical "
    "integers. Scale: one orderkey aggregate to a <=8-bucket "
    "histogram; fitting is metadata math.",
)
def q417_geometric_fit_order_sizes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(F.count("*").alias("k"))
    hist = sizes.groupBy(
        F.least(F.col("k"), F.lit(_KMAX + 1)).alias("kb")
    ).agg(F.count("*").alias("obs"))
    par = sizes.agg(
        F.count("*").alias("n"), F.sum("k").alias("tot")
    ).select(
        "n",
        (F.col("n").cast("double") / F.col("tot")).alias("p"),
        (F.lit(1.0) - F.col("n").cast("double") / F.col("tot")).alias("q"),
    )
    def bucket_exp(k: int):
        return F.round(
            F.col("n")
            * F.col("p")
            * _geom_pow_col(F.col("q"), k - 1)
            * F.lit(1e6)
        ).cast("long")

    exp_case = F.when(F.col("kb") == 1, bucket_exp(1))
    for k in range(2, _KMAX + 1):
        exp_case = exp_case.when(F.col("kb") == k, bucket_exp(k))
    exp_case = exp_case.otherwise(
        F.round(
            F.col("n") * _geom_pow_col(F.col("q"), _KMAX) * F.lit(1e6)
        ).cast("long")
    )
    expect = hist.crossJoin(F.broadcast(par)).select(
        "kb", "obs", exp_case.alias("exp_micro")
    )
    e_d = F.col("exp_micro") / F.lit(1e6)
    dev = F.col("obs").cast("double") - e_d
    return expect.select(
        F.col("kb").cast("long").alias("k_bucket"),
        F.col("obs").cast("long").alias("observed"),
        F.col("exp_micro").alias("expected_micro"),
        F.round(F.lit(1e3) * dev * dev / e_d)
        .cast("long")
        .alias("chisq_term_milli"),
    ).orderBy("kb")
