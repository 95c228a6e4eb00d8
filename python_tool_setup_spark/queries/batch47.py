"""Round-4 gates, batch 47: pairwise Pearson correlation matrix
(q298 — the multivariate half of the q278 profiler, computed from
one-pass exact integer sums) and a Benford first-digit conformance
audit (q299 — the fraud/data-entry anomaly screen on monetary
columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.queries.exactcast import dd_duck
from python_tool_setup_spark.tables import load_table

# (name, source column, integer quantization scale)
_COLS = [
    ("qty", "l_quantity", 100),
    ("price", "l_extendedprice", 100),
    ("disc", "l_discount", 100),
    ("tax", "l_tax", 100),
]
_PAIRS = [(i, j) for i in range(len(_COLS)) for j in range(len(_COLS)) if i < j]


def _corr_sql_term(xa: str, xb: str) -> str:
    return (
        f"CAST(ROUND(((nd * s_{xa}_{xb} - s_{xa} * s_{xb})"
        f" / (sqrt(nd * s_{xa}_{xa} - s_{xa} * s_{xa})"
        f" * sqrt(nd * s_{xb}_{xb} - s_{xb} * s_{xb})))"
        " * 1000000.0) AS BIGINT)"
    )


def _build_corr_sql() -> str:
    sums = ["COUNT(*) AS n"]
    for name, col, scale in _COLS:
        sums.append(f"SUM(CAST(ROUND({col} * {scale}) AS BIGINT)) AS i_{name}")
    for i, j in _PAIRS + [(k, k) for k in range(len(_COLS))]:
        a, ca, sa = _COLS[i]
        b, cb, sb = _COLS[j]
        sums.append(
            f"SUM(CAST(ROUND({ca} * {sa}) AS BIGINT)"
            f" * CAST(ROUND({cb} * {sb}) AS BIGINT)) AS p_{a}_{b}"
        )
    casts = ["CAST(n AS DOUBLE) AS nd"]
    for name, _, _ in _COLS:
        # linear cents sums stay < 2^53 at any tested SF (waived
        # class) — the native cast is exact there
        casts.append(f"CAST(i_{name} AS DOUBLE) AS s_{name}")
    for i, j in _PAIRS + [(k, k) for k in range(len(_COLS))]:
        a = _COLS[i][0]
        b = _COLS[j][0]
        # PRODUCT sums pass 2^53 (cents^2 per row up to 1e14), where
        # DuckDB's native HUGEINT->DOUBLE cast is not correctly
        # rounded (exactcast mechanism, multi-seed catch #6); Spark's
        # DECIMAL(38,0)->double is. Two-limb conversion makes the
        # oracle correctly rounded too. Surfaced by the r9-advice
        # census rewrite in tests/test_exactcast.py (the old regex's
        # swallowed-body hole had exempted exactly these sites).
        casts.append(f"{dd_duck(f'p_{a}_{b}')} AS s_{a}_{b}")
    rows = []
    for i, j in _PAIRS:
        a = _COLS[i][0]
        b = _COLS[j][0]
        rows.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, "
            + _corr_sql_term(a, b)
            + " AS corr_micro FROM d"
        )
    return (
        "WITH s AS (SELECT "
        + ", ".join(sums)
        + " FROM lineitem), d AS (SELECT "
        + ", ".join(casts)
        + " FROM s) "
        + " UNION ALL ".join(rows)
        + " ORDER BY col_x, col_y"
    )


# ---------------------------------------------------------------- q298
@register(
    "q298_correlation_matrix",
    _build_corr_sql(),
    doc="Pairwise Pearson correlation matrix over the four numeric "
    "lineitem measures — the multivariate data-profiling readout "
    "(q278 profiles columns independently; q294 covers the "
    "categorical side with MI). Engine-exact by construction: "
    "values quantize to integer hundredths, ONE pass accumulates "
    "exact n / Σx / Σxy for all columns and pairs (cross-products "
    "summed in DECIMAL(38,0)/HUGEINT — they pass 2^63 at sf>=0.1), "
    "and each correlation is derived from those integers by "
    "correctly-rounded IEEE ops in an identical association on "
    "both engines, micro-quantized last. Scale: a single scan "
    "with map-side partials and a 1-row reduce for ANY number of "
    "column pairs — the textbook one-pass moment matrix, no "
    "per-pair scans, no shuffle of data rows.",
)
def q298_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def iq(col: str, scale: int) -> F.Column:
        return F.round(F.col(col) * scale).cast("long")

    aggs = [F.count(F.lit(1)).alias("n")]
    for name, col, scale in _COLS:
        aggs.append(F.sum(iq(col, scale)).alias(f"i_{name}"))
    for i, j in _PAIRS + [(k, k) for k in range(len(_COLS))]:
        a, ca, sa = _COLS[i]
        b, cb, sb = _COLS[j]
        aggs.append(
            F.sum((iq(ca, sa) * iq(cb, sb)).cast("decimal(38,0)")).alias(
                f"p_{a}_{b}"
            )
        )
    s = li.agg(*aggs)
    nd = F.col("n").cast("double")
    sd = {f"s_{n}": F.col(f"i_{n}").cast("double") for n, _, _ in _COLS}
    for i, j in _PAIRS + [(k, k) for k in range(len(_COLS))]:
        a = _COLS[i][0]
        b = _COLS[j][0]
        sd[f"s_{a}_{b}"] = F.col(f"p_{a}_{b}").cast("double")

    def corr(a: str, b: str) -> F.Column:
        num = nd * sd[f"s_{a}_{b}"] - sd[f"s_{a}"] * sd[f"s_{b}"]
        da = F.sqrt(nd * sd[f"s_{a}_{a}"] - sd[f"s_{a}"] * sd[f"s_{a}"])
        db = F.sqrt(nd * sd[f"s_{b}_{b}"] - sd[f"s_{b}"] * sd[f"s_{b}"])
        return F.round((num / (da * db)) * 1000000.0).cast("long")

    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(_COLS[i][0]).alias("col_x"),
                    F.lit(_COLS[j][0]).alias("col_y"),
                    corr(_COLS[i][0], _COLS[j][0]).alias("corr_micro"),
                )
                for i, j in _PAIRS
            ]
        )
    )
    return (
        s.select(pairs.alias("p"))
        .select("p.col_x", "p.col_y", "p.corr_micro")
        .orderBy("col_x", "col_y")
    )


# ---------------------------------------------------------------- q299
@register(
    "q299_benford_audit",
    """
    WITH cents AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
        FROM orders WHERE o_totalprice > 0
    ),
    digits AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS d,
               COUNT(*) AS n
        FROM cents GROUP BY 1
    ),
    base AS (
        SELECT d, n, SUM(n) OVER () AS total,
               log10(1.0 + 1.0 / CAST(d AS DOUBLE)) AS p
        FROM digits
    ),
    terms AS (
        SELECT d, n, total,
               CAST(ROUND(p * 1000000000.0) AS BIGINT) AS p_benford_nano,
               CAST(ROUND(((CAST(n AS DOUBLE)
                            - CAST(total AS DOUBLE) * p)
                           * (CAST(n AS DOUBLE)
                              - CAST(total AS DOUBLE) * p)
                           / (CAST(total AS DOUBLE) * p))
                   * 1000000.0) AS BIGINT) AS chi2_term_micro
        FROM base
    )
    SELECT d AS digit, CAST(n AS BIGINT) AS n_obs,
           p_benford_nano, chi2_term_micro,
           CAST(SUM(chi2_term_micro) OVER () AS BIGINT) AS chi2_total_micro
    FROM terms ORDER BY digit
    """,
    doc="Benford first-digit conformance audit on the monetary "
    "column — the classic fraud / fabricated-data screen (real "
    "transaction amounts follow log10(1+1/d); fabricated or "
    "truncated ones don't): first significant digit taken from "
    "the INTEGER cents string (no log-of-value digit extraction, "
    "so no FP boundary risk), observed counts vs Benford "
    "expectation, and the per-digit chi-square contributions plus "
    "total. Expectation and chi-square terms quantize per-digit "
    "before the 9-term integer sum (ln/log10 1-ulp posture). "
    "Scale: one scan, a 9-group aggregate, window sums over 9 "
    "rows — metadata all the way after the map side.",
)
def q299_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = o.filter(F.col("o_totalprice") > 0).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
    )
    digits = (
        cents.select(
            F.substring(F.col("c").cast("string"), 1, 1).cast("long").alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = digits.agg(F.sum("n").alias("total"))
    p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d").cast("double"))
    base = digits.crossJoin(F.broadcast(tot)).select(
        "d", "n", "total", p.alias("p")
    )
    nd = F.col("n").cast("double")
    td = F.col("total").cast("double")
    chi_term = F.round(
        ((nd - td * F.col("p")) * (nd - td * F.col("p")) / (td * F.col("p")))
        * 1000000.0
    ).cast("long")
    terms = base.select(
        "d",
        "n",
        "total",
        F.round(F.col("p") * 1000000000.0).cast("long").alias("p_benford_nano"),
        chi_term.alias("chi2_term_micro"),
    )
    chi_tot = terms.agg(F.sum("chi2_term_micro").alias("_chi_tot"))
    return terms.crossJoin(F.broadcast(chi_tot)).select(
        F.col("d").alias("digit"),
        F.col("n").cast("long").alias("n_obs"),
        "p_benford_nano",
        "chi2_term_micro",
        F.col("_chi_tot").cast("long").alias("chi2_total_micro"),
    ).orderBy("digit")
