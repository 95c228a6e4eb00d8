"""Round-5 gates, batch 141: template-prefix mining (q493 — the
synthetic/boilerplate screen for training corpora: documents that
share an identical leading span are usually template-generated or
scraper artifacts; mining the most frequent prefixes with their
corpus share is how you find the templates BEFORE they dominate a
fine-tune) and Hill tail-index estimation (q494 — the standard
power-law tail exponent over document lengths: alpha from the top-k
order statistics, the length-domain companion to q471's Zipf token
fit; a heavy tail (small alpha) is the measured warning that a few
giant documents will dominate token budgets and packing bins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_PREFIX_LEN = 12
_TOP_PREFIXES = 10
_TEMPLATE_PPM = 10_000  # flag prefixes covering >1% of the corpus


@register(
    "q493_template_prefix_mining",
    f"""
    WITH p AS (
        SELECT SUBSTRING(text, 1, {_PREFIX_LEN}) AS prefix,
               COUNT(*) AS cnt
        FROM documents GROUP BY 1
    ),
    tot AS (SELECT SUM(cnt) AS n FROM p)
    SELECT prefix, CAST(cnt AS BIGINT) AS n_docs,
           CAST(ROUND(cnt * 1000000.0 / t.n) AS BIGINT) AS share_ppm,
           ROUND(cnt * 1000000.0 / t.n) >= {_TEMPLATE_PPM}
               AS is_template
    FROM p CROSS JOIN tot t
    ORDER BY cnt DESC, prefix LIMIT {_TOP_PREFIXES}
    """,
    doc="Template-prefix mining (boilerplate/synthetic screen: "
    "documents sharing an identical leading span are usually "
    "template-generated; surfacing the most frequent prefixes "
    "with corpus share finds the templates before they dominate "
    "a fine-tune): one map-side-combined groupBy on the fixed-"
    "width prefix, total by a 1-row broadcast, and a distributed "
    "top-k (TakeOrdered — count desc, prefix asc tiebreak, never "
    "a global sort of the full domain); share ppm-rounded from "
    "exact integers, template flag at the 1% line. Scale: the "
    "prefix domain is bounded by the corpus, the scan reads one "
    "column, and k rows leave the cluster.",
)
def q493_template_prefix_mining(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    p = d.groupBy(
        F.substring("text", 1, _PREFIX_LEN).alias("prefix")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = p.agg(F.sum("cnt").alias("n"))
    share = F.round(F.col("cnt") * 1000000.0 / F.col("n"))
    return (
        p.crossJoin(F.broadcast(tot))
        .select(
            "prefix",
            F.col("cnt").cast("long").alias("n_docs"),
            share.cast("long").alias("share_ppm"),
            (share >= _TEMPLATE_PPM).alias("is_template"),
        )
        .orderBy(F.col("n_docs").desc(), "prefix")
        .limit(_TOP_PREFIXES)
    )


# ---------------------------------------------------------------- q494
_HILL_K = 100
# per-order-statistic log ratio, nano-quantized from exact integer
# (x_i, x_k) inputs — shared verbatim by both engines.
_HILL_TERM_EXPR = (
    "CAST(ROUND(LN(CAST(x AS DOUBLE) / xk) * 1000000000) AS BIGINT)"
)
_HILL_ALPHA_EXPR = (
    "CAST(ROUND(CAST(k_used - 1 AS DOUBLE) * 1000000000 * 1000000"
    " / sum_nano) AS BIGINT)"
)


@register(
    "q494_hill_tail_index",
    f"""
    WITH ranked AS (
        SELECT n_chars,
               ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id)
                   AS r
        FROM documents
    ),
    topk AS (
        SELECT n_chars FROM ranked WHERE r <= {_HILL_K} + 1
    ),
    xk AS (SELECT MIN(n_chars) AS xk, COUNT(*) AS k1 FROM topk),
    terms AS (
        SELECT t.n_chars AS x, s.xk,
               {_HILL_TERM_EXPR} AS term_nano
        FROM topk t CROSS JOIN xk s
        WHERE t.n_chars > s.xk
    ),
    agg AS (
        SELECT SUM(term_nano) AS sum_nano, COUNT(*) + 1 AS k_used,
               MAX(xk) AS xk
        FROM terms
    )
    SELECT CAST(k_used AS BIGINT) AS k_used,
           CAST(xk AS BIGINT) AS x_k,
           CAST(sum_nano AS BIGINT) AS hill_sum_nano,
           {_HILL_ALPHA_EXPR} AS alpha_micro,
           {_HILL_ALPHA_EXPR} < 2000000 AS heavy_tail
    FROM agg
    """,
    doc="Hill tail-index estimation (power-law exponent of the "
    "document-length tail from the top-k order statistics: "
    "1/alpha = mean ln(x_i/x_k) over the k largest values — the "
    "length-domain companion to q471's Zipf token fit; alpha < 2 "
    "means infinite variance, the measured warning that a few "
    "giant documents dominate token budgets and packing bins): "
    "the top k+1 values come from a distributed TakeOrdered "
    "(value desc, doc_id tiebreak — the multiset of values is "
    "deterministic under ties), x_k is their minimum, each log "
    "ratio is nano-quantized from exact integer (x_i, x_k) "
    "inputs BEFORE the sum (FP-order-free), and alpha inverts "
    "the mean in one shared integer-input expression. Ties with "
    "x_k are excluded from the numerator exactly as the "
    "estimator requires (x_i > x_k). Scale: one column scan + "
    "k+1 rows off the cluster; k is fixed, data size only "
    "sharpens the estimate.",
)
def q494_hill_tail_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    topk = (
        d.select("n_chars", "doc_id")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .limit(_HILL_K + 1)
        .select("n_chars")
    )
    xk = topk.agg(
        F.min("n_chars").alias("xk"), F.count(F.lit(1)).alias("k1")
    )
    terms = (
        topk.crossJoin(F.broadcast(xk))
        .filter(F.col("n_chars") > F.col("xk"))
        .select(
            F.col("n_chars").alias("x"),
            "xk",
            F.expr(_HILL_TERM_EXPR).alias("term_nano"),
        )
    )
    agg = terms.agg(
        F.sum("term_nano").alias("sum_nano"),
        (F.count(F.lit(1)) + 1).alias("k_used"),
        F.max("xk").alias("xk"),
    )
    return agg.select(
        F.col("k_used").cast("long").alias("k_used"),
        F.col("xk").cast("long").alias("x_k"),
        F.col("sum_nano").cast("long").alias("hill_sum_nano"),
        F.expr(_HILL_ALPHA_EXPR).alias("alpha_micro"),
        (F.expr(_HILL_ALPHA_EXPR) < 2_000_000).alias("heavy_tail"),
    )
