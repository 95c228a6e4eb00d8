"""Round-4 gates, batch 48: distinct-n corpus diversity metrics
(q300 — the generated-data diversity readout: distinct-1/distinct-2
ratios per source) and a Zipf rank-frequency fit (q301 — the
vocabulary health check: log-log least-squares slope over the top
ranks, the power-law exponent a natural corpus should keep near -1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import prefix_rank
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.queries.exactcast import dd_duck
from python_tool_setup_spark.tables import load_table

_ZIPF_TOP = 200


# ---------------------------------------------------------------- q300
@register(
    "q300_distinct_n_diversity",
    """
    WITH toks AS (
        SELECT source, doc_id, unnest(arr) AS w,
               generate_subscripts(arr, 1) AS i
        FROM (SELECT source, doc_id, string_split(text, ' ') AS arr
              FROM documents)
    ),
    uni AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n1_total,
               CAST(COUNT(DISTINCT w) AS BIGINT) AS n1_distinct
        FROM toks GROUP BY source
    ),
    bg AS (
        SELECT source,
               w || ' ' || LEAD(w) OVER (PARTITION BY doc_id ORDER BY i)
                   AS b
        FROM toks
    ),
    bi AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n2_total,
               CAST(COUNT(DISTINCT b) AS BIGINT) AS n2_distinct
        FROM bg WHERE b IS NOT NULL GROUP BY source
    )
    SELECT uni.source, n1_total, n1_distinct,
           CAST(ROUND((CAST(n1_distinct AS DOUBLE)
               / CAST(n1_total AS DOUBLE)) * 1000000.0) AS BIGINT)
               AS distinct1_micro,
           n2_total, n2_distinct,
           CAST(ROUND((CAST(n2_distinct AS DOUBLE)
               / CAST(n2_total AS DOUBLE)) * 1000000.0) AS BIGINT)
               AS distinct2_micro
    FROM uni JOIN bi ON uni.source = bi.source
    ORDER BY uni.source
    """,
    doc="Distinct-n diversity metrics per source (the distinct-1/"
    "distinct-2 ratios of Li et al.'s diversity eval — the "
    "degenerate-generation detector at CORPUS level, complementing "
    "q297's per-document repetition and q288's vocab churn): "
    "unigram and bigram token totals vs distinct counts, ratio "
    "micro-quantized from exact integers. Plan: split+posexplode "
    "once, bigrams via one LEAD window on the doc key, then two "
    "partial-aggregating distinct counts grouped by source — "
    "distinct-count shuffles are on (source, gram), never a "
    "global set; at 100 TB swap COUNT(DISTINCT) for the q67 "
    "approx_count_distinct cutoff, same plan shape.",
)
def q300_distinct_n_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w")
    )
    uni = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n1_total"),
        F.countDistinct("w").cast("long").alias("n1_distinct"),
    )
    lead_w = F.lead("w").over(Window.partitionBy("doc_id").orderBy("i"))
    bg = toks.select(
        "source",
        F.when(lead_w.isNotNull(), F.concat_ws(" ", F.col("w"), lead_w)).alias("b"),
    )
    bi = (
        bg.filter(F.col("b").isNotNull())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n2_total"),
            F.countDistinct("b").cast("long").alias("n2_distinct"),
        )
    )
    r1 = F.round(
        (F.col("n1_distinct").cast("double") / F.col("n1_total").cast("double"))
        * 1000000.0
    ).cast("long")
    r2 = F.round(
        (F.col("n2_distinct").cast("double") / F.col("n2_total").cast("double"))
        * 1000000.0
    ).cast("long")
    return (
        uni.join(bi, "source")
        .select(
            "source",
            "n1_total",
            "n1_distinct",
            r1.alias("distinct1_micro"),
            "n2_total",
            "n2_distinct",
            r2.alias("distinct2_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------- q301
@register(
    "q301_zipf_fit",
    f"""
    WITH freq AS (
        SELECT w, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY w
    ),
    top_ AS (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS r
        FROM freq ORDER BY n DESC, w LIMIT {_ZIPF_TOP}
    ),
    pts AS (
        SELECT CAST(ROUND(ln(CAST(r AS DOUBLE)) * 1000000000.0) AS BIGINT)
                   AS x,
               CAST(ROUND(ln(CAST(n AS DOUBLE)) * 1000000000.0) AS BIGINT)
                   AS y
        FROM top_
    ),
    s AS (
        SELECT COUNT(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy
        FROM pts
    ),
    d AS (
        SELECT CAST(k AS DOUBLE) AS kd,
               {dd_duck('sx')} / 1000000000.0 AS sx,
               {dd_duck('sy')} / 1000000000.0 AS sy,
               {dd_duck('sxy')} / 1000000000.0 / 1000000000.0 AS sxy,
               {dd_duck('sxx')} / 1000000000.0 / 1000000000.0 AS sxx,
               {dd_duck('syy')} / 1000000000.0 / 1000000000.0 AS syy
        FROM s
    )
    SELECT CAST(kd AS BIGINT) AS n_ranks,
           CAST(ROUND(((kd * sxy - sx * sy) / (kd * sxx - sx * sx))
               * 1000000.0) AS BIGINT) AS slope_micro,
           CAST(ROUND(((sy - ((kd * sxy - sx * sy)
                              / (kd * sxx - sx * sx)) * sx) / kd)
               * 1000000.0) AS BIGINT) AS intercept_micro,
           CAST(ROUND((((kd * sxy - sx * sy) * (kd * sxy - sx * sy))
               / ((kd * sxx - sx * sx) * (kd * syy - sy * sy)))
               * 1000000.0) AS BIGINT) AS r2_micro
    FROM d
    """,
    doc="Zipf rank-frequency fit (vocabulary health: natural text "
    "keeps the log-log slope near -1; template-generated or "
    "deduplicated-to-death corpora flatten or steepen it — the "
    "distributional cousin of q222's vocab audit and q288's "
    "churn): global word counts, top-200 ranks with lexicographic "
    "tiebreaks, then ordinary least squares of ln(freq) on "
    "ln(rank) with slope / intercept / R^2. Engine-exact: each "
    "ln() is quantized to nano BEFORE the sums (1-ulp posture), "
    "the moment sums are exact integers (products pass 2^63 -> "
    "DECIMAL(38,0)/HUGEINT), and the closed-form OLS runs in "
    "identical correctly-rounded double association on both "
    "engines. Scale: one (word) groupBy + distributed TakeOrdered "
    "top-K + a 1-row reduce — the regression itself is O(K) "
    "metadata.",
)
def q301_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = freq.orderBy(F.col("n").desc(), "w").limit(_ZIPF_TOP)
    ranked = prefix_rank(
        top, [("n", "desc"), ("w", "asc")], alias="r"
    ).select("n", "r")
    pts = ranked.select(
        F.round(F.log(F.col("r").cast("double")) * 1000000000.0)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("n").cast("double")) * 1000000000.0)
        .cast("long")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        # cast BEFORE the multiply: nano-quantized ln terms reach
        # ~5e9, so the long*long product itself would pass 2^63
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    giga = 1000000000.0
    dd = s.select(
        F.col("k").cast("double").alias("kd"),
        (F.col("sx").cast("double") / giga).alias("sx"),
        (F.col("sy").cast("double") / giga).alias("sy"),
        (F.col("sxy").cast("double") / giga / giga).alias("sxy"),
        (F.col("sxx").cast("double") / giga / giga).alias("sxx"),
        (F.col("syy").cast("double") / giga / giga).alias("syy"),
    )
    kd, sx, sy = F.col("kd"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (kd * sxy - sx * sy) / (kd * sxx - sx * sx)
    return dd.select(
        kd.cast("long").alias("n_ranks"),
        F.round(slope * 1000000.0).cast("long").alias("slope_micro"),
        F.round(((sy - slope * sx) / kd) * 1000000.0)
        .cast("long")
        .alias("intercept_micro"),
        F.round(
            ((kd * sxy - sx * sy) * (kd * sxy - sx * sy))
            / ((kd * sxx - sx * sx) * (kd * syy - sy * sy))
            * 1000000.0
        )
        .cast("long")
        .alias("r2_micro"),
    )
