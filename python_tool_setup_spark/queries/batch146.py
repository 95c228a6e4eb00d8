"""Round-5 gates, batch 146: capture-recapture universe estimate
(q503 — how big is the TRUE deduplicated universe when every crawl
only samples it? Lincoln-Petersen from two overlapping sources:
n_hat = n1*n2/m where m is the cross-source duplicate count by
content hash — the estimator ecology uses for population sizes and
data engineering should use before promising "we have all the
docs") and Good-Turing unseen mass (q504 — the probability that
the NEXT token is one we've never seen: p0 = singletons/total from
the frequency-of-frequencies table; the coverage number that tells
you whether a vocabulary / dictionary / dedup index is anywhere
near closed over the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

# The two "captures": even-indexed vs odd-indexed sources — two
# overlapping samples of the same document universe.
_CAP_A = "CAST(SUBSTRING(source, 4) AS INT) % 2 = 0"


@register(
    "q503_capture_recapture_universe",
    f"""
    WITH marked AS (
        SELECT MD5(text) AS h,
               MAX(CASE WHEN {_CAP_A} THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN {_CAP_A} THEN 0 ELSE 1 END) AS in_b
        FROM documents GROUP BY MD5(text)
    ),
    s AS (
        SELECT SUM(in_a) AS n1, SUM(in_b) AS n2,
               SUM(in_a * in_b) AS m, COUNT(*) AS observed
        FROM marked
    )
    SELECT CAST(n1 AS BIGINT) AS n_capture_a,
           CAST(n2 AS BIGINT) AS n_capture_b,
           CAST(m AS BIGINT) AS n_overlap,
           CAST(observed AS BIGINT) AS n_observed_distinct,
           CAST(ROUND(CAST(n1 AS DOUBLE) * n2 / GREATEST(m, 1))
               AS BIGINT) AS n_hat_universe,
           CAST(ROUND(CAST(n1 AS DOUBLE) * n2 / GREATEST(m, 1))
               AS BIGINT) - observed AS n_est_unseen,
           CAST(ROUND(observed * 1000000.0
               / ROUND(CAST(n1 AS DOUBLE) * n2 / GREATEST(m, 1)))
               AS BIGINT) AS coverage_ppm
    FROM s
    """,
    doc="Capture-recapture universe estimate (Lincoln-Petersen: two "
    "overlapping samples of one universe give n_hat = n1*n2/m "
    "with m the overlap — ecology's population estimator, applied "
    "to 'how many distinct documents exist that our crawls "
    "haven't seen': the honest denominator behind any coverage "
    "claim): distinct content hashes marked per capture with one "
    "groupBy (MAX flags merge map-side), the estimator derived "
    "from four exact integers through shared expression text, "
    "estimated-unseen and coverage ppm reported alongside. "
    "Scale: one hash groupBy — the same shuffle exact dedup "
    "already pays — and a 1-row report.",
)
def q503_capture_recapture_universe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    in_a = (
        F.substring("source", 4, 10).cast("int") % 2 == 0
    ).cast("long")
    marked = d.groupBy(F.md5("text").alias("h")).agg(
        F.max(in_a).alias("in_a"),
        F.max(1 - in_a).alias("in_b"),
    )
    s = marked.agg(
        F.sum("in_a").alias("n1"),
        F.sum("in_b").alias("n2"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("m"),
        F.count(F.lit(1)).alias("observed"),
    )
    n_hat = F.round(
        F.col("n1").cast("double")
        * F.col("n2")
        / F.greatest(F.col("m"), F.lit(1))
    )
    return s.select(
        F.col("n1").cast("long").alias("n_capture_a"),
        F.col("n2").cast("long").alias("n_capture_b"),
        F.col("m").cast("long").alias("n_overlap"),
        F.col("observed").cast("long").alias("n_observed_distinct"),
        n_hat.cast("long").alias("n_hat_universe"),
        (n_hat.cast("long") - F.col("observed"))
        .cast("long")
        .alias("n_est_unseen"),
        F.round(F.col("observed") * 1000000.0 / n_hat)
        .cast("long")
        .alias("coverage_ppm"),
    )


# ---------------------------------------------------------------- q504
@register(
    "q504_good_turing_unseen_mass",
    """
    WITH tok AS (
        SELECT UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS t
        FROM documents
    ),
    clean AS (SELECT t FROM tok WHERE LENGTH(t) > 0),
    freq AS (SELECT t, COUNT(*) AS c FROM clean GROUP BY t),
    fof AS (SELECT c, COUNT(*) AS n_c FROM freq GROUP BY c),
    s AS (
        SELECT SUM(c * n_c) AS total_tokens,
               SUM(n_c) AS vocab,
               COALESCE(MAX(CASE WHEN c = 1 THEN n_c END), 0)
                   AS singletons,
               COALESCE(MAX(CASE WHEN c = 2 THEN n_c END), 0)
                   AS doubletons
        FROM fof
    )
    SELECT CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST(vocab AS BIGINT) AS vocab_size,
           CAST(singletons AS BIGINT) AS singletons,
           CAST(doubletons AS BIGINT) AS doubletons,
           CAST(ROUND(singletons * 1000000.0 / total_tokens)
               AS BIGINT) AS unseen_mass_ppm,
           CAST(ROUND(singletons * 1000000.0 / total_tokens)
               AS BIGINT) < 10000 AS vocab_nearly_closed
    FROM s
    """,
    doc="Good-Turing unseen mass (the probability the NEXT token is "
    "one never seen: p0 = N1/N from the frequency-of-frequencies "
    "table — the coverage number that says whether a vocabulary / "
    "dictionary / dedup index is anywhere near closed over the "
    "corpus; companions: q366 Heaps' growth, q391 coverage curve, "
    "q471 Zipf decay): whitespace tokens exploded JVM-side, one "
    "groupBy to term frequencies, one to the count-of-counts "
    "domain (tiny), the estimator from exact integers; the "
    "nearly-closed verdict at the 1% line. Scale: the token "
    "explode is the corpus pass every text gate pays; everything "
    "after is frequency-domain metadata.",
)
def q504_good_turing_unseen_mass(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.split(F.lower("text"), " ")).alias("t")
    ).filter(F.length("t") > 0)
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    fof = freq.groupBy("c").agg(F.count(F.lit(1)).alias("n_c"))
    s = fof.agg(
        F.sum(F.col("c") * F.col("n_c")).alias("total_tokens"),
        F.sum("n_c").alias("vocab"),
        F.coalesce(
            F.max(F.when(F.col("c") == 1, F.col("n_c"))), F.lit(0)
        ).alias("singletons"),
        F.coalesce(
            F.max(F.when(F.col("c") == 2, F.col("n_c"))), F.lit(0)
        ).alias("doubletons"),
    )
    p0 = F.round(
        F.col("singletons") * 1000000.0 / F.col("total_tokens")
    )
    return s.select(
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("vocab").cast("long").alias("vocab_size"),
        F.col("singletons").cast("long").alias("singletons"),
        F.col("doubletons").cast("long").alias("doubletons"),
        p0.cast("long").alias("unseen_mass_ppm"),
        (p0.cast("long") < 10000).alias("vocab_nearly_closed"),
    )
