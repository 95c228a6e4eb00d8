"""Round-5 gates, batch 117: SLO error-budget burn (q443 — daily
error-rate against a 99% availability objective, with the burn
multiple and the day the month's budget would exhaust at that
pace: the SRE arithmetic (Google SRE workbook's burn-rate alerts)
over the events stream's error type) and readability scoring
(q444 — Flesch-style reading ease per source from sentence
length and a vowel-group syllable proxy: the text-quality axis
q32's length/punct ratios and q268's LM filter both miss).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_SLO_ERR_BUDGET = 100  # allowed error fraction: 1/100 (99% SLO)


# ---------------------------------------------------------------- q443
@register(
    "q443_slo_burn_rate",
    f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               COUNT(*) AS n,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS e
        FROM events GROUP BY 1
    )
    SELECT CAST(date_diff('day', DATE '1970-01-05', day) AS BIGINT)
               AS day_idx,
           CAST(n AS BIGINT) AS n_events,
           CAST(e AS BIGINT) AS errors,
           CAST(ROUND(1e6 * e / n) AS BIGINT) AS err_rate_micro,
           CAST(ROUND(1e3 * e * {_SLO_ERR_BUDGET} / n) AS BIGINT)
               AS burn_rate_milli,
           e * {_SLO_ERR_BUDGET} > n AS burning
    FROM daily ORDER BY day_idx
    """,
    doc="SLO error-budget burn per day (error rate vs a 99% "
    "availability objective: burn rate = rate/budget — burn 1.0 "
    "spends exactly the budget, 14.4 is the page-now threshold "
    "of the SRE workbook's multiwindow alerts; computed over "
    "the events stream's error type, the operational twin of "
    "q425's statistical anomaly votes): day-domain conditional "
    "counts, burn as an integer ratio in milli, the burning "
    "flag cross-multiplied (e*100 > n) so no division decides "
    "an alert. Scale: one scan to day-domain metadata — the "
    "shape a streaming SLO monitor maintains incrementally.",
)
def q443_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "e"
        ),
    )
    return daily.select(
        F.datediff(F.col("day"), F.lit("1970-01-05").cast("date"))
        .cast("long")
        .alias("day_idx"),
        F.col("n").cast("long").alias("n_events"),
        F.col("e").cast("long").alias("errors"),
        F.round(F.lit(1e6) * F.col("e") / F.col("n"))
        .cast("long")
        .alias("err_rate_micro"),
        F.round(F.lit(1e3) * F.col("e") * _SLO_ERR_BUDGET / F.col("n"))
        .cast("long")
        .alias("burn_rate_milli"),
        (F.col("e") * _SLO_ERR_BUDGET > F.col("n")).alias("burning"),
    ).orderBy("day_idx")


# ---------------------------------------------------------------- q444
@register(
    "q444_readability_scores",
    """
    WITH per_doc AS (
        SELECT source,
               GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                   AS sentences,
               len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS words,
               len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syll
        FROM documents
    ),
    agg AS (
        SELECT source, COUNT(*) AS n_docs,
               SUM(sentences) AS sents, SUM(words) AS words,
               SUM(syll) AS sylls
        FROM per_doc WHERE words > 0 GROUP BY source
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(ROUND(1e3 * words / sents) AS BIGINT)
               AS words_per_sentence_milli,
           CAST(ROUND(1e3 * sylls / words) AS BIGINT)
               AS syllables_per_word_milli,
           CAST(ROUND(1e3 * (206835e-3
               - 1015e-3 * (CAST(words AS DOUBLE) / sents)
               - 846e-1 * (CAST(sylls AS DOUBLE) / words))) AS BIGINT)
               AS flesch_milli
    FROM agg ORDER BY source
    """,
    doc="Flesch-style readability per source (reading ease = "
    "206.835 - 1.015*(words/sentence) - 84.6*(syllables/word), "
    "with syllables proxied by vowel GROUPS — the standard "
    "approximation when no dictionary is allowed; the "
    "text-quality axis that catches run-on machine-generated "
    "prose where q32's punctuation ratios and q268's LM score "
    "pass it): sentence/word/vowel-group counts from identical "
    "char-class regexes in both engines, corpus-level ratios "
    "(not per-doc means — the length-weighted estimate), "
    "e-notation constants, milli-rounded. Scale: scan-bound "
    "regex counting, trivially parallel.",
)
def q444_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    per_doc = d.select(
        "source",
        F.greatest(
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0)),
            F.lit(1),
        ).alias("sentences"),
        F.size(F.regexp_extract_all(low, F.lit("[a-z0-9]+"), 0)).alias("words"),
        F.size(F.regexp_extract_all(low, F.lit("[aeiouy]+"), 0)).alias("syll"),
    ).where(F.col("words") > 0)
    agg = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("sentences").alias("sents"),
        F.sum("words").alias("words"),
        F.sum("syll").alias("sylls"),
    )
    wps = F.col("words").cast("double") / F.col("sents")
    spw = F.col("sylls").cast("double") / F.col("words")
    return agg.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(F.lit(1e3) * F.col("words") / F.col("sents"))
        .cast("long")
        .alias("words_per_sentence_milli"),
        F.round(F.lit(1e3) * F.col("sylls") / F.col("words"))
        .cast("long")
        .alias("syllables_per_word_milli"),
        F.round(
            F.lit(1e3)
            * (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw)
        )
        .cast("long")
        .alias("flesch_milli"),
    ).orderBy("source")
