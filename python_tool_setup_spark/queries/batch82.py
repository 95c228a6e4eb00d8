"""Round-5 gates, batch 82: generation-loop detection (q368 — docs
whose text repeats the same 5-gram over and over: the signature of
model-generated or boilerplate-stuffed text, a standard pretraining
quality filter alongside q297's top-bigram repetition) and tokenizer
fertility (q369 — characters per whitespace token by language: the
data-card number that predicts how many subword tokens a tokenizer
will spend per word of each language).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_LOOP_N = 5  # shingle width
_LOOP_K = 3  # repeats of one shingle that flag a loop


# ---------------------------------------------------------------- q368
@register(
    "q368_repetition_loops",
    f"""
    WITH sh AS (
        SELECT doc_id, source,
               arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] || ' '
                   || arr[i+3] || ' ' || arr[i+4] AS g
        FROM (SELECT doc_id, source, string_split(text, ' ') AS arr
              FROM documents),
             generate_series(1, 1000) AS t(i)
        WHERE i + {_LOOP_N - 1} <= len(arr)
    ),
    per_doc AS (
        SELECT doc_id, source, MAX(cnt) AS max_rep
        FROM (SELECT doc_id, source, g, COUNT(*) AS cnt FROM sh
              GROUP BY doc_id, source, g)
        GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN max_rep >= {_LOOP_K} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_loopy,
           CAST(MAX(max_rep) AS BIGINT) AS worst_repetition,
           CAST(ROUND(CAST(SUM(CASE WHEN max_rep >= {_LOOP_K}
                   THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) * 1000000.0) AS BIGINT) AS loopy_share_micro
    FROM per_doc GROUP BY source ORDER BY source
    """,
    doc="Generation-loop detection: a doc whose single most-repeated "
    f"{_LOOP_N}-gram occurs >= {_LOOP_K} times is 'loopy' — the "
    "fingerprint of degenerate model output and template spam, a "
    "standard pretraining exclusion filter (the phrase-level "
    "sibling of q297's top-bigram share and q120's cross-doc "
    "repeated spans): per-doc shingle counts in one groupBy, "
    "per-doc max, per-source loopy share. Docs with fewer than "
    f"{_LOOP_N} tokens have no shingles and drop out (they cannot "
    "loop). Scale: the shingle groupBy is keyed (doc, gram) — "
    "co-partitioned with the doc, no cross-doc hot keys.",
)
def q368_repetition_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("i", "w"),
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    leads = [F.lead("w", k).over(w) for k in range(1, _LOOP_N)]
    gram = F.concat_ws(" ", F.col("w"), *leads)
    sh = toks.select(
        "doc_id",
        "source",
        F.when(leads[-1].isNotNull(), gram).alias("g"),
    ).filter(F.col("g").isNotNull())
    per_doc = (
        sh.groupBy("doc_id", "source", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id", "source")
        .agg(F.max("cnt").alias("max_rep"))
    )
    loopy = F.when(F.col("max_rep") >= _LOOP_K, 1).otherwise(0)
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(loopy).alias("n_loopy"),
            F.max("max_rep").alias("worst_repetition"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_loopy").cast("long").alias("n_loopy"),
            F.col("worst_repetition").cast("long").alias("worst_repetition"),
            F.round(
                F.col("n_loopy").cast("double")
                / F.col("n_docs").cast("double")
                * 1000000.0
            )
            .cast("long")
            .alias("loopy_share_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------- q369
@register(
    "q369_tokenizer_fertility",
    """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(ROUND(CAST(SUM(n_chars) AS DOUBLE)
               / CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
               * 1000.0) AS BIGINT) AS chars_per_token_milli,
           CAST(ROUND(CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
               / COUNT(*) * 1000.0) AS BIGINT) AS tokens_per_doc_milli
    FROM documents GROUP BY lang ORDER BY lang
    """,
    doc="Tokenizer fertility by language (chars per whitespace token "
    "— the per-language cost predictor: languages with long or "
    "agglutinative words spend more subword tokens per word, so "
    "an equal-token budget is NOT an equal-content budget; the "
    "data-card companion to q344's apportionment and q306's "
    "water-filling): exact integer char and token masses per "
    "lang, two milli-quantized ratios. Scale: one scan, one "
    "|langs|-group aggregate — map-side partials all the way.",
)
def q369_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(n_tok).alias("total_tokens"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_chars").cast("long").alias("total_chars"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.round(
                F.col("total_chars").cast("double")
                / F.col("total_tokens").cast("double")
                * 1000.0
            )
            .cast("long")
            .alias("chars_per_token_milli"),
            F.round(
                F.col("total_tokens").cast("double")
                / F.col("n_docs").cast("double")
                * 1000.0
            )
            .cast("long")
            .alias("tokens_per_doc_milli"),
        )
        .orderBy("lang")
    )
