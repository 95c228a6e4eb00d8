"""Corpus-cleaning gate queries (q81-q84): contamination, PII
redaction, chunking, repetition scoring. All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.llm.cleaning import (
    chunk_documents,
    contamination_report,
    redact_pii,
    repetition_score,
)
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_SQL_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"


@register(
    "q81_contamination",
    """
    WITH test AS (
        SELECT doc_id AS test_id, text FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 100000, text || ' unseen' FROM documents
        WHERE doc_id % 5 = 1
    )
    SELECT test_id,
           array_to_string(ARRAY_AGG(doc_id ORDER BY doc_id), '|')
               AS train_matches,
           COUNT(*) AS n_matches
    FROM documents JOIN test ON sha256(documents.text) = sha256(test.text)
    GROUP BY test_id
    """,
    doc="Train/test contamination: exact content-hash overlap between "
    "the corpus and an eval set (every 5th doc verbatim = "
    "contaminated; mutated docs = clean). Test side is broadcast so "
    "the corpus never shuffles for the join.",
)
def q81_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    test = (
        d.filter(F.col("doc_id") % 5 == 0)
        .select(F.col("doc_id").alias("tid"), "text")
        .unionByName(
            d.filter(F.col("doc_id") % 5 == 1).select(
                (F.col("doc_id") + 100000).alias("tid"),
                F.concat("text", F.lit(" unseen")).alias("text"),
            )
        )
    )
    # gate output must be all-scalar (the driver's canonicalizer cannot
    # sort list cells): join the match-id array to a '|' string
    return contamination_report(d, test, "doc_id", "tid").select(
        "test_id",
        F.concat_ws(
            "|", F.transform("train_matches", lambda x: x.cast("string"))
        ).alias("train_matches"),
        "n_matches",
    )


@register(
    "q82_pii_redaction",
    r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 text || ' contact user' || doc_id ||
                 '@example.com or 555-123-4567 ssn 123-45-6789',
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '[REDACTED_EMAIL]', 'g'),
               '\d{3}-\d{3}-\d{4}', '[REDACTED_PHONE]', 'g'),
             '\d{3}-\d{2}-\d{4}', '[REDACTED_SSN]', 'g') AS text
    FROM documents WHERE doc_id < 50
    """,
    doc="PII redaction: chained regexp_replace for emails, phone "
    "numbers and SSN-shaped strings (patterns chosen to parse "
    "identically under Java regex and RE2), injected synthetically "
    "since the fixture corpus is clean. Zero shuffles — the chain "
    "fuses into the scan projection. Order matters: phone before SSN "
    "would still leave the SSN shape intact, both run.",
)
def q82_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    seeded = d.select(
        "doc_id",
        F.concat(
            "text",
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-4567 ssn 123-45-6789"),
        ).alias("text"),
    )
    return redact_pii(seeded)


@register(
    "q83_rag_chunking",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKS} AS t, LEN({_SQL_TOKS}) AS n
        FROM documents WHERE doc_id < 100
    ),
    starts AS (
        SELECT doc_id, t, n,
               UNNEST(generate_series(0, GREATEST(n - 1, 0), 48)) AS s
        FROM toks
    )
    SELECT doc_id,
           CAST(s / 48 AS INTEGER) AS chunk_id,
           array_to_string(t[(s + 1):(s + 64)], ' ') AS chunk_text,
           LEAST(n - s, 64) AS n_tokens
    FROM starts
    """,
    doc="RAG chunking: overlapping 64-token windows with stride 48 "
    "(chunk i = tokens [48i, 48i+64)); short docs yield one chunk. "
    "sequence+posexplode fans out executor-side — rows produced where "
    "the data lives, never through the driver.",
)
def q83_rag_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return chunk_documents(d, "doc_id", window=64, stride=48)


@register(
    "q84_repetition_score",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKS} AS t FROM documents
    ),
    grams AS (
        SELECT doc_id,
               UNNEST(LIST_TRANSFORM(
                   generate_series(1, GREATEST(LEN(t) - 2, 1)),
                   i -> array_to_string(t[i:i+2], ' '))) AS g
        FROM toks
    ),
    per_gram AS (
        SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g
    )
    SELECT doc_id,
           -- scale-first round (q208 recipe): decimal-reachable ties
           ROUND(1000000 * (CAST(MAX(c) AS DOUBLE) / SUM(c))) / 1000000.0
               AS max_ngram_ratio,
           CAST(SUM(c) AS BIGINT) AS n_ngrams
    FROM per_gram GROUP BY doc_id
    """,
    doc="Repetition / boilerplate score: share of a document's 3-grams "
    "taken by its most-repeated 3-gram (near 1.0 = one phrase "
    "repeated = template spam). Explode + two-level aggregate with "
    "map-side partials; one shuffle on doc_id.",
)
def q84_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_score(load_table(spark, sf_dir, "documents"), "doc_id")
