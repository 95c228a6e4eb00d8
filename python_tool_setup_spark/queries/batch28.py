"""Round-3 gates, batch 28: the end-to-end corpus build (q242) — the
flagship COMPOSITION gate. Every stage (normalize, language gate,
quality gate, exact dedup with deterministic survivorship, train/val
split, token accounting) is an operator this repo already gates in
isolation; here they chain into ONE declarative plan, proving the
pipeline composes without materialization barriers — the form a real
100 TB corpus build takes: a single DAG Catalyst can push filters
through and AQE can re-plan, not a sequence of intermediate tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q242
@register(
    "q242_corpus_pipeline_e2e",
    r"""
    WITH norm AS (
        SELECT doc_id, lang,
               trim(regexp_replace(
                   translate(lower(text),
                             'áàâäãåçéèêëíìîïñóòôöõúùûüýÿ',
                             'aaaaaaceeeeiiiinooooouuuuyy'),
                   '\s+', ' ', 'g')) AS n
        FROM documents
    ),
    quality AS (
        SELECT * FROM norm WHERE length(n) >= 100
    ),
    top2 AS (
        SELECT lang FROM quality
        GROUP BY lang ORDER BY COUNT(*) DESC, lang LIMIT 2
    ),
    kept AS (
        SELECT q.* FROM quality q JOIN top2 USING (lang)
    ),
    survivors AS (
        SELECT MIN(doc_id) AS doc_id,
               arg_min(lang, doc_id) AS lang,
               n
        FROM kept GROUP BY n
    ),
    tagged AS (
        SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                         1, 8)) AS BIGINT) % 10000 < 1000
                    THEN 'val' ELSE 'train' END AS split,
               lang,
               len(string_split(n, ' ')) AS toks
        FROM survivors
    )
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS n_tokens
    FROM tagged
    GROUP BY split, lang
    ORDER BY split, lang
    """,
    doc="End-to-end corpus build as ONE declarative plan — the "
    "flagship composition gate: normalize (q119's canonical form, "
    "fused into the scan projection) -> quality gate (length floor) "
    "-> language gate (top-2 languages derived in-query, broadcast "
    "semi-filter) -> exact dedup with deterministic survivorship "
    "(MIN doc_id per canonical text, survivor lang via min_by) -> "
    "md5 train/val split on the SURVIVOR id (q95's engine-"
    "independent convention) -> per-(split, lang) doc and "
    "whitespace-token accounting. One scan of the corpus, one "
    "dedup shuffle, one 4-row broadcast — no stage materializes an "
    "intermediate table, so at 100 TB the build is a single DAG "
    "Catalyst pushes the quality filter through and AQE re-plans, "
    "not a chain of checkpointed jobs. Every stage is individually "
    "gated elsewhere (q119, q95, q32-q34); this pins that they "
    "COMPOSE.",
)
def q242_corpus_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.llm.cleaning import normalize_text
    from python_tool_setup_spark.llm.pipeline import train_val_test_split

    d = load_table(spark, sf_dir, "documents")
    quality = d.select(
        "doc_id", "lang", normalize_text("text").alias("n")
    ).filter(F.length("n") >= 100)
    top2 = (
        quality.groupBy("lang")
        .count()
        .orderBy(F.col("count").desc(), "lang")
        .limit(2)
        .select("lang")
    )
    kept = quality.join(F.broadcast(top2), "lang", "left_semi")
    survivors = kept.groupBy("n").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("lang", "doc_id").alias("lang"),
    )
    tagged = train_val_test_split(
        survivors, "doc_id", val_frac=0.10, test_frac=0.0
    ).withColumn("toks", F.size(F.split("n", " ")))
    return (
        tagged.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("bigint").alias("n_tokens"),
        )
        .orderBy("split", "lang")
    )
