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

from python_tool_setup_spark.operators.blockrank import pin
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


# ---------------------------------------------------------------- q243
@register(
    "q243_right_to_be_forgotten",
    """
    WITH ev AS (SELECT user_id FROM events WHERE user_id % 15 = 0),
    tgt AS (SELECT user_id FROM ev
            GROUP BY user_id ORDER BY COUNT(*) DESC, user_id LIMIT 1)
    SELECT (SELECT CAST(user_id AS BIGINT) FROM tgt) AS forgotten_user,
           CAST(COUNT(*) AS BIGINT) AS remaining_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS remaining_users,
           CAST(0 AS BIGINT) AS residual_rows,
           TRUE AS purge_complete
    FROM ev WHERE user_id <> (SELECT user_id FROM tgt)
    """,
    doc="Right-to-be-forgotten (GDPR-style PHYSICAL purge) over a "
    "versioned table: the busiest user (derived in-query) is erased "
    "from the current version AND all history — a new scrubbed "
    "version is committed, every older version is vacuumed (their "
    "files embed the subject; a tombstone would let time travel "
    "resurrect them), crashed-writer orphans are swept, and the "
    "AUDIT re-scans every parquet file still on disk for the "
    "subject's key, returning proof of physical absence (0 residual "
    "rows across >0 files). Composes q74 time travel, q145 deletion "
    "semantics, q146 orphan cleanup into the one legal-compliance "
    "operation every data platform eventually needs; cost is one "
    "table rewrite — the honest price of physical erasure.",
)
def q243_right_to_be_forgotten(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.ingestion.versioned import (
        forget_keys,
        read_version,
        write_version,
    )
    from python_tool_setup_spark.staging import staging_dir

    # ev feeds three separate actions (argmax collect + two versioned
    # writes): pin the filtered 2-column frame so events is scanned
    # once.
    ev = pin(
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 15 == 0)
        .select("user_id", "value")
    )
    tgt_row = (
        ev.groupBy("user_id")
        .count()
        .orderBy(F.col("count").desc(), "user_id")
        .limit(1)
        .collect()
    )  # 1-row argmax, bounded
    target = tgt_row[0]["user_id"]

    table = staging_dir("forget_table_")
    write_version(spark, ev, table)                      # v0: original
    write_version(spark, ev.withColumn("value", 2 * F.col("value")), table)
    audit = forget_keys(spark, table, "user_id", [target])
    assert audit["purge_complete"], f"purge incomplete: {audit}"

    latest = read_version(spark, table)
    return latest.agg(
        F.count(F.lit(1)).cast("bigint").alias("remaining_rows"),
        F.countDistinct("user_id").alias("remaining_users"),
    ).select(
        F.lit(target).cast("bigint").alias("forgotten_user"),
        "remaining_rows",
        "remaining_users",
        F.lit(audit["residual_key_rows"]).cast("bigint").alias("residual_rows"),
        F.lit(audit["purge_complete"]).alias("purge_complete"),
    )
