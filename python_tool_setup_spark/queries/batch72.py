"""Round-5 gates, batch 72: sequence-length bucketing padding-waste
report (q348 — the batch-shape economics of training: how many pad
tokens does each power-of-two bucket burn, and what utilization does
the bucketing achieve) and effective source diversity (q349 — the
exp-entropy 'effective number of sources' a data card reports, the
scalar that says a 10-source corpus dominated by one source is
really ~1.3 sources).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_BUCKETS = [16, 32, 64, 128, 256, 512, 1024, 2048]
_TOP = 4096


def _bucket_case_sql(col: str) -> str:
    arms = " ".join(
        f"WHEN {col} <= {b} THEN {b}" for b in _BUCKETS
    )
    return f"CASE {arms} ELSE {_TOP} END"


# ---------------------------------------------------------------- q348
@register(
    "q348_padding_waste",
    f"""
    WITH toks AS (
        SELECT len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    bucketed AS (
        SELECT n_tok, {_bucket_case_sql('n_tok')} AS bucket FROM toks
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS real_tokens,
           CAST(COUNT(*) * bucket AS BIGINT) AS padded_tokens,
           CAST(COUNT(*) * bucket - SUM(n_tok) AS BIGINT) AS pad_waste,
           CAST(ROUND(CAST(SUM(n_tok) AS DOUBLE)
               / CAST(COUNT(*) * bucket AS DOUBLE) * 1000000.0) AS BIGINT)
               AS utilization_micro
    FROM bucketed GROUP BY bucket ORDER BY bucket
    """,
    doc="Padding-waste report for power-of-two sequence-length "
    "bucketing (the batch-shape audit run before fixing a "
    "tokenizer/packing config: every doc pads up to its smallest "
    "covering bucket, and the report prices the pad tokens each "
    "bucket burns vs the packing path q122/pack_sequences): "
    "whitespace token counts (q306's convention), integer "
    "when-cascade bucket assignment (no log2 float), per-bucket "
    "exact integer token/pad accounting, utilization "
    "micro-quantized with one division. Scale: one scan, one "
    "8-ish-group aggregate — the 100 TB cost is the tokenize "
    "scan it shares with every other corpus pass.",
)
def q348_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    bucket = F.lit(_TOP)
    for b in reversed(_BUCKETS):
        bucket = F.when(n_tok <= b, F.lit(b)).otherwise(bucket)
    rows = d.select(n_tok.alias("n_tok"), bucket.alias("bucket"))
    agg = rows.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("real")
    )
    padded = F.col("n") * F.col("bucket")
    return (
        agg.select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("n").cast("long").alias("n_docs"),
            F.col("real").cast("long").alias("real_tokens"),
            padded.cast("long").alias("padded_tokens"),
            (padded - F.col("real")).cast("long").alias("pad_waste"),
            F.round(
                F.col("real").cast("double") / padded.cast("double") * 1000000.0
            )
            .cast("long")
            .alias("utilization_micro"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------- q349
@register(
    "q349_effective_diversity",
    """
    WITH s AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    tot AS (SELECT SUM(n) AS t FROM s),
    terms AS (
        SELECT CAST(ROUND(-1e9 * (CAST(n AS DOUBLE) / t)
                   * ln(CAST(n AS DOUBLE) / t)) AS BIGINT) AS h_nano
        FROM s, tot
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
           CAST(SUM(h_nano) AS BIGINT) AS entropy_nano,
           CAST(ROUND(exp(CAST(SUM(h_nano) AS DOUBLE) / 1e9) * 1000000.0)
               AS BIGINT) AS effective_sources_micro
    FROM terms
    """,
    doc="Effective source diversity: exp of the Shannon entropy of "
    "the source mix (Hill number of order 1 — the data-card scalar "
    "that collapses 'how many sources is this corpus REALLY' into "
    "one number; a 10-source corpus with one dominant source scores "
    "near 1, a uniform one scores 10). Per-source -p ln p terms "
    "nano-quantized BEFORE the sum (1-ulp ln posture), exp applied "
    "once to the dequantized sum — identical arithmetic on both "
    "engines. Complements q344 (what the mix SHOULD be) and q71 "
    "(reweighting to fix it). Scale: one groupBy to |sources| rows.",
)
def q349_effective_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = s.agg(F.sum("n").alias("t"))
    p = F.col("n").cast("double") / F.col("t").cast("double")
    terms = s.crossJoin(F.broadcast(tot)).select(
        F.round(F.lit(-1e9) * p * F.log(p)).cast("long").alias("h_nano")
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.sum("h_nano").cast("long").alias("entropy_nano"),
        F.round(
            F.exp(F.sum("h_nano").cast("double") / F.lit(1e9)) * 1000000.0
        )
        .cast("long")
        .alias("effective_sources_micro"),
    )
