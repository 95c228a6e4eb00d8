"""Corpus-scale operator gates, batch 2 (q109-q115): line-level
boilerplate removal, blocked edit-distance near-dup, bloom-filter
semi-join pruning, sketch-based heavy hitters, deterministic weighted
sampling, unigram-LM quality scoring, int8 embedding quantization.

All seven follow the repo oracle conventions (identical aliases both
sides, integer aggregates cast to BIGINT, doubles rounded identically,
scalar-only output columns). DuckDB lambda indexes are 1-based vs
Spark's 0-based ``transform`` index — oracles below offset
accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q109_boilerplate_lines",
    """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> t <> '') AS tk
        FROM documents
    ),
    lines AS (
        SELECT doc_id, u.i AS pos,
               array_to_string(tk[u.i * 10 + 1 : u.i * 10 + 10], ' ')
                   AS line
        FROM toks, unnest(range((len(tk) + 9) // 10)) u(i)
    ),
    boiler AS (
        SELECT line
        FROM (SELECT line, COUNT(DISTINCT doc_id) AS df
              FROM lines GROUP BY line)
        WHERE df >= 2
    )
    SELECT doc_id,
           array_to_string(ARRAY_AGG(line ORDER BY pos), ' ')
               AS clean_text,
           CAST(COUNT(*) AS BIGINT) AS n_lines_kept
    FROM lines
    WHERE line NOT IN (SELECT line FROM boiler)
    GROUP BY doc_id
    """,
    doc="C4/RefinedWeb-style boilerplate removal: segment documents "
    "into 10-word lines, drop every line occurring verbatim in >= 2 "
    "distinct documents, reassemble the survivors in order. The "
    "boilerplate set is broadcast for the anti-join so the corpus "
    "never shuffles for the filter.",
)
def q109_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.llm.cleaning import remove_boilerplate_lines

    d = _t(spark, sf_dir, "documents")
    return remove_boilerplate_lines(
        d, "doc_id", "text", min_docs=2, words_per_line=10
    )


@register(
    "q110_editdist_neardup",
    """
    WITH corpus AS (
        SELECT doc_id, text, lang, source FROM documents
        UNION ALL
        SELECT doc_id + 200000, 'zzzzz' || substr(text, 6), lang, source
        FROM documents WHERE doc_id % 7 = 0
    ),
    blocked AS (
        SELECT doc_id, lang, source,
               length(text) // 16 AS lb,
               substr(text, 1, 120) AS p
        FROM corpus
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(levenshtein(a.p, b.p) AS BIGINT) AS edit_dist
    FROM blocked a
    JOIN blocked b
      ON a.lang = b.lang AND a.source = b.source AND a.lb = b.lb
         AND a.doc_id < b.doc_id
    WHERE levenshtein(a.p, b.p) <= 8
    """,
    doc="Blocked edit-distance near-dup: every 7th document is "
    "re-planted with a same-length 5-char mutation; pairs are found "
    "by equality blocking on (lang, source, length-bucket) and a "
    "thresholded levenshtein over a 120-char prefix (DP early-exit "
    "above the threshold). Quadratic work is confined to blocks.",
)
def q110_editdist_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.llm.dedup import edit_distance_pairs

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    mut = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.lit("zzzzz"), F.expr("substring(text, 6)")).alias("text"),
        "lang",
        "source",
    )
    corpus = d.unionByName(mut)
    return edit_distance_pairs(
        corpus,
        "doc_id",
        "text",
        block_cols=("lang", "source"),
        max_distance=8,
        prefix_len=120,
        length_bucket=16,
    )


@register(
    "q111_bloom_join",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Bloom-filter semi-join: the urgent-order key set is folded "
    "into an 8192-bit literal bitmask; lineitem is prefiltered by "
    "scan-stage getbit expressions (no shuffle, no false negatives) "
    "before the exact LEFT SEMI join, so only candidates reach the "
    "join. Result is exactly the plain semi-join.",
)
def q111_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.operators.bloom import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem")
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    hit = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    return hit.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "q112_heavy_hitters",
    """
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) >= CEIL(0.003 * (SELECT COUNT(*) FROM events))
    """,
    doc="Heavy hitters with bounded state: per-partition Misra-Gries "
    "summaries (capacity 2/f, mergeable-summaries shrink) produce a "
    "guaranteed superset of keys at frequency >= 0.3%; a broadcast "
    "semi-join + exact count removes false positives. Output is "
    "EXACTLY the full GROUP BY ... HAVING, computed without shuffling "
    "every distinct key.",
)
def q112_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.operators.sketch import heavy_hitters

    e = _t(spark, sf_dir, "events")
    return heavy_hitters(e, "user_id", 0.003)


@register(
    "q113_weighted_sample",
    """
    SELECT doc_id, n_chars,
           -- scale-first round (q208 recipe): the hash/weight quotient
           -- is bit-identical across engines (one IEEE division of
           -- exact integers) but ROUND(x, 6) resolves near-midpoint
           -- doubles differently per engine; the scale-0 round of the
           -- identical scaled double agrees on both
           ROUND(1000000 * (CAST(CAST('0x' || substr(md5(CAST(doc_id
                                AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE)
                 / GREATEST(CAST(n_chars AS DOUBLE), 1.0))) / 1000000.0
               AS priority
    FROM documents
    ORDER BY CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) AS DOUBLE)
             / GREATEST(CAST(n_chars AS DOUBLE), 1.0),
             doc_id
    LIMIT 100
    """,
    doc="Deterministic weighted sampling without replacement: "
    "priority = md5-uniform / weight (one IEEE-exact division, so "
    "Spark and DuckDB agree to the bit), global top-100 by "
    "TakeOrderedAndProject (per-partition heaps, no full sort).",
)
def q113_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.llm.pipeline import weighted_sample

    d = _t(spark, sf_dir, "documents")
    return weighted_sample(d, "doc_id", "n_chars", 100).select(
        "doc_id",
        "n_chars",
        # scale-first round: see the oracle comment
        (F.round(1000000 * F.col("priority")) / 1000000.0).alias("priority"),
    )


@register(
    "q114_unigram_xent",
    """
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  t -> t <> '')) AS tok
        FROM documents
    ),
    vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    probs AS (
        SELECT tok,
               CAST(c AS DOUBLE)
                   / CAST((SELECT SUM(c) FROM vocab) AS DOUBLE) AS p
        FROM vocab
    )
    SELECT doc_id,
           -- scale-first round (q208 recipe); LN is libm-bound, see
           -- the unigram_logprob docstring for the residual floor
           ROUND(1000000 * AVG(-LN(p))) / 1000000.0 AS xent,
           CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM toks JOIN probs USING (tok)
    GROUP BY doc_id
    """,
    doc="Perplexity-style quality filter: per-document cross-entropy "
    "under the corpus's own unigram LM. Vocabulary aggregation is "
    "partial map-side; the prob table is broadcast back onto the "
    "exploded tokens so the corpus never shuffles for the join.",
)
def q114_unigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.llm.text import unigram_logprob

    d = _t(spark, sf_dir, "documents")
    return unigram_logprob(d, "doc_id", "text")


@register(
    "q115_quantize_embeddings",
    """
    WITH dims AS (
        SELECT u.i AS i,
               MIN(CAST(embedding[u.i] AS DOUBLE)) AS mn,
               MAX(CAST(embedding[u.i] AS DOUBLE)) AS mx
        FROM embeddings, unnest(range(1, 65)) u(i)
        GROUP BY u.i
    ),
    cb AS (
        SELECT list(mn ORDER BY i) AS mns,
               list(CASE WHEN mx > mn THEN mx - mn ELSE 1.0 END
                    ORDER BY i) AS rngs
        FROM dims
    ),
    base AS (SELECT vec_id, embedding, mns, rngs FROM embeddings, cb),
    q AS (
        SELECT *,
               list_transform(embedding, (x, i) ->
                   round((CAST(x AS DOUBLE) - mns[i]) * 255.0 / rngs[i]))
                   AS qv
        FROM base
    ),
    d AS (
        SELECT *,
               list_transform(qv, (v, i) -> v * rngs[i] / 255.0 + mns[i])
                   AS dq
        FROM q
    )
    SELECT vec_id,
           array_to_string(list_transform(qv,
               v -> CAST(CAST(v AS INT) AS VARCHAR)), '|') AS quant,
           -- scale-first round (q208 recipe)
           ROUND(1000000000 * (list_reduce(
                     list_transform(embedding, (x, i) ->
                         (CAST(x AS DOUBLE) - dq[i])
                         * (CAST(x AS DOUBLE) - dq[i])),
                     (a, b) -> a + b) / len(embedding))) / 1000000000.0
               AS mse
    FROM d
    """,
    doc="Scalar int8 quantization of the embedding column with "
    "per-vector reconstruction MSE. Codebook = 2*dim literals from a "
    "tiny stats pass; quantize/dequantize/error are scan-stage array "
    "expressions (exact-rounded IEEE ops + deterministic left fold, "
    "so the oracle reproduces the doubles bit-for-bit).",
)
def q115_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.llm.similarity import quantize_int8

    e = _t(spark, sf_dir, "embeddings")
    return quantize_int8(e, "vec_id", "embedding", levels=255)
