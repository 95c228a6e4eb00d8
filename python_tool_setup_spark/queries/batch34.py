"""Round-4 gates, batch 34: CCNet-style LM quality filtering (q268 —
train a unigram LM on the md5 train split, score every document in
integer micro-nats, keep below-average cross-entropy docs by integer
cross-multiplication), incremental MinHash-LSH probing (q269 — new
arrivals find their near-dups in the existing corpus without
re-pairing the corpus), and the corpus data card (q270 — the
per-(source, lang) summary every dataset release ships).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q268
@register(
    "q268_lm_quality_filter",
    r"""
    WITH shard AS (
        SELECT * FROM documents WHERE doc_id % 2 = 0
    ),
    split AS (
        SELECT doc_id, lang, text,
               CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                        1, 8)) AS BIGINT) % 10000 < 1000
                    THEN 'val' ELSE 'train' END AS split
        FROM shard
    ),
    toks AS (
        SELECT doc_id, lang, split, tok
        FROM split,
             UNNEST(list_filter(string_split_regex(lower(text), '\s+'),
                                t -> t <> '')) AS t(tok)
    ),
    lm AS (
        SELECT tok, COUNT(*) AS c FROM toks WHERE split = 'train'
        GROUP BY tok
    ),
    consts AS (
        SELECT (SELECT SUM(c) FROM lm) AS t_total,
               (SELECT COUNT(*) FROM lm) + 1 AS v
    ),
    nll AS (
        SELECT tok,
               CAST(ROUND(1e6 * -ln((c + 1.0) / (t_total + v))) AS BIGINT)
                   AS nll_micro
        FROM lm, consts
    ),
    unseen AS (
        SELECT CAST(ROUND(1e6 * -ln(1.0 / (t_total + v))) AS BIGINT) AS u
        FROM consts
    ),
    scored AS (
        SELECT doc_id, lang,
               SUM(COALESCE(nll_micro, (SELECT u FROM unseen))) AS total_nll,
               COUNT(*) AS n_toks
        FROM toks LEFT JOIN nll USING (tok)
        GROUP BY doc_id, lang
    ),
    corpus AS (
        SELECT SUM(total_nll) AS g_nll, SUM(n_toks) AS g_toks FROM scored
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (
               WHERE total_nll * g_toks < n_toks * g_nll) AS BIGINT)
               AS n_kept,
           CAST(SUM(n_toks) FILTER (
               WHERE total_nll * g_toks < n_toks * g_nll) AS BIGINT)
               AS kept_tokens
    FROM scored, corpus
    GROUP BY lang ORDER BY lang
    """,
    doc="CCNet-style LM quality filter (Wenzek et al. 2020 shape): a "
    "unigram LM is TRAINED on the md5 train split only (q95's "
    "convention — the held-out val docs never leak into the model), "
    "every document is scored by its cross-entropy under that LM, "
    "and docs with below-corpus-average entropy are kept. "
    "Engine-exact end-to-end: per-token negative log-probs are "
    "quantized to integer micro-nats (q257's trick), add-one "
    "smoothed with an explicit unseen-token bucket (val tokens "
    "outside the train vocabulary hit the floor probability, not a "
    "crash), and the keep decision avoids division entirely — "
    "total_nll * corpus_tokens < doc_tokens * corpus_nll is pure "
    "integer cross-multiplication. Plan: one tokenize pass, one "
    "train-count aggregate, the nll table broadcast back onto the "
    "token stream, one per-doc aggregate — at 100 TB this is the "
    "standard two-aggregate LM-filter pipeline with the model as "
    "bounded broadcast metadata.",
)
def q268_lm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.llm.pipeline import train_val_test_split

    # 1-in-2 doc shard: the filter's semantics (train-only LM, unseen
    # bucket, integer keep rule) are corpus-size independent
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    toks = (
        train_val_test_split(d, "doc_id", val_frac=0.10, test_frac=0.0)
        .select(
            "doc_id",
            "lang",
            "split",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    # Pin the train-split LM once (vocabulary-sized — the model IS
    # the working set): tots and nll both re-reference it, and each
    # unpinned reference re-ran the tokenize + count shuffle.
    lm = pin(
        toks.filter(F.col("split") == "train")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tots = lm.agg(
        F.sum("c").alias("t_total"),
        (F.count(F.lit(1)) + 1).alias("v"),
    )
    nll = lm.crossJoin(F.broadcast(tots)).select(
        "tok",
        F.col("c"),
        "t_total",
        "v",
    ).select(
        "tok",
        F.round(
            F.lit(1e6) * -F.log((F.col("c") + 1.0) / (F.col("t_total") + F.col("v")))
        )
        .cast("long")
        .alias("nll_micro"),
        F.round(F.lit(1e6) * -F.log(1.0 / (F.col("t_total") + F.col("v"))))
        .cast("long")
        .alias("unseen_micro"),
    )
    # unseen_micro is constant across the table; carry it via a 1-row
    # broadcast instead of recomputing totals on the token stream
    unseen = nll.agg(F.max("unseen_micro").alias("u"))
    scored = (
        toks.join(F.broadcast(nll.select("tok", "nll_micro")), "tok", "left")
        .crossJoin(F.broadcast(unseen))
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.coalesce("nll_micro", "u")).alias("total_nll"),
            F.count(F.lit(1)).alias("n_toks"),
        )
    )
    # Pin per-doc scores (O(docs) rows): the global total and the
    # final keep-rule aggregation both re-reference scored, and each
    # unpinned reference re-tokenized the corpus.
    scored = pin(scored)
    g = scored.agg(
        F.sum("total_nll").alias("g_nll"), F.sum("n_toks").alias("g_toks")
    )
    kept = F.col("total_nll") * F.col("g_toks") < F.col("n_toks") * F.col(
        "g_nll"
    )
    return (
        scored.crossJoin(F.broadcast(g))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(kept.cast("long")).cast("bigint").alias("n_kept"),
            F.sum(F.when(kept, F.col("n_toks")))
            .cast("bigint")
            .alias("kept_tokens"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------- q269
@register(
    "q269_incremental_lsh_probe",
    r"""
    WITH existing AS (SELECT doc_id, text FROM documents
                      WHERE doc_id < 2000),
    arrivals AS (
        SELECT doc_id + 100000 AS doc_id, text || ' zz qq' AS text
        FROM documents WHERE doc_id < 60
    ),
    sh_e AS (
        SELECT doc_id,
               LIST_DISTINCT(LIST_TRANSFORM(
                   generate_series(1, GREATEST(LEN(toks) - 4, 1)),
                   i -> array_to_string(toks[i:i+4], ' '))) AS sh
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 t -> t <> '') AS toks
              FROM existing)
    ),
    sh_n AS (
        SELECT doc_id,
               LIST_DISTINCT(LIST_TRANSFORM(
                   generate_series(1, GREATEST(LEN(toks) - 4, 1)),
                   i -> array_to_string(toks[i:i+4], ' '))) AS sh
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 t -> t <> '') AS toks
              FROM arrivals)
    )
    SELECT n.doc_id AS new_id, e.doc_id AS existing_id,
           ROUND(1000000 * (CAST(LEN(LIST_INTERSECT(n.sh, e.sh)) AS DOUBLE)
                 / LEN(LIST_DISTINCT(LIST_CONCAT(n.sh, e.sh)))))
               / 1000000.0 AS jaccard
    FROM sh_n n JOIN sh_e e ON TRUE
    WHERE CAST(LEN(LIST_INTERSECT(n.sh, e.sh)) AS DOUBLE)
          / LEN(LIST_DISTINCT(LIST_CONCAT(n.sh, e.sh))) >= 0.5
    """,
    doc="INCREMENTAL MinHash-LSH probe (the arrival-batch half of "
    "near-dup dedup, completing q119's incremental EXACT dedup and "
    "q185's incremental ANN): new documents compute only their own "
    "signatures and equi-join the existing corpus's band index — no "
    "existing x existing re-pairing ever happens, so ingesting a "
    "batch costs O(|batch| + matched buckets) regardless of corpus "
    "size. In production the existing side's band index is computed "
    "once and stored (frozen, like q185's quantizer); the gate "
    "computes it inline for determinism. Oracle: exact cross-side "
    "Jaccard on all (new, existing) pairs — planted ~0.97 similarity "
    "puts LSH miss probability at ~1e-15 (q36's argument).",
)
def q269_incremental_lsh_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.llm.dedup import minhash_lsh_probe

    # corpus side bounded at 2000 docs: the probe's cost contract
    # (O(|batch| + matched buckets), no existing x existing pairing)
    # is what the gate proves; corpus size only scales the index build
    existing = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 2000)
        .select("doc_id", "text")
    )
    arrivals = (
        existing.filter(F.col("doc_id") < 60)
        .withColumn("doc_id", F.col("doc_id") + 100000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zz qq")))
    )
    return minhash_lsh_probe(
        existing,
        arrivals,
        "doc_id",
        "text",
        num_hashes=64,
        bands=16,
        shingle_size=5,
        threshold=0.5,
    )


# ---------------------------------------------------------------- q270
@register(
    "q270_corpus_data_card",
    r"""
    WITH base AS (
        SELECT source, lang, n_chars,
               len(list_filter(string_split_regex(lower(text), '\s+'),
                               t -> t <> '')) AS toks,
               trim(regexp_replace(
                   translate(lower(text),
                             'áàâäãåçéèêëíìîïñóòôöõúùûüýÿ',
                             'aaaaaaceeeeiiiinooooouuuuyy'),
                   '\s+', ' ', 'g')) AS norm
        FROM documents
    ),
    dup AS (
        SELECT norm, COUNT(*) AS n FROM base GROUP BY norm
    )
    SELECT b.source, b.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(b.toks) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) FILTER (WHERE d.n > 1) AS BIGINT) AS n_dup_docs,
           ROUND(quantile_cont(b.n_chars, 0.5), 1) AS median_chars
    FROM base b JOIN dup d USING (norm)
    GROUP BY b.source, b.lang ORDER BY b.source, b.lang
    """,
    doc="Corpus data card — the per-(source, language) release summary "
    "every published dataset ships (docs, whitespace tokens, "
    "exact-duplicate participation via the q119 canonical form, "
    "median document length): one normalize+tokenize scan, one "
    "canonical-text aggregate joined back for dup participation, one "
    "grouped rollup with an exact median (Spark percentile == DuckDB "
    "quantile_cont, q47's convention — the sketch path q97 is the "
    "100 TB default; the card is a bounded per-cell buffer here). "
    "This is the composition a data-governance pipeline materializes "
    "per corpus version and diffs across releases (q261's PSI "
    "monitors the same axes continuously).",
)
def q270_corpus_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.llm.cleaning import normalize_text

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "source",
        "lang",
        "n_chars",
        F.size(
            F.filter(
                F.split(F.lower("text"), r"\s+"), lambda t: t != ""
            )
        ).alias("toks"),
        normalize_text("text").alias("norm"),
    )
    dup = base.groupBy("norm").agg(F.count(F.lit(1)).alias("n"))
    return (
        base.join(dup, "norm")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("toks").cast("bigint").alias("n_tokens"),
            F.sum((F.col("n") > 1).cast("long"))
            .cast("bigint")
            .alias("n_dup_docs"),
            F.round(F.percentile("n_chars", F.lit(0.5)), 1).alias(
                "median_chars"
            ),
        )
        .orderBy("source", "lang")
    )


_N_EPOCHS = 3
_EPOCH_HEAD = 8


# ---------------------------------------------------------------- q271
@register(
    "q271_epoch_shuffle",
    f"""
    WITH epochs AS (
        SELECT e.epoch, d.doc_id,
               CAST(('0x' || substr(md5(e.epoch || '#' ||
                        CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   AS shuffle_key
        FROM documents d,
             UNNEST(generate_series(0, {_N_EPOCHS - 1})) AS e(epoch)
    ),
    ranked AS (
        SELECT epoch, doc_id,
               ROW_NUMBER() OVER (PARTITION BY epoch
                    ORDER BY shuffle_key, doc_id) AS pos
        FROM epochs
    )
    SELECT CAST(epoch AS INT) AS epoch,
           CAST(pos AS INT) AS pos,
           doc_id
    FROM ranked WHERE pos <= {_EPOCH_HEAD}
    ORDER BY epoch, pos
    """,
    doc="Deterministic multi-epoch shuffle — the training-order "
    "primitive multi-epoch runs need: epoch e's permutation orders "
    "docs by md5(epoch # doc_id) (doc_id tiebreak), so every epoch "
    "is a complete, reproducible permutation that differs from every "
    "other epoch, any worker can compute its own slice from "
    "(epoch, doc_id) alone — no materialized shuffle table, no "
    "driver-side RNG state — and a crashed run resumes mid-epoch "
    "byte-identically. The gate pins the first "
    f"{_EPOCH_HEAD} positions of {_N_EPOCHS} epochs; the md5 "
    "convention is q95's, so both engines derive identical keys. At "
    "100 TB the 'shuffle' is a column expression + per-epoch sort "
    "that Spark executes as range-partitioned order — and consumers "
    "that only need approximate mixing skip the sort and hash-"
    "partition on the key directly.",
)
def q271_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = d.crossJoin(
        F.broadcast(
            spark.range(_N_EPOCHS).select(F.col("id").cast("int").alias("epoch"))
        )
    ).select(
        "epoch",
        "doc_id",
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col("epoch"), F.col("doc_id"))), 1, 8
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("shuffle_key"),
    )
    w = Window.partitionBy("epoch").orderBy("shuffle_key", "doc_id")
    return (
        epochs.withColumn("pos", F.row_number().over(w).cast("int"))
        .filter(F.col("pos") <= _EPOCH_HEAD)
        .select("epoch", "pos", "doc_id")
        .orderBy("epoch", "pos")
    )
