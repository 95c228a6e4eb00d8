"""Round-4 gates, batch 51: token-budget water-filling across sources
(q306 — the allocation solver for 'fit these corpora into B tokens
without letting big sources crowd out small ones') and deterministic
Efraimidis-Spirakis weighted sampling without replacement (q307 —
the one-pass distributed weighted sample, md5-derandomized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin, prefix_agg, prefix_rank
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_BUDGET = 15000
_SAMPLE_K = 50


# ---------------------------------------------------------------- q306
@register(
    "q306_token_waterfill",
    f"""
    WITH tok AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS s
        FROM documents GROUP BY source
    ),
    ord_ AS (
        SELECT source, n_docs, s,
               ROW_NUMBER() OVER (ORDER BY s, source) AS i,
               SUM(s) OVER (ORDER BY s, source
                            ROWS UNBOUNDED PRECEDING) AS cum,
               COUNT(*) OVER () AS n,
               SUM(s) OVER () AS total
        FROM tok
    ),
    kk AS (
        SELECT COALESCE(MAX(i), 0) AS k
        FROM ord_ WHERE cum + s * (n - i) <= {_BUDGET}
    ),
    params AS (
        SELECT (SELECT k FROM kk) AS k,
               COALESCE((SELECT cum FROM ord_
                         WHERE i = (SELECT k FROM kk)), 0) AS cumk,
               (SELECT MAX(n) FROM ord_) AS n
    ),
    alloc AS (
        SELECT o.source, o.n_docs, o.s, o.i, p.k,
               CASE WHEN o.i <= p.k OR p.k = p.n THEN o.s
                    ELSE LEAST(o.s,
                        ({_BUDGET} - p.cumk) // (p.n - p.k)
                        + CASE WHEN o.i - p.k <=
                            ({_BUDGET} - p.cumk) % (p.n - p.k)
                          THEN 1 ELSE 0 END)
               END AS allocated
        FROM ord_ o CROSS JOIN params p
    )
    SELECT source, n_docs, s AS tokens,
           CAST(allocated AS BIGINT) AS allocated,
           allocated < s AS capped
    FROM alloc ORDER BY source
    """,
    doc="Token-budget water-filling across sources — the allocation "
    "solver behind 'assemble a B-token corpus without letting the "
    "web crawl crowd out the small curated sources' (the "
    "closed-form dual of q252's fixed mixture weights and q96's "
    "hard per-source caps): sources sorted by size, the largest "
    "prefix that can keep EVERYTHING is found from cumulative "
    "sums (cum_i + s_i*(n-i) <= B), the rest share the remaining "
    "budget equally via integer division with the remainder "
    "distributed deterministically in (size, name) order — every "
    "step exact integer arithmetic, allocations sum to exactly "
    "min(B, total). Scale: token counts are one groupBy; the "
    "solver runs on the SOURCE table (metadata-sized), windows "
    "and all — no iteration, no driver loop.",
)
def q306_token_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("s"),
    )
    tots = tok.agg(
        F.count(F.lit(1)).alias("n"), F.sum("s").alias("total")
    )
    pre = prefix_agg(
        tok,
        [("s", "asc"), ("source", "asc")],
        {"i0": ("count", None), "cum_ex": ("sum", "s")},
    )
    # Pin the source-domain ordered table once: it is referenced four
    # times below (feasibility scan, k-th cum lookup, n_all, final
    # allocation), and without the pin each reference re-instantiates
    # the prefix machinery (41 Exchange nodes in the r10-before plan).
    # |rows| = |sources| — metadata-sized.
    ordd = pin(
        pre.crossJoin(F.broadcast(tots)).select(
            "source",
            "n_docs",
            "s",
            (F.col("i0") + 1).alias("i"),
            (F.col("cum_ex") + F.col("s")).alias("cum"),
            "n",
            "total",
        )
    )
    feasible = ordd.filter(
        F.col("cum") + F.col("s") * (F.col("n") - F.col("i")) <= _BUDGET
    )
    kk = feasible.agg(F.coalesce(F.max("i"), F.lit(0)).alias("k"))
    cumk = (
        ordd.join(F.broadcast(kk), ordd["i"] == kk["k"])
        .agg(F.coalesce(F.max("cum"), F.lit(0)).alias("cumk"))
    )
    params = (
        kk.crossJoin(F.broadcast(cumk))
        .crossJoin(F.broadcast(ordd.agg(F.max("n").alias("n_all"))))
    )
    o = ordd.drop("n").crossJoin(F.broadcast(params))
    spare = F.lit(_BUDGET) - F.col("cumk")
    slots = F.col("n_all") - F.col("k")
    base = F.expr(f"div({_BUDGET} - cumk, n_all - k)")
    rem = spare % slots
    alloc = F.when(
        (F.col("i") <= F.col("k")) | (F.col("k") == F.col("n_all")), F.col("s")
    ).otherwise(
        F.least(
            F.col("s"),
            base + F.when(F.col("i") - F.col("k") <= rem, 1).otherwise(0),
        )
    )
    return (
        o.select(
            "source",
            "n_docs",
            F.col("s").alias("tokens"),
            alloc.cast("long").alias("allocated"),
            (alloc < F.col("s")).alias("capped"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------- q307
@register(
    "q307_weighted_sample_wor",
    f"""
    WITH keyed AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
               CAST(ROUND(
                   ln((CAST(CAST(('0x' || substr(md5('aes|' ||
                        CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                        % 1000000 AS DOUBLE) + 1.0) / 1000001.0)
                   / CAST(n_chars AS DOUBLE)
                   * 1000000000.0) AS BIGINT) AS lnkey_nano
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, w, lnkey_nano,
           CAST(ROW_NUMBER() OVER (ORDER BY lnkey_nano DESC, doc_id)
               AS BIGINT) AS rk
    FROM keyed
    ORDER BY lnkey_nano DESC, doc_id LIMIT {_SAMPLE_K}
    """,
    doc="Weighted sampling WITHOUT replacement via the "
    "Efraimidis-Spirakis one-pass reduction (each item draws "
    "u~U(0,1) and the top-k by u^(1/w) — equivalently ln(u)/w — "
    "IS an exact weighted sample without replacement; the "
    "distributed-systems trick that turns stateful sequential "
    "sampling into an embarrassingly parallel top-k): u is "
    "md5-derandomized (q95's convention, so the gate is "
    "deterministic and the oracle bit-reproduces it), the sort "
    "key ln(u)/w is quantized to nano per item (1-ulp ln "
    "posture), ties broken by doc_id. Scale: one scan, one "
    "distributed TakeOrdered top-k — no shuffle of data rows, no "
    "sequential pass; weights here are doc lengths (sample "
    "long-doc-biased without replacement).",
)
def q307_weighted_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("aes|"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = ((h % 1000000).cast("double") + 1.0) / 1000001.0
    lnkey = F.round(
        F.log(u) / F.col("n_chars").cast("double") * 1000000000.0
    ).cast("long")
    keyed = d.filter(F.col("n_chars") > 0).select(
        "doc_id",
        F.col("n_chars").cast("long").alias("w"),
        lnkey.alias("lnkey_nano"),
    )
    top = keyed.orderBy(F.col("lnkey_nano").desc(), "doc_id").limit(_SAMPLE_K)
    return (
        prefix_rank(
            top, [("lnkey_nano", "desc"), ("doc_id", "asc")], alias="rk"
        )
        .select(
            "doc_id", "w", "lnkey_nano",
            F.col("rk").cast("long").alias("rk"),
        )
        .orderBy("rk")
    )
