"""Round-3 gates, batch 8: the remaining API surfaces and
training-pipeline operators not yet first-class — grouped-aggregate
pandas UDFs (q158), higher-order array functions (q159), mergeable
DataSketches HLL partial-union (q160), stream-stream LEFT OUTER join
with watermark-driven null emission (q161), XML extraction (q162),
SemDeDup-style cluster-then-dedup over embeddings (q163), URL
canonicalization + dedup (q164), HTML boilerplate stripping (q165),
count-min-sketch frequency estimation (q166), and correlated LATERAL
top-k-per-group (q167).

Oracle conventions as everywhere: identical aliases both sides,
integer aggregates cast to BIGINT, doubles ROUNDed identically,
approximate/sketch answers gated through deterministic booleans the
oracle pins.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.staging import local_rows_df, staging_dir
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q158
@register(
    "q158_grouped_agg_pandas_udf",
    """
    SELECT l_returnflag, l_linestatus,
           -- per-row integer cents (q212 recipe: the raw product-sum
           -- is order-dependent across engines) + scale-first round
           -- (q208 recipe: ROUND(x, 2) of a computed quotient
           -- resolves decimal ties differently per engine; a scale-0
           -- round of bit-identical doubles agrees on both)
           ROUND(CAST(SUM(cents) AS DOUBLE) / SUM(l_quantity)) / 100.0
               AS weighted_avg_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT l_returnflag, l_linestatus, l_quantity,
               CAST(ROUND(100 * (l_extendedprice * l_quantity))
                    AS BIGINT) AS cents
        FROM lineitem
    )
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Grouped-AGGREGATE pandas UDF (the user-defined-aggregate "
    "surface, complementing q55 scalar / q56 grouped-map / q57 UDTF): "
    "a quantity-weighted mean price computed as a vectorized "
    "Series->scalar reduction per (returnflag, linestatus) group. "
    "Spark feeds each group's columns as Arrow batches — one shuffle "
    "on the group key, NumPy does the reduction — which is how any "
    "custom aggregation the built-ins can't express (trimmed means, "
    "custom losses) runs without a row-at-a-time Python UDF.",
)
def q158_grouped_agg_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_mean(price: pd.Series, qty: pd.Series) -> float:
        # Mirror the oracle's exact arithmetic: per-row integer cents
        # of the (price * qty) product (row-local IEEE doubles are
        # bit-identical across engines; np.rint's half-even never
        # fires because the true product is integer-valued in cents),
        # exact int64 sum (order-free), then a scale-0 half-away round
        # of the identical double quotient — decimal.Decimal rounds
        # the EXACT binary expansion, matching both engines' scale-0
        # ROUND on the same bit pattern.
        import decimal

        import numpy as np

        p = price.to_numpy(dtype=np.float64)
        q = qty.to_numpy(dtype=np.float64)
        cents = int(np.rint(100.0 * (p * q)).astype(np.int64).sum())
        qsum = float(q.sum())  # integer-valued doubles: exact any order
        v = float(cents) / qsum
        hundredths = decimal.Decimal(v).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
        )
        return float(hundredths) / 100.0

    # grouped-agg pandas UDFs can't mix with built-in aggregates in one
    # agg() (INVALID_PANDAS_UDF_PLACEMENT) — the group size is itself a
    # Series->scalar reduction, so express it as one too
    @pandas_udf("long")
    def group_n(price: pd.Series) -> int:
        return int(len(price))

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        weighted_mean("l_extendedprice", "l_quantity").alias(
            "weighted_avg_price"
        ),
        group_n("l_extendedprice").alias("n"),
    )


# ---------------------------------------------------------------- q159
@register(
    "q159_higher_order_funcs",
    """
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings WHERE vec_id < 500
    )
    SELECT vec_id,
           ROUND(sqrt(list_sum(list_transform(vec, x -> x * x))), 4)
               AS l2_norm,
           CAST(len(list_filter(vec, x -> x > 0)) AS INT) AS n_pos,
           ROUND(list_sum(list_transform(vec, x -> x * 2)), 4)
               AS sum_scaled,
           ROUND(list_sum(list_transform(list_zip(vec, list_reverse(vec)),
                                         p -> p[1] * p[2])), 4) AS rev_dot
    FROM v
    """,
    doc="Higher-order array functions — transform / filter / aggregate "
    "/ zip_with — over the embedding column, entirely JVM-side lambda "
    "expressions (no Python, no explode): per-vector L2 norm, positive-"
    "component count, scaled sum, and the dot product with the reversed "
    "vector. At 100 TB this is the difference between a scan-stage "
    "projection and an explode->groupBy that shuffles dim x rows.",
)
def q159_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    vec = F.transform("embedding", lambda x: x.cast("double"))
    d = e.select("vec_id", vec.alias("vec"))
    sum_of = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    return d.select(
        "vec_id",
        F.round(
            F.sqrt(sum_of(F.transform("vec", lambda x: x * x))), 4
        ).alias("l2_norm"),
        F.size(F.filter("vec", lambda x: x > 0)).alias("n_pos"),
        F.round(sum_of(F.transform("vec", lambda x: x * 2)), 4).alias(
            "sum_scaled"
        ),
        F.round(
            sum_of(F.zip_with("vec", F.reverse("vec"), lambda a, b: a * b)), 4
        ).alias("rev_dot"),
    )


# ---------------------------------------------------------------- q160
@register(
    "q160_hll_partial_union",
    """
    SELECT n.n_name,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS exact_distinct,
           TRUE AS est_ok
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="Mergeable DataSketches HLL (Spark 4 hll_sketch_agg / "
    "hll_union_agg / hll_sketch_estimate): one binary sketch per "
    "nation, estimates checked in-query against the exact distinct "
    "count (within 5%), and the per-nation sketches additionally "
    "UNIONED to a global estimate that must agree with the global "
    "exact count — the partial-aggregate contract that lets 100 TB "
    "cardinalities come from merging per-partition sketches instead "
    "of a full distinct shuffle. The oracle pins the booleans TRUE "
    "and the exact counts relationally.",
)
def q160_hll_partial_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.hll_sketch_agg("c_custkey").alias("sketch"),
            F.countDistinct("c_custkey").cast("bigint").alias("exact_distinct"),
        )
        .withColumn("est", F.hll_sketch_estimate("sketch"))
    )
    # global union of the per-nation partial sketches vs global exact
    global_ok = per_nation.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("g_est"),
        F.sum("exact_distinct").alias("g_exact"),  # custkeys are disjoint
    ).select(
        (
            F.abs(F.col("g_est") - F.col("g_exact"))
            <= 0.05 * F.col("g_exact")
        ).alias("g_ok")
    )
    return (
        per_nation.crossJoin(F.broadcast(global_ok))  # 1-row flag attach
        .select(
            "n_name",
            "exact_distinct",
            (
                (
                    F.abs(F.col("est") - F.col("exact_distinct"))
                    <= 0.05 * F.col("exact_distinct")
                )
                & F.col("g_ok")
            ).alias("est_ok"),
        )
    )


# ---------------------------------------------------------------- q161
@register(
    "q161_stream_stream_outer_join",
    """
    SELECT a.user_id,
           a.event_id AS view_id,
           b.event_id AS purchase_id,
           STRFTIME(b.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
    FROM (SELECT * FROM events
          WHERE event_type = 'view' AND user_id % 10 = 0) a
    LEFT JOIN (SELECT * FROM events
               WHERE event_type = 'purchase' AND user_id % 10 = 0) b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '30 minutes'
    """,
    doc="Stream-stream LEFT OUTER join (q66's inner join cannot say "
    "'this view converted to nothing'): views joined to purchases "
    "within 30 minutes; unmatched views are held in the state store "
    "and emitted with NULL purchase columns only once the watermark "
    "proves no matching purchase can still arrive. The drain appends "
    "a far-future flush sentinel on each side (filtered from the "
    "output) so the watermark provably passes every real event and "
    "ALL null rows flush deterministically — the exact answer the "
    "batch LEFT JOIN oracle computes.",
)
def q161_stream_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    # 1-in-10 user shard: the flush contract (watermark evicts + emits
    # every unmatched view with NULLs) is per-watermark, not
    # per-volume, so the proof is key-count independent — same reason
    # q192/q253 shard. Caps staging write + state volume at sf0.1.
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    src = staging_dir("ssoj_src_")
    # One data batch: the gate proves OUTER-join flush semantics (the
    # watermark from the sentinel, applied in the closing no-data
    # micro-batch, evicts + emits every unmatched view); incremental
    # multi-batch draining is q138/q153's contract. Rate-limiting this
    # drain just multiplies state-store commits per state partition.
    ev.coalesce(4).write.mode("append").parquet(src)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinels = local_rows_df(
        spark,
        [(-1, -1, "view"), (-2, -2, "purchase")],
        "event_id long, user_id long, event_type string",
    ).select(
        "event_id",
        (F.lit(max_ts) + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        "user_id",
        "event_type",
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    sentinels.select(
        [f.name for f in ev.schema.fields]
    ).write.mode("append").parquet(src)  # already 1 partition

    stream = spark.readStream.schema(ev.schema).parquet(src)
    wm = stream.withWatermark("ts", "10 seconds")
    views = wm.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    purchases = wm.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    )
    name = f"q161_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", staging_dir("ckpt_ssoj_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        spark.table(name)
        .filter(F.col("v_user") >= 0)  # drop the flush sentinel
        .select(
            F.col("v_user").alias("user_id"),
            "view_id",
            "purchase_id",
            F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        )
    )


# ---------------------------------------------------------------- q162
@register(
    "q162_xml_extract",
    """
    WITH x AS (
        SELECT '<order><k>' || o_orderkey || '</k><s>' || o_orderstatus
               || '</s><p>' || o_orderpriority || '</p><c>' || o_custkey
               || '</c></order>' AS xml
        FROM orders WHERE o_orderkey < 5000
    )
    SELECT regexp_extract(xml, '<s>(.*?)</s>', 1) AS status,
           regexp_extract(xml, '<p>(.*?)</p>', 1) AS priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(regexp_extract(xml, '<c>(.*?)</c>', 1) AS BIGINT))
                AS BIGINT) AS cust_sum
    FROM x
    GROUP BY 1, 2
    """,
    doc="XML ingestion surface (Spark 4 from_xml): order records "
    "serialized as XML documents (built in-query so both engines see "
    "identical bytes), parsed with a typed schema, aggregated on the "
    "extracted fields. The DuckDB oracle, which has no XML reader, "
    "extracts the same fields by regex — any parser/typing divergence "
    "(whitespace, numeric coercion) breaks the value hash.",
)
def q162_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    xml = F.concat(
        F.lit("<order><k>"),
        F.col("o_orderkey"),
        F.lit("</k><s>"),
        F.col("o_orderstatus"),
        F.lit("</s><p>"),
        F.col("o_orderpriority"),
        F.lit("</p><c>"),
        F.col("o_custkey"),
        F.lit("</c></order>"),
    )
    parsed = o.select(
        F.from_xml(xml, "k BIGINT, s STRING, p STRING, c BIGINT").alias("d")
    )
    return parsed.groupBy(
        F.col("d.s").alias("status"), F.col("d.p").alias("priority")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d.c").cast("bigint").alias("cust_sum"),
    )


# ---------------------------------------------------------------- q163
_SEMDEDUP_PLANTED = 15
_SEMDEDUP_OFFSET = 1_000_000


@register(
    "q163_semantic_cluster_dedup",
    f"""
    SELECT CAST({_SEMDEDUP_PLANTED} AS BIGINT) AS planted_total,
           CAST({_SEMDEDUP_PLANTED} AS BIGINT) AS planted_found,
           TRUE AS all_planted_found
    """,
    doc="SemDeDup (Abbas et al. 2023): semantic dedup = k-means "
    "cluster the embedding space (the q42 IVF coarse quantizer), then "
    "search for near-duplicate pairs ONLY within clusters — the "
    "cluster assignment is the blocking key that replaces all-pairs, "
    "and within-cluster scoring is one BLAS matmul per cell "
    "(embedding_neardup_pairs with the cell as block key). The gate "
    "plants exact duplicate vectors for the first "
    f"{_SEMDEDUP_PLANTED} ids; identical vectors land in identical "
    "cells under ANY fitted quantizer, so every planted pair MUST "
    "surface at cosine 1.0 regardless of fixture scale — the oracle "
    "pins that recall contract.",
)
def q163_semantic_cluster_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.llm.similarity import (
        embedding_neardup_pairs,
        ivf_index,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = e.filter(F.col("vec_id") < _SEMDEDUP_PLANTED).select(
        (F.col("vec_id") + _SEMDEDUP_OFFSET).alias("vec_id"), "embedding"
    )
    corpus = e.unionByName(planted)
    assigned, _model = ivf_index(corpus, "embedding", num_cells=32)
    pairs = embedding_neardup_pairs(
        assigned.select("vec_id", "embedding", "__cell"),
        "vec_id",
        "embedding",
        threshold=0.999,
        block_cols=("__cell",),
    )
    found = pairs.filter(
        (F.col("id_b") - F.col("id_a") == _SEMDEDUP_OFFSET)
        & (F.col("id_a") < _SEMDEDUP_PLANTED)
    )
    return found.agg(
        F.lit(_SEMDEDUP_PLANTED).cast("bigint").alias("planted_total"),
        F.count(F.lit(1)).cast("bigint").alias("planted_found"),
        (F.count(F.lit(1)) == _SEMDEDUP_PLANTED).alias("all_planted_found"),
    )


# ---------------------------------------------------------------- q164
@register(
    "q164_url_canonicalize",
    """
    SELECT 'http://example.com/' || source || '/' || doc_id
               || '?id=' || (doc_id % 7) AS canonical_url,
           CAST(2 AS BIGINT) AS n_variants
    FROM documents WHERE doc_id < 300
    """,
    doc="URL canonicalization + dedup (the web-corpus operator: crawl "
    "frontiers see the same page as HTTP://Host/path/?utm_source=... "
    "and http://host/path?...): two case/tracking-param variants per "
    "document are canonicalized with parse_url (scheme+host lowered, "
    "trailing slash stripped, utm_* params dropped via a higher-order "
    "filter, survivors re-joined sorted) and grouped — every document "
    "collapses to exactly one canonical URL with 2 variants. All "
    "scan-stage expressions; the dedup is the same hash-groupBy as "
    "q31. The oracle constructs the expected canonical form directly.",
)
def q164_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    v0 = F.concat(
        F.lit("HTTP://Example.COM/"),
        F.col("source"),
        F.lit("/"),
        F.col("doc_id"),
        F.lit("/?utm_source=feed&id="),
        F.col("doc_id") % 7,
        F.lit("#frag"),
    )
    v1 = F.concat(
        F.lit("http://example.com/"),
        F.col("source"),
        F.lit("/"),
        F.col("doc_id"),
        F.lit("?id="),
        F.col("doc_id") % 7,
        F.lit("&utm_campaign=x"),
    )
    urls = d.select(F.explode(F.array(v0, v1)).alias("url"))
    no_frag = F.regexp_replace("url", "#.*$", "")
    parsed = urls.select(
        F.lower(F.parse_url(no_frag, F.lit("HOST"))).alias("host"),
        F.regexp_replace(
            F.parse_url(no_frag, F.lit("PATH")), "/$", ""
        ).alias("path"),
        F.parse_url(no_frag, F.lit("QUERY")).alias("query"),
    )
    clean_q = F.array_join(
        F.array_sort(
            F.filter(
                F.split("query", "&"),
                lambda p: ~p.startswith("utm_"),
            )
        ),
        "&",
    )
    canon = parsed.select(
        F.concat(
            F.lit("http://"),
            F.col("host"),
            F.col("path"),
            F.when(clean_q != "", F.concat(F.lit("?"), clean_q)).otherwise(
                F.lit("")
            ),
        ).alias("canonical_url")
    )
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_variants")
    )


# ---------------------------------------------------------------- q165
# Both engines run the IDENTICAL strip pipeline (RE2-safe patterns, no
# backrefs/lookahead) over identically constructed HTML.
_HTML_STEPS = [
    ("<script>[^<]*</script>", ""),
    ("<style>[^<]*</style>", ""),
    ("<[^>]*>", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&amp;", "&"),
    ("[ \\t\\r\\n]+", " "),
]


@register(
    "q165_html_strip",
    """
    WITH raw AS (
        SELECT doc_id,
               '<html><head><script>var x=1;</script><style>.c'
               || CAST(doc_id % 5 AS VARCHAR)
               || '{font-size:10px}</style></head><body><h1>'
               || upper(lang) || '</h1><p>' || substr(text, 1, 200)
               || '</p><p>Tom &amp; Jerry &lt;3 &quot;quotes&quot;</p>'
               || '</body></html>' AS html
        FROM documents WHERE doc_id < 200
    ), clean AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(regexp_replace(
                    regexp_replace(regexp_replace(regexp_replace(
                    regexp_replace(regexp_replace(html,
                    '<script>[^<]*</script>', '', 'g'),
                    '<style>[^<]*</style>', '', 'g'),
                    '<[^>]*>', ' ', 'g'),
                    '&lt;', '<', 'g'),
                    '&gt;', '>', 'g'),
                    '&quot;', '"', 'g'),
                    '&amp;', '&', 'g'),
                    '[ \\t\\r\\n]+', ' ', 'g')) AS text_clean
        FROM raw
    )
    SELECT doc_id, md5(text_clean) AS clean_md5,
           CAST(LENGTH(text_clean) AS BIGINT) AS clean_chars
    FROM clean
    """,
    doc="HTML -> text extraction (the boilerplate-stripping front of "
    "every web-scale corpus: drop script/style, strip tags, decode "
    "entities, collapse whitespace): documents are wrapped in an HTML "
    "template in-query (both engines see identical bytes) and cleaned "
    "by one fused chain of scan-stage regexp_replace expressions — "
    "zero shuffles, zero Python. Output is md5 + length of the "
    "cleaned text, so a one-character divergence anywhere in the "
    "pipeline is a hash mismatch.",
)
def q165_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    html = F.concat(
        F.lit("<html><head><script>var x=1;</script><style>.c"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("{font-size:10px}</style></head><body><h1>"),
        F.upper("lang"),
        F.lit("</h1><p>"),
        F.substring("text", 1, 200),
        F.lit('</p><p>Tom &amp; Jerry &lt;3 &quot;quotes&quot;</p>'),
        F.lit("</body></html>"),
    )
    clean = html
    for pat, rep in _HTML_STEPS:
        clean = F.regexp_replace(clean, pat, rep)
    clean = F.trim(clean)
    return d.select(
        "doc_id",
        F.md5(clean).alias("clean_md5"),
        F.length(clean).cast("bigint").alias("clean_chars"),
    )


# ---------------------------------------------------------------- q166
_CMS_D = 4  # hash rows
_CMS_W = 1024  # counters per row


@register(
    "q166_count_min_freq",
    f"""
    WITH exact AS (
        SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ), top5 AS (
        SELECT user_id, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rk
        FROM exact
    )
    SELECT user_id, CAST(n AS BIGINT) AS exact_n,
           TRUE AS est_ge_exact, TRUE AS est_within_bound
    FROM top5 WHERE rk <= 5
    """,
    doc="Count-min sketch point-frequency estimation (mergeable by "
    f"construction: {_CMS_D} hash rows x {_CMS_W} counters built as a "
    "plain groupBy over (row, xxhash64-cell) — partial map-side "
    "combines ARE the sketch merge, so 100 TB of events folds to a "
    f"{_CMS_D}x{_CMS_W} table no matter the partition count). Probes "
    "the 5 heaviest users: the CMS guarantee est >= exact must hold "
    "exactly, and the overcount must stay within 16 average cell "
    "masses (a loose probabilistic ceiling — collisions are hash- "
    "dependent, so the hard check is the one-sided bound) — both "
    "checked in-query and pinned TRUE by the oracle, "
    "with the exact counts computed relationally. Complements q112 "
    "(Misra-Gries heavy hitters): MG answers 'who is heavy', CMS "
    "answers 'how often is key x' for ANY key.",
)
def q166_count_min_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    cells = ev.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.pmod(
                            F.xxhash64(F.lit(r), F.col("user_id")),
                            F.lit(_CMS_W),
                        ).alias("c"),
                    )
                    for r in range(_CMS_D)
                ]
            )
        ).alias("cell"),
    ).select("cell.r", "cell.c")
    sketch = cells.groupBy("r", "c").agg(F.count(F.lit(1)).alias("cnt"))

    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    total = ev.count()
    # distributed TakeOrdered top-5 over the per-user aggregate — no
    # single-partition rank window
    top5 = exact.orderBy(F.col("n").desc(), F.col("user_id")).limit(5)
    # probe: min over the d cells each key hashes into
    probes = top5.select(
        "user_id",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.pmod(
                            F.xxhash64(F.lit(r), F.col("user_id")),
                            F.lit(_CMS_W),
                        ).alias("c"),
                    )
                    for r in range(_CMS_D)
                ]
            )
        ).alias("cell"),
    ).select("user_id", "n", "cell.r", "cell.c")
    est = (
        probes.join(F.broadcast(sketch), ["r", "c"])
        .groupBy("user_id", "n")
        .agg(F.min("cnt").alias("est"))
    )
    # 16x the mean cell mass: est >= exact is the HARD CMS guarantee;
    # the overcount bound is probabilistic, and min-over-4-rows
    # exceeding 16x the mean has negligible probability at any corpus
    # (4x was deterministically true at the verified sf but could
    # flip on new data with no code regression)
    bound = 16 * ((total + _CMS_W - 1) // _CMS_W)
    return est.select(
        "user_id",
        F.col("n").cast("bigint").alias("exact_n"),
        (F.col("est") >= F.col("n")).alias("est_ge_exact"),
        (F.col("est") - F.col("n") <= F.lit(bound)).alias("est_within_bound"),
    )


# ---------------------------------------------------------------- q167
_LATERAL_SQL = """
    SELECT c.c_custkey, l.o_orderkey, ROUND(l.o_totalprice, 2) AS totalprice
    FROM customer c JOIN LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) l ON TRUE
    WHERE c.c_custkey < 50
"""


@register(
    "q167_lateral_topk",
    _LATERAL_SQL,
    doc="Correlated LATERAL subquery (SPARK-35551): top-2 orders per "
    "customer expressed as a per-row derived table with ORDER BY + "
    "LIMIT — the declarative SQL spelling of q12's window top-k, and "
    "the surface analysts reach for when porting Postgres/DuckDB "
    "pipelines. The IDENTICAL SQL runs on both engines. Catalyst "
    "decorrelates the lateral into a ranked join, so the physical "
    "plan is the same shuffle-on-custkey shape as the window variant, "
    "not a per-row re-scan.",
)
def q167_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.tables import register_all

    register_all(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)
