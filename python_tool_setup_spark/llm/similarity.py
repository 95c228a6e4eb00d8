"""Vector similarity search over ``array<float>`` embedding columns
(L3): exact cosine top-k, LSH-bucketed ANN, IVF (k-means) ANN, and
embedding near-duplicate detection.

Scale design:
- the dot product is a JVM array expression (`zip_with` + `aggregate`)
  — no Python, no UDF in the exact path;
- exact top-k broadcasts the (small) query set against the corpus:
  one scan, no shuffle except the final per-query top-k window;
- LSH ANN buckets by random-hyperplane sign bits so each query only
  scans its probe buckets; hyperplanes come from a seeded RNG inside a
  vectorized Arrow-batched pandas UDF (numpy matmul per batch);
- IVF ANN trains k-means centroids with pyspark.ml (distributed),
  assigns partitions at write time, probes nprobe cells at query time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


# --------------------------------------------------------- exact cosine ----
def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i in doubles, sequential order (deterministic)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Exact brute-force top-k cosine neighbors for each query vector.
    Queries are broadcast; the corpus is scanned once. Ranking uses the
    ROUNDED cosine (+ id tie-break) so results are reproducible across
    engines/runs. Returns (query_id, neighbor_id, cosine, rank)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("__qid"),
            F.col(vec_col).alias("__qvec"),
            l2_norm(F.col(vec_col)).alias("__qnorm"),
        )
    )
    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(vec_col).alias("__cvec"),
        l2_norm(F.col(vec_col)).alias("__cnorm"),
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("__qid") != F.col("__cid"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("__qvec"), F.col("__cvec"))
                / (F.col("__qnorm") * F.col("__cnorm")),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy("__qid").orderBy(F.col("cosine").desc(), F.col("__cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


# ----------------------------------------------------------- LSH bucket ----
def lsh_bucket_signature(
    vec_col: str, dim: int, num_planes: int = 16, seed: int = 42
):
    """Random-hyperplane sign signature as an int bucket id. Vectorized
    Arrow/pandas UDF: one numpy matmul per batch. Deterministic (seeded).
    """
    planes = np.random.default_rng(seed).standard_normal((dim, num_planes))
    powers = (1 << np.arange(num_planes)).astype(np.int64)

    @pandas_udf("long")
    def _sig(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())
        bits = (mat @ planes) > 0
        return pd.Series(bits @ powers)

    return _sig(F.col(vec_col))


def lsh_multitable_signatures(
    vec_col: str, dim: int, num_planes: int, num_tables: int, seed: int = 42
):
    """Bucket ids for ALL hash tables in one Arrow pass (array<long>,
    one entry per table) — one matmul against the stacked plane tensor
    instead of num_tables separate UDF invocations."""
    rngs = [np.random.default_rng(seed + t) for t in range(num_tables)]
    planes = np.concatenate(
        [r.standard_normal((dim, num_planes)) for r in rngs], axis=1
    )  # dim x (tables*planes)
    powers = (1 << np.arange(num_planes)).astype(np.int64)

    @pandas_udf("array<long>")
    def _sigs(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())
        bits = (mat @ planes) > 0  # n x (tables*planes)
        out = [
            (bits[:, t * num_planes : (t + 1) * num_planes] @ powers)
            for t in range(num_tables)
        ]
        stacked = np.stack(out, axis=1)  # n x tables
        return pd.Series(list(stacked))

    return _sigs(F.col(vec_col))


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    num_planes: int = 12,
    num_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: ``num_tables`` independent hyperplane tables;
    a corpus vector is a candidate if it shares a bucket with the query
    in ANY table. All table signatures come from ONE Arrow matmul pass
    per side; (table, bucket) is exploded so the candidate join is a
    single equi-join on (table, bucket) — one shuffle total, never a
    cross product. Exact cosine + top-k window over candidates only."""

    def _tagged(df, id_name, vec_name, norm_name):
        sigs = lsh_multitable_signatures(vec_name, dim, num_planes, num_tables)
        return (
            df.withColumn("__sigs", sigs)
            .select(
                id_name,
                vec_name,
                norm_name,
                F.posexplode("__sigs").alias("__table", "__bucket"),
            )
        )

    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qnorm"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(vec_col).alias("__cvec"),
        l2_norm(F.col(vec_col)).alias("__cnorm"),
    )
    qt = _tagged(q, "__qid", "__qvec", "__qnorm")
    ct = _tagged(c, "__cid", "__cvec", "__cnorm")
    cand = (
        qt.join(ct, ["__table", "__bucket"])
        .drop("__table", "__bucket")
        .filter(F.col("__qid") != F.col("__cid"))
        .dropDuplicates(["__qid", "__cid"])
    )
    scored = cand.withColumn(
        "cosine",
        dot(F.col("__qvec"), F.col("__cvec"))
        / (F.col("__qnorm") * F.col("__cnorm")),
    )
    w = Window.partitionBy("__qid").orderBy(F.col("cosine").desc(), F.col("__cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias("neighbor_id"),
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )


# ------------------------------------------------------------- IVF ANN ----
def ivf_index(
    corpus: DataFrame,
    vec_col: str = "embedding",
    num_cells: int = 16,
    seed: int = 42,
    max_fit_rows: int = 100_000,
):
    """Train an IVF coarse quantizer (distributed k-means via
    pyspark.ml) and return (assigned_corpus, model): the corpus with a
    ``__cell`` column — at scale you'd write it partitioned by cell.

    The quantizer is fitted on a bounded deterministic sample
    (``max_fit_rows``): coarse cells only need the density SHAPE, so
    fitting on 100 TB of vectors buys nothing over ~1e5 of them — the
    standard FAISS-style train-on-sample. Cell ASSIGNMENT still covers
    the full corpus (one model.transform pass)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.withColumn("__features", array_to_vector(F.col(vec_col)))
    n = feat.count()
    fit_set = (
        feat.sample(fraction=min(1.0, max_fit_rows / n), seed=seed)
        if n > max_fit_rows
        else feat
    )
    model = KMeans(
        k=num_cells,
        seed=seed,
        maxIter=5,  # coarse quantizer: rough cells are fine (recall
        # is governed by nprobe, not centroid polish — halves the
        # build time with no measured recall change)
        featuresCol="__features",
        predictionCol="__cell",
    ).fit(fit_set)
    assigned = model.transform(feat).drop("__features")
    return assigned, model


def ivf_topk(
    queries: DataFrame,
    assigned_corpus: DataFrame,
    model,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Search only the ``nprobe`` nearest cells per query: candidate set
    shrinks by ~num_cells/nprobe vs brute force; one equi-join on cell."""
    from pyspark.ml.functions import array_to_vector

    centers = model.clusterCenters()
    centers_df = F.broadcast(
        queries.sparkSession.createDataFrame(
            [(i, [float(x) for x in ctr]) for i, ctr in enumerate(centers)],
            "__cell int, __center array<double>",
        )
    )
    q = queries.select(F.col(query_id).alias("__qid"), F.col(vec_col).alias("__qvec"))
    # nprobe nearest centroids per query (tiny crossJoin: |Q| × cells),
    # ranked by TRUE euclidean proximity: argmin |q-c|² == argmax
    # (q·c - ½|c|²) since |q|² is constant per query. Ranking by raw
    # dot product alone is NOT the k-means assignment metric — a
    # query's own cell could drop out of its probe list (caught by the
    # q185 incremental-update gate at nprobe=2).
    qc = (
        q.crossJoin(centers_df)
        .withColumn(
            "__d",
            dot(F.col("__qvec"), F.col("__center"))
            - 0.5 * dot(F.col("__center"), F.col("__center")),
        )
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy("__qid").orderBy(F.col("__d").desc())
            ),
        )
        .filter(F.col("__r") <= nprobe)
        .select("__qid", "__qvec", "__cell")
    )
    c = assigned_corpus.select(
        F.col(corpus_id).alias("__cid"), F.col(vec_col).alias("__cvec"), "__cell"
    )
    scored = (
        qc.join(c, "__cell")
        .filter(F.col("__qid") != F.col("__cid"))
        .withColumn("cosine", cosine_similarity(F.col("__qvec"), F.col("__cvec")))
    )
    w = Window.partitionBy("__qid").orderBy(F.col("cosine").desc(), F.col("__cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias("neighbor_id"),
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )


# ------------------------------------------------- embedding near-dup ----
def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.9,
    block_cols=(),
    dim: int = 64,
    num_planes: int = 8,
) -> DataFrame:
    """Pairs with cosine >= threshold. With ``block_cols`` the join is
    exact within blocks (oracle-checkable); otherwise LSH buckets prune
    candidates (near-exact for high thresholds: similar vectors share
    sign bits with high probability).

    The pairwise scoring runs as ONE BLAS matmul per block/bucket
    (grouped applyInPandas, Arrow-batched): a JVM join producing
    |block|² rows with an interpreted per-pair array fold was ~10x
    slower at 10k vectors. One shuffle on the block key; a block must
    fit one task's memory (|block| x dim doubles + |block|² scores) —
    for larger blocks, subdivide via additional block cols or use the
    LSH path."""
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        *[F.col(c) for c in block_cols],
    )
    if block_cols:
        keys = list(block_cols)
    else:
        base = base.withColumn(
            "__bucket", lsh_bucket_signature("__vec", dim, num_planes)
        )
        keys = ["__bucket"]

    out_fields = ["id_a bigint", "id_b bigint"]
    for c in block_cols:
        out_fields.append(f"{c} {base.schema[c].dataType.simpleString()}")
    out_fields.append("cosine double")
    schema = ", ".join(out_fields)

    def pairs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id")
        ids = pdf["__id"].to_numpy()
        mat = np.vstack(pdf["__vec"].to_numpy()).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            norms = np.linalg.norm(mat, axis=1)
            sims = (mat @ mat.T) / np.outer(norms, norms)
        ia, ib = np.triu_indices(len(ids), k=1)
        cos = np.round(sims[ia, ib], 6)
        keep = cos >= threshold
        out = {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]]}
        for c, v in zip(block_cols, key):
            out[c] = v
        out["cosine"] = cos[keep]
        return pd.DataFrame(out, columns=["id_a", "id_b", *block_cols, "cosine"])

    return base.groupBy(*keys).applyInPandas(pairs, schema)


# --------------------------------------------------- ANN recall gate ----
def ann_recall_report(
    ann: DataFrame,
    exact: DataFrame,
    query_id: str,
    k: int,
    floor: float,
) -> DataFrame:
    """Quantitative ANN quality gate: per-query recall@k of ``ann``
    against the ``exact`` top-k (both ranked with the same rounded
    cosine + id tie-break, so recall is deterministic), aggregated to a
    single scalar row ``(n_queries, k, recall_floor_met)``.

    The DuckDB oracle asserts the expected constants. ``recall_floor_met``
    is true when at least 90% of queries recover ``floor * k`` of their
    true neighbors — a scale-robust contract (the per-query hit counts
    shift slightly with corpus size, so pinning the exact ok-count would
    tie the oracle to one sf; a real regression in the signature matmul,
    banding, or candidate join tanks recall across many queries and
    flips the boolean). This turns "approximate" from unverifiable into
    a checked contract."""
    a = ann.select(
        F.col(query_id).alias("__qid"), F.col("neighbor_id").alias("__nid")
    )
    e = exact.select(
        F.col(query_id).alias("__qid"), F.col("neighbor_id").alias("__nid")
    )
    hits = a.join(e, ["__qid", "__nid"]).groupBy("__qid").agg(
        F.count(F.lit(1)).alias("__hits")
    )
    per_q = (
        e.select("__qid")
        .distinct()
        .join(hits, "__qid", "left")
        .select(F.coalesce("__hits", F.lit(0)).alias("__hits"))
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.lit(k).cast("int").alias("k"),
        (
            F.sum((F.col("__hits") >= F.lit(floor) * k).cast("int"))
            >= F.count(F.lit(1)) * 0.9
        ).alias("recall_floor_met"),
    )


# ------------------------------------------------- filtered search ----
def filtered_topk(
    queries: DataFrame,
    corpus: DataFrame,
    predicate,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
    assigned_corpus: DataFrame | None = None,
    model=None,
    nprobe: int = 4,
) -> DataFrame:
    """Vector search under a metadata predicate (the retrieval-with-
    filters shape: "nearest docs WHERE lang = 'en' AND date > ...").

    The predicate is applied to the corpus BEFORE the similarity work —
    pre-filtering, the Spark-natural strategy: the filter pushes down
    to the (partitioned/bucketed) scan, and the search cost scales with
    the filtered subset, not the corpus. With an IVF index attached
    (``assigned_corpus``/``model``), the probe joins cells of the
    filtered subset only; otherwise exact brute-force over the subset.
    Post-filtering (search first, filter the top-k after) loses recall
    when the filter is selective — not what we want as the default.
    """
    if assigned_corpus is not None and model is not None:
        return ivf_topk(
            queries,
            assigned_corpus.filter(predicate),
            model,
            query_id,
            corpus_id,
            vec_col,
            k=k,
            nprobe=nprobe,
        )
    return cosine_topk(
        queries, corpus.filter(predicate), query_id, corpus_id, vec_col, k=k
    )


# ------------------------------------------------- hybrid retrieval ----
def hybrid_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    text_col: str = "text",
    k: int = 10,
    alpha: float = 0.5,
) -> DataFrame:
    """Hybrid retrieval: ``alpha * cosine + (1-alpha) * token-Jaccard``.

    The lexical leg (token-set Jaccard) catches exact keyword matches
    that embedding geometry can miss; the vector leg catches paraphrase.
    Both legs are JVM expressions over one broadcast(queries) × corpus
    scan — same single-pass cost shape as ``cosine_topk``; at scale the
    corpus side comes pre-filtered (``filtered_topk``) or bucketed.
    Scores are rounded before ranking so ordering is engine-stable.
    """
    from python_tool_setup_spark.llm.text import tokenize

    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("__qid"),
            F.col(vec_col).alias("__qvec"),
            l2_norm(F.col(vec_col)).alias("__qnorm"),
            F.array_distinct(tokenize(text_col)).alias("__qtoks"),
        )
    )
    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(vec_col).alias("__cvec"),
        l2_norm(F.col(vec_col)).alias("__cnorm"),
        F.array_distinct(tokenize(text_col)).alias("__ctoks"),
    )
    inter = F.size(F.array_intersect("__qtoks", "__ctoks"))
    uni = F.size(F.array_union("__qtoks", "__ctoks"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("__qid") != F.col("__cid"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("__qvec"), F.col("__cvec"))
                / (F.col("__qnorm") * F.col("__cnorm")),
                6,
            ),
        )
        .withColumn(
            "lexical",
            # scale-first round (q208 class): int/int ratio with
            # decimal-reachable scale-6 ties
            F.round(1000000 * (inter / F.greatest(uni, F.lit(1))))
            / 1000000.0,
        )
        .withColumn(
            "score",
            # scale-first round: a 0.5/0.5 mix of two 6-dec values has
            # an EXACT decimal tie whenever the 7th digit lands on 5 —
            # the most reachable ROUND(x, 6) knife edge in the repo
            F.round(
                1000000
                * (
                    F.lit(alpha) * F.col("cosine")
                    + F.lit(1 - alpha) * F.col("lexical")
                )
            )
            / 1000000.0,
        )
    )
    w = Window.partitionBy("__qid").orderBy(F.col("score").desc(), F.col("__cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias("neighbor_id"),
            "cosine",
            "lexical",
            "score",
            "rank",
        )
    )


def embedding_minmax(df: DataFrame, vec_col: str = "embedding") -> tuple[list, list]:
    """Per-dimension global min/max of an embedding column. One
    posexplode + partial-aggregated groupBy(dim); the collect is
    bounded by the dimensionality, never the row count."""
    stats = (
        df.select(F.posexplode(vec_col).alias("i", "x"))
        .groupBy("i")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    dim = len(stats)
    mins, maxes = [0.0] * dim, [0.0] * dim
    for r in stats:
        mins[r["i"]], maxes[r["i"]] = float(r["mn"]), float(r["mx"])
    return mins, maxes


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """Scalar (per-dimension min/max) int8 quantization of an embedding
    column, plus the per-vector reconstruction MSE — the standard 4x
    storage/bandwidth compression in front of ANN indexes (IVF/LSH in
    this module consume either precision).

    All JVM-side: the codebook is 2*dim literals folded into a single
    ``transform`` over the array; quantize + dequantize + error are
    scan-stage expressions with zero shuffle and zero Python. The
    two-pass shape (tiny stats agg, then map) is exactly how a 100 TB
    quantization job wants to run; for single-pass pipelines the stats
    can come from a sample or a prior batch instead.
    """
    mins, maxes = embedding_minmax(df, vec_col)
    mn = F.array(*[F.lit(v).cast("double") for v in mins])
    rng = F.array(
        *[
            F.lit((mx - mv) if mx > mv else 1.0).cast("double")
            for mv, mx in zip(mins, maxes)
        ]
    )
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))

    def q_of(xi, i):
        return F.round(
            (xi - F.element_at(mn, i + 1))
            * F.lit(float(levels))
            / F.element_at(rng, i + 1)
        )

    quant = F.transform(x, lambda xi, i: q_of(xi, i).cast("int"))
    # dequantized value and squared error, folded left-to-right so the
    # FP sum order is deterministic (and mirrors the oracle's fold)
    def err_of(xi, i):
        # plain subtract/multiply/divide: IEEE exactly-rounded, so the
        # oracle engine computes bit-identical doubles (pow() would not)
        d = xi - (
            q_of(xi, i) * F.element_at(rng, i + 1) / F.lit(float(levels))
            + F.element_at(mn, i + 1)
        )
        return d * d

    sq = F.transform(x, err_of)
    mse = F.aggregate(
        sq, F.lit(0.0), lambda acc, v: acc + v
    ) / F.size(F.col(vec_col))
    return df.select(
        F.col(id_col),
        F.array_join(
            F.transform(quant, lambda q: q.cast("string")), "|"
        ).alias("quant"),
        # scale-first round (q208 recipe): ROUND(x, 9) of a computed
        # double resolves near-midpoint values differently per engine
        # even when x is bit-identical; the scale-0 round agrees
        (F.round(1000000000 * mse) / 1000000000.0).alias("mse"),
    )
