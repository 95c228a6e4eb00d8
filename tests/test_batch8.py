"""Targeted unit tests for the batch-8 operators (the oracle-parity
suite covers every gate end-to-end; these pin the operator-level
invariants the gates rely on)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_cms_overestimates_every_key(spark):
    """Count-min guarantee: est >= exact for ALL keys, not just the
    probed heavy hitters — build the sketch over a skewed frame and
    probe every distinct key."""
    from python_tool_setup_spark.queries.batch8 import _CMS_D, _CMS_W

    df = spark.range(0, 5000).select((F.col("id") % 97).alias("user_id"))

    def cells(src):
        return src.select(
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
        ).select("user_id", "cell.r", "cell.c")

    sketch = (
        cells(df).groupBy("r", "c").agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = df.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    est = (
        cells(exact.select("user_id"))
        .join(sketch, ["r", "c"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("est"))
    )
    joined = exact.join(est, "user_id").collect()
    assert len(joined) == 97
    assert all(row["est"] >= row["n"] for row in joined)


def test_url_canonicalize_variants_collapse(spark, sf_dir):
    """Every document's two URL variants collapse to ONE canonical
    form, and the canonical form carries no tracking params, fragment,
    uppercase, or trailing slash."""
    from python_tool_setup_spark.queries import all_queries

    out = all_queries()["q164_url_canonicalize"].spark_fn(spark, sf_dir)
    rows = out.collect()
    assert all(r["n_variants"] == 2 for r in rows)
    for r in rows:
        u = r["canonical_url"]
        assert u.startswith("http://example.com/")
        assert "utm_" not in u and "#" not in u
        assert u == u.lower()
        assert not u.split("?")[0].endswith("/")


def test_semantic_dedup_identical_vectors_cocluster(spark, sf_dir):
    """The SemDeDup recall contract: identical vectors always receive
    the same k-means cell, so planted duplicates can never be split by
    the blocking step."""
    from python_tool_setup_spark.llm.similarity import ivf_index
    from python_tool_setup_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = e.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    assigned, _ = ivf_index(e.unionByName(planted), "embedding", num_cells=8)
    a = assigned.select("vec_id", "__cell")
    pairs = (
        a.filter(F.col("vec_id") < 10)
        .alias("o")
        .join(
            a.filter(F.col("vec_id") >= 1_000_000).alias("c"),
            F.col("o.vec_id") + 1_000_000 == F.col("c.vec_id"),
        )
        .select(F.col("o.__cell").alias("ca"), F.col("c.__cell").alias("cb"))
        .collect()
    )
    assert len(pairs) == 10
    assert all(p["ca"] == p["cb"] for p in pairs)


def test_lateral_equals_window_topk(spark, sf_dir):
    """The LATERAL ORDER BY+LIMIT derived table returns exactly the
    window-function top-k rows."""
    from pyspark.sql import Window

    from python_tool_setup_spark.queries import all_queries
    from python_tool_setup_spark.tables import load_table

    lateral = (
        all_queries()["q167_lateral_topk"]
        .spark_fn(spark, sf_dir)
        .collect()
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    win = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .collect()
    )
    key = lambda r: (r["c_custkey"], r["o_orderkey"])  # noqa: E731
    assert sorted(map(key, lateral)) == sorted(map(key, win))


def test_hll_union_matches_rebuilt_sketch(spark, sf_dir):
    """Merging per-group sketches equals sketching the whole column —
    the partial-aggregate identity that makes HLL safe to distribute."""
    from python_tool_setup_spark.tables import load_table

    c = load_table(spark, sf_dir, "customer")
    merged = (
        c.groupBy("c_nationkey")
        .agg(F.hll_sketch_agg("c_custkey").alias("s"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("s")).alias("est"))
        .collect()[0]["est"]
    )
    direct = c.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("c_custkey")).alias("est")
    ).collect()[0]["est"]
    assert merged == direct
