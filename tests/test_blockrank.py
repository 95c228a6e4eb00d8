"""prefix_agg / prefix_rank must reproduce global-window semantics
exactly while opening no unpartitioned window in the physical plan."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import prefix_agg, prefix_rank


def _rows(n, seed=7):
    rng = random.Random(seed)
    return [
        (i, rng.randint(0, 50), rng.randint(-100, 100)) for i in range(n)
    ]


def _df(spark, n, seed=7):
    return spark.createDataFrame(_rows(n, seed), "id long, k long, v long")


def test_prefix_sum_matches_global_window(spark):
    df = _df(spark, 500)
    got = prefix_agg(
        df, [("k", "asc"), ("id", "asc")], {"pre": ("sum", "v")}, n_blocks=7
    )
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("pre", F.coalesce(F.sum("v").over(w), F.lit(0)))
    assert sorted(got.select("id", "pre").collect()) == sorted(
        want.select("id", "pre").collect()
    )


def test_prefix_min_desc_matches_global_window(spark):
    df = _df(spark, 300, seed=11)
    got = prefix_agg(
        df,
        [("k", "desc"), ("id", "asc")],
        {"pmin": ("min", "v"), "pmax": ("max", "v"), "cnt": ("count", None)},
        n_blocks=5,
    )
    w = Window.orderBy(F.col("k").desc(), "id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = df.select(
        "id",
        F.min("v").over(w).alias("pmin"),
        F.max("v").over(w).alias("pmax"),
        F.coalesce(F.count(F.lit(1)).over(w), F.lit(0)).alias("cnt"),
    )
    assert sorted(got.select("id", "pmin", "pmax", "cnt").collect()) == sorted(
        want.collect()
    )


def test_prefix_rank_matches_row_number(spark):
    df = _df(spark, 400, seed=3)
    got = prefix_rank(df, [("v", "desc"), ("id", "asc")], alias="rk")
    want = df.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("v").desc(), "id"))
    )
    assert sorted(got.select("id", "rk").collect()) == sorted(
        want.select("id", "rk").collect()
    )


def test_edge_cases(spark):
    empty = spark.createDataFrame([], "id long, v long")
    assert (
        prefix_agg(empty, [("id", "asc")], {"p": ("sum", "v")}).count() == 0
    )
    one = spark.createDataFrame([(1, 9)], "id long, v long")
    row = prefix_agg(
        one, [("id", "asc")], {"p": ("sum", "v"), "m": ("min", "v")}
    ).collect()[0]
    assert row["p"] == 0 and row["m"] is None


def test_no_unpartitioned_window_in_plan(spark):
    df = _df(spark, 100)
    got = prefix_rank(df, [("v", "asc"), ("id", "asc")])
    plan = got._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            # every window spec in the plan must carry partition cols
            assert "_blk" in line, line


def test_prefix_agg_cached_input_consistent(spark):
    """Regression: a CACHED input must not break block-offset
    consistency (two repartitionByRange executions re-sampling
    different boundaries -> silently wrong prefixes)."""
    from pyspark.sql import functions as F

    from python_tool_setup_spark.operators.blockrank import prefix_agg

    df = (
        spark.range(5000)
        .select(
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") * 7919 % 100003).alias("v"),
        )
        .persist()
    )
    try:
        pre = prefix_agg(df, [("g", "asc"), ("v", "asc")], {"p": ("count", None)})
        chk = pre.groupBy("g").agg(
            F.min(F.coalesce("p", F.lit(0))).alias("mn"),
            F.max(F.col("p") + 1).alias("mx"),
            F.count("*").alias("n"),
        ).orderBy("g").collect()
        run = 0
        for r in chk:
            assert r["mn"] == run
            run += r["n"]
            assert r["mx"] == run
    finally:
        df.unpersist()
