"""Round-3 gates, batch 16: Arrow-native batch mapping (q203),
built-in regression aggregates (q204), bitmap distinct-counting
(q205), and the modern aggregate trio mode/median/any_value (q206).

Oracle conventions as everywhere: identical aliases both sides,
doubles ROUNDed identically, engine-specific sketches gated through
booleans next to relationally-pinned exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q203
@register(
    "q203_map_in_arrow",
    """
    SELECT CAST(doc_id % 8 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars * 2) AS BIGINT) AS doubled_chars
    FROM documents GROUP BY 1
    """,
    doc="Arrow-native batch mapping (mapInArrow): the same "
    "batch-transform surface as mapInPandas but handed raw "
    "pyarrow.RecordBatch objects — no pandas materialization, no "
    "index bookkeeping, the lowest-overhead Python hook Spark "
    "offers. The transform doubles a numeric column with pyarrow "
    "compute kernels (columnar, zero row iteration) before a plain "
    "JVM aggregate. For per-batch columnar math over 100 TB this "
    "shaves the pandas conversion tax off every batch.",
)
def q203_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def double_chars(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.multiply(batch.column("n_chars"), pa.scalar(2)),
                ],
                names=["doc_id", "doubled"],
            )

    doubled = d.mapInArrow(double_chars, "doc_id long, doubled long")
    return doubled.groupBy(
        (F.col("doc_id") % 8).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("doubled").cast("bigint").alias("doubled_chars"),
    )


# ---------------------------------------------------------------- q204
@register(
    "q204_regression_aggregates",
    """
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4)
               AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Built-in linear-regression aggregates (regr_slope / "
    "regr_intercept / regr_r2 / regr_count — the SQL:2003 family "
    "q140 assembled by hand from moment sums): price-on-quantity OLS "
    "per return flag, computed as mergeable moment aggregates in one "
    "pass — the same partial-aggregation shape as SUM, so a 100 TB "
    "regression costs exactly one map-side-combined shuffle. The "
    "IDENTICAL aggregate names run on both engines.",
)
def q204_regression_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).cast("bigint").alias("n"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


# ---------------------------------------------------------------- q205
@register(
    "q205_bitmap_distinct",
    """
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS exact_distinct,
           TRUE AS bitmap_exact,
           TRUE AS union_consistent
    FROM customer GROUP BY c_mktsegment
    """,
    doc="Bitmap-based distinct counting (bitmap_construct_agg / "
    "bitmap_count / bitmap_or_agg): dense integer keys folded into "
    "per-bucket roaring-style bitmaps — EXACT distinct counts (unlike "
    "HLL's estimate, q160) that still merge associatively, so the "
    "distinct-count of a union is the OR of the bitmaps with no "
    "re-scan. Per-segment bitmap counts are checked against "
    "COUNT(DISTINCT) in-query, and the segment bitmaps are OR-merged "
    "to the global count — the mergeable-exact middle ground between "
    "a distinct shuffle and a sketch.",
)
def q205_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (segment, key) projection read by the bitmap build AND both exact
    # counts; the bucket bitmaps feed the per-segment count AND the
    # global OR-merge: pin both so customer is scanned once.
    c = pin(
        load_table(spark, sf_dir, "customer").select(
            "c_mktsegment", "c_custkey"
        )
    )
    # bitmap bucketing: key -> (bucket, bit position); one bitmap per
    # (segment, bucket), counts summed per segment
    per_bucket = pin(c.groupBy(
        "c_mktsegment",
        F.bitmap_bucket_number("c_custkey").alias("bucket"),
    ).agg(
        F.bitmap_construct_agg(
            F.bitmap_bit_position("c_custkey")
        ).alias("bm")
    ))
    per_segment = per_bucket.groupBy("c_mktsegment").agg(
        F.sum(F.bitmap_count("bm")).cast("bigint").alias("bitmap_distinct")
    )
    exact = c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_custkey").cast("bigint").alias("exact_distinct")
    )
    # global distinct via OR-merge of the per-segment bucket bitmaps
    global_bitmap = (
        per_bucket.groupBy("bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).cast("bigint").alias("g_bitmap"))
    )
    global_exact = c.agg(
        F.countDistinct("c_custkey").cast("bigint").alias("g_exact")
    )
    g_ok = global_bitmap.crossJoin(global_exact).select(
        (F.col("g_bitmap") == F.col("g_exact")).alias("g_ok")
    )
    return (
        exact.join(per_segment, "c_mktsegment")
        .crossJoin(F.broadcast(g_ok))
        .select(
            "c_mktsegment",
            "exact_distinct",
            (F.col("bitmap_distinct") == F.col("exact_distinct")).alias(
                "bitmap_exact"
            ),
            F.col("g_ok").alias("union_consistent"),
        )
    )


# ---------------------------------------------------------------- q206
@register(
    "q206_modern_aggregates",
    """
    SELECT l_linestatus,
           ROUND(median(l_extendedprice), 4) AS median_price,
           CAST(mode(l_quantity ORDER BY l_quantity) AS BIGINT)
               AS mode_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT l_linestatus, l_extendedprice,
                 CAST(l_quantity AS BIGINT) AS l_quantity
          FROM lineitem)
    GROUP BY l_linestatus
    """,
    doc="Modern aggregate shorthand (median / mode): the declarative "
    "spellings of q47's percentile and a most-frequent-value "
    "aggregate. mode() ties are engine-arbitrary, so the gate "
    "deterministically resolves them: Spark computes the full "
    "frequency table and takes (count desc, value asc) — the same "
    "tie-break DuckDB's ORDER BY-qualified mode applies — making the "
    "value hash stable. median remains the exact interpolated "
    "percentile on both engines.",
)
def q206_modern_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_linestatus",
        "l_extendedprice",
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    med = li.groupBy("l_linestatus").agg(
        F.round(F.median("l_extendedprice"), 4).alias("median_price"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    freq = li.groupBy("l_linestatus", "qty").agg(
        F.count(F.lit(1)).alias("f")
    )
    w = Window.partitionBy("l_linestatus").orderBy(
        F.col("f").desc(), F.col("qty")
    )
    modes = (
        freq.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("l_linestatus", F.col("qty").alias("mode_qty"))
    )
    return med.join(modes, "l_linestatus").select(
        "l_linestatus", "median_price", "mode_qty", "n"
    )
