"""Layout maintenance: compaction + Z-order-style clustering.

Parity: the reference issues Delta ``OPTIMIZE [ZORDER BY (...)]`` after
writes (framework.py:256-266, config framework.py:70). Without
delta-spark we implement the *intent*:

- compaction → rewrite with AQE-coalesced / explicitly repartitioned
  output files (small-file problem is the #1 operational issue at
  100 TB — a day of streaming appends leaves thousands of tiny files);
- Z-order → ``repartitionByRange`` on the clustering columns +
  ``sortWithinPartitions``: parquet row-group min/max stats then give
  the same data-skipping effect for predicates on those columns. A true
  space-filling curve only beats this for multi-column point lookups;
  documented divergence (SURVEY.md §7 hard-items #4).

Both are staged rewrites promoted by a metadata-only rename, so a
failure mid-rewrite never corrupts the live table.
"""

from __future__ import annotations

import uuid

from pyspark.sql import SparkSession

from python_tool_setup_spark.sources.fs import replace_dir

_TARGET_FILE_BYTES = 128 * 1024 * 1024


def optimize_layout(
    spark: SparkSession,
    path: str | None = None,
    table: str | None = None,
    fmt: str = "parquet",
    zorder_by: list[str] | None = None,
    partition_by: list[str] | None = None,
    target_file_bytes: int = _TARGET_FILE_BYTES,
) -> None:
    """OPTIMIZE-equivalent over a path or managed table."""
    if fmt == "delta":
        name = table if (table and not path) else f"delta.`{path}`"
        z = f" ZORDER BY ({', '.join(zorder_by)})" if zorder_by else ""
        spark.sql(f"OPTIMIZE {name}{z}")
        return
    if path:
        df = spark.read.format(fmt).load(path)
    elif table:
        df = spark.table(table)
    else:
        raise ValueError("optimize_layout needs a path or table")

    n = max(1, _estimate_num_files(spark, df, target_file_bytes))
    if zorder_by:
        df = df.repartitionByRange(n, *zorder_by).sortWithinPartitions(*zorder_by)
    else:
        # size-based compaction: estimate partition count from input bytes
        df = df.repartition(n)

    if path:
        staging = f"{path.rstrip('/')}__optimize_{uuid.uuid4().hex[:8]}"
        writer = df.write.format(fmt).mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(staging)
        replace_dir(spark, staging, path)
        spark.catalog.clearCache()
        if table:
            spark.sql(f"REFRESH TABLE {table}")
    else:
        tmp = f"__optimize_{uuid.uuid4().hex[:8]}"
        df.createOrReplaceTempView(tmp)
        spark.sql(
            f"CREATE OR REPLACE TABLE {table} USING {fmt} "
            f"AS SELECT * FROM {tmp}"
        )
        spark.catalog.dropTempView(tmp)


def _estimate_num_files(spark, df, target_file_bytes: int) -> int:
    try:
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        return int(min(max(1, size // target_file_bytes), 100_000))
    except Exception:  # noqa: BLE001
        return spark.sparkContext.defaultParallelism


# ------------------------------------------------- true Z-order (Morton) ----
def morton_code(a, b, bits: int = 16):
    """Interleave the low `bits` bits of two non-negative integer
    columns into a Morton (Z-curve) code: a_0 b_0 a_1 b_1 ...

    Pure integer arithmetic (shift/mask/or), engine-independent and
    fully inside whole-stage codegen. 2x16 bits -> 32-bit code.
    """
    from pyspark.sql import functions as F

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    a, b = a.cast("long"), b.cast("long")
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return code


def zorder_by_morton(
    df,
    col_a: str,
    col_b: str,
    num_files: int,
    bits: int = 16,
):
    """Cluster rows along a real space-filling curve over two columns.

    Each column is min/max-scaled to `bits` bits (two tiny aggregate
    scalars — no data is collected), bit-interleaved into a Morton
    code, then range-partitioned + sorted by the code. Unlike the
    lexicographic `repartitionByRange(a, b)` fallback, BOTH columns
    get tight per-file min/max ranges, so parquet row-group stats
    prune point/range predicates on either column (the multi-column
    data-skipping Delta's OPTIMIZE ZORDER provides).
    """
    from pyspark.sql import functions as F

    top = (1 << bits) - 1
    stats = df.agg(
        F.min(col_a).alias("a_lo"),
        F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"),
        F.max(col_b).alias("b_hi"),
    ).first()

    def scaled(c, lo, hi):
        if hi == lo:
            return F.lit(0)
        return ((F.col(c) - F.lit(lo)) * top / F.lit(hi - lo)).cast("long")

    coded = df.withColumn(
        "__z",
        morton_code(
            scaled(col_a, stats["a_lo"], stats["a_hi"]),
            scaled(col_b, stats["b_lo"], stats["b_hi"]),
            bits,
        ),
    )
    return (
        coded.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
