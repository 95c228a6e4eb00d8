"""File-level zone maps: per-file min/max column statistics and
driver-side scan pruning.

This is the data-skipping pattern every 100 TB table format relies on
(Delta file stats, Iceberg manifest ranges, Parquet footer min/max):
maintain one tiny row of (min, max, count) per data file, and answer a
range predicate by reading ONLY the files whose range intersects it.
The zone map itself is O(n_files) metadata rows — thousands of rows for
a 100 TB table — so collecting the pruned file list on the driver is by
design (it is exactly what a table-format scan planner does); the data
files themselves are never driver-resident.

Reference parity: the reference framework delegates layout/statistics
to its table format (framework.py's Delta passthrough); this module
re-expresses the capability for plain parquet directories.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_zone_map(spark: SparkSession, path: str, columns: list[str]) -> DataFrame:
    """One row per data file with min/max/count for ``columns``.

    Runs as a single distributed scan grouped by ``_metadata.file_path``
    (Spark's hidden file-metadata column); at scale this is the same
    stats-collection pass a `CONVERT TO DELTA` or `ANALYZE` runs, and
    the output is small enough to persist next to the table.
    """
    src = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        src.select(F.col("_metadata.file_path").alias("file"), *columns)
        .groupBy("file")
        .agg(*aggs)
    )


@dataclass(frozen=True)
class PrunedScan:
    df: DataFrame
    files_read: int
    files_total: int


def pruned_read(
    spark: SparkSession,
    path: str,
    zone_map: DataFrame,
    column: str,
    lo,
    hi,
) -> PrunedScan:
    """Read only the files whose [min, max] intersects [lo, hi].

    The residual predicate is still applied after the scan (zone
    pruning is sound but not exact: a surviving file may hold rows
    outside the range). Equivalent to a full scan + filter, but I/O is
    proportional to the files touched, not the table size.
    """
    stats = zone_map.select(
        "file", f"min_{column}", f"max_{column}"
    ).collect()
    files_total = len(stats)
    # A file whose column is entirely NULL has min/max = None; no row
    # in it can satisfy a range predicate, so skipping it is sound (and
    # comparing None would raise).
    keep = [
        r["file"]
        for r in stats
        if r[f"min_{column}"] is not None
        and r[f"max_{column}"] is not None
        and r[f"min_{column}"] <= hi
        and r[f"max_{column}"] >= lo
    ]
    if keep:
        df = spark.read.parquet(*keep).filter(
            (F.col(column) >= lo) & (F.col(column) <= hi)
        )
    else:
        df = spark.read.parquet(path).filter(F.lit(False))
    return PrunedScan(df=df, files_read=len(keep), files_total=files_total)
