"""Deletion vectors: soft deletes without rewriting data files.

The Delta/Iceberg "merge-on-read" delete path: instead of rewriting
every file that contains a deleted row (copy-on-write — O(touched
files) of DATA), a delete writes a tiny sidecar of (file, row_index)
tombstones and readers anti-join it at scan time. At 100 TB this turns
a wide delete into metadata-sized writes; the data rewrite happens
later, amortized, in compaction (ingestion/maintenance.py).

Row identity comes from Spark's parquet file metadata columns
(``_metadata.file_path`` + ``_metadata.row_index``) — stable for
immutable files, no synthetic key needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def build_deletion_vector(
    spark: SparkSession, path: str, predicate: Column
) -> DataFrame:
    """Tombstones for every row matching ``predicate``: one
    (_file, _row) pair per deleted row. One distributed scan; output
    is deleted-row-count-sized."""
    df = spark.read.parquet(path).select(
        F.col("_metadata.file_path").alias("_file"),
        F.col("_metadata.row_index").alias("_row"),
        "*",
    )
    return df.filter(predicate).select("_file", "_row")


def read_with_deletion_vector(
    spark: SparkSession, path: str, dv: DataFrame
) -> DataFrame:
    """Scan ``path`` with the deletion vector applied: a left anti-join
    on (file, row_index). The DV is usually tiny relative to the table
    — broadcast it so the scan never shuffles."""
    df = spark.read.parquet(path).select(
        "*",
        F.col("_metadata.file_path").alias("_file"),
        F.col("_metadata.row_index").alias("_row"),
    )
    return df.join(
        F.broadcast(dv), ["_file", "_row"], "left_anti"
    ).drop("_file", "_row")
