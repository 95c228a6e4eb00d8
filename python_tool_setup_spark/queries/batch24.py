"""Round-3 gates, batch 24: physical-layout I/O levers — globally
sorted table write via range repartitioning (q230: per-file min/max
ranges become DISJOINT, which is what makes footer-stats skipping and
zone maps actually prune), and small-files read coalescing (q231:
Spark's scan packs many tiny files into few tasks, the read-side
answer to the small-files problem). Together with q61 (compaction),
q62/q80 (clustering), q116 (zone-map skipping), and q199 (codecs)
this completes the storage-layout story.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.staging import staging_dir
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q230
@register(
    "q230_global_sorted_write",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(o_totalprice), 2) AS total,
           TRUE AS ranges_disjoint
    FROM orders
    """,
    doc="Globally sorted table write: repartitionByRange on the sort "
    "key (sampled range boundaries -> range-partitioned exchange) + "
    "sortWithinPartitions, so the written files carry DISJOINT, "
    "ordered min/max ranges — verified from the actual parquet "
    "footers via DuckDB's parquet_metadata. This layout is the "
    "prerequisite that makes footer-stats skipping (q116) prune: a "
    "point or range predicate then touches one file instead of all "
    "of them, where an unsorted write smears every value range "
    "across every file. The sort is per-partition (no global "
    "single-task sort); range boundaries come from Spark's sampling, "
    "exactly how a 100 TB sorted table is laid down. Row count and "
    "sum pin lossless round-trip; the boolean pins disjointness.",
)
def q230_global_sorted_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    import duckdb

    o = load_table(spark, sf_dir, "orders")
    staged = staging_dir("sorted_write_")
    (
        o.select("o_orderkey", "o_totalprice")
        .repartitionByRange(8, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .write.mode("overwrite")
        .parquet(staged)
    )
    con = duckdb.connect()
    stats = con.execute(
        f"""
        SELECT file_name,
               MIN(stats_min_value::DOUBLE) AS lo,
               MAX(stats_max_value::DOUBLE) AS hi
        FROM parquet_metadata('{staged}/*.parquet')
        WHERE path_in_schema = 'o_totalprice'
        GROUP BY file_name ORDER BY lo
        """
    ).fetchall()
    con.close()
    disjoint = all(
        stats[i][2] <= stats[i + 1][1] for i in range(len(stats) - 1)
    )
    assert len(stats) >= 2 and disjoint, f"ranges overlap: {stats}"
    return (
        spark.read.parquet(staged)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select("n_rows", "total", F.lit(disjoint).alias("ranges_disjoint"))
    )


# ---------------------------------------------------------------- q231
_N_SMALL_FILES = 48


@register(
    "q231_small_files_coalesced_scan",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_keys,
           CAST({_N_SMALL_FILES} AS BIGINT) AS n_files,
           TRUE AS scan_coalesced
    FROM customer
    """,
    doc="Small-files read coalescing: the same table written as "
    f"{_N_SMALL_FILES} tiny files (the classic ingest pathology — "
    "per-trigger streaming sinks, over-partitioned writers) is "
    "scanned back in a handful of tasks, NOT one task per file: "
    "Spark packs splits up to maxPartitionBytes, charging "
    "openCostInBytes per file, so scan parallelism follows data "
    "volume instead of file count. At 100 TB the difference is "
    "millions of 4 KB-task launches vs thousands of right-sized "
    "ones (compaction, q61, remains the durable fix; this gate pins "
    "the read-side mitigation). Asserts scan partitions <= half the "
    "file count and the data round-trips losslessly.",
)
def q231_small_files_coalesced_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "customer")
    staged = staging_dir("small_files_")
    # one row-group-sized file per slice: worst-case tiny-file layout
    n.repartition(_N_SMALL_FILES).write.mode("overwrite").parquet(staged)
    n_files = sum(
        1 for f in os.listdir(staged)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    back = spark.read.parquet(staged)
    n_tasks = back.rdd.getNumPartitions()
    coalesced = n_tasks <= n_files // 2
    assert coalesced, f"{n_files} files scanned as {n_tasks} tasks"
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("c_custkey").alias("n_keys"),
    ).select(
        "n_rows",
        "n_keys",
        F.lit(n_files).cast("bigint").alias("n_files"),
        F.lit(coalesced).alias("scan_coalesced"),
    )
