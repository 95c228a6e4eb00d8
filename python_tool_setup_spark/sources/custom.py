"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The modern extension point for sources Spark has no built-in reader
for (internal feeds, synthetic generators, exotic formats): implement
``DataSource``/``DataSourceReader`` in Python, register once, then use
it like any format — ``spark.read.format("synthetic_docs")``. The
reader declares explicit input partitions, so generation/fetching runs
DISTRIBUTED across executors (one task per partition), not on the
driver.

Here: a deterministic synthetic-document generator (the shape used for
load tests and fixture corpora). Rows are striped ``doc_id % parts``
across partitions, so any row count scales to any parallelism with no
skew and no coordination.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SyntheticDocsDataSource(DataSource):
    """``format("synthetic_docs")`` — options: rows (total row count),
    partitions (input split count)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, bucket int, body string"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 8))

    def partitions(self):
        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition):
        # runs on an executor; deterministic per (row id), independent
        # of partition count
        for doc_id in range(partition.value, self.rows, self.parts):
            yield (
                doc_id,
                doc_id % 10,
                f"doc {doc_id} body {'x' * (doc_id % 7)}",
            )


def register_synthetic_docs(spark) -> None:
    """Idempotent registration of the custom source with the session."""
    spark.dataSource.register(SyntheticDocsDataSource)
