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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


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


# ------------------------------------------------- streaming variant ----
class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticStreamReader(DataSourceStreamReader):
    """Offset-tracked stream of ``rows`` synthetic records: offsets are
    plain row positions, each microbatch covers [start, end) split into
    ``partitions`` executor tasks. ``availableNow`` drains to
    ``latestOffset`` exactly once — replayable from any committed
    offset, which is what makes the source exactly-once under
    checkpointing."""

    def __init__(self, options):
        self.total = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 4))

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        return {"pos": self.total}

    def partitions(self, start, end):
        lo, hi = start["pos"], end["pos"]
        width = max(1, (hi - lo + self.parts - 1) // self.parts)
        return [
            _RangePartition(p, min(p + width, hi))
            for p in range(lo, hi, width)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield (i, i % 10, f"doc {i} body {'x' * (i % 7)}")

    def commit(self, end):
        pass


class SyntheticStreamDataSource(DataSource):
    """``readStream.format("synthetic_stream")`` — deterministic
    counter stream with the same row contents as ``synthetic_docs``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_stream"

    def schema(self) -> str:
        return "doc_id bigint, bucket int, body string"

    def streamReader(self, schema) -> SyntheticStreamReader:
        return SyntheticStreamReader(self.options)


def register_synthetic_stream(spark) -> None:
    spark.dataSource.register(SyntheticStreamDataSource)


# --------------------------------------------------- writer variant ----
class _JsonlCommit(WriterCommitMessage):
    def __init__(self, filename: str, rows: int):
        self.filename, self.rows = filename, rows



def _stage_jsonl(path: str, rows) -> _JsonlCommit:
    """Task-side half of the two-phase JSONL sink (shared by the batch
    and streaming writers): spool rows to a uniquely named file, report
    it via commit message."""
    import json as _json
    import os as _os
    import uuid as _uuid

    name = f"part-{_uuid.uuid4().hex}.jsonl"
    n = 0
    with open(_os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(_json.dumps(r.asDict()) + "\n")
            n += 1
    return _JsonlCommit(name, n)


def _publish_manifest(path: str, manifest_name: str, messages) -> None:
    """Driver-side half: publish the committed-file manifest."""
    import json as _json
    import os as _os

    manifest = {m.filename: m.rows for m in messages if m is not None}
    with open(_os.path.join(path, manifest_name), "w") as f:
        f.write(_json.dumps(manifest, sort_keys=True))


def _discard_staged(path: str, messages) -> None:
    """Abort path: best-effort removal of staged (uncommitted) files."""
    import os as _os

    for m in messages:
        if m is not None:
            try:
                _os.remove(_os.path.join(path, m.filename))
            except OSError:
                pass


class JsonlDirWriter(DataSourceWriter):
    """One JSONL file per task, written to a unique name and reported
    via a commit message — the two-phase shape every distributed sink
    needs: tasks stage independently, the driver's ``commit`` sees the
    full manifest (or ``abort`` discards). No coordination during the
    write; rename/manifest publication is the only serial step."""

    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, rows):
        return _stage_jsonl(self.path, rows)

    def commit(self, messages):
        _publish_manifest(self.path, "_MANIFEST.json", messages)

    def abort(self, messages):
        _discard_staged(self.path, messages)


class JsonlDirDataSource(DataSource):
    """``df.write.format("jsonl_dir").option("path", dir)`` — a custom
    Python sink with per-task staging + driver-side manifest commit."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema, overwrite: bool) -> JsonlDirWriter:
        return JsonlDirWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite) -> "JsonlStreamWriter":
        return JsonlStreamWriter(self.options)


def register_jsonl_dir(spark) -> None:
    spark.dataSource.register(JsonlDirDataSource)


class JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming flavor of the JSONL sink (Spark 4 Python streaming
    data sink API): every micro-batch, each task stages a uniquely
    named ``part-<uuid>.jsonl`` and reports it in a commit
    message; the driver's per-batch ``commit(messages, batchId)``
    publishes a ``_MANIFEST-<batchId>.json``. Task retries write NEW
    unique names and only committed names enter a manifest, so the
    spool is exactly-once at the manifest level — the same two-phase
    contract as the batch writer, exercised per epoch."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _stage_jsonl(self.path, iterator)

    def commit(self, messages, batchId):
        _publish_manifest(self.path, f"_MANIFEST-{batchId}.json", messages)

    def abort(self, messages, batchId):
        _discard_staged(self.path, messages)


# Worker-side importability: these classes ship to Python workers BY
# VALUE via the package-level cloudpickle registration in
# python_tool_setup_spark.__init__ (_ship_package_by_value), so no
# sys.path/cwd assumption leaks into the data-source worker process.
