"""Session-scoped staging directories for gate fixtures and benches.

Every gate that stages fixture files (chunked streams, media dirs,
merge targets, checkpoints) allocates its directory here instead of
calling ``tempfile.mkdtemp`` directly: all staging nests under ONE
process-lifetime root that an ``atexit`` hook removes, so repeated
bench/verify runs are re-entrant and leave no ``/tmp`` litter.

This is test/gate plumbing only — production writes go to real table
paths via the ingestion APIs, never through here.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def staging_root() -> str:
    """The process-lifetime staging root (created lazily, removed at
    interpreter exit)."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="pts_spark_staging_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def staging_dir(prefix: str) -> str:
    """A fresh directory under the session staging root. Drop-in for
    ``tempfile.mkdtemp(prefix=...)`` at gate-fixture call sites."""
    return tempfile.mkdtemp(prefix=prefix, dir=staging_root())


def local_rows_df(spark, rows: list, schema: str):
    """Single-partition DataFrame from driver-local rows (sentinels,
    tiny planted fixtures).

    ``spark.createDataFrame(rows, ...)`` pickles the rows across
    ``defaultParallelism`` Python partitions; a later ``coalesce(1)``
    (the natural "write one file" idiom) then runs ONE task that pays
    one sequential Python-worker round-trip PER parent partition —
    ~4 s for a 2-row sentinel on local[32], measured. Parallelizing to
    one slice up front makes the same write ~0.3 s and needs no
    coalesce. Gate/staging plumbing only — production data never
    originates driver-side.
    """
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
