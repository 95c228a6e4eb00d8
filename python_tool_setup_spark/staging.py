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
