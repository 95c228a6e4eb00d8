from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_tool_setup_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session", autouse=True)
def _session_tmp_root():
    """Route every test-side tempfile.mkdtemp into one removable root,
    so a pytest run leaves /tmp exactly as it found it."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="pytest-tmp-root-")
    prev = tempfile.tempdir
    tempfile.tempdir = root
    yield
    tempfile.tempdir = prev
    shutil.rmtree(root, ignore_errors=True)


@pytest.fixture(scope="session")
def spark():
    import shutil
    import tempfile

    warehouse = tempfile.mkdtemp(prefix="spark-wh-")
    spark = get_spark(
        "python_tool_setup_spark-tests",
        master="local[4]",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.sql.warehouse.dir": warehouse,
        },
    )
    yield spark
    shutil.rmtree(warehouse, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
