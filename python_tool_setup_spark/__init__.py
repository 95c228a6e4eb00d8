"""python_tool_setup_spark — a PySpark-native analytics & pipeline engine.

A from-scratch re-creation of the capability surface of
``myDatapipeline/python_tool_setup`` (see /root/repo/SURVEY.md), built
Spark-first: every operator is expressed with the DataFrame/SQL API so
Catalyst/Tungsten/AQE pick the physical strategy, and Python only touches
data through Arrow-batched Pandas UDFs where built-ins genuinely cannot
express the semantics.

Layout:
    session       SparkSession builder tuned for both local tests and clusters
    tables        fixture/table loading helpers
    config        IngestionConfig dataclass + validation errors (framework parity)
    ingestion/    config-driven batch & streaming ingestion lifecycle
    sources/      file/object-store readers, latest-file selection
    operators/    relational building blocks (semi/anti, top-k, as-of, merge)
    streaming/    autoloader-equivalent, event-time windows, streaming dedup
    llm/          dedup (exact/minhash/simhash/embedding), similarity search,
                  text analysis, multimodal column plumbing
    queries       registry of runnable queries + DuckDB oracle SQL
"""

def _ship_package_by_value() -> None:
    """Ship every class/function of this package to Python workers BY
    VALUE. cloudpickle serializes module-level objects by REFERENCE,
    so worker processes (data-source writers, mapInPandas/UDF workers)
    would have to import this package — which only works when the
    driver's cwd happens to be the repo root or PYTHONPATH is set. A
    vanilla session launched elsewhere fails with ModuleNotFoundError
    inside the worker (observed round 8: q106 datasink, q112 sketch
    mapPartitions, q44/q125/q232 multimodal kernels). Registering the
    top-level package covers all submodules (cloudpickle's
    _is_registered_pickle_by_value walks parent packages)."""
    try:
        import sys

        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # noqa: BLE001 - best-effort on exotic runtimes
        pass


_ship_package_by_value()


def _resolve_version() -> str:
    """Single-source the version: installed distribution metadata when
    available, else the repo-root pyproject.toml (editable/source
    checkouts). The Poetry packaging variant must agree with the root
    pyproject — tests/test_version_consistency.py asserts all three."""
    try:
        from importlib.metadata import PackageNotFoundError, version

        try:
            return version("python-tool-setup-spark")
        except PackageNotFoundError:
            pass
    except Exception:
        pass
    try:
        import os
        import tomllib

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "pyproject.toml"), "rb") as fh:
            return tomllib.load(fh)["project"]["version"]
    except Exception:
        return "0+unknown"


__version__ = _resolve_version()
