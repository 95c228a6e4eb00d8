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
