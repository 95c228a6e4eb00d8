"""Query registry: every operator from SURVEY.md §2 that is "done" has a
named entry here — a Spark callable ``(spark, sf_dir) -> DataFrame`` and
(when SQL-expressible) a DuckDB oracle string over the same tables.

The driver contract (/root/repo/__spark_entry__.py) consumes this via
``queries()`` / ``oracle_sql()``. Column names are aliased identically
on both sides; floating aggregates are rounded identically on both
sides; output timestamps are formatted to strings so engine timezone
representations can't diverge.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Query(name=name, spark_fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def all_queries() -> dict[str, Query]:
    # Import side-effect modules exactly once.
    from python_tool_setup_spark.queries import (  # noqa: F401
        relational,
        llm,
        streaming,
        ingestion,
        extras,
        udfs,
        maintenance,
        pipeline,
        versioned,
        quality,
        cleaning,
        analytics,
        corpus,
        batch3,
        batch4,
        batch5,
        batch6,
    )

    return dict(_REGISTRY)
