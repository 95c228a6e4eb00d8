"""Capture .explain("formatted") for every registered gate into a
directory (one file per gate) plus a summary JSON of plan-shape stats
(Exchange count, join strategies, Python-eval nodes, scan count).

Usage: python tools/capture_plans.py <out_dir> [sf_dir] [gate ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_tool_setup_spark.operators.blockrank import release_pins
from python_tool_setup_spark.queries import all_queries
from python_tool_setup_spark.session import get_spark

_NODES = [
    "Exchange",
    "BroadcastExchange",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "PythonMapInArrow",
    "FlatMapGroupsInPandas",
    "Window",
    "Sort",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Scan parquet",
]


def plan_stats(text: str) -> dict[str, int]:
    out = {}
    for node in _NODES:
        # count operator-tree occurrences like "+- Exchange (3)" /
        # "+- SortMergeJoin Inner (7)" / "Scan parquet  (1)" — the
        # node name may be followed by qualifiers before the id
        n = len(
            re.findall(rf"^[\s+:*-]*{re.escape(node)}[^(\n]*\(\d+\)", text, re.M)
        )
        if n:
            out[node] = n
    return out


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    queries = all_queries()
    summary = {}
    for name in only or sorted(queries):
        try:
            df = queries[name].spark_fn(spark, sf_dir)
            text = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            summary[name] = {"error": str(exc)[:200]}
            continue
        finally:
            release_pins()
            spark.catalog.clearCache()
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(text)
        summary[name] = plan_stats(text)
    with open(os.path.join(out_dir, "_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    print(f"captured {len(summary)} plans -> {out_dir}")


if __name__ == "__main__":
    main()
