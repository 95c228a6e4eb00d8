"""Decompose per-gate bench cost: DataFrame construction (Python +
analysis), physical planning (explain), and execution (noop sink).

The bench floor histogram is flat — 456 of 551 gates sit in the
0.5-1.5 s band — so the dominant optimization lever is the per-gate
baseline, not the few slow gates. This tool answers WHERE that
baseline goes for a sample of gates (guide section 1: measure first).

Usage: python tools/profile_gates.py [sf_dir] [gate ...]
  With no gates: profiles every registered gate once (construction +
  plan only — cheap) and prints the totals, then execution timings for
  the N slowest.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_tool_setup_spark.operators.blockrank import release_pins
from python_tool_setup_spark.queries import all_queries
from python_tool_setup_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    only = args[1:]
    spark = get_spark("profile-gates")
    queries = all_queries()
    names = only or sorted(queries)

    # warm
    queries["q01_pricing_summary"].spark_fn(spark, sf_dir).limit(1).write.format(
        "noop"
    ).mode("overwrite").save()
    release_pins()
    spark.catalog.clearCache()

    rows = []
    for name in names:
        q = queries[name]
        t0 = time.time()
        try:
            df = q.spark_fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: construct FAILED {exc}")
            continue
        t_build = time.time() - t0
        # trigger full analysis + optimization + physical planning
        # without executing
        t0 = time.time()
        _ = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        t_plan = time.time() - t0
        t_execs = []
        if only:
            for _ in range(3):
                t0 = time.time()
                df2 = q.spark_fn(spark, sf_dir)
                df2.write.format("noop").mode("overwrite").save()
                t_execs.append(round(time.time() - t0, 3))
                release_pins()
                spark.catalog.clearCache()
        rows.append(
            {
                "gate": name,
                "build_s": round(t_build, 3),
                "plan_s": round(t_plan, 3),
                "exec_s": t_execs,
            }
        )
        release_pins()
        spark.catalog.clearCache()

    rows.sort(key=lambda r: -(r["build_s"] + r["plan_s"]))
    for r in rows[: 40 if not only else len(rows)]:
        print(json.dumps(r))
    tot_b = sum(r["build_s"] for r in rows)
    tot_p = sum(r["plan_s"] for r in rows)
    print(
        json.dumps(
            {
                "n": len(rows),
                "total_build_s": round(tot_b, 1),
                "total_plan_s": round(tot_p, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
