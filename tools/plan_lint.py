"""Mechanical physical-plan lint over the FULL query registry.

Builds every registered gate's DataFrame at a small SF and audits the
(initial, pre-AQE) executed-plan tree for joins that would not survive
a 100x scale-up:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — an all-pairs
  compare is only acceptable when one side is PROVABLY bounded by a
  constant independent of data size. The lint walks each join node's
  subtree and accepts it when the broadcast/either side derives from:
    * a grouping-keyless aggregate ``HashAggregate(keys=[]`` /
      ``SortAggregate(key=[]`` — exactly one row (the idiomatic Spark
      "attach a global scalar" cross-join; O(n), not O(n*m));
    * a ``(Global|Local)Limit`` / ``TakeOrderedAndProject`` — bounded
      by the literal k;
    * a ``LocalTableScan`` / ``Scan OneRowRelation`` — driver-side
      literal constants (query batches, calendar dims);
    * a ``(Reused)Subquery`` — scalar subquery result.
  Anything else (a FileScan reaching the broadcast side with no
  bounding node above it) is a lint FAILURE unless allowlisted with a
  reason.
- ``BatchEvalPython`` (row-at-a-time Python UDF) — forbidden; the
  Arrow paths (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas /
  BatchEvalPythonUDTF*) are exempt. ``BatchEvalPythonUDTF`` is the
  API-surface Python UDTF node: Spark's default UDTF evaluation is
  batch-pickled (the Arrow variant is conf-gated and changes type
  coercion); the three UDTF gates are allowlisted with that reason.

Every hit must either be fixed or carry an allowlist entry WITH A
REASON below; the companion test (tests/test_plan_lint.py) pins the
mechanism, so new gates are auto-audited by re-running this tool.

Usage: python tools/plan_lint.py [sf_dir] [gate ...]
Writes a JSON report to /tmp/plan_lint.json and prints a summary.
"""

from __future__ import annotations

import json
import re
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (pattern, gate) -> reason. A gate listed here may contain the node;
# every OTHER occurrence is a lint failure.
ALLOW: dict[tuple[str, str], str] = {
    ("BatchEvalPythonUDTF", "q57_udtf"):
        "Python UDTF API-surface gate; Spark's default UDTF eval node "
        "(Arrow variant is conf-gated and alters type coercion)",
    ("BatchEvalPythonUDTF", "q202_udtf_analyze"):
        "UDTF analyze() API-surface gate; same default-eval node",
    ("BatchEvalPythonUDTF", "q248_udtf_table_argument"):
        "UDTF TABLE-argument API-surface gate; same default-eval node",
}

_QUERY_BATCH = (
    "broadcast QUERY BATCH bounded by a pushed key-range filter "
    "(vec_id/doc_id < k, k<=20 by construction) x corpus — O(k*n); "
    "the corpus-scale paths are the LSH/IVF gates (q36/q41/q42)"
)
_CALENDAR = (
    "build side keyed on a CALENDAR domain (days/months of the time "
    "span, not data volume) — a date-dim broadcast; output is "
    "n_periods x n_offsets"
)
for _gate in ("q37_cosine_topk", "q102_filtered_search",
              "q104_hybrid_retrieval", "q154_ann_recall_at_10",
              "q185_ivf_incremental_update", "q260_knn_label_consistency",
              "q262_hard_negative_mining", "q42_ivf_ann"):
    ALLOW[("BroadcastNestedLoopJoin", _gate)] = _QUERY_BATCH
for _gate in ("q274_rolling_distinct_users", "q387_lead_lag_correlation",
              "q441_watermark_sweep_advisor", "q454_ljung_box_whiteness",
              "q479_ewma_control_chart", "q498_sliding_wau",
              "q519_seasonal_decomposition", "q527_rolling_correlation",
              "q534_runs_test"):
    ALLOW[("BroadcastNestedLoopJoin", _gate)] = _CALENDAR
ALLOW.update({
    ("BroadcastNestedLoopJoin", "q111_bloom_join"):
        "cross join against the 1-row aggregated bloom bitmask (cached "
        "build relation); condition-only membership probe",
    ("BroadcastNestedLoopJoin", "q324_ratio_metric_delta"):
        "per-arm scalar moment aggregates (2 experiment arms) cross join",
    ("BroadcastNestedLoopJoin", "q355_quantile_normalization"):
        "rank-range join against the global VALUE HISTOGRAM (distinct "
        "n_chars values + prefix bounds) — bounded by the value domain, "
        "orders smaller than row count",
    ("BroadcastNestedLoopJoin", "q446_tail_treatment_moments"):
        "build side grouped on the global row count n (single group -> "
        "1 row of percentile bounds)",
    ("BroadcastNestedLoopJoin", "q478_zone_map_clustering_depth"):
        "zone-map block overlap join: both sides are <=64 block "
        "summaries by construction (FLOOR(bef*64/n))",
    ("BroadcastNestedLoopJoin", "q507_group_sequential_obf"):
        "build side is the literal look-boundary grid (<=5 interim "
        "analysis dates)",
    ("BroadcastNestedLoopJoin", "q516_rank_biased_overlap"):
        "build side is the top-50 rank-filtered overlap list (r<=50)",
    ("BroadcastNestedLoopJoin", "q522_kendall_tau_b"):
        "both sides keyed on the (discount, quantity) VALUE LATTICE — "
        "TPC-H fixed domains (11 x 50), <=550 rows per side at any SF",
    ("CartesianProduct", "q424_simpson_reversal_detector"):
        "all-pairs over per-priority aggregates — o_orderpriority has 5 "
        "values, <=10 ordered pairs at any SF",
})

# Nodes that bound a subtree's cardinality by a data-size-independent
# constant: global aggregates (1 row), limits (k rows), driver-side
# literal relations, scalar subqueries.
_BOUNDED = re.compile(
    r"HashAggregate\(keys=\[\]"
    r"|SortAggregate\(key=\[\]"
    r"|ObjectHashAggregate\(keys=\[\]"
    r"|HashAggregate\(keys=\[\d"  # literal constant grouping key -> 1 row
    r"|GlobalLimit|LocalLimit|TakeOrderedAndProject"
    r"|LocalTableScan|Scan OneRowRelation"
    # Driver-materialized relation (spark.createDataFrame over a python
    # list / pandas frame — the only source of ExistingRDD in this
    # package; there are no RDD hot paths): inherently bounded by
    # driver memory at build time, e.g. IVF centroid tables, literal
    # offset spines, look-boundary grids.
    r"|Scan ExistingRDD"
    r"|ReusedSubquery|Subquery "
)
_SCAN = re.compile(r"FileScan|BatchScan")
_RANGE = re.compile(r"Range \((-?\d+), (-?\d+)")
_RANGE_BOUND = 100_000  # a literal Range below this is a constant spine


def _indent(line: str) -> int:
    """Tree depth of a plan line (count of leading tree-drawing chars).

    The WholeStageCodegen prefix ``*(N) `` is stripped FIRST: its digit
    count varies with the codegen stage id, so ``*(3) `` vs ``*(12) ``
    at the same tree depth would otherwise measure one char apart and
    skew subtree/branch splitting (ADVICE r8)."""
    line = re.sub(r"^([\s:+\-]*)\*\(\d+\) ", r"\1", line)
    m = re.match(r"[\s:+\-*()0-9]*", line)
    return len(m.group(0)) if m else 0


def _subtree(lines: list[str], i: int) -> list[str]:
    """Lines of the subtree rooted at lines[i] (by indentation)."""
    d = _indent(lines[i])
    out = [lines[i]]
    for ln in lines[i + 1:]:
        if not ln.strip() or _indent(ln) <= d:
            break
        out.append(ln)
    return out


def _join_is_bounded(lines: list[str], i: int) -> bool:
    """True if the join at lines[i] has a provably bounded side.

    Walk the join's subtree; a side is bounded when a _BOUNDED node
    appears above (shallower than or at the first occurrence of) any
    scan in that side. We approximate sides by scanning the subtree in
    order: for each branch start (':-' = left, last '+-' = right), we
    check whether a bounding node precedes the first unbounded scan.
    """
    # blockrank's inter-block prefix join: both sides are per-block
    # aggregates over the reserved ``_blk`` column, whose domain is
    # capped at ``n_blocks`` (default 32) by construction
    # (operators/blockrank.py:421,455-464) — <=32 rows per side at any
    # data size.
    if "_blk" in lines[i]:
        return True
    sub = _subtree(lines, i)[1:]
    if not sub:
        return False
    # Split into the two child branches by indentation of branch roots.
    roots = [j for j, ln in enumerate(sub)
             if _indent(ln) == min(_indent(x) for x in sub if x.strip())]
    if len(roots) < 2:
        branches = [sub]
    else:
        branches = [sub[roots[0]:roots[1]], sub[roots[1]:]]
    def _line_kind(ln: str) -> str | None:
        if _BOUNDED.search(ln):
            return "bounded"
        m = _RANGE.search(ln)
        if m:
            lo, hi = int(m.group(1)), int(m.group(2))
            return "bounded" if hi - lo <= _RANGE_BOUND else "scan"
        if _SCAN.search(ln):
            return "scan"
        return None

    for br in branches:
        kind = next((k for ln in br if (k := _line_kind(ln))), None)
        if kind == "bounded":
            return True  # this side's cardinality is a constant
    return False


def audit_plan(plan: str) -> dict[str, int]:
    """Return {pattern: count} of UNBOUNDED occurrences in a plan string."""
    lines = plan.splitlines()
    hits: dict[str, int] = {}
    for i, ln in enumerate(lines):
        for pat in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            if pat in ln and not _join_is_bounded(lines, i):
                hits[pat] = hits.get(pat, 0) + 1
        if "BatchEvalPythonUDTF" in ln:
            hits["BatchEvalPythonUDTF"] = hits.get("BatchEvalPythonUDTF", 0) + 1
        elif "BatchEvalPython" in ln:
            hits["BatchEvalPython"] = hits.get("BatchEvalPython", 0) + 1
    return hits


def lint(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    from python_tool_setup_spark.queries import all_queries
    from python_tool_setup_spark.session import get_spark

    spark = get_spark("plan-lint", master="local[8]")
    qs = all_queries()
    names = only or sorted(qs)
    report: dict[str, dict] = {}
    fails: list[str] = []
    for name in names:
        row: dict = {}
        try:
            df = qs[name].spark_fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            for pat, n in audit_plan(plan).items():
                row[pat] = n
                if (pat, name) in ALLOW:
                    row[f"{pat}_allowed"] = ALLOW[(pat, name)]
                else:
                    fails.append(f"{name}: {pat} x{n}")
        except Exception as exc:  # noqa: BLE001
            row["error"] = f"{type(exc).__name__}: {exc}"
        if row:
            report[name] = row
        spark.catalog.clearCache()
    return report, fails


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    report, fails = lint(sf_dir, only)
    with open("/tmp/plan_lint.json", "w") as fh:
        json.dump({"report": report, "fails": fails}, fh, indent=1)
    print(json.dumps(report, indent=1))
    print(f"\n{len(report)} gates with flagged nodes; {len(fails)} UNEXPLAINED")
    for f in fails:
        print("FAIL", f)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
