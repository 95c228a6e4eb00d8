"""Print physical-plan evidence (pushdown / broadcast / shuffle counts)
for the headline queries. Usage: python tools/explain_audit.py [sf_dir]."""

from __future__ import annotations

import re
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_tool_setup_spark.queries import all_queries
from python_tool_setup_spark.session import get_spark

CHECKS = [
    ("q01_pricing_summary", ["PushedFilters", "HashAggregate"]),
    ("q03_filter_predicates", ["PushedFilters", "ReadSchema"]),
    ("q04_join_star", ["BroadcastHashJoin", "Exchange"]),
    ("q14_sort_topk", ["TakeOrderedAndProject"]),
    ("q22_asof_join", ["Exchange", "Window"]),
    ("q37_cosine_topk", ["BroadcastNestedLoopJoin"]),
    ("q68_stratified_sample", ["Exchange", "Filter"]),
    ("q69_shard_packing", ["BroadcastHashJoin", "Exchange", "Window"]),
    ("q70_tfidf_top_terms", ["BroadcastHashJoin", "HashAggregate"]),
    ("q73_change_feed", ["SortMergeJoin", "Exchange"]),
    ("q75_incremental_agg", ["HashAggregate", "Exchange"]),
    ("q86_tpch_q5ish", ["BroadcastHashJoin", "SortMergeJoin", "PushedFilters"]),
    # round-3 additions
    ("q159_higher_order_funcs", ["Project", "Exchange"]),
    ("q165_html_strip", ["Project", "Exchange"]),
    ("q166_count_min_freq", ["HashAggregate", "Exchange"]),
    ("q172_feature_hashing", ["HashAggregate", "Generate"]),
    ("q175_bpe_pair_counts", ["TakeOrderedAndProject", "HashAggregate"]),
    ("q181_shipping_priority", ["BroadcastHashJoin", "PushedFilters",
                                "TakeOrderedAndProject"]),
    ("q182_returned_item_revenue", ["BroadcastHashJoin", "PushedFilters",
                                    "TakeOrderedAndProject"]),
    ("q186_triangle_count", ["HashAggregate", "Exchange"]),
    ("q209_priority_late_ship", ["BroadcastHashJoin", "PushedFilters"]),
    ("q213_customer_distribution", ["HashAggregate", "Exchange"]),
    ("q217_large_volume_customers", ["TakeOrderedAndProject",
                                     "BroadcastHashJoin"]),
    ("q219_waiting_supplier", ["Window", "HashAggregate", "Exchange"]),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("explain-audit", master="local[8]")
    qs = all_queries()
    for name, keys in CHECKS:
        plan = qs[name].spark_fn(spark, sf_dir)._jdf.queryExecution()
        text = plan.executedPlan().toString()
        print(f"\n=== {name} ===")
        for key in keys:
            n = text.count(key)
            line = next((ln.strip() for ln in text.splitlines() if key in ln), "")
            print(f"  {key}: x{n}  {line[:120]}")
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", text)
        if pushed:
            print(f"  pushed: {pushed.group(1)[:120]}")


if __name__ == "__main__":
    main()
