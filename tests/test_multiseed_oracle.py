"""Oracle parity on a NON-driver dataset (the knife-edge regression).

The driver's fixtures are fixed, so a ROUND(SUM(double), n) gate that
is deterministic-green on them can still flip a final digit on other
data: the engines' floating SUM orders differ (Spark partial-agg merge
vs DuckDB sequential scan), and when a group's true sum sits within an
ulp of a rounding boundary the two orders round apart. seed=7/sf0.001
deterministically reproduces the boundary that caught q212 (TPC-H Q9
profit, one cent off) in round 7 — fixed by per-row cent quantization.
This module regenerates that exact dataset and re-runs q212 plus a
sample of the other money-sum gates against the DuckDB oracle on it,
so the fix (and the class) can't silently regress.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

from python_tool_setup_spark.queries import all_queries
from python_tool_setup_spark.testing import compare_query, oracle_connection

_spec = importlib.util.spec_from_file_location(
    "make_fixtures",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "make_fixtures.py",
    ),
)
make_fixtures = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("make_fixtures", make_fixtures)
_spec.loader.exec_module(make_fixtures)

# q212 is the proven knife edge; the rest are cheap neighbors from the
# ROUND(SUM(double)) census (TPC-H money shapes over the same columns).
GATES = [
    "q212_product_profit",
    "q01_pricing_summary",
    "q181_shipping_priority",
    "q182_returned_item_revenue",
    "q210_nation_pair_volume",
    "q211_market_share",
    "q86_tpch_q5ish",
]


@pytest.fixture(scope="module")
def seed7_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("seed7"))
    make_fixtures.generate(out, sf=0.001, seed=7)
    return out


@pytest.fixture(scope="module")
def seed7_oracle(seed7_dir):
    con = oracle_connection(seed7_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", GATES)
def test_money_gate_on_knife_edge_dataset(spark, seed7_oracle, seed7_dir, name):
    q = all_queries()[name]
    mismatch = compare_query(spark, seed7_oracle, q, seed7_dir)
    assert mismatch is None, f"{name} on seed7 data: {mismatch}"


def test_q208_on_its_knife_edge_dataset(spark, tmp_path_factory):
    """seed=911/sf0.009 deterministically reproduces the decimal
    half-boundary that caught q208 (TPC-H Q2 unit cost, 4th decimal):
    ROUND(x, 4) itself resolves ...x.xxxx5 ties differently per engine
    (Spark rounds the exact binary expansion, DuckDB the FP-scaled
    value) — the third r7 multi-seed catch, fixed by scaling by 1e4
    BEFORE a scale-0 round (dyadic ties, engine-agreeing)."""
    out = str(tmp_path_factory.mktemp("seed911"))
    make_fixtures.generate(out, sf=0.009, seed=911)
    con = oracle_connection(out)
    try:
        mismatch = compare_query(
            spark, con, all_queries()["q208_mincost_supplier"], out
        )
    finally:
        con.close()
    assert mismatch is None, f"q208 on seed911 data: {mismatch}"


def test_q210_on_its_knife_edge_dataset(spark, tmp_path_factory):
    """seed=8128/sf0.013 deterministically reproduces the boundary
    that caught q210 (TPC-H Q7 bilateral volume, one cent off) — the
    fourth r7 multi-seed catch, same sum-order class, same per-row
    cent-quantization fix."""
    out = str(tmp_path_factory.mktemp("seed8128"))
    make_fixtures.generate(out, sf=0.013, seed=8128)
    con = oracle_connection(out)
    try:
        mismatch = compare_query(
            spark, con, all_queries()["q210_nation_pair_volume"], out
        )
    finally:
        con.close()
    assert mismatch is None, f"q210 on seed8128 data: {mismatch}"


def test_q64_on_its_knife_edge_dataset(spark, tmp_path_factory):
    """seed=314/sf0.008 deterministically reproduces the boundary that
    caught q64 (bucketed-join net revenue, one cent off) — the second
    r7 multi-seed catch, fixed with the same per-row cent
    quantization."""
    out = str(tmp_path_factory.mktemp("seed314"))
    make_fixtures.generate(out, sf=0.008, seed=314)
    con = oracle_connection(out)
    try:
        mismatch = compare_query(
            spark, con, all_queries()["q64_bucketed_join"], out
        )
    finally:
        con.close()
    assert mismatch is None, f"q64 on seed314 data: {mismatch}"
