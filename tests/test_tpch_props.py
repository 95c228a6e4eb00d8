"""Property-based tests for the TPC-H remainder rewrites (batch 18/19):
the q219 waiting-supplier kernel vs a brute-force correlated
EXISTS / NOT-EXISTS evaluation, and the q213 ON-clause-filter left
join vs a direct Python count — the two gates whose Spark plans are
algebraic rewrites rather than literal transcriptions of the SQL.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.relational import last_to_ship

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Small key domains force the interesting collisions: multi-supplier
# orders, shipdate ties at the order max, single-supplier orders.
lines_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # orderkey
        st.integers(min_value=0, max_value=3),   # suppkey
        st.integers(min_value=0, max_value=5),   # shipdate (ordinal)
    ),
    min_size=1,
    max_size=25,
)


def brute_force_waits(lines):
    """Literal TPC-H Q21 semantics: distinct (order, supplier) with an
    l1 line such that EXISTS another-supplier line in the order and
    NOT EXISTS another-supplier line shipped strictly later than l1."""
    by_order = defaultdict(list)
    for o, s, d in lines:
        by_order[o].append((s, d))
    waits = set()
    for o, rows in by_order.items():
        for s, d in rows:  # l1
            others = [(s2, d2) for s2, d2 in rows if s2 != s]
            if others and not any(d2 > d for _, d2 in others):
                waits.add((o, s))
    return waits


@SETTINGS
@given(lines=lines_strategy)
def test_last_to_ship_matches_brute_force(spark, lines):
    df = spark.createDataFrame(
        lines, "l_orderkey long, l_suppkey long, l_shipdate long"
    )
    got = {
        (r["l_orderkey"], r["l_suppkey"])
        for r in last_to_ship(df).collect()
    }
    assert got == brute_force_waits(lines)


orders_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # custkey
        st.booleans(),                           # passes the ON filter
    ),
    min_size=0,
    max_size=20,
)


@SETTINGS
@given(orders=orders_strategy)
def test_on_clause_left_join_count_distribution(spark, orders):
    """q213's rewrite: pre-filtering the right side of a LEFT join is
    equivalent to the filter living in the ON clause — zero-match
    customers must still appear with count 0."""
    customers = list(range(6))
    expected_counts = {c: 0 for c in customers}
    for cust, ok in orders:
        if ok:
            expected_counts[cust] += 1
    expected = defaultdict(int)
    for n in expected_counts.values():
        expected[n] += 1

    cdf = spark.createDataFrame([(c,) for c in customers], "c_custkey long")
    odf = spark.createDataFrame(
        [(i, c, ok) for i, (c, ok) in enumerate(orders)],
        "o_orderkey long, o_custkey long, ok boolean",
    )
    of = odf.filter(F.col("ok")).select("o_custkey", "o_orderkey")
    per = (
        cdf.join(of, cdf["c_custkey"] == of["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    got = {
        r["c_count"]: r["custdist"]
        for r in per.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .collect()
    }
    assert got == dict(expected)
