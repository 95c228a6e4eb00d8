"""Property-based tests for the TPC-H remainder rewrites (batch 18/19):
the q219 waiting-supplier kernel (``last_to_ship``) vs a brute-force
correlated EXISTS / NOT-EXISTS evaluation under full three-valued
logic (NULL ship dates included), and the q213 count-of-counts kernel
(``left_join_count_histogram``) vs a direct Python count — both
testing the PRODUCTION operators the gates call, not replicas.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from python_tool_setup_spark.operators.relational import (
    last_to_ship,
    left_join_count_histogram,
)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Small key domains force the interesting collisions: multi-supplier
# orders, shipdate ties at the order max, single-supplier orders, and
# NULL ship dates (which satisfy NOT EXISTS vacuously).
lines_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),                  # orderkey
        st.integers(min_value=0, max_value=3),                  # suppkey
        st.one_of(st.none(), st.integers(min_value=0, max_value=5)),  # ship
    ),
    min_size=1,
    max_size=25,
)


def brute_force_waits(lines):
    """Literal TPC-H Q21 semantics under three-valued logic: distinct
    (order, supplier) with an l1 line such that EXISTS another-supplier
    line in the order and NOT EXISTS another-supplier line shipped
    strictly later than l1 (``d2 > NULL`` is UNKNOWN -> no such l3)."""
    by_order = defaultdict(list)
    for o, s, d in lines:
        by_order[o].append((s, d))
    waits = set()
    for o, rows in by_order.items():
        for s, d in rows:  # l1
            others = [(s2, d2) for s2, d2 in rows if s2 != s]
            later = any(
                d2 is not None and d is not None and d2 > d
                for _, d2 in others
            )
            if others and not later:
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
def test_left_join_count_histogram(spark, orders):
    """q213's kernel: pre-filtering the right side of a LEFT join is
    equivalent to the filter living in the ON clause — zero-match
    customers must still appear in bucket 0."""
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
        [(c,) for c, ok in orders if ok] or [],
        "o_custkey long",
    )
    got = {
        r["n"]: r["dist"]
        for r in left_join_count_histogram(
            cdf, odf, "c_custkey", "o_custkey"
        ).collect()
    }
    assert got == dict(expected)


points_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=4)),  # x
        st.one_of(st.none(), st.integers(min_value=0, max_value=4)),  # y
    ),
    min_size=1,
    max_size=20,
)


def _nulls_last_key(t):
    """Shared deterministic ordering for possibly-None 2-tuples."""
    return (
        t[0] is None, t[0] if t[0] is not None else 0,
        t[1] is None, t[1] if t[1] is not None else 0,
    )


def brute_force_skyline(points):
    """Literal NOT-EXISTS domination under three-valued logic: p
    survives iff no q with q.x <= p.x, q.y <= p.y, and (q.x < p.x or
    q.y < p.y) — any comparison involving NULL is UNKNOWN, so a NULL
    coordinate on either side means q does not dominate p."""
    def dominates(q, p):
        qx, qy = q
        px, py = p
        if None in (qx, qy, px, py):
            return False
        return qx <= px and qy <= py and (qx < px or qy < py)

    out = []
    for i, p in enumerate(points):
        if not any(dominates(q, p) for j, q in enumerate(points) if j != i):
            out.append(p)
    return sorted(out, key=_nulls_last_key)


@SETTINGS
@given(points=points_strategy)
def test_skyline_2d_matches_brute_force(spark, points):
    from python_tool_setup_spark.operators.relational import skyline_2d

    df = spark.createDataFrame(points, "x long, y long")
    got = sorted(
        ((r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()),
        key=_nulls_last_key,
    )
    assert got == brute_force_skyline(points)


asof_strategy = st.tuples(
    st.lists(  # left: (key, ts)
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=12,
    ),
    st.lists(  # right: (key, ts, value); ts deduped per key below
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=99),
        ),
        min_size=0,
        max_size=12,
    ),
)


@SETTINGS
@given(data=asof_strategy)
def test_asof_join_both_directions_match_brute_force(spark, data):
    from python_tool_setup_spark.operators.asof import asof_join

    left_rows, right_raw = data
    # enforce the operator's tie contract: unique right ts per key
    right_rows = list({(k, t): v for k, t, v in right_raw}.items())
    right_rows = [(k, t, v) for (k, t), v in right_rows]

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        "lid long, k long, lts long",
    )
    rdf = spark.createDataFrame(
        right_rows or [], "k long, rts long, v long"
    )

    for direction in ("backward", "forward"):
        got = {
            r["lid"]: r["v_right"]
            for r in asof_join(
                ldf, rdf, on=["k"], left_ts="lts", right_ts="rts",
                right_cols=["v"], direction=direction,
            ).collect()
        }
        expected = {}
        for i, (k, t) in enumerate(left_rows):
            cands = [
                (rt, v) for rk, rt, v in right_rows
                if rk == k
                and (rt <= t if direction == "backward" else rt >= t)
            ]
            if cands:
                pick = max(cands) if direction == "backward" else min(cands)
                expected[i] = pick[1]
            else:
                expected[i] = None
        assert got == expected, f"{direction}: {got} != {expected}"
