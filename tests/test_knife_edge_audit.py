"""Analytic adjudication of the ROUND(SUM(money)) census + the
ROUND-tie mechanism pin.

Round 7's multi-seed sweeps adjudicated knife edges EMPIRICALLY (4
catches on 12 datasets); tools/knife_edge_audit.py replaces the random
detector with a constructive PROOF for the remaining raw-sum census:
every group's true sum lies on the column's verified decimal lattice,
and the worst-case any-order FP error is bounded below the distance to
the nearest rounding midpoint. margin > 1 means NO dataset the driver
can supply and NO summation order can flip the final digit; the policy
thresholds add headroom (>= 10 at sf0.01, the driver's comparison SF;
>= 2 at sf0.1, the judges' cross-check SF). A failing margin or an
unaligned column = the data model changed; the site takes the standard
integer-cents recipe (q212/q208), like the 28 l_extendedprice /
o_totalprice sites converted in round 8 when this audit first ran.
"""

from __future__ import annotations

import os

import pytest

from python_tool_setup_spark.queries import all_queries

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from knife_edge_audit import audit, census, lattice_distance, resolve

SF001 = os.environ.get("SPARK_GRAFT_SF001", "/root/testdata/sf0.01")
SF01 = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")


@pytest.fixture(scope="module")
def oracles():
    return {n: q.oracle for n, q in all_queries().items() if q.oracle}


def test_every_census_site_resolves(oracles):
    """Every ROUND(SUM(...)) final must resolve to a verified
    decimal-aligned column: a new gate with an unresolvable summand
    fails here until it's either added to _OVERRIDES (with an
    alignment proof) or converted to integer cents."""
    for site in census(oracles):
        resolve(site)  # raises with instructions on failure


def test_margins_at_driver_sf(oracles):
    if not os.path.isdir(SF001):
        pytest.skip("driver fixtures not present")
    rows = audit(SF001, oracles)
    assert rows, "census unexpectedly empty"
    bad = [r for r in rows if r["margin"] < 10]
    assert not bad, (
        "sites within 10x of a rounding knife edge at the driver's "
        f"comparison SF — convert to integer cents: "
        f"{[(r['gate'], r['column'], round(r['margin'], 2)) for r in bad]}"
    )


def test_margins_at_bench_sf(oracles):
    if not os.path.isdir(SF01):
        pytest.skip("sf0.1 fixtures not present")
    rows = audit(SF01, oracles)
    bad = [r for r in rows if r["margin"] < 2]
    assert not bad, (
        "sites without a worst-case-proof margin at sf0.1 — convert: "
        f"{[(r['gate'], r['column'], round(r['margin'], 2)) for r in bad]}"
    )


def test_lattice_distance_closed_form():
    # 2-dec money rounded at its own scale: half a cent away.
    assert lattice_distance(0.01, 1, 2) == pytest.approx(0.005)
    # 2-dec money at scale 3: half a mill.
    assert lattice_distance(0.01, 1, 3) == pytest.approx(0.0005)
    # 2-dec money at scale 1 REACHES ties exactly (X.X5 is on the
    # lattice): distance zero -> must convert.
    assert lattice_distance(0.01, 1, 1) == 0.0
    # integer quantities at scales 1 and 2.
    assert lattice_distance(1.0, 1, 1) == pytest.approx(0.05)
    assert lattice_distance(1.0, 1, 2) == pytest.approx(0.005)
    # doubled 2-dec values (exact doubling) at scale 3.
    assert lattice_distance(0.01, 2, 3) == pytest.approx(0.0005)
    # unaligned column: no lattice, no proof.
    assert lattice_distance(0.0, 1, 2) == 0.0


def test_round_tie_mechanism_pin(spark):
    """WHY d=0 sites must convert: on exact 3-decimal midpoints the
    engines' ROUND(x, 2) genuinely disagree (Spark rounds the binary
    expansion of the double; DuckDB rounds the FP-scaled value) —
    measured at ~2.6% of midpoints — while the repo's scale-first
    recipe ROUND(100 * x) / 100 agrees on every one (the scaled tie
    is a dyadic-exact .5 that both engines round up)."""
    import duckdb
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(8)
    xs = [float(k) / 100 + 0.005 for k in rng.integers(1e5, 5e7, 1500)]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, x DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(xs))
    )
    duck = con.execute(
        "SELECT ROUND(x, 2), ROUND(100 * x) / 100 FROM t ORDER BY i"
    ).fetchall()
    con.close()

    sdf = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "i int, x double"
    ).orderBy("i")
    sp = sdf.select(
        F.round("x", 2).alias("r"),
        (F.round(100 * F.col("x")) / 100).alias("sf"),
    ).collect()

    raw_disagree = sum(1 for d, s in zip(duck, sp) if d[0] != s["r"])
    recipe_disagree = sum(1 for d, s in zip(duck, sp) if d[1] != s["sf"])
    assert raw_disagree > 0, (
        "engines now agree on raw ROUND of decimal midpoints — the "
        "d=0 conversion policy can be revisited"
    )
    assert recipe_disagree == 0, "scale-first recipe must always agree"
