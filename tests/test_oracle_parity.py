"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from python_tool_setup_spark.queries import all_queries
from python_tool_setup_spark.testing import compare_query, oracle_connection

QUERIES = all_queries()


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = oracle_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, oracle, sf_dir, name):
    mismatch = compare_query(spark, oracle, QUERIES[name], sf_dir)
    assert mismatch is None, f"{name}: {mismatch}"


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_contract_shape():
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 26
