"""Property/invariant tests for round-5 gates (beyond the DuckDB
oracle hash-match): each gate's defining mathematical identity is
checked on the sf0.001 fixture."""

from __future__ import annotations

import os

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_ks_two_sample_bounds(spark):
    from python_tool_setup_spark.queries.batch71 import q346_ks_two_sample

    r = q346_ks_two_sample(spark, SF_DIR).collect()[0]
    # D in [0, 1]; numerator bounded by n1*n2; micro consistent
    assert 0 <= r["ks_micro"] <= 1_000_000
    assert 0 <= r["d_num"] <= r["n1"] * r["n2"]
    assert r["ks_micro"] == round(r["d_num"] / (r["n1"] * r["n2"]) * 1e6)


def test_js_divergence_bounded_by_ln2(spark):
    from python_tool_setup_spark.queries.batch71 import q347_js_divergence

    r = q347_js_divergence(spark, SF_DIR).collect()[0]
    # JSD in [0, ln 2] (nats); quantization tolerance 1 unit/bucket
    assert -r["n_buckets"] <= r["jsd_nano"] <= 693_147_181 + r["n_buckets"]


def test_padding_waste_accounting(spark):
    from python_tool_setup_spark.queries.batch72 import q348_padding_waste

    rows = q348_padding_waste(spark, SF_DIR).collect()
    for r in rows:
        assert r["padded_tokens"] == r["real_tokens"] + r["pad_waste"]
        assert 0 < r["utilization_micro"] <= 1_000_000
    # buckets strictly increasing powers of two
    bs = [r["bucket"] for r in rows]
    assert bs == sorted(bs) and all(b & (b - 1) == 0 for b in bs)


def test_effective_diversity_hill_bounds(spark):
    from python_tool_setup_spark.queries.batch72 import (
        q349_effective_diversity,
    )

    r = q349_effective_diversity(spark, SF_DIR).collect()[0]
    # 1 <= exp(H) <= n_sources
    assert 999_000 <= r["effective_sources_micro"]
    assert r["effective_sources_micro"] <= r["n_sources"] * 1_000_000 + 1000


def test_bloom_semi_join_no_false_negatives(spark):
    from python_tool_setup_spark.queries.batch73 import q350_bloom_semi_join

    r = q350_bloom_semi_join(spark, SF_DIR).collect()[0]
    # every true key passes the filter; fp count consistent
    assert r["n_candidates"] >= r["n_true"]
    assert r["n_false_pos"] == r["n_candidates"] - r["n_true"]
    assert r["n_bits_set"] <= 8192


def test_cramers_v_bounds(spark):
    from python_tool_setup_spark.queries.batch73 import q351_cramers_v

    r = q351_cramers_v(spark, SF_DIR).collect()[0]
    assert 0 <= r["v_micro"] <= 1_000_000
    assert r["dof"] == (r["n_rows"] - 1) * (r["n_cols"] - 1)
