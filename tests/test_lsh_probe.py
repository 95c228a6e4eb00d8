"""Unit tests for the incremental MinHash-LSH probe operator."""

from __future__ import annotations

from python_tool_setup_spark.llm.dedup import minhash_lsh_probe


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "and the crowd cheers loudly under bright summer skies tonight"
)


def test_probe_finds_planted_cross_side_pairs_only(spark):
    existing = _docs(
        spark,
        [
            (1, BASE),
            (2, BASE.replace("fox", "cat")),
            (3, "completely different words about spark shuffles and parquet"),
            # two existing near-dups of each other: must NOT be paired
            (4, BASE.replace("dog", "wolf")),
        ],
    )
    new = _docs(
        spark,
        [
            (101, BASE + " extra"),  # near-dup of 1 (and close to 2/4)
            (102, "nothing in common with anything at all here zzz qqq xx"),
        ],
    )
    got = {
        (r["new_id"], r["existing_id"])
        for r in minhash_lsh_probe(existing, new, "doc_id").collect()
    }
    assert (101, 1) in got
    # only cross-side pairs: every pair is (new, existing)
    assert all(n >= 100 and e < 100 for n, e in got)
    # the novel doc matches nothing
    assert not any(n == 102 for n, _ in got)


def test_probe_empty_new_side(spark):
    existing = _docs(spark, [(1, BASE), (2, BASE)])
    new = _docs(spark, []).limit(0)
    assert minhash_lsh_probe(existing, new, "doc_id").count() == 0
