"""Property-based tests (hypothesis) for the round-3 operators:
triangle counting vs brute force, BPE pair counts vs a naive Python
count, and sentence segmentation vs a reference re.split."""

from __future__ import annotations

import itertools
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ),
    min_size=0,
    max_size=20,
)


@SETTINGS
@given(edges=edges_strategy)
def test_triangle_count_matches_brute_force(spark, edges):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    expected = sum(
        1
        for a, b, c in itertools.combinations(sorted({v for e in und for v in e}), 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    )
    if und:
        df = spark.createDataFrame(sorted(und), "a long, b long")
    else:
        df = spark.createDataFrame([], "a long, b long")
    e1, e2, e3 = df.alias("e1"), df.alias("e2"), df.alias("e3")
    got = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .count()
    )
    assert got == expected


texts = st.lists(
    st.text(alphabet="ab .!?", min_size=0, max_size=30), min_size=1, max_size=4
)


@SETTINGS
@given(docs=texts)
def test_sentence_segmentation_matches_re_split(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    sentences = F.filter(
        F.transform(F.split("text", "[.!?]+"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(sentences).alias("n")
        ).collect()
    }
    for i, t in enumerate(docs):
        expected = len(
            [s for s in (seg.strip() for seg in re.split(r"[.!?]+", t)) if s]
        )
        assert got[i] == expected, (t, got[i], expected)


token_lists = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=8),
    min_size=1,
    max_size=4,
)


@SETTINGS
@given(docs=token_lists)
def test_bpe_pair_counts_match_naive(spark, docs):
    expected = Counter()
    for toks in docs:
        for a, b in zip(toks, toks[1:]):
            expected[f"{a} {b}"] += 1
    df = spark.createDataFrame([(d,) for d in docs], "t array<string>")
    toks = df.filter(F.size("t") >= 2)
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.size("t") - 1),
                F.slice("t", 2, F.size("t") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("pair")
    )
    got = Counter(
        {
            r["pair"]: r["n"]
            for r in pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n")).collect()
        }
    )
    assert got == expected
