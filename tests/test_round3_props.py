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


def test_mixture_schedule_positions_bijective(spark):
    """q252 invariant: schedule positions are unique, and the covered
    prefix [0, 3*min(blocks)) has no gaps — every block is P P S."""
    from pyspark.sql import Window

    rows = [(i, "en" if i % 3 != 0 else "de") for i in range(60)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    from pyspark.sql import functions as F

    lp = d.agg(F.min("lang").alias("l"))
    tagged = d.crossJoin(F.broadcast(lp)).select(
        "doc_id", (F.col("lang") == F.col("l")).alias("is_primary")
    )
    ranked = tagged.withColumn(
        "rk", F.row_number().over(Window.partitionBy("is_primary").orderBy("doc_id"))
    )
    sched = ranked.select(
        F.when(
            F.col("is_primary"),
            ((F.col("rk") - 1) / 2).cast("long") * 3 + (F.col("rk") - 1) % 2,
        )
        .otherwise((F.col("rk") - 1) * 3 + 2)
        .cast("bigint")
        .alias("pos"),
        "is_primary",
    )
    got = sorted((r["pos"], r["is_primary"]) for r in sched.collect())
    positions = [p for p, _ in got]
    assert len(positions) == len(set(positions)), "positions collide"
    n_primary = sum(1 for _, p in got if p)
    n_secondary = len(got) - n_primary
    covered = 3 * min(n_primary // 2, n_secondary)
    prefix = [t for t in got if t[0] < covered]
    assert [p for p, _ in prefix] == list(range(covered)), "gap in prefix"
    for p, is_primary in prefix:
        assert is_primary == (p % 3 != 2), f"slot {p} wrong source"


def test_resize_nearest_non_divisible_height(spark, tmp_path):
    """ceil semantics: a 16x5 image downsampled 2x keeps 3 rows, and
    the resized bytes equal the even-index stride of the original."""
    import hashlib

    from python_tool_setup_spark.llm.multimodal import read_media, resize_nearest
    from python_tool_setup_spark.llm.png import encode_png

    w, h = 16, 5
    pixels = bytes(range(w * h))
    p = tmp_path / "img.png"
    p.write_bytes(encode_png(w, h, pixels, channels=1))
    out = resize_nearest(
        read_media(spark, str(tmp_path), glob="*.png"), factor=2
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["out_width"], row["out_height"]) == (8, 3)
    expected = bytes(
        pixels[y * w + x] for y in range(0, h, 2) for x in range(0, w, 2)
    )
    assert row["resized_sha256"] == hashlib.sha256(expected).hexdigest()
