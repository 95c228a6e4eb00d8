"""Unit tests for corpus-cleaning operators (llm/cleaning.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_tool_setup_spark.llm.cleaning import (
    chunk_documents,
    contamination_report,
    redact_pii,
    repetition_score,
)


def test_contamination_detects_verbatim_only(spark):
    train = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "alpha beta gamma")],
        ["doc_id", "text"],
    )
    test = spark.createDataFrame(
        [(100, "alpha beta gamma"), (101, "delta epsilon zeta")],
        ["tid", "text"],
    )
    got = {
        r["test_id"]: (r["train_matches"], r["n_matches"])
        for r in contamination_report(train, test, "doc_id", "tid").collect()
    }
    # verbatim dup matches BOTH identical train docs; near-miss matches none
    assert got == {100: ([1, 3], 2)}


def test_redact_pii_all_kinds(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org call 555-123-4567 ssn 123-45-6789")],
        ["id", "text"],
    )
    out = redact_pii(df).first()["text"]
    assert out == (
        "mail [REDACTED_EMAIL] call [REDACTED_PHONE] ssn [REDACTED_SSN]"
    )


def test_chunk_documents_overlap_and_reconstruction(spark):
    words = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame([(1, words), (2, "short doc")], ["id", "text"])
    chunks = chunk_documents(df, "id", window=64, stride=48)
    rows = sorted(
        ((r["id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
         for r in chunks.collect())
    )
    doc1 = [r for r in rows if r[0] == 1]
    # 150 tokens, stride 48 -> starts 0,48,96,144 -> 4 chunks
    assert [r[1] for r in doc1] == [0, 1, 2, 3]
    assert doc1[0][3] == 64 and doc1[-1][3] == 150 - 144
    # consecutive chunks overlap by window - stride = 16 tokens
    a, b = doc1[0][2].split(), doc1[1][2].split()
    assert a[48:] == b[:16]
    # stride-prefixes + the final chunk reconstruct the document exactly
    rebuilt = [t for r in doc1[:-1] for t in r[2].split()[:48]] + doc1[-1][2].split()
    assert rebuilt == words.split()
    short = [r for r in rows if r[0] == 2]
    assert len(short) == 1 and short[0][2] == "short doc" and short[0][3] == 2


def test_repetition_score_flags_boilerplate(spark):
    df = spark.createDataFrame(
        [
            (1, "buy now " * 50),             # one phrase repeated
            (2, " ".join(f"u{i}" for i in range(100))),  # all distinct
        ],
        ["id", "text"],
    )
    got = {r["id"]: r["max_ngram_ratio"] for r in
           repetition_score(df, "id").collect()}
    assert got[1] > 0.45 and got[2] < 0.02


def test_strip_markdown_forms(spark):
    from pyspark.sql import functions as F

    from python_tool_setup_spark.llm.cleaning import strip_markdown

    cases = [
        ("# Header\nbody", "Header\nbody"),
        ("## Deep header line", "Deep header line"),
        ("a **bold** b", "a bold b"),
        ("a *it* and ***strong*** b", "a it and strong b"),
        ("see [anchor](http://x/y) here", "see anchor here"),
        ("img ![alt text](http://x/i.png) end", "img alt text end"),
        ("code `x = 1` end", "code x = 1 end"),
        ("plain text stays", "plain text stays"),
        # image form must win over link form (the ! prefix)
        ("![a](u) [b](v)", "a b"),
    ]
    df = spark.createDataFrame(cases, "raw string, expected string")
    out = df.select("expected", strip_markdown("raw").alias("got")).collect()
    for r in out:
        assert r["got"] == r["expected"], f"{r['got']!r} != {r['expected']!r}"
