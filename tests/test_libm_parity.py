"""Constructive evidence for the documented transcendental "libm
floor" (the residual class PLANS.md accepts for ln/log10/exp/sqrt
kernels: both engines receive bit-identical exact-integer inputs, but
their math libraries — DuckDB's C libm vs the JVM's — may differ in
the last ulp).

Measured over the FULL 1..1e6 integer domain (round-8 continuation
probe): LN differs on ~0.93% of inputs, LOG10 on ~0.28%, EXP(1/v) on
4 inputs, SQRT on 0 (IEEE-exact, always identical) — and NOT ONE of
those 1-ulp differences flips the engine convention's nano (1e9)
quantization: a flip needs ln(v)*1e9 within ~2e-6 of a half-integer
AND a libm disagreement at that exact input (expected rate ~3e-8 per
input; the repo's ln-consuming gates draw at most ~1e5 distinct
inputs per dataset).

This module pins a 1..100k subset of that probe so a DuckDB/JVM libm
change that widens the divergence (or starts flipping quantizations)
breaks loudly rather than surfacing as an unexplained sweep mismatch.
"""

from __future__ import annotations

import duckdb
import numpy as np

N = 100_000


def _duck(expr: str) -> np.ndarray:
    con = duckdb.connect()
    out = con.execute(
        f"SELECT {expr} AS x FROM (SELECT UNNEST(RANGE(1, {N + 1})) v)"
        " ORDER BY v"
    ).fetchnumpy()["x"]
    con.close()
    return out


def _spark(spark, expr: str) -> np.ndarray:
    rows = spark.sql(
        f"SELECT {expr} AS x FROM RANGE(1, {N + 1}) ORDER BY id"
    ).toPandas()
    return rows["x"].to_numpy()


def test_sqrt_is_bit_identical(spark):
    d = _duck("SQRT(CAST(v AS DOUBLE))")
    s = _spark(spark, "SQRT(CAST(id AS DOUBLE))")
    assert int((d != s).sum()) == 0


def test_ln_log10_diffs_never_flip_nano_quantization(spark):
    for dexpr, sexpr in (
        ("LN(CAST(v AS DOUBLE))", "LN(CAST(id AS DOUBLE))"),
        ("LOG10(CAST(v AS DOUBLE))", "LOG10(CAST(id AS DOUBLE))"),
    ):
        d = _duck(dexpr)
        s = _spark(spark, sexpr)
        neq = np.nonzero(d != s)[0]
        # the libm floor exists (diffs are expected, ~1% for LN) ...
        assert len(neq) < N * 0.02, f"{dexpr}: libm divergence widened"
        # ... but none of them may flip the nano-quantized convention
        flips = [
            int(i)
            for i in neq
            if round(float(d[i]) * 1e9) != round(float(s[i]) * 1e9)
        ]
        assert flips == [], f"{dexpr}: nano-round flips at ids {flips[:5]}"


def test_exp_reciprocal_diffs_never_flip_nano_quantization(spark):
    d = _duck("EXP(1.0 / CAST(v AS DOUBLE))")
    s = _spark(spark, "EXP(1.0 / CAST(id AS DOUBLE))")
    neq = np.nonzero(d != s)[0]
    assert len(neq) < 50, "EXP divergence widened"
    flips = [
        int(i)
        for i in neq
        if round(float(d[i]) * 1e9) != round(float(s[i]) * 1e9)
    ]
    assert flips == [], f"EXP nano flips at ids {flips[:5]}"
