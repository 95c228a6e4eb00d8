"""Bloom-filter semi-join pruning: filter a huge fact table against a
small/medium key set WITHOUT shuffling the fact side.

The pattern (what Spark's own runtime row-group filters do inside AQE,
exposed here as an explicit, composable operator — parity with the
reference's "filter early" guidance, reference framework.py's staged
ingest): build a tiny bitmask from the build side's join keys, embed it
as a literal in a scan-stage predicate on the probe side, then finish
with the exact join. The bloom pass has NO false negatives, so
``bloom_semi_join`` is exactly ``probe ⋉ build`` — the bitmask only
prunes rows (and, after predicate pushdown, whole row groups) before
the shuffle.

Scale notes:
- build: one partial-aggregated groupBy over <= num_bits/64 word slots
  (default 128 rows) — the collect is bounded by the mask size, never
  by data volume.
- probe: pure JVM expressions (md5 → conv → getbit) evaluated inside
  the scan's WholeStageCodegen; zero extra shuffle, zero Python.
- sizing: false-positive rate ~ (1 - e^{-kn/m})^k; with the default
  m=8192 bits / k=3 it stays < 5% up to n≈1000 distinct keys. Callers
  with bigger build sides pass a bigger ``num_bits`` (the mask is
  m/8 bytes of literal — 1 MiB mask ≈ 8M bits, still broadcast-cheap).

Uses the engine-independent md5 hash (llm/dedup.py) so oracles can
reproduce the pruning decision if needed; the gate oracle only needs
the exact-join result, since bloom-then-exact ≡ exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_tool_setup_spark.llm.dedup import md5_hash32


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k independent bit positions for a key, via seeded md5 hashes."""
    s = key.cast("string")
    return [
        F.pmod(md5_hash32(s, seed=i + 1), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_bitmask(
    build: DataFrame,
    key_col: str,
    num_bits: int = 8192,
    num_hashes: int = 3,
) -> list[int]:
    """Aggregate the build side's keys into a bitmask of
    ``num_bits / 64`` longs. One narrow aggregation; the driver only
    ever sees <= num_bits/64 rows regardless of build-side size."""
    num_words = (num_bits + 63) // 64
    pos = build.select(
        F.explode(
            F.array(*_positions(F.col(key_col), num_bits, num_hashes))
        ).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias(
                "m"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
        .collect()
    )
    mask = [0] * num_words
    for row in words:
        mask[row["w"]] = row["mask"]
    return mask


def bloom_prefilter(
    probe: DataFrame,
    key_col: str,
    mask: list[int],
    num_bits: int = 8192,
    num_hashes: int = 3,
) -> DataFrame:
    """Keep only probe rows whose key *may* be in the build set: every
    one of the k hashed bits is set in the literal mask. Pure scan-side
    expression — survives into WholeStageCodegen, no join, no shuffle."""
    arr = F.array(*[F.lit(int(w)).cast("bigint") for w in mask])
    cond = F.lit(True)
    for p in _positions(F.col(key_col), num_bits, num_hashes):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        cond = cond & (F.getbit(word, F.pmod(p, F.lit(64))) == 1)
    return probe.filter(cond)


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    num_bits: int = 8192,
    num_hashes: int = 3,
) -> DataFrame:
    """Exactly ``probe ⋉ build`` (LEFT SEMI), with a bloom prefilter so
    only candidate rows reach the exact join's shuffle/broadcast."""
    mask = bloom_bitmask(build, build_key, num_bits, num_hashes)
    pre = bloom_prefilter(probe, probe_key, mask, num_bits, num_hashes)
    return pre.join(
        build.select(F.col(build_key).alias(probe_key)).distinct(),
        on=probe_key,
        how="left_semi",
    )
