"""Heavy-hitter detection with bounded state: per-partition
Misra-Gries summaries, merged, then confirmed with one exact pass.

Why not just groupBy().count()? At 100 TB a full count shuffles every
distinct key (billions of group states); heavy-hitter queries only
need the keys above a frequency floor. The sketch pass keeps O(1/f)
state per partition and ships O(partitions / f) candidate keys total —
independent of data volume — and the exact pass is a broadcast
semi-join + aggregation over just those candidates.

Guarantee (no false negatives): Misra-Gries with capacity c
underestimates any key's partition count by at most n_p / (c + 1).
With c >= 2/f, a key with global count >= f * n must exceed f * n_p on
at least one partition (pigeonhole) and survives that partition's
summary. The exact confirm pass then removes all false positives, so
the final output is EXACTLY ``SELECT key, count(*) ... HAVING
count(*) >= ceil(f * n)`` — the sketch only changes the plan shape,
never the answer. The summary merge (sum counters, then subtract the
(c+1)-th largest and drop non-positives) is the mergeable-summaries
construction of Agarwal et al., "Mergeable Summaries" (PODS 2012).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_shrink(counts: "pd.Series", capacity: int) -> "pd.Series":
    """Mergeable-summaries shrink: keep the top ``capacity`` entries by
    subtracting the (capacity+1)-th largest count from everything."""
    if len(counts) <= capacity:
        return counts
    threshold = counts.nlargest(capacity + 1).iloc[-1]
    out = counts - threshold
    return out[out > 0]


def misra_gries_candidates(
    df: DataFrame, key_col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries → one small DataFrame of
    candidate keys (string-typed). Arrow-batched: each batch is folded
    in with a vectorized value_counts + shrink, not per-row Python."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = pd.Series(dtype="int64")
        for pdf in batches:
            batch = pdf["key"].value_counts()
            counts = counts.add(batch, fill_value=0).astype("int64")
            counts = _mg_shrink(counts, capacity)
        yield pd.DataFrame({"key": counts.index.astype(str)})

    keyed = df.select(F.col(key_col).cast("string").alias("key"))
    return keyed.mapInPandas(summarize, "key string")


def heavy_hitters(
    df: DataFrame, key_col: str, min_frac: float
) -> DataFrame:
    """All keys occurring in >= ``min_frac`` of rows, with their EXACT
    counts. Sketch candidates (superset, bounded state) → broadcast
    semi-join → exact count over candidates only."""
    capacity = max(1, math.ceil(2.0 / min_frac))
    cands = misra_gries_candidates(df, key_col, capacity).distinct()
    total = df.count()
    min_count = math.ceil(min_frac * total)
    confirmed = (
        df.join(
            F.broadcast(cands),
            on=F.col(key_col).cast("string") == F.col("key"),
            how="left_semi",
        )
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    return confirmed
