"""Training-data pipeline operators: deterministic sampling, token-budget
shard packing, corpus mix rebalancing, TF-IDF top terms.

These extend the reference's ingestion surface (no equivalent exists in
`/root/reference` — see SURVEY.md §2.5 provenance notes) with the
operations a 100 TB training-data pipeline runs between ingestion and
training:

- **Deterministic sampling** uses an md5 content hash, not `rand()`:
  the same row always lands in the same bucket, so samples are
  reproducible across runs, resumable after failure, and consistent
  between train/eval splits. No shuffle at all — a pure filter that
  pushes down around the scan.
- **Shard packing** assigns documents to fixed-token-budget shards via
  a TWO-LEVEL cumulative sum: per-chunk partial sums (map-side
  combine, one small shuffle) + a broadcast of chunk offsets, then a
  within-chunk window. A naive global window over each language would
  funnel the largest language through ONE task; the two-level form
  keeps every window partition bounded by `chunk_size` rows.
- **Mix weights** compute per-group resampling weights from group
  counts — a tiny aggregate, broadcastable to the row-level sampler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_MOD = 10_000


# ------------------------------------------------- deterministic hash ----
def hash_bucket(key: Column | str, modulus: int = HASH_MOD) -> Column:
    """Stable [0, modulus) bucket from md5 of the key's string form.

    Engine-independent (md5 of UTF-8 text), unlike xxhash64/crc32, so
    samples match across Spark, DuckDB, or any downstream system.
    """
    col = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % F.lit(modulus)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its hash
    bucket falls below rate*HASH_MOD for its stratum.

    `rates` is a small dict (strata cardinality ~ languages/domains),
    inlined as a literal map — evaluated per row with zero shuffle and
    zero join; the filter sits directly on the scan.
    """
    entries = [x for k, v in rates.items() for x in (F.lit(k), F.lit(float(v)))]
    rate = F.coalesce(
        F.element_at(F.create_map(*entries), F.col(strata_col)),
        F.lit(float(default_rate)),
    )
    return df.filter(hash_bucket(key_col) < rate * HASH_MOD)


# ------------------------------------------------------ shard packing ----
def pack_shards(
    df: DataFrame,
    group_col: str,
    order_col: str,
    token_col: str,
    budget: int,
    chunk_size: int = 100_000,
) -> DataFrame:
    """Assign each row a `shard_id` so consecutive rows (by `order_col`
    within `group_col`) fill fixed `budget`-token shards: shard_id =
    floor(exclusive-prefix-sum(tokens) / budget).

    Two-level prefix sum (see module docstring): chunk = order//chunk_
    size is monotonic in the order column, so global prefix sum =
    chunk-offset (cumsum of per-chunk totals, tiny) + within-chunk
    prefix sum (window bounded by chunk_size rows). Deterministic and
    identical to the single-window result, without the one-task-per-
    group bottleneck.
    """
    chunked = df.withColumn("_chunk", (F.col(order_col) / chunk_size).cast("bigint"))
    chunk_tot = chunked.groupBy(group_col, "_chunk").agg(
        F.sum(token_col).alias("_chunk_tokens")
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = chunk_tot.select(
        group_col,
        "_chunk",
        F.coalesce(F.sum("_chunk_tokens").over(w_off), F.lit(0)).alias("_offset"),
    )
    w_in = (
        Window.partitionBy(group_col, "_chunk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        chunked.join(F.broadcast(offsets), [group_col, "_chunk"])
        .withColumn(
            "_prefix",
            F.col("_offset") + F.coalesce(F.sum(token_col).over(w_in), F.lit(0)),
        )
        .withColumn("shard_id", (F.col("_prefix") / budget).cast("bigint"))
        .drop("_chunk", "_chunk_tokens", "_offset", "_prefix")
    )


# -------------------------------------------------------- mix weights ----
def mix_weights(
    df: DataFrame,
    group_col: str,
    target_shares: dict[str, float] | None = None,
) -> DataFrame:
    """Per-group resampling weight = target_share / actual_share.

    With no target, the target is uniform across observed groups. The
    output is one row per group (broadcast-sized) — join it back to
    rows and feed the weight into `stratified_sample` rates to
    rebalance a corpus toward the target mix.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("group_rows"))
    total_w = Window.partitionBy()
    counts = counts.withColumn(
        "actual_share", F.col("group_rows") / F.sum("group_rows").over(total_w)
    )
    if target_shares:
        entries = [
            x for k, v in target_shares.items() for x in (F.lit(k), F.lit(float(v)))
        ]
        tgt = F.coalesce(
            F.element_at(F.create_map(*entries), F.col(group_col)), F.lit(0.0)
        )
    else:
        tgt = F.lit(1.0) / F.count(F.lit(1)).over(total_w)
    return counts.withColumn("weight", tgt / F.col("actual_share")).select(
        group_col,
        "group_rows",
        F.round("actual_share", 6).alias("actual_share"),
        F.round("weight", 6).alias("weight"),
    )
