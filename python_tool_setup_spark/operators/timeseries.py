"""Time-series alignment: resample to a fixed interval with gap
filling and last-observation-carried-forward.

The shape every metrics/feature pipeline needs before joining event
streams to model-training windows: raw events are irregular, the
consumer wants one row per (key, interval) with explicit zeros for
quiet intervals and the last known level carried across gaps.

Scale design: one aggregate on (key, bucket) with map-side combine,
a per-key bounds aggregate (key-cardinality-sized), the dense grid
generated EXECUTOR-side via ``sequence`` + ``explode`` (never on the
driver), and one left join back — all hash-partitioned on the key, so
Spark reuses a single exchange. The carry-forward window partitions by
key, bounded by each key's own time span.
"""

from __future__ import annotations

from collections.abc import Sequence as Seq

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_gapfill(
    df: DataFrame,
    ts_col: str,
    key_cols: Seq[str],
    value_col: str,
    interval: str = "1 hour",
) -> DataFrame:
    """One row per (key, interval bucket) from each key's first to last
    event: ``n_events``/``sum_value`` zero-filled on quiet buckets,
    ``carry_avg`` = last non-empty bucket's mean value (LOCF)."""
    keys = list(key_cols)
    bucket = F.date_trunc("hour", F.col(ts_col)).alias("__bucket")
    per_bucket = df.groupBy(*keys, bucket).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 3).alias("sum_value"),
        (F.sum(value_col) / F.count(F.lit(1))).alias("__avg"),
    )
    bounds = per_bucket.groupBy(*keys).agg(
        F.min("__bucket").alias("__mn"), F.max("__bucket").alias("__mx")
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence("__mn", "__mx", F.expr(f"INTERVAL {interval}"))
        ).alias("__bucket"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(per_bucket, [*keys, "__bucket"], "left")
        .select(
            *keys,
            F.col("__bucket").alias("bucket"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
            F.round(F.last("__avg", ignorenulls=True).over(w), 6).alias(
                "carry_avg"
            ),
        )
    )
