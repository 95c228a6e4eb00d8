"""Ordered-prefix aggregates and ranks with ZERO unpartitioned windows.

``ROW_NUMBER() OVER (ORDER BY ...)`` / ``SUM(x) OVER (ORDER BY ...)``
without a PARTITION BY funnels every row through one task
(``WindowExec: No Partition Defined``).  At 100 TB that single task is
the job.  This module provides the same semantics as a three-step
distributed decomposition:

1. assign every row a BLOCK id that respects the sort order;
2. aggregate per block (tiny: ``n_blocks`` rows), then compute each
   block's *prior-blocks* aggregate with a triangular broadcast
   self-join — no window at all on the metadata table;
3. join the prior-block offsets back (broadcast) and finish with a
   window PARTITIONED by block, so no task ever materializes more than
   one block.

Block assignment — the correctness-critical part. The id must be
IDENTICAL for the per-block-totals pass, the per-row pass, and any
re-execution of the output lineage (self-joins, AQE re-plans). Two
strategies:

- **Deterministic width buckets** (default when the leading sort
  column is numeric / date / timestamp / boolean): ``_blk`` is a pure
  expression of the row — ``floor((proxy - min) * n / span)`` against
  a broadcast min/max aggregate — so NOTHING about physical execution
  can change it. Blocks are equal-width in the value domain, not
  equal-count; a skewed leading key degrades balance but never
  correctness (and every current caller's leading key is
  near-uniform or histogram-bounded).
- **Pinned range layout** (leading sort column is a string or an
  opaque expression): ``repartitionByRange`` + ``spark_partition_id``
  gives equal-count blocks, but the range boundaries are re-sampled
  per physical execution and exchange reuse is NOT guaranteed to
  unify the passes (measured: intermittent wrong prefixes at sf0.01
  under AQE) — so this path always persists the blocked layout to
  pin one materialization.

Exactness: sums here are over integers (the repo's engine-exact
posture quantizes before summing), so regrouping the addition is
bit-identical to the single-partition plan; min/max are order-free.

The reference has no distributed-ranking surface at all (its whole
computational content is an ETL framework, framework.py:1-351); this
is the Spark-native scale path for the rank/cumsum family the query
gates need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["prefix_agg", "prefix_rank"]

_KINDS = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.BooleanType,
)


def _sort_exprs(order: list[tuple]) -> list[Column]:
    out = []
    for col, direction in order:
        c = F.col(col) if isinstance(col, str) else col
        out.append(c.desc() if direction == "desc" else c.asc())
    return out


def _src(kind: str, col) -> Column:
    if kind == "count":
        return F.lit(1)
    return F.col(col) if isinstance(col, str) else col


def _proxy(df: DataFrame, order: list[tuple]):
    """A numeric, sort-monotone proxy of the leading order column, or
    None when one can't be derived deterministically."""
    col0, _ = order[0]
    if not isinstance(col0, str):
        return None
    try:
        dtype = df.schema[col0].dataType
    except KeyError:
        return None
    if isinstance(dtype, _NUMERIC_TYPES):
        return F.col(col0).cast("double")
    if isinstance(dtype, T.DateType):
        return F.datediff(F.col(col0), F.lit("1970-01-01")).cast(
            "double"
        )
    if isinstance(dtype, T.TimestampType):
        return F.unix_timestamp(F.col(col0)).cast("double")
    return None


def prefix_agg(
    df: DataFrame,
    order: list[tuple],
    aggs: dict[str, tuple],
    n_blocks: int = 32,
    persist: bool = False,
) -> DataFrame:
    """Attach EXCLUSIVE ordered-prefix aggregates to every row.

    ``order``: [(column_or_name, "asc"|"desc"), ...] — must be a total
    order over the rows (unique per row), otherwise tie rows split
    nondeterministically between "before" and "not before".
    ``aggs``: {out_alias: (kind, column_or_name_or_None)} with kind in
    {"sum", "count", "min", "max"} ("count" ignores the column).

    Each alias becomes the aggregate over the rows STRICTLY BEFORE the
    row in the order: sum/count give 0 on an empty prefix, min/max give
    NULL (matching ``rowsBetween(unboundedPreceding, -1)``).

    ``persist=True`` forces the pinned-range-layout path even for
    numeric leading keys (useful when equal-count blocks matter more
    than avoiding the materialization).

    ``_blk`` and ``_p_<alias>`` are reserved column names.
    """
    sort = _sort_exprs(order)
    proxy = None if persist else _proxy(df, order)
    if proxy is not None:
        # Deterministic width buckets: _blk is a pure expression of
        # the row against a broadcast min/max — immune to exchange
        # re-sampling, AQE re-plans, and output-lineage re-execution.
        _, direction = order[0]
        bounds = df.agg(
            F.min(proxy).alias("_mn"), F.max(proxy).alias("_mx")
        )
        pos = (
            (F.col("_mx") - proxy)
            if direction == "desc"
            else (proxy - F.col("_mn"))
        )
        span = F.col("_mx") - F.col("_mn")
        blk = F.when(span <= 0, F.lit(0)).otherwise(
            F.least(
                F.lit(n_blocks - 1),
                F.floor(pos * n_blocks / span),
            )
        )
        blocked = (
            df.crossJoin(F.broadcast(bounds))
            .withColumn("_blk", blk.cast("int"))
            .drop("_mn", "_mx")
            .repartition(n_blocks, "_blk")
        )
    else:
        # Pinned range layout: equal-count blocks from the sampled
        # range exchange, persisted because the sampling is NOT
        # stable across physical executions (and exchange reuse has
        # been observed to miss intermittently under AQE, silently
        # corrupting the prefixes).
        blocked = (
            df.repartitionByRange(n_blocks, *sort)
            .withColumn("_blk", F.spark_partition_id())
            .persist()
        )
    totals = blocked.groupBy("_blk").agg(
        *[_KINDS[k](_src(k, c)).alias(f"_t_{a}") for a, (k, c) in aggs.items()]
    )
    rhs = totals.select(
        F.col("_blk").alias("_blk_b"),
        *[F.col(f"_t_{a}").alias(f"_b_{a}") for a in aggs],
    )
    prior = (
        totals.select("_blk")
        .join(F.broadcast(rhs), F.col("_blk_b") < F.col("_blk"), "left")
        .groupBy("_blk")
        .agg(
            *[
                _KINDS[k](F.col(f"_b_{a}")).alias(f"_p_{a}")
                for a, (k, _) in aggs.items()
            ]
        )
    )
    w = Window.partitionBy("_blk").orderBy(*sort).rowsBetween(
        Window.unboundedPreceding, -1
    )
    out = blocked.join(F.broadcast(prior), "_blk")
    for a, (k, c) in aggs.items():
        run = _KINDS[k](_src(k, c)).over(w)
        if k in ("sum", "count"):
            expr = F.coalesce(F.col(f"_p_{a}"), F.lit(0)) + F.coalesce(
                run, F.lit(0)
            )
        elif k == "min":
            expr = F.least(F.col(f"_p_{a}"), run)
        else:
            expr = F.greatest(F.col(f"_p_{a}"), run)
        out = out.withColumn(a, expr)
    return out.drop("_blk", *[f"_p_{a}" for a in aggs])


def prefix_rank(
    df: DataFrame,
    order: list[tuple],
    alias: str = "rk",
    n_blocks: int = 32,
    persist: bool = False,
) -> DataFrame:
    """1-based ``ROW_NUMBER() OVER (ORDER BY ...)`` equivalent under a
    total order, with no unpartitioned window anywhere in the plan.
    See :func:`prefix_agg` for the block-assignment determinism
    contract (numeric leading keys get pure-expression blocks; string
    leading keys get a persisted range layout)."""
    out = prefix_agg(
        df, order, {alias: ("count", None)}, n_blocks, persist=persist
    )
    return out.withColumn(alias, (F.col(alias) + 1).cast("long"))
