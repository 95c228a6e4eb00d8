"""Ordered-prefix aggregates and ranks with ZERO unpartitioned windows.

``ROW_NUMBER() OVER (ORDER BY ...)`` / ``SUM(x) OVER (ORDER BY ...)``
without a PARTITION BY funnels every row through one task
(``WindowExec: No Partition Defined``).  At 100 TB that single task is
the job.  This module provides the same semantics as a three-step
distributed decomposition:

1. range-partition the rows on the order key (``repartitionByRange`` —
   the same sampled range exchange a global sort would open, but with
   no per-partition sort barrier), tagging each row with its block id;
2. aggregate per block (tiny: ``n_blocks`` rows), then compute each
   block's *prior-blocks* aggregate with a triangular broadcast
   self-join — no window at all on the metadata table;
3. join the prior-block offsets back (broadcast) and finish with a
   window PARTITIONED by block, so no task ever materializes more than
   one block.

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

__all__ = ["prefix_agg", "prefix_rank"]

_KINDS = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


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

    ``_blk`` and ``_p_<alias>`` are reserved column names.
    """
    sort = _sort_exprs(order)
    # _blk MUST be identical for the totals pass and the per-row pass.
    # Within one execution, exchange reuse guarantees that (one physical
    # repartitionByRange feeds both subtrees) — four rounds of oracle
    # evidence. Two cases DEFEAT reuse and silently produce
    # duplicate/missing ranks, so they pin the blocked layout with a
    # persist instead: (a) a CACHED input (the cache defeats reuse and
    # the passes re-sample range boundaries independently); (b) a caller
    # whose plan executes the OUTPUT lineage twice with differently-
    # shaped subtrees — e.g. self-joining rank r to rank r-1 (q475) —
    # which must opt in with persist=True. Persisting unconditionally
    # is NOT free: it breaks pipelining and materializes the working
    # set, a measured 2-3x slowdown across the prefix gate family.
    blocked = df.repartitionByRange(n_blocks, *sort).withColumn(
        "_blk", F.spark_partition_id()
    )
    if persist or df.is_cached:
        blocked = blocked.persist()
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

    Pass ``persist=True`` when the RESULT's lineage will be executed
    more than once with different subtree shapes (e.g. self-joining
    rank r to rank r-1) — re-execution re-samples range boundaries and
    silently yields duplicate/missing ranks otherwise."""
    out = prefix_agg(
        df, order, {alias: ("count", None)}, n_blocks, persist=persist
    )
    return out.withColumn(alias, (F.col(alias) + 1).cast("long"))
