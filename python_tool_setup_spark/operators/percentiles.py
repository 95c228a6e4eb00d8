"""Exact grouped percentiles over a value histogram — no per-group
row buffering.

Spark's exact ``percentile`` aggregate buffers every row of a group in
one task; at 100 TB that buffer is the job. This operator computes the
same continuous-interpolation percentiles (quantile_cont semantics)
from the per-(group, value) COUNT histogram instead: cumulative counts
via a window PARTITIONED by group over the distinct-value domain, the
two straddling order statistics v[floor(k)], v[ceil(k)] for
k = (n-1)p picked out with conditional aggregates, interpolated
``v_lo + frac * (v_hi - v_lo)`` — the formula both Spark and DuckDB
use, so results agree to the last ulp (callers round anyway).

Per-task state is one group's distinct-value histogram, not its row
buffer. The sketch path (``approx_percentile``) remains the default at
extreme scale; this is its exactness reference (q47/q363 gates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_exact_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    pcts: dict[str, float],
) -> DataFrame:
    """Return one row per group: the requested percentiles (alias ->
    p in [0, 1]) plus ``n``. ``_v``/``_cnt``/``_before``/``_n`` and
    ``_lo_*``/``_hi_*`` are reserved intermediates."""
    group_cols = list(group_cols)
    hist = df.groupBy(
        *group_cols, F.col(value_col).alias("_v")
    ).agg(F.count(F.lit(1)).alias("_cnt"))
    wgrp = Window.partitionBy(*group_cols)
    wcum = wgrp.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        *group_cols,
        "_v",
        "_cnt",
        F.coalesce(F.sum("_cnt").over(wcum), F.lit(0)).alias("_before"),
        F.sum("_cnt").over(wgrp).alias("_n"),
    )

    def bounds(p: float, tag: str):
        k = (F.col("_n") - 1).cast("double") * F.lit(p)
        lo = F.floor(k).cast("long")
        hi = F.least(F.col("_n") - 1, lo + 1)
        covers = lambda i: (F.col("_before") <= i) & (
            i < F.col("_before") + F.col("_cnt")
        )
        return [
            F.max(F.when(covers(lo), F.col("_v"))).alias(f"_lo_{tag}"),
            F.max(F.when(covers(hi), F.col("_v"))).alias(f"_hi_{tag}"),
        ]

    aggs = [b for tag, p in pcts.items() for b in bounds(p, tag)]
    agg = cum.groupBy(*group_cols).agg(*aggs, F.sum("_cnt").alias("n"))

    out_cols = [*group_cols]
    for tag, p in pcts.items():
        k = (F.col("n") - 1).cast("double") * F.lit(p)
        frac = k - F.floor(k).cast("long").cast("double")
        v = F.col(f"_lo_{tag}") + frac * (
            F.col(f"_hi_{tag}") - F.col(f"_lo_{tag}")
        )
        out_cols.append(v.alias(tag))
    out_cols.append(F.col("n"))
    return agg.select(*out_cols)


def grouped_exact_percentiles_frac(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    pcts: dict[str, tuple[int, int]],
) -> DataFrame:
    """Exact-rational QUANTILE_CONT over an INTEGER value column.

    ``pcts`` maps alias -> (a, b) for quantile a/b. Per group the
    continuous quantile is value[k] + r/b * (value[k+1] - value[k])
    with (n-1)*a = k*b + r — so b * quantile is the exact INTEGER
    ``lo*(b-r) + hi*r``, returned as ``{tag}_num`` (the caller divides
    by b / rounds half-up as ``(num + b//2) DIV b``).

    Why this exists (r8 multi-seed catch #5, q524 on seed 5050): the
    float path computes frac = (n-1)*p - floor(...) in doubles, and a
    quantile landing exactly on a half-step tie (p = 19/20 over cent
    values hits half-millis whenever the bracketing gap is odd) then
    rounds differently per engine because the two interpolation
    doubles differ by an ulp. Integer numerators are exact on both
    engines under any partitioning.
    """
    group_cols = list(group_cols)
    hist = df.groupBy(
        *group_cols, F.col(value_col).alias("_v")
    ).agg(F.count(F.lit(1)).alias("_cnt"))
    wgrp = Window.partitionBy(*group_cols)
    wcum = wgrp.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        *group_cols,
        "_v",
        "_cnt",
        F.coalesce(F.sum("_cnt").over(wcum), F.lit(0)).alias("_before"),
        F.sum("_cnt").over(wgrp).alias("_n"),
    )

    def bounds(a: int, b: int, tag: str):
        kt = (F.col("_n") - 1) * a
        lo = ((kt - kt % b) / b).cast("long")
        hi = F.least(F.col("_n") - 1, lo + 1)
        covers = lambda i: (F.col("_before") <= i) & (  # noqa: E731
            i < F.col("_before") + F.col("_cnt")
        )
        return [
            F.max(F.when(covers(lo), F.col("_v"))).alias(f"_lo_{tag}"),
            F.max(F.when(covers(hi), F.col("_v"))).alias(f"_hi_{tag}"),
        ]

    aggs = [c for tag, (a, b) in pcts.items() for c in bounds(a, b, tag)]
    agg = cum.groupBy(*group_cols).agg(*aggs, F.sum("_cnt").alias("n"))

    out_cols = [*group_cols]
    for tag, (a, b) in pcts.items():
        kt = (F.col("n") - 1) * a
        r = kt % b
        num = F.col(f"_lo_{tag}").cast("long") * (b - r) + F.col(
            f"_hi_{tag}"
        ).cast("long") * r
        out_cols.append(num.alias(f"{tag}_num"))
    out_cols.append(F.col("n"))
    return agg.select(*out_cols)
