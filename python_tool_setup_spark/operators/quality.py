"""Data-quality expectations: declarative row-level rules checked in a
single scan, with optional quarantine routing.

The pipeline-pattern counterpart to the reference's config validation
(reference framework.py:121-126 validates the PIPELINE config; these
validate the DATA). Rules are named boolean Column predicates:

    rules = {"qty_range": F.col("qty").between(1, 50),
             "key_not_null": F.col("id").isNotNull()}

- `expectation_report`: one aggregate pass → per-rule violation count
  + violation rate. No shuffle beyond the final global agg of
  rule-cardinality partial sums; cost is one scan regardless of how
  many rules.
- `quarantine`: split (good, bad) where bad rows carry the list of
  failed rule names — route bad rows to a dead-letter table instead of
  failing the pipeline. Both outputs derive from ONE projection; a
  NULL predicate result counts as a violation (fail-closed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fails(pred: Column) -> Column:
    # NULL predicate (e.g. comparison with NULL) fails closed
    return ~F.coalesce(pred, F.lit(False))


def expectation_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Per-rule violation counts over one scan: (rule, violations,
    total_rows, violation_rate)."""
    aggs = [
        F.sum(_fails(pred).cast("long")).alias(name) for name, pred in rules.items()
    ] + [F.count(F.lit(1)).alias("__total")]
    wide = df.agg(*aggs)
    names = F.array(*[F.lit(n) for n in rules])
    counts = F.array(*[F.col(n) for n in rules])
    return (
        wide.select(
            F.explode(F.arrays_zip(names.alias("rule"), counts.alias("violations")))
            .alias("z"),
            F.col("__total").alias("total_rows"),
        )
        .select(
            F.col("z.rule").alias("rule"),
            F.col("z.violations").alias("violations"),
            "total_rows",
            # scale-first round: the count quotient is bit-identical
            # across engines; ROUND(x, 6) tie resolution is not
            (
                F.round(
                    1000000 * (F.col("z.violations") / F.col("total_rows"))
                )
                / 1000000.0
            ).alias("violation_rate"),
        )
    )


def quarantine(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split df into (good, bad); bad rows get a `_failed_rules`
    array column naming every rule they violate."""
    failed = F.array_compact(
        F.array(
            *[
                F.when(_fails(pred), F.lit(name)) for name, pred in rules.items()
            ]
        )
    )
    tagged = df.withColumn("_failed_rules", failed)
    good = tagged.filter(F.size("_failed_rules") == 0).drop("_failed_rules")
    bad = tagged.filter(F.size("_failed_rules") > 0)
    return good, bad


def outlier_zscore(
    df: DataFrame,
    value_col: str,
    group_cols=(),
    threshold: float = 3.0,
    quantum: float | None = None,
) -> DataFrame:
    """Flag rows whose value is more than ``threshold`` sample standard
    deviations from its group mean.

    Group moments come from ONE aggregate (count/mean/stddev — all
    mergeable, map-side combined) broadcast back onto the rows, so the
    big side is scanned once and never shuffled: the statistical
    sibling of the rule-based ``expectation_report``.

    ``quantum`` (e.g. 0.01 for 2-decimal money) switches the moments to
    EXACT integer arithmetic: per-row micro-units, an int64 sum and a
    DECIMAL(38) square-sum — both order-free — so mu/sigma/z are
    bit-identical under any partitioning or re-aggregation order
    (float moments drift by summation order, and a z within ulps of a
    .00005 midpoint then rounds differently per plan — the q208/q212
    knife-edge classes). The z column takes the scale-first round
    either way so the flag is engine-stable."""
    keys = list(group_cols)
    if quantum is not None:
        inv = round(1.0 / quantum)
        c = F.round(inv * F.col(value_col)).cast("long")
        stats = df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(c).alias("__sc"),
            F.sum(c.cast("decimal(38,0)") * c).alias("__sc2"),
        )
        mu = F.col("__sc").cast("double") / (float(inv) * F.col("__n"))
        num = (
            F.col("__n").cast("decimal(38,0)") * F.col("__sc2")
            - F.col("__sc").cast("decimal(38,0)") * F.col("__sc")
        ).cast("double")
        sigma = F.sqrt(
            num
            / (
                F.col("__n").cast("double")
                * (F.col("__n") - 1)
                * float(inv * inv)
            )
        )
        stats = stats.select(
            *keys, mu.alias("__mu"), sigma.alias("__sigma")
        )
    else:
        stats = df.groupBy(*keys).agg(
            F.avg(value_col).alias("__mu"),
            F.stddev(value_col).alias("__sigma"),
        )
    joined = (
        df.join(F.broadcast(stats), keys)
        if keys
        else df.crossJoin(F.broadcast(stats))
    )
    # scale-first round (q208 recipe): ROUND(x, 4) of a computed
    # quotient resolves near-midpoint doubles differently per engine.
    z = (
        F.round(
            10000
            * (
                (F.col(value_col) - F.col("__mu"))
                / F.when(F.col("__sigma") > 0, F.col("__sigma"))
            )
        )
        / 10000.0
    )
    return (
        joined.withColumn("z", z)
        .withColumn("is_outlier", F.abs(F.col("z")) > threshold)
        .drop("__mu", "__sigma")
    )
