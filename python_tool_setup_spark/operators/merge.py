"""Upsert (MERGE) as a pure DataFrame rewrite.

Parity target: the reference's Delta merge —
``whenMatchedUpdateAll().whenNotMatchedInsertAll()`` built from an
AND-joined key-equality condition (reference ``framework.py:211-231``,
``:226-231``). Semantics reproduced here without requiring delta-spark:

  result = (target rows with no source key match)       -- kept as-is
         ∪ (source rows)                                -- update ∪ insert

because "update all" replaces every column of a matched target row with
the source row, a matched target row contributes nothing of its own.
Delta raises on multiple source rows matching one target row; we expose
``source_dedup_order`` to make the source unique per key first
(deterministically), or raise like Delta when duplicates remain.

Scale: one shuffle each side on the merge keys (anti-join + union);
no full materialization of either side on the driver. Null-key source
rows never match (SQL equality), so like Delta they fall through to the
insert branch; null-key target rows are always kept.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class MergeKeyError(ValueError):
    """Duplicate merge keys in source (Delta would raise the same)."""


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    source_dedup_order: Sequence | None = None,
    check_duplicate_source_keys: bool = False,
) -> DataFrame:
    """Return the merged relation: matched targets replaced by their
    source row, unmatched source rows appended, unmatched targets kept.
    """
    from python_tool_setup_spark.operators.relational import dedup_by_keys

    keys = list(keys)
    source = source.select(*target.columns)  # align column order/schema

    if source_dedup_order is not None:
        source = dedup_by_keys(source, keys, source_dedup_order)
    elif check_duplicate_source_keys:
        dup = (
            source.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise MergeKeyError(
                f"source has multiple rows per merge key {keys}; "
                "pass source_dedup_order or pre-aggregate"
            )

    # Null-safe NOT: plain anti-join already treats null keys as
    # non-matching, matching SQL MERGE ON equality semantics.
    untouched_target = target.join(source.select(*keys), on=keys, how="left_anti")
    return untouched_target.unionByName(source)
