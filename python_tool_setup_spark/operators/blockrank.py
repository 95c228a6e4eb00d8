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
  correctness (every current caller's leading key is near-uniform or
  histogram-bounded; a caller with a hot leading value opts into the
  pinned range layout below via ``persist=True``, whose partitioner
  keys on the FULL sort tuple and therefore splits the hot value by
  the tiebreakers — both properties are pinned by planted-skew tests
  in tests/test_blockrank.py). NULL leading keys go to the
  first block under ``asc`` (Spark sorts NULLS FIRST ascending) and
  the last block under ``desc`` (NULLS LAST); NaN float/double keys
  go to the opposite end (Spark sorts NaN greater than any value).
- **Pinned range layout** (leading sort column is a string or an
  opaque expression): ``repartitionByRange`` + ``spark_partition_id``
  gives equal-count blocks, but the range boundaries are re-sampled
  per physical execution and exchange reuse is NOT guaranteed to
  unify the passes (measured: intermittent wrong prefixes at sf0.01
  under AQE) — so this path always pins ONE materialization via an
  eager ``localCheckpoint`` (RDD-backed, so storage is released by
  the ContextCleaner when the output is garbage-collected — a plain
  ``persist`` would sit in the CacheManager forever unless somebody
  remembered to unpersist, which across a 500-gate sweep nobody
  does).

LINEAGE CONTRACT (``cache_input``): the decomposition executes its
input lineage up to three times (bounds aggregate, per-block totals,
final join-back). For a bare pruned scan that is cheaper than caching;
for anything with a join/aggregate/window upstream — and especially
for CHAINED prefix calls — re-execution multiplies upstream work
~3x per link (the q323 RFM incident: three chained calls -> ~4^3
recompute explosion, 62 s for a 5 s query). So by default
(``cache_input=None``) the input is pinned with an eager
``localCheckpoint`` whenever its analyzed plan is anything beyond
scan/filter/project OR contains a nondeterministic expression
(rand/uuid/monotonically_increasing_id/shuffle/... — a Project over
rand() is node-trivial but re-executes to DIFFERENT rows; limit
without total order and sample are non-trivial NODES and pin that
way), closing the corrupt-prefix risk of re-executed nondeterminism.
An already-persisted input is never re-pinned (checked for both the
default and ``cache_input=True``). Pass ``cache_input=False`` only
when the caller has already materialized the input some other way or
accepts trivial-scan re-reads; ``True`` forces pinning a trivial scan.

Pin strategy: eager ``localCheckpoint`` by default (ContextCleaner
reclaims it on GC — no CacheManager leak), which is NOT recomputable:
executor loss / dynamic-allocation decommission fails the job. Set
``spark.python_tool_setup.blockrank.pin=persist`` on such clusters to
use replicated disk persistence instead — BUT note that persist is
recomputable BY DESIGN, so a pin whose purpose is to freeze
nondeterministic rows (rand()/sample/range-exchange sampling) cannot
safely use it: those pins upgrade to a RELIABLE checkpoint when a
checkpoint dir is configured, else warn and keep localCheckpoint
(fails loudly instead of silently corrupting prefixes — see
:func:`pin`). Persisted pins are tracked; call :func:`release_pins`
after materializing results to free the CacheManager across chained
calls.

Exactness: sums here are over integers (the repo's engine-exact
posture quantizes before summing), so regrouping the addition is
bit-identical to the single-partition plan; min/max are order-free.

The reference has no distributed-ranking surface at all (its whole
computational content is an ETL framework, framework.py:1-351); this
is the Spark-native scale path for the rank/cumsum family the query
gates need.

Reserved column names: ``_blk``, ``_p_<alias>``, ``_brk_mn``,
``_brk_mx`` (the bound columns are renamed away from anything a
caller plausibly owns).
"""

from __future__ import annotations

import warnings

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

_FLOAT_TYPES = (T.FloatType, T.DoubleType)

# Analyzed-plan node names whose re-execution is cheap AND
# deterministic: a pruned scan plus row-local transforms. Anything
# else (joins, aggregates, windows, generators, python maps, limits,
# samples, set ops...) is either expensive to run three times or not
# guaranteed to reproduce the same rows — both get pinned.
_TRIVIAL_NODES = (
    "Project",
    "Filter",
    "Relation",
    "Range",
    "LogicalRDD",
    "LocalRelation",
    "SubqueryAlias",
    "View",
    "Repartition",
    "RepartitionByExpression",
)

# Expression text that marks a plan NON-reproducible across the width
# path's three executions (bounds, totals, join-back) even when every
# NODE is a trivial Project/Filter: re-executed nondeterminism can
# yield different rows/values per pass and silently corrupt prefixes.
# current_timestamp()/now() are consistent WITHIN one query but the
# bounds aggregate is a SEPARATE execution from the main plan, so they
# count too. A false positive (e.g. the token inside a string literal)
# only costs one pin, never correctness.
_NONDETERMINISTIC_TOKENS = (
    "rand(",
    "randn(",
    "random(",
    "uuid()",
    "shuffle(",
    "monotonically_increasing_id()",
    "current_timestamp()",
    "current_date(",
    "now()",
    "input_file_name()",
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


def _leading_is_float(df: DataFrame, order: list[tuple]) -> bool:
    col0, _ = order[0]
    if not isinstance(col0, str):
        return False
    try:
        return isinstance(df.schema[col0].dataType, _FLOAT_TYPES)
    except KeyError:
        return False


def _is_persisted(df: DataFrame) -> bool:
    try:
        lvl = df.storageLevel
        return bool(lvl.useMemory or lvl.useDisk)
    except Exception:
        return False


def _plan_text(df: DataFrame) -> str | None:
    try:
        return df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return None


def _has_nondeterminism(df: DataFrame) -> bool:
    """True when the analyzed plan contains a nondeterministic
    expression (or can't be inspected): re-executing such a plan can
    yield DIFFERENT rows, so its pin must be non-recomputable."""
    plan = _plan_text(df)
    if plan is None:
        return True
    lowered = plan.lower()
    return any(tok in lowered for tok in _NONDETERMINISTIC_TOKENS)


def _is_trivial(df: DataFrame) -> bool:
    """True when every node of the analyzed plan is a deterministic,
    cheap-to-re-execute scan/filter/project shape AND no expression in
    the plan is nondeterministic (a Project over rand()/uuid()/... is
    node-trivial but NOT re-execution-safe). On any doubt (unparseable
    plan, unknown node) returns False so the caller pins — wrong
    answer in that direction only costs one materialization, never
    correctness."""
    plan = _plan_text(df)
    if plan is None:
        return False
    lowered = plan.lower()
    if any(tok in lowered for tok in _NONDETERMINISTIC_TOKENS):
        return False
    for line in plan.splitlines():
        stripped = line.lstrip(" +-:")
        if not stripped:
            continue
        node = stripped.split(" ", 1)[0].split("[", 1)[0]
        if not node:
            continue
        if not any(node == t or node.startswith(t) for t in _TRIVIAL_NODES):
            return False
    return True


# DataFrames pinned via persist mode, awaiting release_pins(). (local
# checkpoints need no tracking: the ContextCleaner reclaims them on GC.)
_PERSISTED_PINS: list[DataFrame] = []

_PIN_CONF = "spark.python_tool_setup.blockrank.pin"
_PIN_MODES = ("localCheckpoint", "persist")


def pin(df: DataFrame, nondeterministic: bool | None = None) -> DataFrame:
    """Materialize ONCE and truncate lineage.

    Default strategy — RDD-backed eager ``localCheckpoint``: storage
    is dropped by the ContextCleaner when the result is garbage-
    collected (unlike ``Dataset.persist``, which leaks in the
    CacheManager until an explicit unpersist). CAVEAT: a local
    checkpoint lives ONLY on its executors and is NOT recomputable —
    executor loss or dynamic-allocation decommission fails the job (a
    documented Spark restriction). On clusters with dynamic allocation
    or preemptible executors set
    ``spark.python_tool_setup.blockrank.pin=persist`` to use replicated
    disk persistence instead (executor-loss-tolerant, tracked for
    :func:`release_pins`).

    ``nondeterministic=True`` declares that the pin exists to FREEZE a
    plan whose re-execution can yield different rows (rand()/sample/
    range-exchange sampling). The default (``None``) auto-detects by
    inspecting the analyzed plan (:func:`_has_nondeterminism`) — the
    same safety the prefix machinery applies internally — so a direct
    caller pinning a rand()/sample-derived plan under the persist conf
    cannot silently opt into a recomputable pin (ADVICE r10). The
    inspection only runs under persist mode (localCheckpoint pins are
    never recomputable, so the distinction is moot there and the
    plan-text round-trip is skipped). Persist cannot honor that
    contract —
    it is recomputable by design, so a 2-replica loss silently
    re-derives DIFFERENT rows — therefore such pins upgrade to a
    RELIABLE checkpoint when ``sparkContext.setCheckpointDir`` has
    been called (recomputation-free AND loss-tolerant), else warn and
    keep localCheckpoint: failing loudly on executor loss beats
    silently corrupting prefixes.

    Any value of the conf other than ``localCheckpoint``/``persist``
    raises (a typo must not silently defeat the operator on the very
    clusters that set it)."""
    mode = "localCheckpoint"
    try:
        mode = df.sparkSession.conf.get(_PIN_CONF, "localCheckpoint")
    except Exception:
        pass
    if mode not in _PIN_MODES:
        raise ValueError(
            f"{_PIN_CONF}={mode!r}: expected one of {_PIN_MODES} "
            "(case-sensitive)"
        )
    if mode == "persist":
        if nondeterministic is None:
            nondeterministic = _has_nondeterminism(df)
        if nondeterministic:
            ckpt_dir = None
            try:
                ckpt_dir = df.sparkSession.sparkContext.getCheckpointDir()
            except Exception:
                pass
            if ckpt_dir:
                return df.checkpoint(eager=True)
            warnings.warn(
                f"{_PIN_CONF}=persist requested, but this pin freezes a "
                "NONDETERMINISTIC plan and persist is recomputable "
                "(block loss would silently re-derive different rows); "
                "no checkpoint dir is set, falling back to "
                "localCheckpoint (fails loudly on executor loss). Call "
                "sparkContext.setCheckpointDir() to get a reliable, "
                "loss-tolerant pin instead.",
                stacklevel=2,
            )
            return df.localCheckpoint(eager=True)
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.DISK_ONLY_2)
        out.count()  # eager, like localCheckpoint(eager=True)
        _PERSISTED_PINS.append(out)
        return out
    return df.localCheckpoint(eager=True)


def release_pins() -> int:
    """Unpersist every persist-mode pin created so far and return how
    many were released. Call after the downstream result is
    materialized (e.g. between chained prefix_agg gates) so persist
    mode doesn't grow the CacheManager across a long sweep."""
    n = 0
    while _PERSISTED_PINS:
        df = _PERSISTED_PINS.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


# Backwards-compatible internal alias (pre-round-8 name).
_pin = pin


def _range_blocked(df: DataFrame, sort: list, n_blocks: int) -> DataFrame:
    """Pinned range layout: equal-count blocks from the sampled range
    exchange, pinned because the sampling is NOT stable across
    physical executions (and exchange reuse has been observed to miss
    intermittently under AQE, silently corrupting the prefixes) —
    i.e. this pin is ALWAYS nondeterminism-triggered, so persist mode
    is never allowed to serve it (see :func:`pin`).

    Skew note: the range partitioner keys on the FULL sort tuple, so a
    hot LEADING value (one key owning most rows) is still split across
    blocks by the tiebreaker columns — this path (``persist=True``) is
    the opt-in remedy when the width-bucket default would put most
    rows in one block (guide §2.5; planted-skew property tests in
    tests/test_blockrank.py)."""
    return pin(
        df.repartitionByRange(n_blocks, *sort).withColumn(
            "_blk", F.spark_partition_id()
        ),
        nondeterministic=True,
    )


def prefix_agg(
    df: DataFrame,
    order: list[tuple],
    aggs: dict[str, tuple],
    n_blocks: int = 32,
    persist: bool = False,
    cache_input: bool | None = None,
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

    ``cache_input``: lineage contract — see the module docstring.
    None (default) pins non-trivial inputs once via eager
    localCheckpoint; True always pins; False never does (caller
    asserts the input is already persisted or a cheap scan).

    ``_blk``, ``_p_<alias>``, ``_brk_mn``, ``_brk_mx`` are reserved
    column names.
    """
    sort = _sort_exprs(order)
    proxy = None if persist else _proxy(df, order)
    if proxy is not None and not _is_persisted(df) and (
        cache_input is True
        or (cache_input is None and not _is_trivial(df))
    ):
        # width path reads the input three times (bounds, totals,
        # join-back) — pin it once. The pinned-range path below reads
        # it exactly ONCE into the checkpointed blocked layout, so
        # pinning there would be a pure second materialization.
        df = pin(df, nondeterministic=_has_nondeterminism(df))
    if proxy is not None:
        # Deterministic width buckets: _blk is a pure expression of
        # the row against a broadcast min/max — immune to exchange
        # re-sampling, AQE re-plans, and output-lineage re-execution.
        _, direction = order[0]
        # NaN would poison min/max (Spark's max treats NaN as the
        # largest double) and the bucket arithmetic; bounds are over
        # finite values only, NaN rows get an explicit end block.
        finite = (
            F.nanvl(proxy, F.lit(None).cast("double"))
            if _leading_is_float(df, order)
            else proxy
        )
        bounds = df.agg(
            F.min(finite).alias("_brk_mn"),
            F.max(finite).alias("_brk_mx"),
        )
        pos = (
            (F.col("_brk_mx") - proxy)
            if direction == "desc"
            else (proxy - F.col("_brk_mn"))
        )
        span = F.col("_brk_mx") - F.col("_brk_mn")
        core = F.when(
            span.isNull() | (span <= 0), F.lit(0)
        ).otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(n_blocks - 1),
                    F.floor(pos * n_blocks / span),
                ),
            )
        )
        # Spark sort order: NULL first asc / last desc; NaN greater
        # than every value (last asc / first desc). Matching end
        # blocks keep the within-block window ordering global.
        null_blk = 0 if direction != "desc" else n_blocks - 1
        nan_blk = n_blocks - 1 if direction != "desc" else 0
        blk = F.when(proxy.isNull(), F.lit(null_blk))
        if _leading_is_float(df, order):
            blk = blk.when(F.isnan(proxy), F.lit(nan_blk))
        blk = blk.otherwise(core)
        blocked = (
            df.crossJoin(F.broadcast(bounds))
            .withColumn("_blk", blk.cast("int"))
            .drop("_brk_mn", "_brk_mx")
            .repartition(n_blocks, "_blk")
        )
    else:
        blocked = _range_blocked(df, sort, n_blocks)
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
    cache_input: bool | None = None,
) -> DataFrame:
    """1-based ``ROW_NUMBER() OVER (ORDER BY ...)`` equivalent under a
    total order, with no unpartitioned window anywhere in the plan.
    See :func:`prefix_agg` for the block-assignment determinism and
    input-lineage (``cache_input``) contracts."""
    out = prefix_agg(
        df,
        order,
        {alias: ("count", None)},
        n_blocks,
        persist=persist,
        cache_input=cache_input,
    )
    return out.withColumn(alias, (F.col(alias) + 1).cast("long"))
