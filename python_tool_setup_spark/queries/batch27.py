"""Round-3 gates, batch 27: entity resolution / record linkage — the
two classic candidate-generation strategies at scale. q239: blocked
linkage (hash-partition the universe by a derived blocking key,
compare only within blocks — join-shaped, like the L2 dedup family).
q240: sorted-neighborhood (order the universe by a derived sort key
and compare each record to its w nearest neighbors — window-shaped,
needs no exact key agreement). Both confine the quadratic comparison
kernel to bounded candidate sets, the only way pairwise matching
survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import prefix_rank
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


def _dirty_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'dirty' variants: every 3rd customer re-enters the
    universe with one PADDING ZERO dropped from its name (drop
    position keyed on the custkey, confined to the first four digit
    slots — always '0' for custkey < 100000, so the zero-stripped
    form of a record and its variant is identical). Both engines
    derive the identical typo."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    pos = (F.col("c_custkey") % 4) + 10  # first four digit positions
    dirty = c.filter(F.col("c_custkey") % 3 == 0).select(
        (-F.col("c_custkey") - 1).alias("c_custkey"),  # new identity
        F.concat(
            F.substring("c_name", F.lit(1), pos - 1),
            F.substring("c_name", pos + 1, F.lit(99)),
        ).alias("c_name"),
    )
    return c.unionAll(dirty)


_DIRTY_SQL = """
        SELECT c_custkey, c_name FROM customer
        UNION ALL
        SELECT -c_custkey - 1,
               substr(c_name, 1, CAST(c_custkey % 4 + 9 AS INT))
                 || substr(c_name, CAST(c_custkey % 4 + 11 AS INT))
        FROM customer WHERE c_custkey % 3 = 0
"""


# ---------------------------------------------------------------- q239
@register(
    "q239_record_linkage_blocked",
    f"""
    WITH u AS ({_DIRTY_SQL}),
    blocked AS (
        SELECT c_custkey, c_name, replace(c_name, '0', '') AS blk
        FROM u
    )
    SELECT CAST(a.c_custkey AS BIGINT) AS clean_key,
           CAST(b.c_custkey AS BIGINT) AS dirty_key,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM blocked a JOIN blocked b
      ON a.blk = b.blk AND a.c_custkey >= 0 AND b.c_custkey < 0
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY clean_key, dirty_key
    """,
    doc="Blocked record linkage (entity resolution, candidate "
    "generation by HASH BLOCKING): a deterministically dirtied "
    "universe (every 3rd customer re-enters with one padding zero "
    "dropped from its name) is re-linked to clean identities by "
    "blocking on the zero-stripped name — a key INVARIANT under the "
    "corruption, so recall is complete by construction — and running "
    "the edit-distance kernel ONLY within blocks: one equi-join "
    "shuffle on the blocking key, never all-pairs, with the "
    "quadratic kernel bounded by block size (a handful of records "
    "share a stripped key). That block-confined shape is the "
    "structural requirement for ER at 100 TB. Ambiguous near-matches "
    "(a different customer whose variant is also 1 edit away) are "
    "emitted identically by both engines' levenshtein.",
)
def q239_record_linkage_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _dirty_customers(spark, sf_dir)
    blocked = u.withColumn("blk", F.regexp_replace("c_name", "0", ""))
    a = blocked.filter(F.col("c_custkey") >= 0).select(
        F.col("c_custkey").alias("clean_key"),
        F.col("c_name").alias("na"),
        "blk",
    )
    b = blocked.filter(F.col("c_custkey") < 0).select(
        F.col("c_custkey").alias("dirty_key"),
        F.col("c_name").alias("nb"),
        F.col("blk").alias("blk_b"),
    )
    return (
        a.join(b, a["blk"] == b["blk_b"])
        .withColumn("dist", F.levenshtein("na", "nb"))
        .filter(F.col("dist") <= 1)
        .select(
            "clean_key", "dirty_key", F.col("dist").cast("int").alias("dist")
        )
        .orderBy("clean_key", "dirty_key")
    )


# ---------------------------------------------------------------- q240
_SN_WINDOW = 3


@register(
    "q240_sorted_neighborhood",
    f"""
    WITH u AS ({_DIRTY_SQL}),
    ranked AS (
        SELECT c_custkey, c_name,
               ROW_NUMBER() OVER (
                   ORDER BY replace(c_name, '0', ''), c_custkey) AS rk
        FROM u
    )
    SELECT CAST(a.c_custkey AS BIGINT) AS clean_key,
           CAST(b.c_custkey AS BIGINT) AS dirty_key,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM ranked a JOIN ranked b
      ON b.rk BETWEEN a.rk - {_SN_WINDOW} AND a.rk + {_SN_WINDOW}
     AND a.c_custkey >= 0 AND b.c_custkey < 0
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY clean_key, dirty_key
    """,
    doc="Sorted-neighborhood record linkage: rank the dirty universe "
    "by a derived sort key (the zero-stripped name — corruption "
    f"variants collapse to the same key and sort adjacent), then "
    f"compare each clean record only to its +/-{_SN_WINDOW} rank "
    "neighbors — the window-shaped candidate generator: no exact "
    "blocking-key agreement needed downstream, only sort proximity, "
    "which is what lets SN catch near-misses a coarse hash block "
    "splits (recall is bounded by the window, the method's "
    "documented trade-off). Spark generates the neighborhood by "
    "exploding each record to its covering rank offsets and "
    "equi-joining on the offset — one shuffle, candidates bounded "
    "at 2w+1 per record, never all-pairs. The rank itself is the "
    "range-partitioned block-offset rank (operators/blockrank.py), "
    "so no step funnels one partition. "
    "Both engines verify every emitted pair <= 1 edit.",
)
def q240_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _dirty_customers(spark, sf_dir)
    # rank-domain work via the distributed block-offset rank (no
    # single-partition window even on a billion-record universe)
    ranked = prefix_rank(
        u,
        [(F.regexp_replace("c_name", "0", ""), "asc"), ("c_custkey", "asc")],
        alias="rk",
    )
    a = ranked.filter(F.col("c_custkey") >= 0).select(
        F.col("c_custkey").alias("clean_key"),
        F.col("c_name").alias("na"),
        F.col("rk").alias("rk_a"),
    )
    # each clean record covers ranks [rk-w, rk+w]; equi-joining on the
    # covered rank hits exactly the neighborhood
    cover = a.select(
        "clean_key",
        "na",
        F.explode(
            F.sequence(F.col("rk_a") - _SN_WINDOW, F.col("rk_a") + _SN_WINDOW)
        ).alias("rk_cov"),
    )
    b = ranked.filter(F.col("c_custkey") < 0).select(
        F.col("c_custkey").alias("dirty_key"),
        F.col("c_name").alias("nb"),
        F.col("rk").alias("rk_b"),
    )
    return (
        cover.join(b, cover["rk_cov"] == b["rk_b"])
        .withColumn("dist", F.levenshtein("na", "nb"))
        .filter(F.col("dist") <= 1)
        .select(
            "clean_key", "dirty_key", F.col("dist").cast("int").alias("dist")
        )
        .orderBy("clean_key", "dirty_key")
    )
