"""Round-5 gates, batch 131: front-coding advisor (q473 — the
third member of the encoding-advisor trilogy: q460 delta-encodes
sorted integers, q468 dictionary-encodes low-cardinality strings,
q473 measures incremental PREFIX compression for sorted
high-cardinality strings — Parquet's DELTA_BYTE_ARRAY and every
sorted string index block) and per-group reservoir sampling (q474
— a deterministic fixed-k uniform sample per group via hash-rank
top-k: the bounded-memory per-stratum sample every profiler and
debugger pulls, made reproducible and oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from python_tool_setup_spark.operators.blockrank import pin, prefix_rank
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


@register(
    "q473_front_coding_advisor",
    """
    WITH vals AS (
        SELECT DISTINCT p_name AS v FROM part
    ),
    ranked AS (
        SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS r FROM vals
    ),
    pairs AS (
        SELECT cur.v AS v,
               CASE WHEN prev.v IS NULL THEN 0
                    ELSE len(list_filter(
                        range(1, least(length(cur.v),
                                       length(prev.v)) + 1),
                        i -> cur.v[1:i] = prev.v[1:i])) END AS lcp
        FROM ranked cur
        LEFT JOIN ranked prev ON prev.r = cur.r - 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(LENGTH(v)) AS BIGINT) AS plain_bytes,
           CAST(SUM(LENGTH(v) - lcp + 1) AS BIGINT) AS coded_bytes,
           CAST(ROUND(1e6 * (SUM(LENGTH(v))
               - SUM(LENGTH(v) - lcp + 1))
               / SUM(LENGTH(v))) AS BIGINT) AS savings_ppm,
           SUM(LENGTH(v) - lcp + 1) * 10 <= SUM(LENGTH(v)) * 9
               AS recommend_front_coding
    FROM pairs
    """,
    doc="Front-coding advisor (incremental prefix compression for "
    "SORTED string dictionaries — Parquet DELTA_BYTE_ARRAY, "
    "sorted index blocks: each value stores the shared-prefix "
    "length with its predecessor plus the suffix; completes the "
    "measured-encoding trilogy with q460 delta-ints and q468 "
    "dict-strings): distinct values ranked in sort order with "
    "the block-offset ranking (no global window Spark-side), "
    "consecutive pairs joined on rank, the longest common "
    "prefix computed by a higher-order lambda (count of i where "
    "prefix-i matches — exact because prefix equality is "
    "monotone), coded bytes = suffix + 1 length byte, and the "
    "recommendation cross-multiplied at a 10% floor. Scale: one "
    "distinct shuffle + one equi-join on adjacent ranks over "
    "the VALUE dictionary, not the rows; the lambda is JVM-side "
    "codegen, no UDF.",
)
def q473_front_coding_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    vals = p.select(F.col("p_name").alias("v")).distinct()
    # Ranked values feed BOTH self-join sides: pin so the rank
    # machinery runs once.
    ranked = pin(prefix_rank(vals, [("v", "asc")], alias="r"))
    cur = ranked.alias("cur")
    prev = ranked.select(
        F.col("v").alias("pv"), (F.col("r") + 1).alias("pr")
    ).alias("prev")
    pairs = cur.join(prev, F.col("cur.r") == F.col("prev.pr"), "left").select(
        F.col("cur.v").alias("v"),
        F.when(F.col("pv").isNull(), F.lit(0))
        .otherwise(
            F.expr(
                "size(filter(sequence(1, least(length(v), length(pv))),"
                " i -> substring(v, 1, i) = substring(pv, 1, i)))"
            )
        )
        .alias("lcp"),
    )
    plain = F.sum(F.length("v"))
    coded = F.sum(F.length("v") - F.col("lcp") + 1)
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_values"),
        plain.cast("long").alias("plain_bytes"),
        coded.cast("long").alias("coded_bytes"),
        F.round(F.lit(1e6) * (plain - coded) / plain)
        .cast("long")
        .alias("savings_ppm"),
        (coded * 10 <= plain * 9).alias("recommend_front_coding"),
    )


# ---------------------------------------------------------------- q474
_RES_K = 5
_RES_MULT = 2654435761
_RES_SPACE = 1 << 32


@register(
    "q474_reservoir_sample_per_group",
    f"""
    WITH keyed AS (
        SELECT o_orderpriority AS grp, o_orderkey,
               (o_orderkey * {_RES_MULT}) % {_RES_SPACE} AS hk
        FROM orders
    ),
    ranked AS (
        SELECT grp, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY grp
                   ORDER BY hk, o_orderkey) AS r
        FROM keyed
    )
    SELECT grp, CAST(r AS BIGINT) AS r,
           CAST(o_orderkey AS BIGINT) AS o_orderkey
    FROM ranked WHERE r <= {_RES_K}
    ORDER BY grp, r
    """,
    doc="Per-group reservoir sampling (a fixed-k uniform sample from "
    "every group in one pass — the per-stratum peek behind data "
    "profiling, debugging, and labeling budgets): each row gets "
    "a deterministic pseudo-random key (multiplicative hash of "
    "the order key), and the k smallest keys per group are the "
    "sample — exactly Efraimidis-Spirtsos A-Res with a "
    "reproducible generator, so the oracle pins the SAME sample. "
    "The per-group top-k runs as a PARTITIONED window (group "
    "cardinality bounds the partition count, no global window); "
    "at 100 TB the same plan holds because rank <= k prunes "
    "map-side via WindowGroupLimit pushdown. Scale: one shuffle "
    "on the group key; k and |groups| bound the output.",
)
def q474_reservoir_sample_per_group(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    keyed = o.select(
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
        ((F.col("o_orderkey") * _RES_MULT) % _RES_SPACE).alias("hk"),
    )
    w = Window.partitionBy("grp").orderBy("hk", "o_orderkey")
    return (
        keyed.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _RES_K)
        .select(
            "grp",
            F.col("r").cast("long").alias("r"),
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
        )
        .orderBy("grp", "r")
    )
