"""Round-4 gates, batch 43: order-insensitive table fingerprinting
(q291) — the cross-system replication check: two tables are
content-equal iff their fingerprints match, computable without
sorting, shipping, or comparing rows, and ADDITIVE so partitions
fingerprint independently and merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_FP_MOD = 2**61 - 1  # Mersenne prime: sums never overflow a BIGINT


def row_fingerprint(cols: list[str]) -> F.Column:
    """Canonical per-row hash: md5 of the '|'-joined string forms
    (NULL -> chr(1) sentinel), reduced mod a Mersenne prime. md5 keeps
    it engine-independent (q95's convention), the modulus keeps the
    SUM inside BIGINT on any row count."""
    canon = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("\x01")) for c in cols]
    )
    return F.pmod(
        F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long"),
        F.lit(_FP_MOD),
    )


def table_fingerprint(df: DataFrame, cols: list[str]) -> F.Column:
    """Order-insensitive content fingerprint: SUM of row hashes mod the
    Mersenne prime. Commutative/associative -> partitions fingerprint
    independently and merge (one partial aggregate, no sort, no
    shuffle of data rows); equal multisets of rows => equal
    fingerprints, and a single changed row flips it with probability
    1 - 2^-61. The sum runs in DECIMAL(38,0) (row hashes reach 2^61,
    so a BIGINT sum overflows past ~4 rows under ANSI mode)."""
    return F.pmod(
        F.sum(row_fingerprint(cols).cast("decimal(38,0)")),
        F.lit(_FP_MOD).cast("decimal(38,0)"),
    ).cast("long")


# ---------------------------------------------------------------- q291
@register(
    "q291_table_fingerprint",
    f"""
    WITH rows_ AS (
        SELECT CAST(('0x' || substr(md5(
                   CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus
                   || '|' || CAST(ROUND(o_totalprice, 2) AS VARCHAR)
               ), 1, 15)) AS BIGINT) % {_FP_MOD} AS h,
               o_orderkey % 2 = 0 AS even
        FROM orders
    )
    SELECT CAST(SUM(h) % {_FP_MOD} AS BIGINT) AS fp,
           CAST((SUM(CASE WHEN even THEN h ELSE 0 END) % {_FP_MOD}
                 + SUM(CASE WHEN NOT even THEN h ELSE 0 END) % {_FP_MOD})
                % {_FP_MOD} AS BIGINT) AS fp_merged,
           TRUE AS additive,
           TRUE AS mutation_detected
    FROM rows_
    """,
    doc="Order-insensitive table FINGERPRINT — the cross-system "
    "replication check (is the copied/migrated/restated table "
    "content-identical?) that needs no sort, no row shipping, no "
    "side-by-side diff: each row hashes via md5 of its canonical "
    "'|'-joined string form (NULL sentinel distinct from empty "
    "string), and the table fingerprint is the SUM mod a Mersenne "
    "prime — commutative, so partitions fingerprint independently "
    "and MERGE (the gate proves additivity: fingerprinting the even "
    "and odd halves separately and combining equals the whole-table "
    "fingerprint), and a single mutated row flips it (the gate "
    "re-fingerprints a copy with one balance changed and pins the "
    "mismatch). md5 canonicalization makes it engine-independent — "
    "the DuckDB oracle computes the identical fp, which is exactly "
    "the cross-engine use case. At 100 TB: one partial aggregate, "
    "scan-bound, zero shuffle of data rows.",
)
def q291_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("p2"),
    )
    canon_cols = ["o_orderkey", "o_orderstatus", "p2"]
    whole = o.agg(table_fingerprint(o, canon_cols).alias("fp"))
    halves = (
        o.withColumn("even", F.col("o_orderkey") % 2 == 0)
        .groupBy("even")
        .agg(table_fingerprint(o, canon_cols).alias("hfp"))
        .agg(
            F.pmod(
                F.sum(F.col("hfp").cast("decimal(38,0)")),
                F.lit(_FP_MOD).cast("decimal(38,0)"),
            )
            .cast("long")
            .alias("fp_merged")
        )
    )
    mutated = o.withColumn(
        "p2",
        F.when(F.col("o_orderkey") == 7, F.col("p2") + 1).otherwise(
            F.col("p2")
        ),
    )
    mfp = mutated.agg(table_fingerprint(mutated, canon_cols).alias("mfp"))
    return (
        whole.crossJoin(F.broadcast(halves))
        .crossJoin(F.broadcast(mfp))
        .select(
            F.col("fp").cast("bigint").alias("fp"),
            F.col("fp_merged").cast("bigint").alias("fp_merged"),
            (F.col("fp") == F.col("fp_merged")).alias("additive"),
            (F.col("fp") != F.col("mfp")).alias("mutation_detected"),
        )
    )
