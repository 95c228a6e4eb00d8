"""Round-5 gates, batch 107: PII density profiling (q421 — how many
email/phone-shaped tokens per kilobyte each source ships: the
exposure HEAT MAP that decides where q82's redaction pass must run
first), a consistent-hashing rebalance audit (q422 — key movement
when a 16-shard md5 ring grows to 17: measured against the 1/17
theory, the resharding-cost evidence behind q69's shard packing),
and a Bloom-filter sizing advisor (q423 — optimal bits/hashes for
the measured key cardinality at several target false-positive
rates: the closed-form design table behind q111/q350's bloom
joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+"
_PHONE = "[0-9]{3}-[0-9]{3,4}-[0-9]{4}"
_SHARDS = 16
_FPPS = [(1, 100), (1, 1000), (1, 10000)]  # fpp as exact fractions


# ---------------------------------------------------------------- q421
@register(
    "q421_pii_density_profile",
    f"""
    WITH per_doc AS (
        SELECT source,
               n_chars,
               len(regexp_extract_all(lower(text), '{_EMAIL}'))
                   AS n_email,
               len(regexp_extract_all(lower(text), '{_PHONE}'))
                   AS n_phone
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_email) AS BIGINT) AS emails,
           CAST(SUM(n_phone) AS BIGINT) AS phones,
           CAST(SUM(CASE WHEN n_email + n_phone > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS docs_with_pii,
           CAST(ROUND(1e6 * (SUM(n_email) + SUM(n_phone))
               / (SUM(n_chars) / 1024e0)) AS BIGINT) AS pii_per_kb_micro
    FROM per_doc GROUP BY source ORDER BY source
    """,
    doc="PII density heat map per source (email/phone-shaped token "
    "counts per kilobyte — the exposure PROFILE that priorities "
    "q82's redaction pass and the disclosure a data card (q270) "
    "should carry; q82 removes PII, this measures where it "
    "concentrates): one scan, two conservative regex extracts "
    "per document (identical char-class patterns in both "
    "engines — no engine-specific regex syntax), density as an "
    "integer-count over kB ratio. Scale: embarrassingly "
    "parallel scan; the regexes are the cost, paid once per "
    "document.",
)
def q421_pii_density_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    per_doc = d.select(
        "source",
        "n_chars",
        F.size(F.regexp_extract_all(low, F.lit(_EMAIL), 0)).alias("n_email"),
        F.size(F.regexp_extract_all(low, F.lit(_PHONE), 0)).alias("n_phone"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_email").cast("long").alias("emails"),
            F.sum("n_phone").cast("long").alias("phones"),
            F.sum(
                F.when(F.col("n_email") + F.col("n_phone") > 0, 1).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("docs_with_pii"),
            F.round(
                F.lit(1e6)
                * (F.sum("n_email") + F.sum("n_phone"))
                / (F.sum("n_chars") / F.lit(1024.0))
            )
            .cast("long")
            .alias("pii_per_kb_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------- q422
@register(
    "q422_consistent_hash_rebalance",
    f"""
    WITH keys AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('shard|' ||
                   CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM documents
    ),
    assign AS (
        SELECT doc_id, h % {_SHARDS} AS s16, h % {_SHARDS + 1} AS s17
        FROM keys
    ),
    moves AS (
        SELECT s16, COUNT(*) AS n,
               SUM(CASE WHEN s16 <> s17 THEN 1 ELSE 0 END) AS moved
        FROM assign GROUP BY s16
    )
    SELECT CAST(s16 AS BIGINT) AS shard,
           CAST(n AS BIGINT) AS n_keys,
           CAST(moved AS BIGINT) AS moved_keys,
           CAST(ROUND(1e6 * moved / n) AS BIGINT) AS moved_share_micro
    FROM moves ORDER BY s16
    """,
    doc=f"Consistent-hashing rebalance audit: md5-derandomized keys "
    f"assigned to {_SHARDS} and {_SHARDS + 1} shards by modulo, "
    "per-shard movement measured — naive modulo sharding moves "
    f"~{_SHARDS}/{_SHARDS + 1} of ALL keys when a shard is added "
    "(the measured indictment), versus the ~1/17 a consistent "
    "ring moves; the evidence a resharding design review needs "
    "in numbers, beside q69's shard packing and q303's skew "
    "audit. Everything is integer md5 arithmetic — both engines "
    "agree exactly. Scale: one scan, shard-domain metadata out.",
)
def q422_consistent_hash_rebalance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("shard|"), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    assign = d.select(
        (h % _SHARDS).alias("s16"), (h % (_SHARDS + 1)).alias("s17")
    )
    return (
        assign.groupBy("s16")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("s16") != F.col("s17"), 1).otherwise(0)).alias(
                "moved"
            ),
        )
        .select(
            F.col("s16").cast("long").alias("shard"),
            F.col("n").cast("long").alias("n_keys"),
            F.col("moved").cast("long").alias("moved_keys"),
            F.round(F.lit(1e6) * F.col("moved") / F.col("n"))
            .cast("long")
            .alias("moved_share_micro"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------- q423
@register(
    "q423_bloom_sizing_advisor",
    f"""
    WITH card AS (
        SELECT COUNT(DISTINCT l_partkey) AS n FROM lineitem
    ),
    cfg AS (
        SELECT * FROM (VALUES {", ".join(f"({num}, {den})" for num, den in _FPPS)})
            AS t(fpp_num, fpp_den)
    )
    SELECT CAST(c.fpp_den AS BIGINT) AS one_in,
           CAST(card.n AS BIGINT) AS n_keys,
           CAST(CEIL(-1e0 * card.n
               * ln(CAST(c.fpp_num AS DOUBLE) / c.fpp_den)
               / (ln(2e0) * ln(2e0))) AS BIGINT) AS m_bits,
           CAST(GREATEST(1, ROUND(
               -1e0 * ln(CAST(c.fpp_num AS DOUBLE) / c.fpp_den) / ln(2e0)))
               AS BIGINT) AS k_hashes,
           CAST(ROUND(1e3 * CEIL(-1e0 * card.n
               * ln(CAST(c.fpp_num AS DOUBLE) / c.fpp_den)
               / (ln(2e0) * ln(2e0))) / card.n) AS BIGINT)
               AS bits_per_key_milli
    FROM cfg c, card ORDER BY one_in
    """,
    doc="Bloom-filter sizing advisor for the measured join-key "
    "cardinality (optimal m = -n ln p / ln^2 2 and k = -ln p / "
    "ln 2 at target fpp 1%/0.1%/0.01% — the design table behind "
    "q111's bloom join and q350's m-bounded bit table, computed "
    "from the ACTUAL distinct count instead of a guess): one "
    "distinct-count aggregate, then closed-form metadata math "
    "(fpp as exact integer fractions; ln of those fractions is "
    "the same libm call in both engines, milli/ceil applied to "
    "identical doubles). Scale: the distinct count is the only "
    "data-scale term.",
)
def q423_bloom_sizing_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    card = li.agg(F.count_distinct("l_partkey").alias("n"))
    cfg = spark.createDataFrame(_FPPS, ["fpp_num", "fpp_den"])
    ln2 = F.log(F.lit(2.0))
    lnp = F.log(F.col("fpp_num").cast("double") / F.col("fpp_den"))
    m_bits = F.ceil(
        F.lit(-1.0) * F.col("n") * lnp / (ln2 * ln2)
    ).cast("long")
    return (
        F.broadcast(cfg)
        .crossJoin(card)
        .select(
            F.col("fpp_den").cast("long").alias("one_in"),
            F.col("n").cast("long").alias("n_keys"),
            m_bits.alias("m_bits"),
            F.greatest(
                F.lit(1), F.round(F.lit(-1.0) * lnp / ln2).cast("long")
            )
            .cast("long")
            .alias("k_hashes"),
            F.round(F.lit(1e3) * m_bits / F.col("n"))
            .cast("long")
            .alias("bits_per_key_milli"),
        )
        .orderBy("one_in")
    )
