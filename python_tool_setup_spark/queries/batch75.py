"""Round-5 gates, batch 75: Fleiss' kappa (q354 — multi-rater
agreement, the n-rater generalization of q305's Cohen kappa: the
number a labeling-vendor QA report leads with) and cross-source
quantile normalization (q355 — map every source's feature
distribution onto the pooled distribution; the batch-effect
remover borrowed from bioinformatics that makes per-source length
distributions comparable before mixing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin, prefix_agg
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_R = 3  # raters


def _label_sql(j: str) -> str:
    return (
        f"CASE WHEN (n_chars > 500) != "
        f"(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || {j}), "
        f"1, 15)) AS BIGINT) % 10 = 0) THEN 1 ELSE 0 END"
    )


# ---------------------------------------------------------------- q354
@register(
    "q354_fleiss_kappa",
    f"""
    WITH labels AS (
        SELECT doc_id, {_label_sql('j')} AS y
        FROM documents, generate_series(0, {_R - 1}) AS t(j)
    ),
    per_item AS (
        SELECT doc_id, SUM(y) AS n1, {_R} - SUM(y) AS n0 FROM labels
        GROUP BY doc_id
    ),
    s AS (
        SELECT COUNT(*) AS n,
               SUM(n1 * (n1 - 1) + n0 * (n0 - 1)) AS pi_numer,
               SUM(n1) AS s1
        FROM per_item
    )
    SELECT CAST(n AS BIGINT) AS n_items,
           CAST({_R} AS BIGINT) AS n_raters,
           CAST(pi_numer AS BIGINT) AS pi_numer,
           CAST(ROUND(CAST(pi_numer AS DOUBLE)
               / (CAST(n AS DOUBLE) * {_R * (_R - 1)}) * 1000000.0)
               AS BIGINT) AS po_micro,
           CAST(ROUND(((CAST(s1 AS DOUBLE) / (n * {_R}))
                       * (CAST(s1 AS DOUBLE) / (n * {_R}))
                     + (1.0 - CAST(s1 AS DOUBLE) / (n * {_R}))
                       * (1.0 - CAST(s1 AS DOUBLE) / (n * {_R})))
               * 1000000.0) AS BIGINT) AS pe_micro,
           CAST(ROUND(
               (CAST(pi_numer AS DOUBLE) / (CAST(n AS DOUBLE) * {_R * (_R - 1)})
                - ((CAST(s1 AS DOUBLE) / (n * {_R}))
                   * (CAST(s1 AS DOUBLE) / (n * {_R}))
                 + (1.0 - CAST(s1 AS DOUBLE) / (n * {_R}))
                   * (1.0 - CAST(s1 AS DOUBLE) / (n * {_R}))))
               / (1.0
                - ((CAST(s1 AS DOUBLE) / (n * {_R}))
                   * (CAST(s1 AS DOUBLE) / (n * {_R}))
                 + (1.0 - CAST(s1 AS DOUBLE) / (n * {_R}))
                   * (1.0 - CAST(s1 AS DOUBLE) / (n * {_R}))))
               * 1000000.0) AS BIGINT) AS kappa_micro
    FROM s
    """,
    doc="Fleiss' kappa over 3 deterministic synthetic raters (each "
    "rater = the length-based label with an independent "
    "md5-derandomized 10% flip — the q95 derandomization "
    "convention, so both engines reproduce the same panel): "
    "per-item agreement numerators n1(n1-1)+n0(n0-1) stay "
    "integers through the sum, Po and Pe assemble from the two "
    "integer totals with identical double expressions (squares "
    "written as products, never pow), kappa quantized once at "
    "the end. The n-rater generalization of q305's Cohen kappa. "
    "Scale: one groupBy per item then a 1-row reduce.",
)
def q354_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    flips = [
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("doc_id").cast("string"), F.lit(f"|{j}")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 10
            == 0
        )
        for j in range(_R)
    ]
    base = F.col("n_chars") > 500
    labels = [
        F.when(base != flip, 1).otherwise(0) for flip in flips
    ]
    per_item = d.select(
        sum(labels[1:], labels[0]).alias("n1")
    ).select("n1", (F.lit(_R) - F.col("n1")).alias("n0"))
    s = per_item.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.col("n1") * (F.col("n1") - 1) + F.col("n0") * (F.col("n0") - 1)
        ).alias("pi_numer"),
        F.sum("n1").alias("s1"),
    )
    nd = F.col("n").cast("double")
    po = F.col("pi_numer").cast("double") / (nd * (_R * (_R - 1)))
    p1 = F.col("s1").cast("double") / (F.col("n") * _R)
    pe = p1 * p1 + (1.0 - p1) * (1.0 - p1)
    return s.select(
        F.col("n").cast("long").alias("n_items"),
        F.lit(_R).cast("long").alias("n_raters"),
        F.col("pi_numer").cast("long").alias("pi_numer"),
        F.round(po * 1000000.0).cast("long").alias("po_micro"),
        F.round(pe * 1000000.0).cast("long").alias("pe_micro"),
        F.round((po - pe) / (1.0 - pe) * 1000000.0)
        .cast("long")
        .alias("kappa_micro"),
    )


# ---------------------------------------------------------------- q355
@register(
    "q355_quantile_normalization",
    """
    WITH hist AS (
        SELECT n_chars AS v, COUNT(*) AS cnt FROM documents GROUP BY v
    ),
    cum AS (
        SELECT v, SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
               AS c FROM hist
    ),
    tot AS (SELECT COUNT(*) AS big_n FROM documents),
    ranked AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY n_chars, doc_id) AS r,
               COUNT(*) OVER (PARTITION BY source) AS ns
        FROM documents
    ),
    mapped AS (
        SELECT source, n_chars,
               (SELECT MIN(v) FROM cum
                WHERE c >= (r * big_n + ns - 1) // ns) AS norm_v
        FROM ranked, tot
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_raw,
           CAST(SUM(norm_v) AS BIGINT) AS sum_norm,
           CAST(ROUND(CAST(SUM(norm_v) AS DOUBLE) / COUNT(*) * 1000.0)
               AS BIGINT) AS mean_norm_milli
    FROM mapped GROUP BY source ORDER BY source
    """,
    doc="Cross-source quantile normalization (the batch-effect "
    "remover: replace each row's value by the POOLED distribution's "
    "order statistic at the row's within-source quantile, so every "
    "source ends up with the same marginal distribution before "
    "mixing — bioinformatics' microarray trick applied to corpus "
    "length balancing): within-source ranks via windows PARTITIONED "
    "by source, pooled index ceil(r*N/ns) in exact integer "
    "arithmetic, the pooled order statistic looked up by a range "
    "join against the distinct-value CDF built with the "
    "block-offset prefix (broadcast metadata — no global window, "
    "no row sort). r*N reaches ~2.5e7 at sf0.01 and ~2.5e13 at "
    "sf1 — long-safe; DECIMAL(38,0) at 1e10+ rows. Scale: one "
    "shuffle on source + a histogram join.",
)
def q355_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Narrow 3-column base read by the value histogram, the grand
    # count AND the per-source rank window: pin it so documents is
    # scanned once.
    d = pin(
        load_table(spark, sf_dir, "documents").select(
            "source", "n_chars", "doc_id"
        )
    )
    hist = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cum = prefix_agg(hist, [("v", "asc")], {"before": ("sum", "cnt")}).select(
        "v", "before", (F.col("before") + F.col("cnt")).alias("c")
    )
    tot = d.agg(F.count(F.lit(1)).alias("big_n"))
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ws = Window.partitionBy("source")
    ranked = d.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(ws).alias("ns"),
    ).crossJoin(F.broadcast(tot))
    idx = F.expr("div(r * big_n + ns - 1, ns)")
    mapped = ranked.withColumn("idx", idx).join(
        F.broadcast(cum),
        (F.col("before") < F.col("idx")) & (F.col("idx") <= F.col("c")),
    )
    return (
        mapped.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_raw"),
            F.sum("v").alias("sum_norm"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("sum_raw").cast("long").alias("sum_raw"),
            F.col("sum_norm").cast("long").alias("sum_norm"),
            F.round(
                F.col("sum_norm").cast("double") / F.col("n_docs") * 1000.0
            )
            .cast("long")
            .alias("mean_norm_milli"),
        )
        .orderBy("source")
    )
