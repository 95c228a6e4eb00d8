"""Round-5 gates, batch 79: weighted Jaccard between the two biggest
sources (q362 — q312's set-Jaccard upgraded to occurrence mass:
Σ min(tf_A, tf_B) / Σ max — the similarity that notices one source
uses the shared vocabulary 100x more) and daily per-type value bands
(q363 — the p10/p50/p90 ribbon every ops dashboard draws, computed
EXACTLY per (day, type) via the shared histogram-percentile operator
q47 uses, so no group ever buffers its raw rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q362
@register(
    "q362_weighted_jaccard",
    """
    WITH ranked_sources AS (
        SELECT source, COUNT(*) AS n,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, source) AS rk
        FROM documents GROUP BY source
    ),
    a AS (SELECT source FROM ranked_sources WHERE rk = 1),
    b AS (SELECT source FROM ranked_sources WHERE rk = 2),
    toks AS (
        SELECT d.source, tok
        FROM documents d,
             UNNEST(regexp_split_to_array(lower(d.text), '[^a-z0-9]+'))
                 AS t(tok)
        WHERE tok <> ''
          AND (d.source = (SELECT source FROM a)
               OR d.source = (SELECT source FROM b))
    ),
    tf AS (
        SELECT tok,
               SUM(CASE WHEN source = (SELECT source FROM a)
                   THEN 1 ELSE 0 END) AS ta,
               SUM(CASE WHEN source = (SELECT source FROM b)
                   THEN 1 ELSE 0 END) AS tb
        FROM toks GROUP BY tok
    )
    SELECT (SELECT source FROM a) AS source_a,
           (SELECT source FROM b) AS source_b,
           CAST(SUM(LEAST(ta, tb)) AS BIGINT) AS inter_mass,
           CAST(SUM(GREATEST(ta, tb)) AS BIGINT) AS union_mass,
           CAST(ROUND(CAST(SUM(LEAST(ta, tb)) AS DOUBLE)
               / CAST(SUM(GREATEST(ta, tb)) AS DOUBLE) * 1000000.0)
               AS BIGINT) AS weighted_jaccard_micro
    FROM tf
    """,
    doc="Weighted Jaccard between the two largest sources' token "
    "frequency vectors (Σ min(tf) / Σ max(tf) — q312's set Jaccard "
    "weighted by occurrence mass, the corpus-mixing similarity "
    "that distinguishes 'share a vocabulary' from 'use it in the "
    "same proportions'): source pair pinned by the deterministic "
    "(count DESC, source) rank via distributed TakeOrdered shape, "
    "per-token frequencies in one conditional aggregate, exact "
    "integer masses with one final division. Scale: one tokenize "
    "pass over the two sources, one token groupBy.",
)
def q362_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    top2 = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "source")
        .limit(2)
        .select("source")
        .collect()
    )
    # two-row driver-side pin of the comparison pair (bounded metadata,
    # same class as scalar bounds)
    sa, sb = top2[0]["source"], top2[1]["source"]
    toks = (
        d.filter(F.col("source").isin(sa, sb))
        .select(
            "source",
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    tf = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("source") == sa, 1).otherwise(0)).alias("ta"),
        F.sum(F.when(F.col("source") == sb, 1).otherwise(0)).alias("tb"),
    )
    return tf.agg(
        F.lit(sa).alias("source_a"),
        F.lit(sb).alias("source_b"),
        F.sum(F.least("ta", "tb")).cast("long").alias("inter_mass"),
        F.sum(F.greatest("ta", "tb")).cast("long").alias("union_mass"),
        F.round(
            F.sum(F.least("ta", "tb")).cast("double")
            / F.sum(F.greatest("ta", "tb")).cast("double")
            * 1000000.0
        )
        .cast("long")
        .alias("weighted_jaccard_micro"),
    )


# ---------------------------------------------------------------- q363
@register(
    "q363_daily_value_bands",
    """
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(value, 0.1), 4) AS p10,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.9), 4) AS p90
    FROM events
    GROUP BY 1, 2 ORDER BY day, event_type
    """,
    doc="Daily p10/p50/p90 value bands per event type (the ops- "
    "dashboard ribbon: is today's median payment drifting, did "
    "the tail blow out) — computed EXACTLY through the shared "
    "histogram-percentile operator (operators/percentiles.py, "
    "same engine as q47): per-(day, type) distinct-value "
    "histograms, partitioned cumulative counts, straddling order "
    "statistics interpolated quantile_cont-style. No (day, type) "
    "group ever buffers raw rows — per-task state is the distinct "
    "VALUE histogram, which is what makes the same plan hold when "
    "one day holds a billion events. ROUND(4) on both engines.",
)
def q363_daily_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.operators.percentiles import (
        grouped_exact_percentiles,
    )

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.col("ts").cast("date").alias("d"), "event_type", "value"
    )
    pct = grouped_exact_percentiles(
        base, ["d", "event_type"], "value", {"p10": 0.1, "p50": 0.5, "p90": 0.9}
    )
    return pct.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("p10", 4).alias("p10"),
        F.round("p50", 4).alias("p50"),
        F.round("p90", 4).alias("p90"),
    ).orderBy("day", "event_type")
