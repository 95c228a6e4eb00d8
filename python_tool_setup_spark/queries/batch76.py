"""Round-5 gates, batch 76: interval self-overlap sweep (q356 — the
endpoint-sweep primitive: how much wall-clock time does each user
spend with 1+ / 2+ of their 5-minute activity intervals open; the
billing/concurrency question behind session stitching) and
train-vs-val n-gram novelty (q357 — what fraction of the val
split's 3-grams never occur in train: the contamination complement
that says how HARD the held-out set is, pairing q222's token OOV
at the phrase level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_IV_SEC = 300  # interval length per event


# ---------------------------------------------------------------- q356
@register(
    "q356_interval_overlap",
    f"""
    WITH pts AS (
        SELECT user_id,
               date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
                   AS t, 1 AS delta, event_id
        FROM events
        UNION ALL
        SELECT user_id,
               date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
                   + {_IV_SEC} AS t, -1 AS delta, event_id
        FROM events
    ),
    swept AS (
        SELECT user_id, t,
               SUM(delta) OVER (PARTITION BY user_id
                   ORDER BY t, delta DESC, event_id
                   ROWS UNBOUNDED PRECEDING) AS active,
               LEAD(t) OVER (PARTITION BY user_id
                   ORDER BY t, delta DESC, event_id) AS nxt
        FROM pts
    ),
    per_user AS (
        SELECT user_id,
               SUM(CASE WHEN active >= 1 THEN nxt - t ELSE 0 END)
                   AS covered_sec,
               SUM(CASE WHEN active >= 2 THEN nxt - t ELSE 0 END)
                   AS overlap_sec
        FROM swept WHERE nxt IS NOT NULL GROUP BY user_id
    )
    SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(covered_sec) AS BIGINT) AS covered_sec,
           CAST(SUM(overlap_sec) AS BIGINT) AS overlap_sec,
           CAST(ROUND(CAST(SUM(overlap_sec) AS DOUBLE)
               / CAST(SUM(covered_sec) AS DOUBLE) * 1000000.0) AS BIGINT)
               AS overlap_share_micro
    FROM per_user GROUP BY user_id % 10 ORDER BY user_bucket
    """,
    doc="Interval self-overlap via the classic endpoint sweep (each "
    "event opens a 5-minute interval; +1/-1 endpoint deltas, a "
    "running active count, and segment durations between "
    "consecutive endpoints give exact seconds spent with >=1 and "
    ">=2 intervals open — the concurrency/billing primitive that "
    "generalizes q272's gap sessions): all windows PARTITIONED by "
    "user (per-user sweeps are independent — embarrassingly "
    "parallel at 100 TB), epoch-second integers end to end, "
    "zero-length tie segments contribute 0 under any tie order so "
    "the (t, delta DESC, event_id) total order is engine-stable. "
    "Output grouped to 10 user buckets.",
)
def q356_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t = F.col("ts").cast("long")
    starts = ev.select(
        "user_id", t.alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    ends = ev.select(
        "user_id",
        (t + _IV_SEC).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    pts = starts.unionByName(ends)
    w = Window.partitionBy("user_id").orderBy(
        "t", F.col("delta").desc(), "event_id"
    )
    swept = pts.select(
        "user_id",
        "t",
        F.sum("delta").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "active"
        ),
        F.lead("t").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    seg = F.col("nxt") - F.col("t")
    per_user = swept.groupBy("user_id").agg(
        F.sum(F.when(F.col("active") >= 1, seg).otherwise(0)).alias(
            "covered_sec"
        ),
        F.sum(F.when(F.col("active") >= 2, seg).otherwise(0)).alias(
            "overlap_sec"
        ),
    )
    return (
        per_user.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("covered_sec").alias("covered_sec"),
            F.sum("overlap_sec").alias("overlap_sec"),
        )
        .select(
            F.col("user_bucket").cast("long").alias("user_bucket"),
            F.col("n_users").cast("long").alias("n_users"),
            F.col("covered_sec").cast("long").alias("covered_sec"),
            F.col("overlap_sec").cast("long").alias("overlap_sec"),
            F.round(
                F.col("overlap_sec").cast("double")
                / F.col("covered_sec").cast("double")
                * 1000000.0
            )
            .cast("long")
            .alias("overlap_share_micro"),
        )
        .orderBy("user_bucket")
    )


# ---------------------------------------------------------------- q357
@register(
    "q357_ngram_novelty",
    """
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                          1, 8)) AS BIGINT) % 10000 < 1000
                    THEN 'val' ELSE 'train' END AS split,
               arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
             generate_series(1, 1000) AS t(i)
        WHERE i + 2 <= len(arr)
    ),
    train_g AS (SELECT DISTINCT g FROM toks WHERE split = 'train'),
    val_g AS (
        SELECT g, COUNT(*) AS occ FROM toks WHERE split = 'val' GROUP BY g
    ),
    j AS (
        SELECT v.g, v.occ,
               CASE WHEN t.g IS NULL THEN 1 ELSE 0 END AS novel
        FROM val_g v LEFT JOIN train_g t ON v.g = t.g
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS val_distinct_ngrams,
           CAST(SUM(occ) AS BIGINT) AS val_ngram_occurrences,
           CAST(SUM(novel) AS BIGINT) AS novel_distinct,
           CAST(SUM(novel * occ) AS BIGINT) AS novel_occurrences,
           CAST(ROUND(CAST(SUM(novel) AS DOUBLE) / COUNT(*) * 1000000.0)
               AS BIGINT) AS novelty_distinct_micro,
           CAST(ROUND(CAST(SUM(novel * occ) AS DOUBLE) / SUM(occ)
               * 1000000.0) AS BIGINT) AS novelty_occurrence_micro
    FROM j
    """,
    doc="Train-vs-val 3-gram novelty (the contamination COMPLEMENT: "
    "q259 hunts val n-grams that DID leak into train, this "
    "measures how much of val is genuinely unseen — a held-out "
    "set whose phrases all appear in train tests memorization, "
    "not generalization): the md5-bucket split convention "
    "(q95/q222), 3-gram shingling shared with q333, distinct "
    "train n-grams left-anti-probe the val side, novelty reported "
    "both by distinct type and by occurrence mass. Scale: one "
    "shingle pass, one distinct per split, one hash join on the "
    "n-gram — identical shape to the dedup family.",
)
def q357_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.llm.pipeline import train_val_test_split

    d = load_table(spark, sf_dir, "documents")
    split_docs = train_val_test_split(
        d, "doc_id", val_frac=0.10, test_frac=0.0
    )
    # build 3-grams with lead over per-doc position windows
    toks = split_docs.select(
        "doc_id", "split", F.posexplode(F.split("text", " ")).alias("i", "w")
    )
    wd = Window.partitionBy("doc_id").orderBy("i")
    gram = F.concat_ws(
        " ", F.col("w"), F.lead("w", 1).over(wd), F.lead("w", 2).over(wd)
    )
    # The 3-gram stream feeds the train-distinct AND val-count sides
    # with different filters (no plan identity, no stage reuse): pin it
    # so the tokenize + position window run once.
    grams = pin(
        toks.select(
            "split",
            F.when(F.lead("w", 2).over(wd).isNotNull(), gram).alias("g"),
        ).filter(F.col("g").isNotNull())
    )
    train_g = grams.filter(F.col("split") == "train").select("g").distinct()
    val_g = (
        grams.filter(F.col("split") == "val")
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    j = val_g.join(
        train_g.withColumn("_seen", F.lit(1)), "g", "left"
    ).select(
        "occ", F.when(F.col("_seen").isNull(), 1).otherwise(0).alias("novel")
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("val_distinct_ngrams"),
        F.sum("occ").cast("long").alias("val_ngram_occurrences"),
        F.sum("novel").cast("long").alias("novel_distinct"),
        F.sum(F.col("novel") * F.col("occ"))
        .cast("long")
        .alias("novel_occurrences"),
        F.round(
            F.sum("novel").cast("double")
            / F.count(F.lit(1)).cast("double")
            * 1000000.0
        )
        .cast("long")
        .alias("novelty_distinct_micro"),
        F.round(
            F.sum(F.col("novel") * F.col("occ")).cast("double")
            / F.sum("occ").cast("double")
            * 1000000.0
        )
        .cast("long")
        .alias("novelty_occurrence_micro"),
    )
