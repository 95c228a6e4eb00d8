"""Round-4 gates, batch 61: character-entropy quality filter (q327 —
the gibberish/degenerate-text detector working BELOW the token
level, beside q297's bigram repetition and q33's surface stats) and
longest consecutive-active-day streak (q328 — the gaps-and-islands
classic as an engagement metric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q327
@register(
    "q327_char_entropy",
    """
    WITH chars AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch
        FROM documents
    ),
    hist AS (
        SELECT doc_id, ch, COUNT(*) AS n
        FROM chars WHERE ch <> '' GROUP BY doc_id, ch
    ),
    tot AS (
        SELECT doc_id, ch, n, SUM(n) OVER (PARTITION BY doc_id) AS t
        FROM hist
    ),
    terms AS (
        SELECT doc_id, t,
               CAST(ROUND(-(CAST(n AS DOUBLE) / CAST(t AS DOUBLE))
                   * ln(CAST(n AS DOUBLE) / CAST(t AS DOUBLE))
                   * 1000000000.0) AS BIGINT) AS h_nano
        FROM tot
    ),
    per_doc AS (
        SELECT doc_id, MAX(t) AS n_chars_counted,
               SUM(h_nano) AS entropy_nano
        FROM terms GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_chars_counted AS BIGINT) AS n_chars_counted,
           CAST(entropy_nano AS BIGINT) AS entropy_nano,
           entropy_nano < 2500000000 AS flagged_low_entropy
    FROM per_doc ORDER BY doc_id
    """,
    doc="Character-level Shannon entropy per document (the "
    "gibberish / degenerate-generation detector BELOW the token "
    "level — aaaa-floods, base64 blobs and keyboard mash all "
    "have abnormal char entropy even when token-level stats "
    "(q33/q297) look fine; natural English sits near 4.1 "
    "nats... bits aside, the gate uses nats): per-doc char "
    "histogram in one (doc, char) groupBy, entropy terms "
    "-p*ln(p) quantized to nano PER CELL before the per-doc "
    "integer sum (1-ulp posture), docs under 2.5 nats flagged. "
    "Scale: the char explode multiplies rows by doc length but "
    "collapses immediately into the (doc, char) cells — state is "
    "bounded by alphabet size per doc, and everything rides one "
    "doc-key shuffle.",
)
def q327_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.col("ch") != "")
    hist = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("n"))
    tot = hist.select(
        "doc_id",
        "n",
        F.sum("n").over(Window.partitionBy("doc_id")).alias("t"),
    )
    p = F.col("n").cast("double") / F.col("t").cast("double")
    terms = tot.select(
        "doc_id",
        "t",
        F.round(-p * F.log(p) * 1000000000.0).cast("long").alias("h_nano"),
    )
    per_doc = terms.groupBy("doc_id").agg(
        F.max("t").cast("long").alias("n_chars_counted"),
        F.sum("h_nano").cast("long").alias("entropy_nano"),
    )
    return per_doc.select(
        "doc_id",
        "n_chars_counted",
        "entropy_nano",
        (F.col("entropy_nano") < 2500000000).alias("flagged_low_entropy"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------- q328
@register(
    "q328_longest_streak",
    """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    islands AS (
        SELECT user_id, d,
               date_diff('day', DATE '2024-01-01', d)
                   - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                   AS grp
        FROM days
    ),
    streaks AS (
        SELECT user_id, grp, COUNT(*) AS len,
               MIN(d) AS streak_start
        FROM islands GROUP BY user_id, grp
    ),
    best AS (
        SELECT user_id, len, streak_start,
               ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY len DESC, streak_start) AS rk
        FROM streaks
    )
    SELECT user_id, CAST(len AS BIGINT) AS longest_streak_days,
           streak_start
    FROM best WHERE rk = 1 ORDER BY user_id
    """,
    doc="Longest consecutive-active-day streak per user (the "
    "engagement metric product dashboards headline; the "
    "gaps-and-islands pattern q120's span dedup uses, applied to "
    "calendar days): distinct active days, island id = day-index "
    "minus per-user row_number (constant within a consecutive "
    "run — pure integer arithmetic), streak lengths from one "
    "groupBy, per-user argmax with earliest-start tiebreak so "
    "the answer is deterministic. Scale: everything is "
    "partitioned by user and rides the same user-key shuffle; "
    "distinct-day state is bounded by the calendar.",
)
def q328_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.select(
        "user_id",
        "d",
        (
            F.datediff(F.col("d"), F.lit("2024-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("grp"),
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"), F.min("d").alias("streak_start")
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), "streak_start"
    )
    best = streaks.withColumn("rk", F.row_number().over(wb))
    return (
        best.filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("len").cast("long").alias("longest_streak_days"),
            "streak_start",
        )
        .orderBy("user_id")
    )
