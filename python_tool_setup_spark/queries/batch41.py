"""Round-4 gates, batch 41: stream-static LEFT ANTI join (q287 — the
live missing-dimension monitor; q126's stream-static inner join finds
matches, this surfaces the events that match NOTHING) and top-K
vocabulary churn between corpus snapshots (q288 — the lexical
complement of q261's distributional PSI).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q287
@register(
    "q287_stream_static_anti_join",
    """
    WITH ev AS (SELECT * FROM events WHERE user_id % 5 = 0),
    dim AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0)
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_orphans,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_orphan_users
    FROM ev e LEFT JOIN dim d ON e.user_id = d.c_custkey
    WHERE d.c_custkey IS NULL
    GROUP BY e.event_type ORDER BY e.event_type
    """,
    doc="Stream-static LEFT ANTI join — the live referential-integrity "
    "monitor (q126's stream-static INNER join enriches matches; this "
    "surfaces events whose user has NO dimension row — the orphan "
    "firehose that signals a broken upstream extract within one "
    "micro-batch instead of at the next batch reconciliation, the "
    "streaming half of q245's late-dimension parking): a replayed "
    "event stream anti-joins a static dimension slice per "
    "micro-batch and the orphan counts per event type are drained "
    "and pinned against the batch anti-join the oracle states. The "
    "static side broadcasts into every micro-batch (no stream-side "
    "state at all — anti join against a static relation is "
    "stateless), so at 100 TB/day this costs one broadcast per "
    "trigger and nothing accumulates.",
)
def q287_stream_static_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.queries.streaming import _drain
    from python_tool_setup_spark.staging import staging_dir

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 5 == 0)
        .select("user_id", "event_type")
    )
    src = staging_dir("ssaj_src_")
    ev.write.mode("append").parquet(src)
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 == 0)
        .select("c_custkey")
    )
    stream = spark.readStream.schema(ev.schema).parquet(src)
    orphans = stream.join(
        F.broadcast(dim), stream["user_id"] == dim["c_custkey"], "left_anti"
    )
    per_batch = orphans.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    drained = _drain(per_batch, "update")
    return (
        drained.groupBy("event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n_orphans"),
            F.countDistinct("user_id").cast("bigint").alias("n_orphan_users"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- q288
_CHURN_K = 200


@register(
    "q288_vocabulary_churn",
    f"""
    WITH toks AS (
        SELECT doc_id % 2 AS half, tok
        FROM documents,
             UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(tok)
        WHERE tok <> ''
    ),
    va AS (
        SELECT tok FROM (
            SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
            FROM toks WHERE half = 0 GROUP BY tok
        ) WHERE rk <= {_CHURN_K}
    ),
    vb AS (
        SELECT tok FROM (
            SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
            FROM toks WHERE half = 1 GROUP BY tok
        ) WHERE rk <= {_CHURN_K}
    )
    SELECT CAST((SELECT COUNT(*) FROM va JOIN vb USING (tok)) AS BIGINT)
               AS n_shared,
           CAST((SELECT COUNT(*) FROM va WHERE tok NOT IN
                     (SELECT tok FROM vb)) AS BIGINT) AS n_dropped,
           CAST((SELECT COUNT(*) FROM vb WHERE tok NOT IN
                     (SELECT tok FROM va)) AS BIGINT) AS n_new
    """,
    doc=f"Top-{_CHURN_K} vocabulary CHURN between corpus snapshots "
    "(even/odd doc halves as yesterday/today): how much of the "
    "high-frequency vocabulary survived, dropped out, or is new — "
    "the lexical drift signal q261's PSI (distributional) can't "
    "see: PSI stays flat when token LENGTHS hold steady while the "
    "actual words rotate (a crawl switching domains). Both "
    "vocabularies use the deterministic (count DESC, token ASC) "
    "rank from q222, so the set algebra is engine-exact. One "
    "tokenize pass, two bounded top-K vocabularies, set "
    "intersection/differences over 2x{_CHURN_K} rows — at 100 TB "
    "the vocabularies are bounded metadata and the churn report is "
    "free compared to the token count it rides on.",
)
def q288_vocabulary_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            (F.col("doc_id") % 2).alias("half"),
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("half", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("half").orderBy(F.col("n").desc(), "tok")
    # top-K vocab feeds THREE separate count actions (shared, dropped,
    # new); runtime reuse cannot share scans across actions, so pin the
    # O(2K)-row frame (tokenize + window run once).
    top = pin(
        toks.withColumn("rk", F.row_number().over(w)).filter(
            F.col("rk") <= _CHURN_K
        )
    )
    va = top.filter(F.col("half") == 0).select("tok")
    vb = top.filter(F.col("half") == 1).select("tok")
    shared = va.join(vb, "tok", "left_semi").count()
    dropped = va.join(vb, "tok", "left_anti").count()
    new = vb.join(va, "tok", "left_anti").count()
    from python_tool_setup_spark.staging import local_rows_df

    return local_rows_df(
        spark,
        [(shared, dropped, new)],
        "n_shared long, n_dropped long, n_new long",
    )
