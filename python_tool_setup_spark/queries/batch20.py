"""Round-3 gates, batch 20: chained stateful streaming (q221 — two
time-window aggregations in ONE append-mode stream, the multi-stateful
pipeline Spark 3.4+ unlocked), tokenizer vocabulary + OOV-rate audit
(q222 — the coverage check run before freezing any training
tokenizer), and the skyline / Pareto-frontier operator (q223 — the
classic multi-objective OLAP op, rewritten from the O(n^2) NOT-EXISTS
definition to an aggregate + tiny-domain prefix-min).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.staging import local_rows_df, staging_dir
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q221
@register(
    "q221_multi_stateful_chain",
    """
    WITH ev AS (SELECT ts, user_id, value FROM events WHERE user_id % 20 = 0),
    l1 AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS w1, user_id,
               COUNT(*) AS n, SUM(value) AS sv
        FROM ev GROUP BY 1, 2
    )
    SELECT STRFTIME(time_bucket(INTERVAL '6 hours', w1),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(n) AS BIGINT) AS n_events,
           ROUND(SUM(sv), 3) AS total_value
    FROM l1 GROUP BY 1
    """,
    doc="Chained stateful streaming (multi-stateful append pipelines, "
    "Spark 3.4+): a 1-hour per-user windowed aggregation feeding a "
    "SECOND 6-hour windowed re-aggregation inside the same stream — "
    "`window(window_col, '6 hours')` consumes the upstream window "
    "struct directly, and the watermark propagates through both "
    "stateful operators. Before multi-stateful support this required "
    "two jobs with an intermediate sink; now the pre-aggregated "
    "rollup cascade (the 100 TB metrics-pipeline shape: fine windows "
    "-> coarse windows, state bounded per level by the watermark) is "
    "one pipeline. Replay: one user shard (user_id % 20 == 0 — the "
    "chained-emission contract is per-watermark, not per-volume, "
    "matching q53's shard precedent) then a +48h sentinel row "
    "whose only job is to push the final watermark past every real "
    "window — both levels then emit exactly the closed windows, and "
    "the sentinel's own (never-closed) windows are excluded by "
    "construction on both engines. Oracle: the equivalent two-level "
    "batch rollup.",
)
def q221_multi_stateful_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.queries.streaming import _drain

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 20 == 0)
        .select("ts", "user_id", "value")
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]  # scalar bound, tiny
    sentinel = local_rows_df(
        spark, [(max_ts, -1, 0.0)], ev.schema
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 48 HOURS"))
    staged = staging_dir("chain_stream_")
    for i, part_df in enumerate([ev, sentinel]):
        sub = staging_dir(f"chain_part{i}_")
        part_df.coalesce(1).write.mode("overwrite").parquet(sub)
        part = next(
            f
            for f in os.listdir(sub)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = os.path.join(staged, f"{i:02d}.parquet")
        shutil.copyfile(os.path.join(sub, part), dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)
    # No rate limit: data + sentinel land in one micro-batch; the
    # chained emission the gate proves happens in the CLOSING batch
    # (watermark computed at end-of-batch flushes both stateful
    # levels), identically under any chopping — q138/q253's
    # invariance tests pin that. One fewer trigger ≈ 2s less
    # orchestration per bench run.
    stream = spark.readStream.schema(ev.schema).parquet(staged)
    l1 = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    )
    l2 = (
        l1.groupBy(F.window(F.col("w"), "6 hours").alias("w6"))
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("n").alias("n_events"),
            F.round(F.sum("sv"), 3).alias("total_value"),
        )
        .select(
            F.date_format("w6.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_groups",
            "n_events",
            "total_value",
        )
    )
    return _drain(l2, "append")


# ---------------------------------------------------------------- q222
_VOCAB_K = 500


@register(
    "q222_vocab_oov",
    f"""
    WITH toks AS (
        SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                         1, 8)) AS BIGINT) % 10000 < 1000
                    THEN 'val' ELSE 'train' END AS split,
               tok
        FROM documents,
             UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(tok)
        WHERE tok <> ''
    ),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
            FROM toks WHERE split = 'train' GROUP BY tok
        ) WHERE rk <= {_VOCAB_K}
    )
    SELECT CAST((SELECT COUNT(*) FROM vocab) AS BIGINT) AS vocab_size,
           CAST(COUNT(*) AS BIGINT) AS val_tokens,
           CAST(COUNT(*) FILTER (WHERE tok NOT IN (SELECT tok FROM vocab))
                AS BIGINT) AS oov_tokens,
           -- scale-first round (q208 recipe): the count ratio can tie
           -- on a 5e-5 decimal boundary ROUND(x, 4) resolves
           -- differently per engine
           ROUND(10000 * (CAST(COUNT(*) FILTER (WHERE tok NOT IN
                          (SELECT tok FROM vocab)) AS DOUBLE)
                 / COUNT(*))) / 10000.0 AS oov_rate
    FROM toks WHERE split = 'val'
    """,
    doc="Tokenizer vocabulary + out-of-vocabulary audit (L4, the check "
    "run before freezing a training tokenizer): deterministically "
    "split the corpus train/val on the md5 key bucket (q95's "
    "engine-independent convention), build the top-"
    f"{_VOCAB_K} train vocabulary with a deterministic (count DESC, "
    "token ASC) tie-break, and measure what fraction of val token "
    "OCCURRENCES fall outside it. One pass tokenizes (split+explode "
    "fused in the scan stage), one shuffle aggregates train counts, "
    "the vocabulary (bounded at K rows) broadcasts into the val anti "
    "probe — at 100 TB the corpus is never re-scanned and the only "
    "wide exchange is the token-count aggregate. All counts are "
    "integers, so the OOV ratio is exact on both engines.",
)
def q222_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.llm.pipeline import train_val_test_split

    d = load_table(spark, sf_dir, "documents")
    toks = (
        train_val_test_split(d, "doc_id", val_frac=0.10, test_frac=0.0)
        .select(
            "split",
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    train_counts = (
        toks.filter(F.col("split") == "train")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # distributed TakeOrdered top-K over the aggregated token domain
    # (vocabulary candidates), not the corpus; K bounds the broadcast
    # side and no single-partition rank window opens
    vocab = (
        train_counts.orderBy(F.col("n").desc(), "tok")
        .limit(_VOCAB_K)
        .select("tok")
    )
    val = toks.filter(F.col("split") == "val")
    # ONE pass over the val tokens: the left join against the marked
    # vocab yields both counts in a single aggregate (the old
    # val-count + anti-join-count branches each re-tokenized the val
    # split — two full scans for two numbers).
    valj = val.join(
        F.broadcast(vocab.withColumn("_v", F.lit(1))), "tok", "left"
    )
    stats = valj.agg(
        F.count(F.lit(1)).alias("val_tokens"),
        F.sum(F.when(F.col("_v").isNull(), 1).otherwise(0)).alias(
            "oov_tokens"
        ),
    )
    return (
        stats
        .crossJoin(F.broadcast(vocab.agg(F.count(F.lit(1)).alias("vocab_size"))))
        .select(
            "vocab_size",
            "val_tokens",
            "oov_tokens",
            # scale-first round: see the oracle comment
            (
                F.round(
                    10000
                    * (
                        F.col("oov_tokens").cast("double")
                        / F.col("val_tokens")
                    )
                )
                / 10000.0
            ).alias("oov_rate"),
        )
    )


# ---------------------------------------------------------------- q223
@register(
    "q223_skyline",
    """
    SELECT p.p_partkey, p.p_size, ROUND(p.p_retailprice, 2) AS price
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_size <= p.p_size
          AND q.p_retailprice <= p.p_retailprice
          AND (q.p_size < p.p_size OR q.p_retailprice < p.p_retailprice)
    )
    ORDER BY p.p_size, p.p_partkey
    """,
    doc="Skyline / Pareto frontier (minimize p_size AND p_retailprice "
    "simultaneously): parts no other part beats on both dimensions — "
    "the multi-objective shortlist operator (cheapest-smallest SKUs, "
    "best quality-vs-cost documents). The textbook definition is the "
    "O(n^2) NOT-EXISTS self-join the oracle runs; the Spark plan "
    "rewrites it as: (1) per-size MIN(price) — one map-side-combined "
    "aggregate over the full relation; (2) prefix-min over strictly "
    "smaller sizes — a window over the per-size table, whose row "
    "count is the DISTINCT SIZE domain (bounded, ~50), so the "
    "unpartitioned window sort is O(domain), never O(n); (3) a "
    "broadcast join back: a row survives iff its price equals its "
    "size's min and strictly undercuts every smaller size's min. "
    "Equivalent because any dominator either shares the size (then "
    "the size-min dominates too) or is smaller (then that size's min "
    "dominates too); duplicate frontier points survive together "
    "(neither strictly dominates). All comparisons are on raw parquet "
    "doubles — bit-identical across engines.",
)
def q223_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.operators.relational import skyline_2d

    p = load_table(spark, sf_dir, "part")
    return (
        skyline_2d(p, "p_size", "p_retailprice")
        .select(
            "p_partkey",
            "p_size",
            F.round("p_retailprice", 2).alias("price"),
        )
        .orderBy("p_size", "p_partkey")
    )
