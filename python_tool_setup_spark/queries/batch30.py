"""Round-3 gates, batch 30: tokenizer-pipeline closure — BPE merge
APPLICATION (q251: q175 counts the pairs, this derives the top-K
merge rules and applies them corpus-wide with greedy leftmost-first
semantics via boundary-padded replace — pure string expressions, no
Python in the loop) and the deterministic mixture SCHEDULE (q252:
closed-form interleave positions from per-source ranks — the
reproducible training order that q71's mixture weights feed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_N_MERGES = 5
_TOP_UNITS = 15


def _oracle_sql() -> str:
    """Build the DuckDB oracle: derive the same K merges as scalar
    subqueries and nest the same K boundary-safe replaces."""
    base = """
    WITH words AS (
        SELECT tok AS w, COUNT(*) AS cnt
        FROM documents,
             UNNEST(regexp_split_to_array(lower(text), '[^a-z]+')) AS t(tok)
        WHERE tok <> '' GROUP BY tok
    ),
    pc AS (
        SELECT p.pair, SUM(cnt) AS c
        FROM words,
             UNNEST(list_transform(generate_series(1, length(w) - 1),
                                   i -> substr(w, i, 2))) AS p(pair)
        GROUP BY p.pair
    ),
    merges AS (
        SELECT pair, ROW_NUMBER() OVER (ORDER BY c DESC, pair) AS rk
        FROM pc QUALIFY rk <= {k}
    ),
    spaced AS (
        SELECT ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s,
               cnt
        FROM words
    ),
    merged AS (
        SELECT {expr} AS s, cnt FROM spaced
    ),
    units AS (
        SELECT u.unit, SUM(cnt) AS n
        FROM merged, UNNEST(string_split(trim(s), ' ')) AS u(unit)
        GROUP BY u.unit
    )
    SELECT unit, CAST(n AS BIGINT) AS n
    FROM units ORDER BY n DESC, unit LIMIT {top}
    """
    expr = "s"
    for i in range(1, _N_MERGES + 1):
        m = f"(SELECT pair FROM merges WHERE rk = {i})"
        expr = (
            f"replace({expr}, ' ' || substr({m}, 1, 1) || ' ' || "
            f"substr({m}, 2, 1) || ' ', ' ' || {m} || ' ')"
        )
    return base.format(k=_N_MERGES, expr=expr, top=_TOP_UNITS)


# ---------------------------------------------------------------- q251
@register(
    "q251_bpe_apply",
    _oracle_sql(),
    doc=f"BPE merge application (q175's counterpart — train counts "
    f"pairs, THIS applies the rules): the top-{_N_MERGES} character "
    "pairs by corpus frequency (deterministic count-desc/pair-asc "
    "rank) become merge rules applied corpus-wide in rank order with "
    "greedy leftmost-first, non-overlapping semantics — the exact "
    "contract of BPE tokenization, realized as boundary-padded "
    "string replace on the spaced representation (' a b c ' -> "
    "' ab c '), a pure codegen expression chain: both engines' "
    "replace() is leftmost-first non-overlapping, so parity is "
    f"byte-exact. The merged-unit vocabulary (top {_TOP_UNITS} units "
    "by weighted frequency) is the gate's pinned output. The merge "
    "table is bounded metadata (one 5-row collect); tokenization "
    "itself runs at scan speed over the distinct-word domain with "
    "frequencies carried as weights — the corpus is never re-scanned "
    "per rule.",
)
def q251_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = words.select(
        "cnt",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    merges = [
        r["pair"]
        for r in pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("c"))
        .orderBy(F.col("c").desc(), "pair")
        .limit(_N_MERGES)
        .collect()  # the merge TABLE: bounded metadata
    ]
    s = F.concat(F.lit(" "), F.array_join(F.split("w", ""), " "), F.lit(" "))
    for m in merges:
        s = F.replace(
            s, F.lit(f" {m[0]} {m[1]} "), F.lit(f" {m} ")
        )
    return (
        words.select(s.alias("s"), "cnt")
        .select(F.explode(F.split(F.trim("s"), " ")).alias("unit"), "cnt")
        .groupBy("unit")
        .agg(F.sum("cnt").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "unit")
        .limit(_TOP_UNITS)
    )


# ---------------------------------------------------------------- q252
@register(
    "q252_mixture_schedule",
    """
    WITH lang_pick AS (SELECT MIN(lang) AS l FROM documents),
    a AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS rk
        FROM documents, lang_pick WHERE lang = l
    ),
    b AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS rk
        FROM documents, lang_pick WHERE lang <> l
    ),
    sched AS (
        SELECT ((rk - 1) // 2) * 3 + ((rk - 1) % 2) AS pos,
               doc_id, 'primary' AS src
        FROM a
        UNION ALL
        SELECT (rk - 1) * 3 + 2, doc_id, 'secondary' FROM b
    )
    SELECT CAST(pos AS BIGINT) AS pos, doc_id, src
    FROM sched WHERE pos < 30 ORDER BY pos
    """,
    doc="Deterministic mixture SCHEDULE — the ordering half of data "
    "mixing (q71 fixes the WEIGHTS; this fixes the ORDER): a 2:1 "
    "interleave of the primary language against the rest, computed "
    "arithmetically from per-source ranks (primary rank r occupies "
    "global slots block*3+{0,1}, secondary fills slot block*3+2) — "
    "NO global sort or driver loop, just rank windows per source and "
    "closed-form positions, so a 100 TB mixture schedule "
    "materializes as a column expression and any worker can compute "
    "its slice independently. Reproducibility is the point: the "
    "schedule is a pure function of (doc_id order, weights), so "
    "training runs replay byte-identically. The first 30 slots are "
    "pinned (the pattern P P S P P S ... is visible in the output).",
)
def q252_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    lp = d.agg(F.min("lang").alias("l"))
    tagged = d.crossJoin(F.broadcast(lp)).select(
        "doc_id", (F.col("lang") == F.col("l")).alias("is_primary")
    )
    wa = Window.partitionBy("is_primary").orderBy("doc_id")
    ranked = tagged.withColumn("rk", F.row_number().over(wa))
    sched = ranked.select(
        F.when(
            F.col("is_primary"),
            ((F.col("rk") - 1) / 2).cast("long") * 3 + (F.col("rk") - 1) % 2,
        )
        .otherwise((F.col("rk") - 1) * 3 + 2)
        .cast("bigint")
        .alias("pos"),
        "doc_id",
        F.when(F.col("is_primary"), "primary")
        .otherwise("secondary")
        .alias("src"),
    )
    return sched.filter(F.col("pos") < 30).orderBy("pos")


# ---------------------------------------------------------------- q253
@register(
    "q253_stream_stream_full_outer",
    """
    WITH ev AS (SELECT * FROM events WHERE user_id % 12 = 0),
    a AS (SELECT * FROM ev WHERE event_type = 'view'),
    b AS (SELECT * FROM ev WHERE event_type = 'purchase')
    SELECT COALESCE(a.user_id, b.user_id) AS user_id,
           a.event_id AS view_id,
           b.event_id AS purchase_id
    FROM a FULL JOIN b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '30 minutes'
    """,
    doc="Stream-stream FULL OUTER join — completes the stream-join "
    "matrix (q66 inner, q161 left-outer): views and purchases within "
    "a 30-minute window, where BOTH unmatched sides must flush — "
    "views that converted to nothing AND purchases with no "
    "attributable view. Both state stores hold their side until the "
    "watermark (advanced past every real event by one far-future "
    "sentinel per side, filtered from the output) proves no partner "
    "can arrive, then emit with NULLs. The time-bound join condition "
    "constrains state on both sides, so memory stays "
    "O(watermark-window), not O(stream). One user shard (the flush "
    "contract is per-watermark, not per-volume).",
)
def q253_stream_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return full_outer_stream_join_drain(spark, sf_dir)


def full_outer_stream_join_drain(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The q253 drain, parameterized by micro-batch chopping.

    ``max_files_per_trigger`` rate-limits the availableNow drain so the
    SAME input is consumed in a different number of micro-batches; the
    chopping-invariance property test (tests/test_streaming_invariance
    .py) asserts the result set is identical under several values —
    the watermark/flush contract may not depend on how the source
    happens to be chopped into batches.
    """
    import uuid

    from python_tool_setup_spark.staging import local_rows_df, staging_dir

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 12 == 0)
    src = staging_dir("ssfo_src_")
    ev.coalesce(4).write.mode("append").parquet(src)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]  # scalar bound, tiny
    sentinels = local_rows_df(
        spark,
        [(-1, -1, "view"), (-2, -2, "purchase")],
        "event_id long, user_id long, event_type string",
    ).select(
        "event_id",
        (F.lit(max_ts) + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        "user_id",
        "event_type",
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    sentinels.select(
        [f.name for f in ev.schema.fields]
    ).write.mode("append").parquet(src)  # already 1 partition

    reader = spark.readStream.schema(ev.schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(src)
    wm = stream.withWatermark("ts", "10 seconds")
    views = wm.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    purchases = wm.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
        "full_outer",
    )
    name = f"q253_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", staging_dir("ckpt_ssfo_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        spark.table(name)
        # drop the flush sentinels from the answer
        .filter(
            (F.coalesce("v_user", "p_user") >= 0)
        )
        .select(
            F.coalesce("v_user", "p_user").alias("user_id"),
            "view_id",
            "purchase_id",
        )
    )


# ---------------------------------------------------------------- q254
@register(
    "q254_dim_refresh_between_batches",
    """
    WITH ev AS (SELECT event_id, user_id, value FROM events
                WHERE user_id % 14 = 0)
    SELECT tier,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 3) AS total
    FROM (
        SELECT 'tier_' || CAST(user_id % 3 AS VARCHAR) AS tier, value
        FROM ev WHERE event_id % 2 = 0
        UNION ALL
        SELECT 'tier_' || CAST((user_id + 1) % 3 AS VARCHAR), value
        FROM ev WHERE event_id % 2 = 1
    )
    GROUP BY tier ORDER BY tier
    """,
    doc="Dimension refresh BETWEEN micro-batch drains (the dynamic "
    "broadcast-refresh pattern q126's static join cannot express): "
    "the enrichment dimension is a VERSIONED table re-resolved to "
    "its latest committed version INSIDE foreachBatch, so each "
    "micro-batch joins the dimension as of ITS OWN processing time. "
    "The gate drains half the events against dim v0, commits a "
    "restated v1 (every tier reassigned), then RESUMES from the "
    "checkpoint and drains the rest against v1 — the spool "
    "(at-least-once per-batch parquet appends; exactly-once would "
    "need batchId-keyed overwrite, and the local availableNow drain "
    "never retries a batch) must equal "
    "first-half x v0 union second-half x v1, which is exactly what "
    "the oracle states. Composes q74 versioning + q153 "
    "checkpoint-resume + foreachBatch enrichment; at 100 TB this is "
    "how slowly-changing reference data follows a live stream "
    "without restarting it.",
)
def q254_dim_refresh_between_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import uuid

    from python_tool_setup_spark.ingestion.versioned import (
        read_version,
        write_version,
    )
    from python_tool_setup_spark.staging import local_rows_df, staging_dir

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 14 == 0)
        .select("event_id", "user_id", "value")
    )
    users = ev.select("user_id").distinct()

    def dim(shift: int) -> DataFrame:
        return users.select(
            "user_id",
            F.concat(
                F.lit("tier_"), ((F.col("user_id") + shift) % 3).cast("string")
            ).alias("tier"),
        )

    dim_table = staging_dir("dim_refresh_")
    write_version(spark, dim(0), dim_table)  # v0: initial belief

    src = staging_dir("dimref_src_")
    ckpt = staging_dir("dimref_ckpt_")
    spool = staging_dir("dimref_spool_")
    halves = [
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
    ]

    def enrich(batch_df, batch_id):
        # re-resolve the dimension to its LATEST committed version at
        # each batch's own processing time — the refresh pattern
        d = read_version(batch_df.sparkSession, dim_table)
        (
            batch_df.join(F.broadcast(d), "user_id")
            .select("tier", "value")
            .write.mode("append")
            .parquet(spool)
        )

    def drain(part_df):
        sub = staging_dir("dimref_part_")
        part_df.coalesce(1).write.mode("overwrite").parquet(sub)
        part = next(
            f for f in os.listdir(sub)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        shutil.copyfile(
            os.path.join(sub, part),
            os.path.join(src, f"{uuid.uuid4().hex}.parquet"),
        )
        q = (
            spark.readStream.schema(ev.schema)
            .parquet(src)
            .writeStream.foreachBatch(enrich)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain(halves[0])                      # first half joins dim v0
    write_version(spark, dim(1), dim_table)  # the refresh lands
    drain(halves[1])                      # resumed drain joins dim v1

    return (
        spark.read.parquet(spool)
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 3).alias("total"),
        )
        .orderBy("tier")
    )


# ---------------------------------------------------------------- q255
@register(
    "q255_linear_attribution",
    """
    WITH ev AS (SELECT * FROM events WHERE user_id % 6 = 0),
    p AS (SELECT event_id AS pid, user_id, ts AS pts, value
          FROM ev WHERE event_type = 'purchase'),
    v AS (SELECT event_id AS vid, user_id, ts AS vts
          FROM ev WHERE event_type = 'view'),
    touches AS (
        SELECT p.pid, p.value, v.vid,
               COUNT(*) OVER (PARTITION BY p.pid) AS n_touch
        FROM p JOIN v
          ON p.user_id = v.user_id
         AND v.vts >= p.pts - INTERVAL 6 HOUR AND v.vts <= p.pts
    )
    SELECT CAST(vid % 24 AS BIGINT) AS touch_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_credits,
           -- per-row micro-units (q212 recipe): the per-touch credit
           -- quotient is bit-identical across engines, but the raw
           -- double SUM over credits is order-dependent; the integer
           -- micro sum is order-free, and the final scale-0 round of
           -- the identical double agrees on both engines
           ROUND(CAST(SUM(CAST(ROUND(1000000 * (value / n_touch))
                 AS BIGINT)) AS DOUBLE) / 1000) / 1000.0
               AS credited_value
    FROM touches
    GROUP BY vid % 24 ORDER BY touch_bucket
    """,
    doc="Linear multi-touch attribution (the credit-assignment "
    "operator funnels/retention don't cover): every purchase's value "
    "is split EQUALLY across the user's view touches in the "
    "preceding 6 hours — an equi-join on user with a time-window "
    "residual (one shuffle, the q23 range-join shape), then a "
    "per-purchase window count to derive each touch's 1/n share; "
    "credit conservation is structural (each purchase's shares sum "
    "to its value). Credited value rolls up per touch bucket. At "
    "100 TB the join prunes by the equi-key first and the window "
    "rides the same partitioning — no per-purchase re-scan; the "
    "division is IEEE-identical on both engines (same value, same "
    "integer count).",
)
def q255_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 6 == 0)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
        "value",
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"),
        F.col("user_id").alias("vu"),
        F.col("ts").alias("vts"),
    )
    touches = p.join(
        v,
        (F.col("pu") == F.col("vu"))
        & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 6 HOURS"))
        & (F.col("vts") <= F.col("pts")),
    ).withColumn("n_touch", F.count("*").over(Window.partitionBy("pid")))
    return (
        touches.groupBy((F.col("vid") % 24).cast("bigint").alias("touch_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            # per-row micro-units: see the oracle comment
            (
                F.round(
                    F.sum(
                        F.round(
                            1000000 * (F.col("value") / F.col("n_touch"))
                        ).cast("long")
                    ).cast("double")
                    / 1000
                )
                / 1000.0
            ).alias("credited_value"),
        )
        .orderBy("touch_bucket")
    )
