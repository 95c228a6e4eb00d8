"""Round-5 gates, batch 120: partition granularity advisor (q449 —
daily vs weekly vs monthly partitioning of the events stream,
scored by partition-count and imbalance: the table-layout decision
behind q195's pruning and q286's small-files advice, made from
measured distributions) and B-cubed clustering evaluation (q450 —
precision/recall of the near-dup connected components against the
PLANTED ground truth of q72's corpus: the clustering-quality
scorecard that says whether the dedup graph is over- or
under-merging, per item, not per pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.queries.pipeline import _planted_labels, _SQL_TOKS
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q449
@register(
    "q449_partition_granularity_advisor",
    """
    WITH buckets AS (
        SELECT 'a_daily' AS gran,
               CAST(CAST(ts AS DATE) AS VARCHAR) AS b
        FROM events
        UNION ALL
        SELECT 'b_weekly',
               CAST(date_diff('day', DATE '1970-01-05',
                    CAST(ts AS DATE)) // 7 AS VARCHAR)
        FROM events
        UNION ALL
        SELECT 'c_monthly',
               CAST(date_trunc('month', CAST(ts AS DATE)) AS VARCHAR)
        FROM events
    ),
    sizes AS (
        SELECT gran, b, COUNT(*) AS rows_
        FROM buckets GROUP BY gran, b
    )
    SELECT gran,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(MIN(rows_) AS BIGINT) AS rows_min,
           CAST(MAX(rows_) AS BIGINT) AS rows_max,
           CAST(ROUND(1e3 * SUM(rows_) / COUNT(*)) AS BIGINT)
               AS rows_avg_milli,
           CAST(ROUND(1e3 * MAX(rows_) * COUNT(*) / SUM(rows_))
               AS BIGINT) AS imbalance_milli
    FROM sizes GROUP BY gran ORDER BY gran
    """,
    doc="Partition granularity advisor for the events stream "
    "(daily vs weekly vs monthly layouts scored by partition "
    "count and imbalance = max/avg — too many partitions "
    "recreate q286's small-files problem, too few defeat "
    "q195's pruning; the layout decision made from measured "
    "distributions instead of convention): three bucketings "
    "stacked into one scan (Monday-epoch weeks, calendar "
    "months), per-layout min/max/avg and the imbalance ratio "
    "as integer-milli. Scale: bucket-domain metadata; the "
    "stacked scan is the only data-scale term.",
)
def q449_partition_granularity_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    buckets = (
        e.select(
            F.lit("a_daily").alias("gran"),
            day.cast("string").alias("b"),
        )
        .unionByName(
            e.select(
                F.lit("b_weekly").alias("gran"),
                F.floor(
                    F.datediff(day, F.lit("1970-01-05").cast("date")) / 7
                )
                .cast("string")
                .alias("b"),
            )
        )
        .unionByName(
            e.select(
                F.lit("c_monthly").alias("gran"),
                F.trunc(day, "month").cast("string").alias("b"),
            )
        )
    )
    sizes = buckets.groupBy("gran", "b").agg(F.count("*").alias("rows_"))
    return (
        sizes.groupBy("gran")
        .agg(
            F.count("*").cast("long").alias("n_partitions"),
            F.min("rows_").cast("long").alias("rows_min"),
            F.max("rows_").cast("long").alias("rows_max"),
            F.round(F.lit(1e3) * F.sum("rows_") / F.count("*"))
            .cast("long")
            .alias("rows_avg_milli"),
            F.round(
                F.lit(1e3) * F.max("rows_") * F.count("*") / F.sum("rows_")
            )
            .cast("long")
            .alias("imbalance_milli"),
        )
        .orderBy("gran")
    )


# ---------------------------------------------------------------- q450
@register(
    "q450_bcubed_cluster_eval",
    f"""
    WITH RECURSIVE base AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 60
        UNION ALL
        SELECT doc_id + 100000, text || ' zz qq' FROM documents
        WHERE doc_id < 60
        UNION ALL
        SELECT doc_id + 200000, text || ' zz qq ww' FROM documents
        WHERE doc_id < 60
    ),
    shingled AS (
        SELECT doc_id,
               LIST_DISTINCT(LIST_TRANSFORM(
                   generate_series(1, GREATEST(LEN(toks) - 4, 1)),
                   i -> array_to_string(toks[i:i+4], ' '))) AS sh
        FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM base)
    ),
    edges AS (
        SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(LEN(LIST_INTERSECT(a.sh, b.sh)) AS DOUBLE)
                   / LEN(LIST_DISTINCT(LIST_CONCAT(a.sh, b.sh))) AS jac
            FROM shingled a JOIN shingled b ON a.doc_id < b.doc_id
        ) WHERE jac >= 0.5
    ),
    und AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION SELECT id_b, id_a FROM edges
    ),
    reach(node, lbl) AS (
        SELECT src, src FROM und
        UNION
        SELECT u.src, r.lbl FROM und u JOIN reach r ON u.dst = r.node
    ),
    labels AS (
        SELECT b.doc_id,
               COALESCE(m.cluster_id, b.doc_id) AS pred,
               b.doc_id % 100000 AS truth
        FROM base b LEFT JOIN (
            SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node
        ) m ON b.doc_id = m.node
    ),
    cells AS (
        SELECT pred, truth, COUNT(*) AS m FROM labels GROUP BY pred, truth
    ),
    csize AS (SELECT pred, SUM(m) AS nc FROM cells GROUP BY pred),
    tsize AS (SELECT truth, SUM(m) AS nt FROM cells GROUP BY truth),
    scored AS (
        SELECT c.m,
               CAST(ROUND(1e9 * c.m / cs.nc) AS BIGINT) AS p_nano,
               CAST(ROUND(1e9 * c.m / ts.nt) AS BIGINT) AS r_nano
        FROM cells c
        JOIN csize cs ON cs.pred = c.pred
        JOIN tsize ts ON ts.truth = c.truth
    )
    SELECT CAST(SUM(m) AS BIGINT) AS n_items,
           CAST(ROUND(CAST(SUM(m * p_nano) AS DOUBLE) / SUM(m)) AS BIGINT)
               AS bcubed_precision_nano,
           CAST(ROUND(CAST(SUM(m * r_nano) AS DOUBLE) / SUM(m)) AS BIGINT)
               AS bcubed_recall_nano
    FROM scored
    """,
    doc="B-cubed evaluation of the near-dup connected components "
    "against the PLANTED truth of q72's corpus (truth group = "
    "base id of each planted copy family; per-ITEM precision "
    "|C i ∩ L i|/|C i| and recall |C i ∩ L i|/|L i| averaged "
    "over items — the clustering scorecard that penalizes "
    "over-merging in precision and under-merging in recall, "
    "which pair-counting metrics mask): the (pred, truth) "
    "contingency cells give every item's score, per-item values "
    "nano-quantized BEFORE the m-weighted integer sums. The "
    "oracle recomputes the SAME clustering with its recursive "
    "CTE, so the eval certifies the DISTRIBUTED label "
    "propagation end-to-end. Scale: eval cost is |cells| "
    "metadata once labels exist.",
)
def q450_bcubed_cluster_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    ids = d.select("doc_id")
    corpus_ids = (
        ids.unionByName(ids.select((F.col("doc_id") + 100000).alias("doc_id")))
        .unionByName(ids.select((F.col("doc_id") + 200000).alias("doc_id")))
    )
    pred_labels = _planted_labels(spark, sf_dir).select(
        F.col("doc_id"), F.col("cluster_id")
    )
    labels = corpus_ids.join(pred_labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("pred"),
        (F.col("doc_id") % 100000).alias("truth"),
    )
    cells = labels.groupBy("pred", "truth").agg(F.count("*").alias("m"))
    # Cluster and truth sizes as window sums over the bounded-slice
    # cell table (the q294 single-tree shape): the old
    # csize/tsize/join fan-out re-instantiated the cell aggregation
    # three times (14 Exchange / 9 scans / 5 SortMergeJoin in the
    # r10-before plan). Integer sums — identical values.
    scored = (
        cells.select(
            "pred",
            "truth",
            "m",
            F.sum("m").over(Window.partitionBy("pred")).alias("nc"),
            F.sum("m").over(Window.partitionBy("truth")).alias("nt"),
        )
        .select(
            "m",
            F.round(F.lit(1e9) * F.col("m") / F.col("nc"))
            .cast("long")
            .alias("p_nano"),
            F.round(F.lit(1e9) * F.col("m") / F.col("nt"))
            .cast("long")
            .alias("r_nano"),
        )
    )
    return scored.agg(
        F.sum("m").cast("long").alias("n_items"),
        F.round(
            F.sum(F.col("m") * F.col("p_nano")).cast("double") / F.sum("m")
        )
        .cast("long")
        .alias("bcubed_precision_nano"),
        F.round(
            F.sum(F.col("m") * F.col("r_nano")).cast("double") / F.sum("m")
        )
        .cast("long")
        .alias("bcubed_recall_nano"),
    )
