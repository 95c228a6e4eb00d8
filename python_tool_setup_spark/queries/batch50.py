"""Round-4 gates, batch 50: item-item collaborative filtering
(q304 — cosine neighbors over co-purchase vectors, the deterministic
recommender built on q296's within-basket pair generator) and
Cohen's kappa (q305 — chance-corrected agreement between two
labelers, the annotation-QA staple).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_MIN_CO = 2
_TOP_K = 3


# ---------------------------------------------------------------- q304
@register(
    "q304_item_item_cf",
    f"""
    WITH b AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    item AS (SELECT p, COUNT(*) AS np FROM b GROUP BY p),
    pair AS (
        SELECT a.p AS x, c.p AS y, COUNT(*) AS sxy
        FROM b a JOIN b c ON a.o = c.o AND a.p < c.p
        GROUP BY a.p, c.p
        HAVING COUNT(*) >= {_MIN_CO}
    ),
    sym AS (
        SELECT x AS item, y AS nb, sxy FROM pair
        UNION ALL
        SELECT y AS item, x AS nb, sxy FROM pair
    ),
    scored AS (
        SELECT sym.item, sym.nb, sym.sxy,
               CAST(ROUND((CAST(sym.sxy AS DOUBLE)
                   / sqrt(CAST(ix.np * iy.np AS DOUBLE)))
                   * 1000000.0) AS BIGINT) AS cos_micro
        FROM sym
        JOIN item ix ON ix.p = sym.item
        JOIN item iy ON iy.p = sym.nb
    ),
    ranked AS (
        SELECT item, nb, sxy, cos_micro,
               ROW_NUMBER() OVER (PARTITION BY item
                   ORDER BY cos_micro DESC, nb) AS rk
        FROM scored
    )
    SELECT item, nb AS neighbor, CAST(sxy AS BIGINT) AS co_count,
           cos_micro, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_TOP_K}
    ORDER BY item, rk
    """,
    doc="Item-item collaborative filtering ('customers who bought X "
    "also bought Y'): cosine similarity between items over their "
    "binary basket-membership vectors — for 0/1 vectors the dot "
    "product IS the co-purchase count and the norms are the item "
    "supports, so sim = s_xy / sqrt(n_x * n_y), exact from "
    "integers, micro-quantized (ranking ties broken by neighbor "
    "id so top-k is engine-deterministic). This is the "
    "deterministic recommender the ALS latent-factor model "
    "approximates; candidates come from q296's within-basket "
    "self-join (quadratic in basket size only), symmetrized, "
    "ranked per item by one partitioned window — no all-pairs "
    "item matrix, no iterative fit, and the whole plan is three "
    "shuffles (basket key, pair key, item key) at any scale.",
)
def q304_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Per-order item BASKETS in one shuffle (collect_set dedups the
    # (order, part) pairs the old .distinct() needed its own exchange
    # for), then the basket-bounded co-occurrence pairs expand
    # ARRAY-LOCALLY — the old o-keyed self-join shuffled the distinct
    # pair set twice more, and the sym union below re-instantiated
    # that whole pipeline per branch (12 scans in the r10-before
    # plan); re-running the two-shuffle basket pipeline per branch is
    # cheaper than a pin barrier (measured 2.5 s vs 3.0-3.3 s pinned).
    baskets = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).groupBy("o").agg(F.sort_array(F.collect_set("p")).alias("ps"))
    item = baskets.select(F.explode("ps").alias("p")).groupBy("p").agg(
        F.count(F.lit(1)).alias("np")
    )
    pair = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) ->"
                    " transform(slice(ps, i + 2, size(ps) - i - 1),"
                    " y -> struct(x, y))))"
                )
            ).alias("pr")
        )
        .groupBy(F.col("pr.x").alias("x"), F.col("pr.y").alias("y"))
        .agg(F.count(F.lit(1)).alias("sxy"))
        .filter(F.col("sxy") >= _MIN_CO)
    )
    sym = pair.select(
        F.col("x").alias("item"), F.col("y").alias("nb"), "sxy"
    ).unionByName(
        pair.select(F.col("y").alias("item"), F.col("x").alias("nb"), "sxy")
    )
    ix = item.select(F.col("p").alias("item"), F.col("np").alias("nx"))
    iy = item.select(F.col("p").alias("nb"), F.col("np").alias("ny"))
    scored = (
        sym.join(F.broadcast(ix), "item")
        .join(F.broadcast(iy), "nb")
        .select(
            "item",
            "nb",
            "sxy",
            F.round(
                F.col("sxy").cast("double")
                / F.sqrt((F.col("nx") * F.col("ny")).cast("double"))
                * 1000000.0
            )
            .cast("long")
            .alias("cos_micro"),
        )
    )
    w = Window.partitionBy("item").orderBy(F.col("cos_micro").desc(), "nb")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
        .select(
            "item",
            F.col("nb").alias("neighbor"),
            F.col("sxy").cast("long").alias("co_count"),
            "cos_micro",
            F.col("rk").cast("long").alias("rk"),
        )
        .orderBy("item", "rk")
    )


# ---------------------------------------------------------------- q305
@register(
    "q305_cohens_kappa",
    """
    WITH labeled AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
               CASE WHEN text LIKE '%the%' THEN 1 ELSE 0 END AS b
        FROM documents
    ),
    conf AS (
        SELECT a, b, COUNT(*) AS n FROM labeled GROUP BY a, b
    ),
    s AS (
        SELECT SUM(n) AS total,
               SUM(CASE WHEN a = b THEN n ELSE 0 END) AS agree,
               SUM(CASE WHEN a = 1 THEN n ELSE 0 END) AS a1,
               SUM(CASE WHEN b = 1 THEN n ELSE 0 END) AS b1
        FROM conf
    ),
    d AS (
        SELECT CAST(total AS DOUBLE) AS t,
               CAST(agree AS DOUBLE) AS ag,
               CAST(a1 AS DOUBLE) AS a1,
               CAST(b1 AS DOUBLE) AS b1
        FROM s
    )
    SELECT CAST(t AS BIGINT) AS n_docs,
           CAST(ag AS BIGINT) AS n_agree,
           CAST(ROUND((ag / t) * 1000000.0) AS BIGINT) AS po_micro,
           CAST(ROUND(((a1 * b1 + (t - a1) * (t - b1)) / (t * t))
               * 1000000.0) AS BIGINT) AS pe_micro,
           CAST(ROUND(((ag / t - (a1 * b1 + (t - a1) * (t - b1)) / (t * t))
               / (1.0 - (a1 * b1 + (t - a1) * (t - b1)) / (t * t)))
               * 1000000.0) AS BIGINT) AS kappa_micro
    FROM d
    """,
    doc="Cohen's kappa — chance-corrected agreement between two "
    "labelers (here: the stored language label vs a trivial "
    "lexical rule), the annotation-quality staple for judging "
    "whether two classifiers / annotators agree beyond chance. "
    "kappa = (p_o - p_e)/(1 - p_e) with p_e from the marginal "
    "label rates; the confusion matrix is exact integer counts "
    "from ONE groupBy on the label pair, and the kappa arithmetic "
    "is correctly-rounded double ops in identical association, "
    "micro-quantized. Scale: one scan, a 4-cell aggregate, 1-row "
    "reduce; generalizes to k-class kappa with the same cell "
    "table.",
)
def q305_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    labeled = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("a"),
        F.when(F.col("text").contains("the"), 1).otherwise(0).alias("b"),
    )
    conf = labeled.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n"))
    s = conf.agg(
        F.sum("n").alias("total"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("n")).otherwise(0)).alias(
            "agree"
        ),
        F.sum(F.when(F.col("a") == 1, F.col("n")).otherwise(0)).alias("a1"),
        F.sum(F.when(F.col("b") == 1, F.col("n")).otherwise(0)).alias("b1"),
    )
    dd = s.select(
        F.col("total").cast("double").alias("t"),
        F.col("agree").cast("double").alias("ag"),
        F.col("a1").cast("double").alias("a1"),
        F.col("b1").cast("double").alias("b1"),
    )
    t, ag, a1, b1 = F.col("t"), F.col("ag"), F.col("a1"), F.col("b1")
    pe = (a1 * b1 + (t - a1) * (t - b1)) / (t * t)
    return dd.select(
        t.cast("long").alias("n_docs"),
        ag.cast("long").alias("n_agree"),
        F.round((ag / t) * 1000000.0).cast("long").alias("po_micro"),
        F.round(pe * 1000000.0).cast("long").alias("pe_micro"),
        F.round(((ag / t - pe) / (F.lit(1.0) - pe)) * 1000000.0)
        .cast("long")
        .alias("kappa_micro"),
    )
