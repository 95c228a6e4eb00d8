"""Round-4 gates, batch 46: market-basket pair mining (q296 —
support/confidence/lift over per-order item pairs, the association-
rule primitive) and Gopher-style top-bigram repetition scoring
(q297 — the within-document repetitiveness quality signal the
Gopher/MassiveText filters use, beside q33's surface-stats quality
score and the cross-document dedup stack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_MINSUP = 3


# ---------------------------------------------------------------- q296
@register(
    "q296_basket_pairs",
    f"""
    WITH b AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    n_orders AS (SELECT COUNT(DISTINCT o) AS n FROM b),
    item AS (SELECT p, COUNT(*) AS np FROM b GROUP BY p),
    pair AS (
        SELECT a.p AS x, c.p AS y, COUNT(*) AS sxy
        FROM b a JOIN b c ON a.o = c.o AND a.p < c.p
        GROUP BY a.p, c.p
        HAVING COUNT(*) >= {_MINSUP}
    )
    SELECT pair.x, pair.y, CAST(pair.sxy AS BIGINT) AS sxy,
           CAST(ix.np AS BIGINT) AS nx,
           CAST(iy.np AS BIGINT) AS ny,
           CAST(ROUND((CAST(pair.sxy AS DOUBLE) / CAST(ix.np AS DOUBLE))
               * 1000000.0) AS BIGINT) AS conf_xy_micro,
           CAST(ROUND((CAST(pair.sxy * (SELECT n FROM n_orders) AS DOUBLE)
               / CAST(ix.np * iy.np AS DOUBLE))
               * 1000000.0) AS BIGINT) AS lift_micro
    FROM pair
    JOIN item ix ON ix.p = pair.x
    JOIN item iy ON iy.p = pair.y
    ORDER BY x, y
    """,
    doc="Market-basket pair mining (the association-rule / "
    "frequently-bought-together primitive): orders are baskets, "
    "parts are items; co-occurring pairs with support >= 3 are "
    "returned with exact support, per-item supports, confidence "
    "x=>y and lift, micro-quantized from exact integer counts "
    "(correctly-rounded division only — no FP drift surface). "
    "The pair generator is the within-basket self-join — work is "
    "quadratic in BASKET SIZE only (bounded at ~7 lineitems in "
    "this schema), never in the catalog, and rides one shuffle on "
    "the basket key; supports and the final enrich are equi-joins "
    "on item id. The same plan shape is FP-growth's candidate "
    "counting for k=2 — at 100 TB you'd cap or sample degenerate "
    "mega-baskets exactly like the LSH bucket caps.",
)
def q296_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Per-order item BASKETS in one shuffle (q304 shape): collect_set
    # replaces the standalone distinct, the basket-bounded pairs
    # expand array-locally instead of through the o-keyed self-join,
    # and n_orders/item derive from the basket table (the old b was
    # instantiated 4x — scan + distinct each time).
    baskets = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).groupBy("o").agg(F.sort_array(F.collect_set("p")).alias("ps"))
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n"))
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
        .filter(F.col("sxy") >= _MINSUP)
    )
    ix = item.select(F.col("p").alias("x"), F.col("np").alias("nx"))
    iy = item.select(F.col("p").alias("y"), F.col("np").alias("ny"))
    out = (
        pair.join(F.broadcast(ix), "x")
        .join(F.broadcast(iy), "y")
        .crossJoin(F.broadcast(n_orders))  # 1-row scalar attach
    )
    return out.select(
        "x",
        "y",
        F.col("sxy").cast("long").alias("sxy"),
        F.col("nx").cast("long").alias("nx"),
        F.col("ny").cast("long").alias("ny"),
        F.round(
            (F.col("sxy").cast("double") / F.col("nx").cast("double")) * 1000000.0
        )
        .cast("long")
        .alias("conf_xy_micro"),
        F.round(
            (F.col("sxy") * F.col("n")).cast("double")
            / (F.col("nx") * F.col("ny")).cast("double")
            * 1000000.0
        )
        .cast("long")
        .alias("lift_micro"),
    ).orderBy("x", "y")


# ---------------------------------------------------------------- q297
@register(
    "q297_top_bigram_repetition",
    """
    WITH toks AS (
        SELECT doc_id, unnest(arr) AS w,
               generate_subscripts(arr, 1) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS arr
              FROM documents)
    ),
    bigrams AS (
        SELECT doc_id,
               w || ' ' || LEAD(w) OVER (PARTITION BY doc_id ORDER BY i)
                   AS bg
        FROM toks
    ),
    counts AS (
        SELECT doc_id, bg, COUNT(*) AS n
        FROM bigrams WHERE bg IS NOT NULL
        GROUP BY doc_id, bg
    ),
    ranked AS (
        SELECT doc_id, bg, n,
               SUM(n) OVER (PARTITION BY doc_id) AS total,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY n DESC, bg) AS rn
        FROM counts
    )
    SELECT doc_id, bg AS top_bigram,
           CAST(n AS BIGINT) AS top_n,
           CAST(total AS BIGINT) AS n_bigrams,
           CAST(ROUND((CAST(n AS DOUBLE) / CAST(total AS DOUBLE))
               * 1000000.0) AS BIGINT) AS rep_micro,
           CAST(n AS DOUBLE) / CAST(total AS DOUBLE) > 0.05 AS flagged
    FROM ranked WHERE rn = 1
    ORDER BY doc_id
    """,
    doc="Gopher/MassiveText-style repetition scoring: per document, "
    "the most frequent word BIGRAM and the fraction of all bigram "
    "instances it accounts for — the within-document "
    "repetitiveness filter (Rae et al.'s 'fraction of characters "
    "in most common n-gram' family) that catches boilerplate and "
    "degenerate generations the CROSS-document dedup stack "
    "(q36/q120) can't see. Plan: split + posexplode (one "
    "row-multiplying projection, no UDF), bigrams via one LEAD "
    "window on the doc key, counts via one (doc, bigram) groupBy, "
    "and the per-doc argmax + total via windows over the counts "
    "table — everything rides the same doc-key shuffle, states "
    "bounded by per-doc vocabulary. Ratio micro-quantized from "
    "exact integers; ties broken lexicographically so the argmax "
    "is engine-deterministic.",
)
def q297_top_bigram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w")
    )
    bg = F.concat_ws(
        " ", F.col("w"), F.lead("w").over(Window.partitionBy("doc_id").orderBy("i"))
    )
    bigrams = toks.select(
        "doc_id",
        F.when(
            F.lead("w").over(Window.partitionBy("doc_id").orderBy("i")).isNotNull(),
            bg,
        ).alias("bg"),
    )
    counts = (
        bigrams.filter(F.col("bg").isNotNull())
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wdoc = Window.partitionBy("doc_id")
    ranked = counts.select(
        "doc_id",
        "bg",
        "n",
        F.sum("n").over(wdoc).alias("total"),
        F.row_number()
        .over(wdoc.orderBy(F.col("n").desc(), "bg"))
        .alias("rn"),
    )
    frac = F.col("n").cast("double") / F.col("total").cast("double")
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("bg").alias("top_bigram"),
            F.col("n").cast("long").alias("top_n"),
            F.col("total").cast("long").alias("n_bigrams"),
            F.round(frac * 1000000.0).cast("long").alias("rep_micro"),
            (frac > 0.05).alias("flagged"),
        )
        .orderBy("doc_id")
    )
