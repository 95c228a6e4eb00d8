"""Round-3 gates, batch 26: SQL-semantics completions — multiset set
operations (q237: EXCEPT ALL / INTERSECT ALL preserve multiplicities,
a different operator from q16's distinct-set forms), modern syntax
conveniences (q238: GROUP BY ALL / ORDER BY ALL / SELECT * EXCEPT),
and distribution-rank window functions (q241: PERCENT_RANK /
CUME_DIST, completing the window family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q237
@register(
    "q237_multiset_set_ops",
    """
    WITH a AS (SELECT CAST(l_quantity AS INT) AS q FROM lineitem
               WHERE YEAR(l_shipdate) = 1996),
         b AS (SELECT CAST(l_quantity AS INT) AS q FROM lineitem
               WHERE YEAR(l_shipdate) = 1997)
    SELECT 'except_all' AS op, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    UNION ALL
    SELECT 'intersect_all' AS op, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
    UNION ALL
    SELECT 'except_distinct' AS op, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
    ORDER BY op
    """,
    doc="Multiset (bag) set operations — EXCEPT ALL keeps "
    "max(0, m1 - m2) copies of each value and INTERSECT ALL keeps "
    "min(m1, m2), where the q16 distinct forms collapse to membership "
    "— on two ship-year slices whose quantity values overlap almost "
    "completely, so the distinct answer (~0) and the bag answer "
    "(thousands) are wildly different and only correct multiplicity "
    "accounting matches. Spark plans both as a single hash aggregate "
    "over (value -> count pair) with a generate — one shuffle, no "
    "join, exactly how bag semantics should scale. The distinct "
    "EXCEPT rides along as the contrast row.",
)
def q237_multiset_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.year("l_shipdate") == 1996).select(
        F.col("l_quantity").cast("int").alias("q")
    )
    b = li.filter(F.year("l_shipdate") == 1997).select(
        F.col("l_quantity").cast("int").alias("q")
    )
    rows = [
        ("except_all", a.exceptAll(b)),
        ("except_distinct", a.subtract(b)),
        ("intersect_all", a.intersectAll(b)),
    ]
    out = None
    for op, df in rows:
        part = df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), "n"
        )
        out = part if out is None else out.unionAll(part)
    return out.orderBy("op")


# ---------------------------------------------------------------- q238
@register(
    "q238_modern_sql_syntax",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 1) AS qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
    """,
    doc="Modern SQL syntax: GROUP BY ALL infers the grouping keys from "
    "the non-aggregate select items and ORDER BY ALL orders by every "
    "output column left-to-right — both run IDENTICALLY in Spark 4 "
    "and DuckDB (the oracle uses the same text), compiling to the "
    "same hash aggregate + sort as the explicit forms, so the "
    "convenience costs nothing at plan level. The Spark side also "
    "exercises SELECT * EXCEPT to drop a column by exclusion before "
    "aggregating — schema-evolution-friendly projections for wide "
    "tables where listing 200 kept columns is the error-prone form.",
)
def q238_modern_sql_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        WITH narrowed AS (
            SELECT * EXCEPT (l_comment)
            FROM (SELECT l_returnflag, l_linestatus, l_quantity,
                         'x' AS l_comment
                  FROM lineitem_v)
        )
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(l_quantity), 1) AS qty
        FROM narrowed
        GROUP BY ALL
        ORDER BY ALL
        """
    )


# ---------------------------------------------------------------- q241
@register(
    "q241_distribution_ranks",
    """
    SELECT DISTINCT l_returnflag,
           CAST(l_quantity AS INT) AS qty,
           -- scale-first rounds (q208 recipe): rank ratios are
           -- decimal-reachable ties at scale 6
           ROUND(1000000 * PERCENT_RANK() OVER w) / 1000000.0 AS pr,
           ROUND(1000000 * CUME_DIST() OVER w) / 1000000.0 AS cd
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
    ORDER BY l_returnflag, qty
    """,
    doc="Distribution-rank window functions — PERCENT_RANK ((rank-1)/"
    "(n-1)) and CUME_DIST (fraction of peers at or below) — the "
    "relative-standing primitives behind percentile flags and "
    "curriculum ordering, computed per return-flag partition over "
    "raw rows and then DISTINCT-ed (both functions are constant "
    "within a tie group, so the distinct output is well-defined and "
    "identical in both engines; the division is IEEE-exact on "
    "identical integer rank/count inputs). One shuffle on the "
    "partition key; completes the window family alongside ranking "
    "(q12), analytics (q13), frames (q129/q150), and NTILE (q176).",
)
def q241_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    # percent_rank/cume_dist are constant within a (flag, qty) tie
    # group, so they are pure functions of the VALUE HISTOGRAM:
    # pr = |rows before| / (n-1), cd = |rows up to| / n. The raw
    # window sorted every lineitem row inside <=|flags| partitions
    # (single-task per flag — the §2.5 skew shape at scale); the
    # histogram is one aggregate shuffle with map-side partials and
    # the window runs over <=|flags|x50 rows. Identical integer
    # rank/count inputs -> identical IEEE divisions.
    hist = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("int").alias("qty")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wf = Window.partitionBy("l_returnflag").orderBy("qty")
    wp = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "qty",
        (F.sum("cnt").over(wf) - F.col("cnt")).alias("before"),
        F.sum("cnt").over(wf).alias("upto"),
        F.sum("cnt").over(wp).alias("n"),
    )
    pr = F.when(
        F.col("n") > 1, F.col("before") / (F.col("n") - 1)
    ).otherwise(F.lit(0.0))
    return (
        cum.select(
            "l_returnflag",
            "qty",
            (F.round(1000000 * pr) / 1000000.0).alias("pr"),
            (
                F.round(1000000 * (F.col("upto") / F.col("n"))) / 1000000.0
            ).alias("cd"),
        )
        .orderBy("l_returnflag", "qty")
    )
