"""Round-5 gates, batch 127: clustering coefficients (q465 — global
transitivity and mean local clustering over the q186 projection
graph: the wedge-closure ratios that turn q186's raw triangle count
into the comparable density readouts graph pipelines actually
monitor) and candidate-key discovery (q466 — uniqueness ratios for
declared column combinations: the profiling step that certifies
which keys dedup (q31), MERGE (q24), and SCD2 (q76) can safely key
on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

# Same projection graph as q186 (order-part keys folded into a small
# vertex space so the graph has real wedge/triangle structure).
_CC_MOD = 97


@register(
    "q465_clustering_coefficient",
    f"""
    WITH und AS (
        SELECT DISTINCT LEAST(l_orderkey % {_CC_MOD},
                              l_partkey % {_CC_MOD}) AS a,
               GREATEST(l_orderkey % {_CC_MOD},
                        l_partkey % {_CC_MOD}) AS b
        FROM lineitem
        WHERE l_orderkey % {_CC_MOD} <> l_partkey % {_CC_MOD}
    ),
    deg AS (
        SELECT v, COUNT(*) AS d
        FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
        GROUP BY v
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1 JOIN und e2 ON e1.b = e2.a
                    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    tri_per_v AS (
        SELECT v, COUNT(*) AS t
        FROM (SELECT x AS v FROM tri UNION ALL
              SELECT y AS v FROM tri UNION ALL
              SELECT z AS v FROM tri)
        GROUP BY v
    ),
    local AS (
        SELECT deg.v, deg.d, COALESCE(t.t, 0) AS t
        FROM deg LEFT JOIN tri_per_v t ON t.v = deg.v
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM und) AS BIGINT) AS n_edges,
           CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges,
           CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles,
           CAST(ROUND(1e6 * 3 * (SELECT COUNT(*) FROM tri)
               / SUM(d * (d - 1) / 2)) AS BIGINT) AS transitivity_micro,
           CAST(ROUND(1e6 * AVG(CASE WHEN d >= 2
               THEN 2e0 * t / (d * (d - 1)) END)) AS BIGINT)
               AS avg_local_micro
    FROM local
    """,
    doc="Clustering coefficients over the q186 projection graph "
    "(global transitivity 3*triangles/wedges and the mean local "
    "coefficient — the density readouts that make triangle counts "
    "comparable across graphs of different size): canonical a<b "
    "edges, degrees from one union-both-endpoints aggregate, "
    "per-vertex triangle incidence by unioning all three corner "
    "projections of the closed-wedge join, local ratio 2t/d(d-1) "
    "averaged over vertices of degree >= 2. Scale: the wedge join "
    "is the q186 hotspot with the same degree-orientation bound; "
    "everything downstream of it is vertex-cardinality metadata — "
    "degrees, incidence counts, and two scalar ratios.",
)
def q465_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = F.col("l_orderkey") % _CC_MOD
    b = F.col("l_partkey") % _CC_MOD
    und = (
        li.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    und.persist()
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    tri.persist()
    tri_per_v = (
        tri.select(F.col("x").alias("v"))
        .unionAll(tri.select(F.col("y").alias("v")))
        .unionAll(tri.select(F.col("z").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    local = deg.join(tri_per_v, "v", "left").select(
        "v", "d", F.coalesce("t", F.lit(0)).alias("t")
    )
    n_edges = und.count()
    n_tri = tri.count()
    wedges = F.sum(F.col("d") * (F.col("d") - 1) / 2)
    out = local.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.lit(n_edges).cast("long").alias("n_edges"),
        wedges.cast("long").alias("n_wedges"),
        F.lit(n_tri).cast("long").alias("n_triangles"),
        F.round(F.lit(1e6) * 3 * n_tri / wedges)
        .cast("long")
        .alias("transitivity_micro"),
        F.round(
            F.lit(1e6)
            * F.avg(
                F.when(
                    F.col("d") >= 2,
                    F.lit(2.0) * F.col("t") / (F.col("d") * (F.col("d") - 1)),
                )
            )
        )
        .cast("long")
        .alias("avg_local_micro"),
    )
    rows = out.collect()
    und.unpersist()
    tri.unpersist()
    return spark.createDataFrame(rows, out.schema)


# ---------------------------------------------------------------- q466
# Declared candidate keys: (label, table, columns). Mix of true keys
# and non-keys so the uniqueness verdict exercises both branches.
_KEYS = [
    ("orders.o_orderkey", "orders", ["o_orderkey"]),
    ("orders.cust+date", "orders", ["o_custkey", "o_orderdate"]),
    ("lineitem.order+line", "lineitem", ["l_orderkey", "l_linenumber"]),
    ("lineitem.l_orderkey", "lineitem", ["l_orderkey"]),
    ("events.event_id", "events", ["event_id"]),
    ("customer.c_custkey", "customer", ["c_custkey"]),
]


def _key_oracle_block(label: str, table: str, cols: list[str]) -> str:
    collist = ", ".join(cols)
    return f"""
    SELECT '{label}' AS candidate,
           CAST(n AS BIGINT) AS n_rows,
           CAST(d AS BIGINT) AS n_distinct,
           CAST(ROUND(1e6 * d / n) AS BIGINT) AS uniqueness_ppm,
           d = n AS is_key
    FROM (
        SELECT COUNT(*) AS n,
               (SELECT COUNT(*) FROM
                   (SELECT DISTINCT {collist} FROM {table})) AS d
        FROM {table}
    )
    """


@register(
    "q466_candidate_key_discovery",
    "SELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        _key_oracle_block(lb, t, cs) for lb, t, cs in _KEYS
    )
    + "\n) ORDER BY candidate",
    doc="Candidate-key discovery (uniqueness profiling: is the "
    "declared column set actually a key — the certification that "
    "q31's dedup keys, q24's MERGE keys, and q76's SCD2 natural "
    "keys rest on): per candidate the exact distinct-combination "
    "count is compared to the row count, reported as a ppm "
    "uniqueness ratio and a hard is_key boolean. True keys "
    "(primary keys, order+linenumber) and non-keys (bare "
    "l_orderkey, cust+date) both appear so each verdict branch "
    "is proven against the oracle. Scale: one distinct-count per "
    "candidate — a map-side-combined shuffle on the candidate "
    "columns; candidates run as independent stages and the "
    "report is |candidates| rows of metadata.",
)
def q466_candidate_key_discovery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    out = None
    for label, table, cols in _KEYS:
        t = load_table(spark, sf_dir, table)
        row = t.agg(
            F.lit(label).alias("candidate"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct(*cols).cast("long").alias("n_distinct"),
            F.round(
                F.lit(1e6) * F.countDistinct(*cols) / F.count(F.lit(1))
            )
            .cast("long")
            .alias("uniqueness_ppm"),
            (F.countDistinct(*cols) == F.count(F.lit(1))).alias("is_key"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("candidate")
