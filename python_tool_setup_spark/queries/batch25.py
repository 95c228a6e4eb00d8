"""Round-3 gates, batch 25: the pandas-on-Spark API surface (q234) —
`pyspark.pandas`, the drop-in pandas dialect that compiles to the same
Catalyst plans, letting pandas-fluent users run on the cluster without
rewriting to DataFrame verbs. The gate proves the dialect round-trips
through the engine (groupby/agg/sort in pandas syntax, `.to_spark()`
back) and matches the relational oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q234
@register(
    "q234_pandas_api",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(o_totalprice), 2) AS avg_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="pandas-on-Spark API (`pyspark.pandas`): the same aggregation "
    "written in pandas dialect — groupby().agg() with named columns, "
    "reset_index, sort_values — compiles to the identical Catalyst "
    "hash-aggregate plan as the DataFrame verbs (NOT driver-side "
    "pandas: the data never leaves the executors, and "
    "`distributed-sequence` indexing avoids the single-partition "
    "default-index trap). `.to_spark()` hands the result back to the "
    "relational surface. This is the migration surface for "
    "pandas-fluent users at 100 TB; the oracle pins that the dialect "
    "changes syntax, not semantics.",
)
def q234_pandas_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.pandas as ps

    prev = ps.get_option("compute.default_index_type")
    ps.set_option("compute.default_index_type", "distributed-sequence")
    try:
        pdf = load_table(spark, sf_dir, "orders").pandas_api()
        agg = (
            pdf.groupby("o_orderpriority")
            .agg(
                n=("o_orderkey", "count"),
                avg_price=("o_totalprice", "mean"),
                max_price=("o_totalprice", "max"),
            )
            .reset_index()
            .sort_values("o_orderpriority")
        )
        out = agg.to_spark()
    finally:
        ps.set_option("compute.default_index_type", prev)
    return out.select(
        "o_orderpriority",
        F.col("n").cast("bigint").alias("n"),
        F.round("avg_price", 2).alias("avg_price"),
        F.round("max_price", 2).alias("max_price"),
    ).orderBy("o_orderpriority")
