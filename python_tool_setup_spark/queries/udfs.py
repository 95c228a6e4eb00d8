"""User-defined-function surface (SURVEY.md §2.5 L6): Arrow-batched
scalar pandas UDF, grouped-map applyInPandas, and a Python UDTF — each
oracle-checked against the equivalent pure-SQL computation.

Scale notes: all three run vectorized over Arrow batches (never
row-at-a-time Python); grouped-map shuffles once on the group key; the
UDTF streams partition-local with no shuffle. These queries exist to
prove the UDF plumbing — equivalent logic that CAN be a built-in
expression should be one (see the rest of the registry).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


@register(
    "q55_pandas_udf",
    """
    SELECT vec_id,
           label,
           ROUND(SQRT(list_sum(list_transform(
               CAST(embedding AS DOUBLE[]), x -> x * x))), 4) AS l2_norm
    FROM embeddings
    """,
    doc="Scalar pandas UDF (Arrow-batched numpy L2 norm) over the "
    "embedding column; oracle is the SQL list-fold equivalent.",
)
def q55_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @pandas_udf("double")
    def l2_norm(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(np.sqrt((mat * mat).sum(axis=1)))

    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", "label", F.round(l2_norm("embedding"), 4).alias("l2_norm")
    )


@register(
    "q56_grouped_map",
    """
    WITH stats AS (
        -- exact integer moments (q212 recipe) + scale-first round
        -- (q208 recipe): float window AVG/STDDEV drift by summation
        -- order across engines, and a z within ulps of a .00005
        -- midpoint then rounds apart; int64 cent sums + HUGEINT
        -- square-sums are order-free, so mu/sigma/z are bit-identical
        SELECT o_orderpriority,
               COUNT(*) AS cnt,
               SUM(CAST(ROUND(100 * o_totalprice) AS BIGINT)) AS sc,
               SUM(CAST(CAST(ROUND(100 * o_totalprice) AS BIGINT)
                        AS HUGEINT)
                   * CAST(ROUND(100 * o_totalprice) AS BIGINT)) AS sc2
        FROM orders GROUP BY o_orderpriority
    ),
    m AS (
        SELECT o_orderpriority,
               CAST(sc AS DOUBLE) / (100.0 * cnt) AS mu,
               SQRT(CAST(cnt * sc2 - CAST(sc AS HUGEINT) * sc AS DOUBLE)
                    / (CAST(cnt AS DOUBLE) * (cnt - 1) * 10000))
                   AS sigma
        FROM stats
    )
    SELECT o_orderkey,
           o.o_orderpriority,
           ROUND(10000 * ((o_totalprice - m.mu) / m.sigma)) / 10000.0
               AS z_score
    FROM orders o JOIN m USING (o_orderpriority)
    """,
    doc="Grouped-map applyInPandas: per-priority z-score normalization "
    "(one shuffle on the group key, Arrow-batched pandas per group); "
    "oracle is the window-function rewrite.",
)
def q56_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        # Mirror the oracle's exact arithmetic op-for-op (cents are
        # exact int64; Python ints give the exact square-sum; each
        # double op below is the same IEEE op both engines run). A
        # pandas mean()/std() here would drift by summation order.
        import numpy as np

        c = (100.0 * pdf["o_totalprice"]).round().astype("int64")
        n = len(pdf)
        sc = int(c.sum())
        sc2 = sum(int(v) * int(v) for v in c)
        mu = sc / (100.0 * n)
        sigma = math.sqrt(
            float(n * sc2 - sc * sc) / (float(n) * (n - 1) * 10000)
        )
        z = (pdf["o_totalprice"] - mu) / sigma
        # scale-first round: np.rint's half-even differs from the
        # engines' half-away only on EXACT dyadic ties, which the
        # irrational sigma makes unreachable
        pdf["z_score"] = np.rint(10000 * z) / 10000.0
        return pdf[["o_orderkey", "o_orderpriority", "z_score"]]

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return o.groupBy("o_orderpriority").applyInPandas(
        zscore, "o_orderkey long, o_orderpriority string, z_score double"
    )


@register(
    "q57_udtf",
    """
    SELECT doc_id, token, COUNT(*) AS cnt
    FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    )
    WHERE LENGTH(token) >= 6
    GROUP BY doc_id, token
    """,
    doc="Python UDTF (Spark 4 table function): per-document token "
    "histogram for tokens >= 6 chars, lateral-joined to documents; "
    "oracle is the unnest + group-by rewrite.",
)
def q57_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @udtf(returnType="token string, cnt long")
    class TokenCounts:
        def eval(self, text: str):
            counts: dict[str, int] = {}
            for tok in (text or "").lower().split(" "):
                if len(tok) >= 6:
                    counts[tok] = counts.get(tok, 0) + 1
            for tok, cnt in counts.items():
                yield tok, cnt

    spark.udtf.register("token_counts", TokenCounts)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.cnt
        FROM documents d, LATERAL token_counts(d.text) t
        """
    )
