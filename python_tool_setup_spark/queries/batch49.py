"""Round-4 gates, batch 49: exact ROC-AUC via the rank-sum identity
(q302 — the classifier-eval staple, computed tie-correctly without
any curve sweep) and a key-skew Gini profile (q303 — the shuffle-
health diagnostic: how unequal the per-key load is, computed from
the size HISTOGRAM so it never needs a global sort of keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin, prefix_agg
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.queries.exactcast import dd_duck
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q302
@register(
    "q302_exact_auc",
    """
    WITH scored AS (
        SELECT n_chars AS s,
               CASE WHEN text LIKE '%data%' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    grp AS (
        SELECT s, COUNT(*) AS cnt, SUM(y) AS cnt_pos
        FROM scored GROUP BY s
    ),
    cum AS (
        SELECT s, cnt, cnt_pos,
               SUM(cnt) OVER (ORDER BY s) - cnt AS cnt_lt
        FROM grp
    ),
    agg AS (
        SELECT SUM(cnt_pos * (2 * cnt_lt + cnt + 1)) AS sum_r2,
               SUM(cnt_pos) AS n1,
               SUM(cnt) - SUM(cnt_pos) AS n0
        FROM cum
    )
    SELECT CAST(n1 AS BIGINT) AS n_pos,
           CAST(n0 AS BIGINT) AS n_neg,
           CAST(sum_r2 AS BIGINT) AS sum_ranks_x2,
           CAST(ROUND((CAST(sum_r2 - n1 * (n1 + 1) AS DOUBLE)
               / CAST(2 * n1 * n0 AS DOUBLE)) * 1000000.0) AS BIGINT)
               AS auc_micro,
           CAST(ROUND(((CAST(sum_r2 - n1 * (n1 + 1) AS DOUBLE)
               / CAST(2 * n1 * n0 AS DOUBLE)) * 2.0 - 1.0)
               * 1000000.0) AS BIGINT) AS gini_micro
    FROM agg
    """,
    doc="Exact ROC-AUC via the Mann-Whitney rank-sum identity "
    "(AUC = (R1 - n1(n1+1)/2) / (n1*n0) with midrank tie "
    "handling): scoring documents by length against the "
    "'mentions data' label. Doubled average ranks keep EVERYTHING "
    "integer — per score group each positive contributes "
    "2*cnt_lt + cnt + 1, so ties are exact with no half units, "
    "and the single final division is correctly rounded then "
    "micro-quantized (the eval-metric sibling of q154's "
    "recall@k and q184's classifier gates). Plan: one groupBy on "
    "the score, ONE cumulative window over the distinct-score "
    "table (cardinality of scores, not rows), and a 1-row reduce "
    "— no per-threshold curve sweep, no global sort of the data. "
    "At 100 TB the rank products pass 2^63 -> same "
    "DECIMAL(38,0)/HUGEINT posture as q298.",
)
def q302_exact_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.operators.evalmetrics import exact_auc

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        F.col("n_chars").alias("s"),
        F.when(F.col("text").contains("data"), 1).otherwise(0).alias("y"),
    )
    return exact_auc(scored, "s", "y")


# ---------------------------------------------------------------- q303
@register(
    "q303_key_skew_gini",
    f"""
    WITH sizes AS (
        SELECT user_id, COUNT(*) AS x FROM events GROUP BY user_id
    ),
    hist AS (
        SELECT x, COUNT(*) AS m FROM sizes GROUP BY x
    ),
    cum AS (
        SELECT x, m,
               SUM(m) OVER (ORDER BY x) - m AS a,
               SUM(m) OVER () AS n,
               SUM(CAST(x AS HUGEINT) * m) OVER () AS total
        FROM hist
    ),
    agg AS (
        SELECT SUM(CAST(x AS HUGEINT) * m * (2 * a + m - n)) AS numer,
               MAX(n) AS n_keys, MAX(total) AS n_events,
               MAX(x) AS max_size
        FROM cum
    )
    SELECT CAST(n_keys AS BIGINT) AS n_keys,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(max_size AS BIGINT) AS max_size,
           CAST(ROUND((CAST(max_size AS DOUBLE)
               / CAST(n_events AS DOUBLE)) * 1000000.0) AS BIGINT)
               AS max_share_micro,
           CAST(ROUND(({dd_duck('numer')}
               / {dd_duck('CAST(n_keys AS HUGEINT) * n_events')}) * 1000000.0)
               AS BIGINT)
               AS gini_micro
    FROM agg
    """,
    doc="Key-skew Gini profile over the event stream's user key — "
    "the shuffle-health diagnostic that says WHETHER q155's "
    "auto-salting / AQE skew handling is needed before you pay "
    "for it. Gini needs keys in size order, but sorting billions "
    "of keys is exactly what a skew probe must not do: instead "
    "the per-key sizes collapse to a size HISTOGRAM (distinct "
    "sizes, usually a few hundred), and the rank-run identity "
    "sum_{run}(2i-n-1) = m*(2a+m-n) turns the Gini numerator "
    "into one pass over that histogram — all integers (HUGEINT/"
    "DECIMAL products), one cumulative window over metadata, "
    "micro-quantized last. Outputs max-key share alongside (the "
    "single-hot-key smell AQE's skew factor keys off).",
)
def q303_key_skew_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sizes = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    # Pin the ≤|distinct sizes|-row histogram: tot and the prefix both
    # re-reference it, and unpinned each re-ran the events scan + the
    # user-key shuffle.
    hist = pin(sizes.groupBy("x").agg(F.count(F.lit(1)).alias("m")))
    tot = hist.agg(
        F.sum("m").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("m")).alias("total"),
    )
    cum = prefix_agg(hist, [("x", "asc")], {"a": ("sum", "m")}).crossJoin(
        F.broadcast(tot)
    )
    agg = cum.agg(
        F.sum(
            F.col("x").cast("decimal(38,0)")
            * F.col("m")
            * (2 * F.col("a") + F.col("m") - F.col("n"))
        ).alias("numer"),
        F.max("n").alias("n_keys"),
        F.max("total").alias("n_events"),
        F.max("x").alias("max_size"),
    )
    return agg.select(
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("max_size").cast("long").alias("max_size"),
        F.round(
            (F.col("max_size").cast("double") / F.col("n_events").cast("double"))
            * 1000000.0
        )
        .cast("long")
        .alias("max_share_micro"),
        F.round(
            (
                F.col("numer").cast("double")
                / (F.col("n_keys") * F.col("n_events")).cast("double")
            )
            * 1000000.0
        )
        .cast("long")
        .alias("gini_micro"),
    )
