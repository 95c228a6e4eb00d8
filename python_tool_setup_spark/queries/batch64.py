"""Round-4 gates, batch 64: EXACT set-similarity join with PPJoin
prefix filtering (q333) — the deterministic alternative to the
MinHash-LSH family (q36/q39): LSH trades recall for speed, prefix
filtering prunes candidates WITHOUT losing a single pair, and the
brute-force oracle proves that completeness end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

# Jaccard threshold 3/5 kept as integers: ceil(0.6*n) = (3n+4) div 5.
_T_NUM, _T_DEN = 3, 5


def _shingles(d: DataFrame) -> DataFrame:
    # Array-local 3-gram construction (zero shuffles — see
    # batch90._spark_shingles for the rationale and the exact-set
    # equivalence argument vs the old explode + lead window + distinct).
    from python_tool_setup_spark.queries.batch90 import _spark_shingles

    return _spark_shingles(d, 3)


# ---------------------------------------------------------------- q333
@register(
    "q333_ppjoin_similarity",
    """
    WITH toks AS (
        SELECT DISTINCT doc_id, w1 || ' ' || w2 || ' ' || w3 AS sh
        FROM (
            SELECT doc_id, arr[i] AS w1, arr[i+1] AS w2, arr[i+2] AS w3
            FROM (SELECT doc_id, string_split(text, ' ') AS arr
                  FROM documents),
                 generate_series(1, 1000) AS t(i)
            WHERE i + 2 <= len(arr)
        )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
        FROM toks a JOIN toks b
          ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT i.d1, i.d2,
           CAST(i.c AS BIGINT) AS n_inter,
           CAST(s1.n AS BIGINT) AS n1,
           CAST(s2.n AS BIGINT) AS n2,
           CAST(ROUND(CAST(i.c AS DOUBLE)
               / CAST(s1.n + s2.n - i.c AS DOUBLE) * 1000000.0)
               AS BIGINT) AS jaccard_micro
    FROM inter i
    JOIN sizes s1 ON s1.doc_id = i.d1
    JOIN sizes s2 ON s2.doc_id = i.d2
    WHERE 5 * i.c >= 3 * (s1.n + s2.n - i.c)
    ORDER BY i.d1, i.d2
    """,
    doc="EXACT set-similarity self-join (3-gram shingle sets, "
    "Jaccard >= 0.6) with PPJoin-style prefix filtering — the "
    "deterministic, zero-false-negative alternative to the "
    "MinHash-LSH family (q36 trades recall for speed; prefix "
    "filtering prunes WITHOUT losing pairs): per doc, tokens "
    "sort by global document frequency (rarest first, shingle "
    "tiebreak) and only the first n - ceil(t*n) + 1 tokens — "
    "kept as exact integers, (3n+4) div 5 — generate candidates "
    "(two sets with Jaccard >= t MUST share a prefix token: the "
    "pigeonhole bound from Chaudhuri/Xiao et al.), and the PPJoin "
    "length filter prunes size-incompatible pairs in the same join "
    "(J >= 3/5 forces 5*min(n1,n2) >= 3*max(n1,n2)); candidates "
    "then verify with full intersection counts and the integer "
    "cross-multiplied threshold 5c >= 3(n1+n2-c) — no FP in the "
    "filter at all. The DuckDB oracle brute-forces ALL "
    "shingle-sharing pairs, so the match proves the prefix "
    "filter lost nothing. Scale: candidates come only from "
    "rare-token buckets (df-ascending prefixes), verification "
    "joins touch candidate pairs x their two token sets — the "
    "frequent-shingle hot buckets the naive join dies on never "
    "enter the plan.",
)
def q333_ppjoin_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # The shingle relation feeds FOUR consumers (sizes, df table,
    # ranked prefixes, both verification sides); without pinning it,
    # each consumer re-runs the explode+distinct shuffle. Persist is
    # the right call at any scale (it's the algorithm's working set);
    # bench hygiene clears cache per gate.
    toks = _shingles(d).persist()
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    df_tab = toks.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        toks.join(df_tab, "sh")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "sh")
            ),
        )
        .join(F.broadcast(sizes), "doc_id")
    )
    prefix = ranked.filter(
        F.col("rk") <= F.col("n") - F.expr(f"div({_T_NUM} * n + 4, {_T_DEN})") + 1
    ).select("doc_id", "sh", "n", "rk")
    a = prefix.alias("a")
    b = prefix.alias("b")
    # length filter: J >= 3/5 forces 5*min(n1,n2) >= 3*max(n1,n2)
    # (even full containment of the smaller set cannot reach the
    # threshold otherwise) — sizes ride the prefix rows, so the prune
    # happens inside candidate generation, before the distinct and
    # long before the verification join
    # PPJoin positional filter (Xiao et al.): per candidate pair,
    # upper-bound the achievable overlap from the prefix matches
    # themselves. Both docs list tokens in the SAME global order
    # (df asc, sh tiebreak), so the shared prefix tokens appear in the
    # same relative order in both docs and the match with the largest
    # rank on one side is the largest on the other. With po = number
    # of prefix-prefix shared tokens and (i*, j*) the ranks of the
    # LAST such token, every other shared token sits strictly after
    # (i*, j*) on BOTH sides (a shared token outside either prefix is
    # later in the global order than every prefix-prefix match), so
    #   overlap <= po + min(n1 - i*, n2 - j*).
    # Jaccard >= 3/5 needs 8*overlap >= 3*(n1+n2); pairs whose upper
    # bound cannot reach that are pruned HERE — before the verify join
    # expands each pair by its full token sets — with exact integer
    # arithmetic, so no true pair is ever lost (the r10 revert showed
    # the verify expansion is the real cost; this shrinks its input).
    # The groupBy replaces the old .distinct(): same shuffle key, a
    # few small agg columns instead of dedup, strictly fewer pairs out.
    matches = a.join(
        b,
        (F.col("a.sh") == F.col("b.sh"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (_T_DEN * F.col("a.n") >= _T_NUM * F.col("b.n"))
        & (_T_DEN * F.col("b.n") >= _T_NUM * F.col("a.n")),
    ).select(
        F.col("a.doc_id").alias("d1"),
        F.col("b.doc_id").alias("d2"),
        F.col("a.rk").alias("ia"),
        F.col("b.rk").alias("jb"),
        F.col("a.n").alias("na"),
        F.col("b.n").alias("nb"),
    )
    cand = (
        matches.groupBy("d1", "d2")
        .agg(
            F.count(F.lit(1)).alias("po"),
            F.max("ia").alias("ia"),
            F.max("jb").alias("jb"),
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
        )
        .filter(
            (_T_NUM + _T_DEN)
            * (
                F.col("po")
                + F.least(
                    F.col("na") - F.col("ia"), F.col("nb") - F.col("jb")
                )
            )
            >= _T_NUM * (F.col("na") + F.col("nb"))
        )
        .select("d1", "d2")
    )
    t1 = toks.select(F.col("doc_id").alias("d1"), F.col("sh").alias("sh1"))
    t2 = toks.select(F.col("doc_id").alias("d2"), F.col("sh").alias("sh2"))
    inter = (
        cand.join(t1, "d1")
        .join(t2, "d2")
        .filter(F.col("sh1") == F.col("sh2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    out = inter.join(F.broadcast(s1), "d1").join(F.broadcast(s2), "d2")
    union = F.col("n1") + F.col("n2") - F.col("c")
    return (
        out.filter(5 * F.col("c") >= 3 * union)
        .select(
            "d1",
            "d2",
            F.col("c").cast("long").alias("n_inter"),
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.round(F.col("c").cast("double") / union.cast("double") * 1000000.0)
            .cast("long")
            .alias("jaccard_micro"),
        )
        .orderBy("d1", "d2")
    )
