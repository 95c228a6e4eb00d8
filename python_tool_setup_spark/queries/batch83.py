"""Round-5 gates, batch 83: vocabulary-tier mix per source (q370 —
what share of each source's token mass is head / middle / tail
vocabulary: the head-heaviness profile that says one source is
boilerplate and another is long-tail-rich) and the language-ID
confusion matrix (q371 — q33's stopword-vote classifier evaluated
the way an eval harness would: full actual x predicted matrix with
per-language recall, both engines running the PROVABLY same vote
via the shared SQL fragments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.queries.llm import _LANGID_CASE, _LANGID_SCORED_CTE
from python_tool_setup_spark.tables import load_table

_HEAD_K = 100
_MID_K = 1000


# ---------------------------------------------------------------- q370
@register(
    "q370_vocab_tier_mix",
    f"""
    WITH toks AS (
        SELECT source, tok
        FROM documents,
             UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
                 AS t(tok)
        WHERE tok <> ''
    ),
    global_rank AS (
        SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
        FROM toks GROUP BY tok
    ),
    tiers AS (
        SELECT tok,
               CASE WHEN rk <= {_HEAD_K} THEN 'head'
                    WHEN rk <= {_MID_K} THEN 'middle'
                    ELSE 'tail' END AS tier
        FROM global_rank
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS token_mass,
           CAST(SUM(CASE WHEN tier = 'head' THEN 1 ELSE 0 END) AS BIGINT)
               AS head_mass,
           CAST(SUM(CASE WHEN tier = 'middle' THEN 1 ELSE 0 END) AS BIGINT)
               AS middle_mass,
           CAST(SUM(CASE WHEN tier = 'tail' THEN 1 ELSE 0 END) AS BIGINT)
               AS tail_mass,
           CAST(ROUND(CAST(SUM(CASE WHEN tier = 'head' THEN 1 ELSE 0 END)
               AS DOUBLE) / COUNT(*) * 1000000.0) AS BIGINT)
               AS head_share_micro
    FROM toks JOIN tiers USING (tok)
    GROUP BY source ORDER BY source
    """,
    doc="Vocabulary-tier mix per source: rank the GLOBAL vocabulary "
    f"by frequency (top-{_HEAD_K} = head, top-{_MID_K} = middle, "
    "rest = tail — Zipf tiers, q301's curve cut into bands) and "
    "report how each source's token MASS distributes across the "
    "tiers — boilerplate sources live in the head, rich prose "
    "carries a fat tail; the mix is what a dedup/quality triage "
    "reads before weighting sources. Spark keeps the tier table "
    "as a broadcast (vocabulary-domain metadata; the global rank "
    "is a TakeOrdered-free groupBy + rank over the aggregated "
    "token domain via the block-offset rank). Scale: one tokenize "
    "pass, one token groupBy, one broadcast join back.",
)
def q370_vocab_tier_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.operators.blockrank import pin, prefix_rank

    d = load_table(spark, sf_dir, "documents")
    # Tokenization explode feeds the frequency ranking AND the tier
    # join-back: pin it so documents is tokenized once.
    toks = pin(
        d.select(
            "source",
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    ranked = prefix_rank(freq, [("n", "desc"), ("tok", "asc")], alias="rk")
    tiers = ranked.select(
        "tok",
        F.when(F.col("rk") <= _HEAD_K, "head")
        .when(F.col("rk") <= _MID_K, "middle")
        .otherwise("tail")
        .alias("tier"),
    )
    tiered = toks.join(tiers, "tok")
    is_ = lambda t: F.sum(F.when(F.col("tier") == t, 1).otherwise(0))
    return (
        tiered.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("token_mass"),
            is_("head").alias("head_mass"),
            is_("middle").alias("middle_mass"),
            is_("tail").alias("tail_mass"),
        )
        .select(
            "source",
            F.col("token_mass").cast("long").alias("token_mass"),
            F.col("head_mass").cast("long").alias("head_mass"),
            F.col("middle_mass").cast("long").alias("middle_mass"),
            F.col("tail_mass").cast("long").alias("tail_mass"),
            F.round(
                F.col("head_mass").cast("double")
                / F.col("token_mass").cast("double")
                * 1000000.0
            )
            .cast("long")
            .alias("head_share_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------- q371
@register(
    "q371_langid_confusion",
    f"""
{_LANGID_SCORED_CTE},
    pred AS (
        SELECT lang AS actual, {_LANGID_CASE} AS predicted FROM scored
    ),
    cells AS (
        SELECT actual, predicted, COUNT(*) AS n FROM pred GROUP BY 1, 2
    ),
    totals AS (
        SELECT actual, SUM(n) AS n_actual FROM cells GROUP BY actual
    )
    SELECT c.actual, c.predicted,
           CAST(c.n AS BIGINT) AS n,
           CAST(t.n_actual AS BIGINT) AS n_actual,
           CAST(ROUND(CAST(c.n AS DOUBLE) / CAST(t.n_actual AS DOUBLE)
               * 1000000.0) AS BIGINT) AS share_micro
    FROM cells c JOIN totals t USING (actual)
    ORDER BY actual, predicted
    """,
    doc="Language-ID confusion matrix: q33's stopword-vote "
    "classifier scored the way an eval harness scores it — the "
    "full actual x predicted count matrix with per-actual-language "
    "share (the diagonal is recall; off-diagonal cells name the "
    "confusion pairs a better classifier should attack first). "
    "The oracle reuses the SAME shared SQL fragments as q33's "
    "(_LANGID_SCORED_CTE/_LANGID_CASE), so the two gates are "
    "provably scoring one vote, and the Spark side reuses "
    "llm/text.py's language_id operator unchanged. Scale: the "
    "classifier is a per-row projection; the matrix is "
    "|langs|^2 metadata.",
)
def q371_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_tool_setup_spark.llm.text import language_id

    d = load_table(spark, sf_dir, "documents")
    pred = language_id(d, "text").select(
        F.col("lang").alias("actual"), F.col("lang_pred").alias("predicted")
    )
    cells = pred.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = cells.groupBy("actual").agg(F.sum("n").alias("n_actual"))
    return (
        cells.join(F.broadcast(totals), "actual")
        .select(
            "actual",
            "predicted",
            F.col("n").cast("long").alias("n"),
            F.col("n_actual").cast("long").alias("n_actual"),
            F.round(
                F.col("n").cast("double")
                / F.col("n_actual").cast("double")
                * 1000000.0
            )
            .cast("long")
            .alias("share_micro"),
        )
        .orderBy("actual", "predicted")
    )
