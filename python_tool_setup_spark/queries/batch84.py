"""Round-5 gates, batch 84: source-concentration HHI per language
(q372 — the Herfindahl index that flags languages dominated by one
source: a diversity risk a data card must disclose) and c-TF-IDF
distinctive keywords per source (q373 — BERTopic's class-based
TF-IDF: the three tokens that say what makes each source different,
not what it shares with everything).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_KEY_TOP = 3


# ---------------------------------------------------------------- q372
@register(
    "q372_source_concentration_hhi",
    """
    WITH cells AS (
        SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT lang, SUM(n) AS nl FROM cells GROUP BY lang),
    shares AS (
        SELECT c.lang, c.source, c.n, t.nl,
               CAST(c.n AS DOUBLE) / t.nl AS p
        FROM cells c JOIN tot t USING (lang)
    ),
    hhi AS (
        SELECT lang,
               COUNT(*) AS n_sources,
               CAST(ROUND(SUM(p * p) * 1000000.0) AS BIGINT) AS hhi_micro
        FROM shares GROUP BY lang
    ),
    top AS (
        SELECT lang, source AS top_source, n, nl,
               ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY n DESC, source) AS rk
        FROM shares
    )
    SELECT h.lang,
           CAST(h.n_sources AS BIGINT) AS n_sources,
           h.hhi_micro,
           t.top_source,
           CAST(ROUND(CAST(t.n AS DOUBLE) / t.nl * 1000000.0) AS BIGINT)
               AS top_share_micro
    FROM hhi h JOIN top t ON h.lang = t.lang AND t.rk = 1
    ORDER BY h.lang
    """,
    doc="Source-concentration Herfindahl-Hirschman index per "
    "language (HHI = sum of squared source shares — antitrust's "
    "concentration number applied to corpus provenance: 1e6 means "
    "one source owns the language, 1e6/k means k equal sources; "
    "the single-point-of-failure disclosure beside q349's global "
    "diversity): per-(lang, source) counts in one groupBy, shares "
    "squared as products of identical doubles, the dominant "
    "source pinned by a window PARTITIONED by lang with "
    "deterministic ties. Scale: |langs| x |sources| metadata "
    "after one aggregate.",
)
def q372_source_concentration_hhi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # O(lang×source) cell table: every downstream consumer (totals,
    # shares, HHI, top-source window) re-instantiated it — pin it so
    # documents is scanned once.
    cells = pin(
        d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cells.groupBy("lang").agg(F.sum("n").alias("nl"))
    shares = cells.join(F.broadcast(tot), "lang").withColumn(
        "p", F.col("n").cast("double") / F.col("nl")
    )
    hhi = shares.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.round(F.sum(F.col("p") * F.col("p")) * 1000000.0)
        .cast("long")
        .alias("hhi_micro"),
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "source")
    top = (
        shares.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "lang",
            F.col("source").alias("top_source"),
            F.round(F.col("n").cast("double") / F.col("nl") * 1000000.0)
            .cast("long")
            .alias("top_share_micro"),
        )
    )
    return (
        hhi.join(top, "lang")
        .select(
            "lang",
            F.col("n_sources").cast("long").alias("n_sources"),
            "hhi_micro",
            "top_source",
            "top_share_micro",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------- q373
@register(
    "q373_ctfidf_keywords",
    f"""
    WITH toks AS (
        SELECT source, tok
        FROM documents,
             UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
                 AS t(tok)
        WHERE tok <> ''
    ),
    tf AS (SELECT source, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    ns AS (SELECT COUNT(DISTINCT source) AS s FROM tf),
    scored AS (
        SELECT tf.source, tf.tok,
               CAST(ROUND(tf.tf * ln(CAST(s AS DOUBLE) / df.df)
                   * 1000000000.0) AS BIGINT) AS score_nano
        FROM tf JOIN df USING (tok), ns
    ),
    ranked AS (
        SELECT source, tok, score_nano,
               ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY score_nano DESC, tok) AS rk
        FROM scored
    )
    SELECT source, CAST(rk AS BIGINT) AS rk, tok, score_nano
    FROM ranked WHERE rk <= {_KEY_TOP}
    ORDER BY source, rk
    """,
    doc="c-TF-IDF distinctive keywords per source (BERTopic's "
    "class-based TF-IDF: treat each source's concatenated text as "
    "one class document, weight term frequency by ln(S/df) over "
    "SOURCES-containing-term — terms every source shares score "
    "exactly 0 and vanish; what survives is each source's "
    "signature vocabulary, the three-word summary a corpus map "
    "shows per node): per-(source, token) counts in one groupBy, "
    "source-level df on the aggregated domain, scores "
    "nano-quantized (tf * ln — integer tf times 1-ulp ln, "
    "quantized per term), top-3 via windows PARTITIONED by "
    "source. Scale: one tokenize pass + token-domain metadata.",
)
def q373_ctfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "source",
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    tf = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ns = tf.agg(F.count_distinct("source").alias("s"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(ns))
        .select(
            "source",
            "tok",
            F.round(
                F.col("tf")
                * F.log(F.col("s").cast("double") / F.col("df"))
                * 1000000000.0
            )
            .cast("long")
            .alias("score_nano"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("score_nano").desc(), "tok"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KEY_TOP)
        .select(
            "source", F.col("rk").cast("long").alias("rk"), "tok", "score_nano"
        )
        .orderBy("source", "rk")
    )
