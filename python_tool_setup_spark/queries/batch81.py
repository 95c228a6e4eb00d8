"""Round-5 gates, batch 81: Heaps'-law vocabulary growth curve (q366
— V(N) ~ K·N^beta: how fast the corpus vocabulary grows with tokens
read; the curve that sizes a tokenizer and predicts marginal-data
novelty, companion to q301's Zipf fit) and degree assortativity of
the event-transition graph (q367 — do high-fanout states feed
high-fanin states; the one-number mixing pattern of the q290
transition matrix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin, prefix_rank
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_CPS = [500, 1000, 2000, 4000, 8000, 16000, 32000, 64000]


# ---------------------------------------------------------------- q366
@register(
    "q366_heaps_law",
    f"""
    WITH toks AS (
        SELECT doc_id, i, arr[i] AS tok
        FROM (SELECT doc_id,
                     regexp_split_to_array(lower(text), '[^a-z0-9]+') AS arr
              FROM documents),
             generate_series(1, 1000) AS t(i)
        WHERE i <= len(arr) AND arr[i] <> ''
    ),
    pos AS (
        SELECT tok, ROW_NUMBER() OVER (ORDER BY doc_id, i) AS p FROM toks
    ),
    fp AS (SELECT tok, MIN(p) AS first_pos FROM pos GROUP BY tok),
    tot AS (SELECT COUNT(*) AS n_tok FROM pos),
    cps AS (
        SELECT N FROM (VALUES {", ".join(f"({n})" for n in _CPS)}) AS t(N)
        WHERE N <= (SELECT n_tok FROM tot)
    ),
    curve AS (
        SELECT N,
               (SELECT COUNT(*) FROM fp WHERE first_pos <= N) AS vocab
        FROM cps
    ),
    pts AS (
        SELECT N, vocab,
               CAST(ROUND(ln(CAST(N AS DOUBLE)) * 1000000000.0) AS BIGINT)
                   AS x,
               CAST(ROUND(ln(CAST(vocab AS DOUBLE)) * 1000000000.0)
                   AS BIGINT) AS y
        FROM curve
    ),
    fit AS (
        SELECT COUNT(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx
        FROM pts
    )
    SELECT CAST(p.N AS BIGINT) AS n_tokens,
           CAST(p.vocab AS BIGINT) AS vocab,
           CAST(ROUND(CAST(f.k * f.sxy - CAST(f.sx AS HUGEINT) * f.sy
                   AS DOUBLE)
               / CAST(f.k * f.sxx - CAST(f.sx AS HUGEINT) * f.sx AS DOUBLE)
               * 1000000.0) AS BIGINT) AS beta_micro
    FROM pts p, fit f ORDER BY n_tokens
    """,
    doc="Heaps'-law vocabulary growth curve with fitted exponent: "
    "V(N) = distinct tokens among the first N corpus tokens, read "
    "off as the CDF of each token's FIRST global occurrence "
    "position — the global position is the block-offset rank over "
    "(doc_id, position) (operators/blockrank.py, no global "
    "window), first positions reduce per token, and the whole "
    "curve is ONE conditional aggregate over the checkpoint grid. "
    "beta from the q301-convention log-log OLS (nano-quantized "
    "lns, HUGEINT/DECIMAL(38,0) moment products, one division). "
    "Typical text lands beta in [0.4, 0.6]; a near-1 slope says "
    "the corpus never stops minting tokens (tokenizer risk). "
    "Scale: tokenize scan + one token groupBy + metadata.",
)
def q366_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), "[^a-z0-9]+")).alias(
                "i", "tok"
            ),
        )
        .filter(F.col("tok") != "")
    )
    pos = prefix_rank(toks, [("doc_id", "asc"), ("i", "asc")], alias="p")
    fp = pos.groupBy("tok").agg(F.min("p").alias("first_pos"))
    # prefix_rank preserves row count, so the token total does not
    # need the rank machinery at all — count the raw token stream and
    # skip a second instantiation of the prefix pipeline.
    tot = toks.agg(F.count(F.lit(1)).alias("n_tok"))
    curve_row = fp.agg(
        *[
            F.sum(F.when(F.col("first_pos") <= n, 1).otherwise(0)).alias(
                f"v{n}"
            )
            for n in _CPS
        ]
    )
    curve = (
        curve_row.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(n).cast("long").alias("N"),
                            F.col(f"v{n}").cast("long").alias("vocab"),
                        )
                        for n in _CPS
                    ]
                )
            ).alias("s")
        )
        .select("s.N", "s.vocab")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("N") <= F.col("n_tok"))
    )
    # Pin the curve points once (≤ len(_CPS) rows): they feed both the
    # regression aggregate and the final projection, and without the
    # pin each reference re-instantiates the whole token/prefix-rank
    # pipeline (26 Exchange nodes in the r10-before plan).
    pts = pin(
        curve.select(
            "N",
            "vocab",
            F.round(F.log(F.col("N").cast("double")) * 1e9)
            .cast("long")
            .alias("x"),
            F.round(F.log(F.col("vocab").cast("double")) * 1e9)
            .cast("long")
            .alias("y"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    fit = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
    )
    num = (
        F.col("k") * F.col("sxy")
        - F.col("sx").cast("decimal(38,0)") * F.col("sy")
    ).cast("double")
    den = (
        F.col("k") * F.col("sxx")
        - F.col("sx").cast("decimal(38,0)") * F.col("sx")
    ).cast("double")
    return (
        pts.crossJoin(F.broadcast(fit))
        .select(
            F.col("N").cast("long").alias("n_tokens"),
            F.col("vocab").cast("long").alias("vocab"),
            F.round(num / den * 1000000.0).cast("long").alias("beta_micro"),
        )
        .orderBy("n_tokens")
    )


# ---------------------------------------------------------------- q367
@register(
    "q367_degree_assortativity",
    """
    WITH ordered AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev
        FROM events
    ),
    edges AS (
        SELECT prev AS src, event_type AS dst FROM ordered
        WHERE prev IS NOT NULL
    ),
    outd AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
    ind AS (SELECT dst, COUNT(*) AS id_ FROM edges GROUP BY dst),
    xy AS (
        SELECT o.od AS x, i.id_ AS y
        FROM edges e JOIN outd o ON e.src = o.src
                     JOIN ind i ON e.dst = i.dst
    ),
    s AS (
        SELECT COUNT(*) AS m, SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy
        FROM xy
    )
    SELECT CAST(m AS BIGINT) AS m_edges,
           CAST(ROUND(CAST(m * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                      * CAST(m * syy - sy * sy AS DOUBLE))
               * 1000000.0) AS BIGINT) AS assortativity_micro
    FROM s
    """,
    doc="Degree assortativity of the user-journey transition "
    "multigraph (q290's edges, one number: Pearson correlation "
    "across edges between source out-degree and destination "
    "in-degree — positive means hub states chain into hub states, "
    "negative means hubs scatter into leaves; the mixing-pattern "
    "diagnostic for funnel graphs): edges from per-user LAG "
    "windows (partitioned — embarrassingly parallel), degree "
    "tables are |event_type| metadata broadcast back, and the "
    "correlation reduces with HUGEINT/DECIMAL(38,0) moment "
    "products (cast BEFORE multiply — the q301/q319 overflow "
    "posture), one sqrt at the end. Scale: one edge shuffle on "
    "the tiny node domain.",
)
def q367_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .filter(F.col("src").isNotNull())
    )
    # ONE window pass: reduce edges to the (src, dst) PAIR TABLE first
    # (bounded by |event_type|² — metadata-sized), then degrees and
    # every co-moment derive from it by exact integer regrouping
    # (sum over edges of f(x,y) == sum over pairs of cnt·f(x,y); all
    # decimal(38,0) arithmetic, so the regrouped sums are
    # bit-identical). The old shape instantiated the lag-window edge
    # stream three times (outd, ind, xy) — 3 events scans + 3 window
    # sorts in the plan for two bounded degree maps.
    # (not pinned: the three pair consumers are plan-identical, so
    # runtime exchange reuse already shares the window+aggregate
    # stages — a pin measured slower, 0.90 vs 0.82 min-of-4, r11)
    pair = edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cnt"))
    outd = pair.groupBy("src").agg(F.sum("cnt").alias("od"))
    ind = pair.groupBy("dst").agg(F.sum("cnt").alias("id_"))
    xy = (
        pair.join(F.broadcast(outd), "src")
        .join(F.broadcast(ind), "dst")
        .select("cnt", F.col("od").alias("x"), F.col("id_").alias("y"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    n = F.col("cnt").cast("decimal(38,0)")
    s = xy.agg(
        F.sum("cnt").alias("m"),
        F.sum(n * F.col("x")).alias("sx"),
        F.sum(n * F.col("y")).alias("sy"),
        F.sum(n * dec("x") * F.col("y")).alias("sxy"),
        F.sum(n * dec("x") * F.col("x")).alias("sxx"),
        F.sum(n * dec("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    denx = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    deny = (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return s.select(
        F.col("m").cast("long").alias("m_edges"),
        F.round(num / F.sqrt(denx * deny) * 1000000.0)
        .cast("long")
        .alias("assortativity_micro"),
    )
