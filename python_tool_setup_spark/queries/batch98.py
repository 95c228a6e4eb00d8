"""Round-5 gates, batch 98: Markov transition entropy (q400 — the
conditional entropy H(next | current) of the per-user event-type
chain: q290 counts the transition MATRIX, this gate scores how
PREDICTABLE each state's successor is, the one-number summary a
sequence-model curriculum uses to rank event streams) and
business-day shipping latency (q401 — order-to-ship latency in
BUSINESS days via a closed-form weekday count, the SLA clock that
q337's freshness gate leaves in calendar days).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q400
@register(
    "q400_markov_transition_entropy",
    """
    WITH seq AS (
        SELECT user_id, event_type AS cur,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    trans AS (
        SELECT cur, nxt, COUNT(*) AS c FROM seq
        WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    tot AS (
        SELECT cur, SUM(c) AS t, COUNT(*) AS fanout FROM trans GROUP BY cur
    ),
    terms AS (
        SELECT tr.cur, to_.t, to_.fanout,
               CAST(ROUND(-1e9 * (CAST(tr.c AS DOUBLE) / to_.t)
                    * ln(CAST(tr.c AS DOUBLE) / to_.t)) AS BIGINT)
                   AS term_nano
        FROM trans tr JOIN tot to_ ON tr.cur = to_.cur
    )
    SELECT cur AS event_type,
           CAST(MAX(t) AS BIGINT) AS n_transitions,
           CAST(MAX(fanout) AS BIGINT) AS fanout,
           CAST(SUM(term_nano) AS BIGINT) AS entropy_nano
    FROM terms GROUP BY cur ORDER BY cur
    """,
    doc="Conditional entropy of the per-user event-type Markov chain "
    "(H(next|cur) = -SUM p ln p over each state's successor "
    "distribution — q290 counts the transition matrix, this gate "
    "scores each state's successor PREDICTABILITY, the signal a "
    "sequence-model curriculum or anomaly monitor ranks streams "
    "by; fanout = number of distinct successors): successors via "
    "per-user lead windows (partitioned by user_id — no global "
    "window), matrix + marginals in two |types|^2-bounded "
    "groupBys, per-term -p ln p nano-quantized before the "
    "order-independent integer sum. Scale: one shuffle on "
    "user_id for the lead, then type-domain metadata.",
)
def q400_markov_transition_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    trans = seq.groupBy("cur", "nxt").agg(F.count("*").alias("c"))
    tot = trans.groupBy("cur").agg(
        F.sum("c").alias("t"), F.count("*").alias("fanout")
    )
    p = F.col("c").cast("double") / F.col("t")
    terms = trans.join(tot, "cur").select(
        "cur",
        "t",
        "fanout",
        F.round(F.lit(-1e9) * p * F.log(p)).cast("long").alias("term_nano"),
    )
    return (
        terms.groupBy("cur")
        .agg(
            F.max("t").cast("long").alias("n_transitions"),
            F.max("fanout").cast("long").alias("fanout"),
            F.sum("term_nano").cast("long").alias("entropy_nano"),
        )
        .select(
            F.col("cur").alias("event_type"),
            "n_transitions",
            "fanout",
            "entropy_nano",
        )
        .orderBy("event_type")
    )


# 1970-01-05 is a Monday: business days in [epoch, d) is the exact
# closed form 5*(days/7) + min(days%7, 5) with days = datediff from
# that Monday (q388's engine-neutral datediff-mod-7 weekday idiom).
_EPOCH_MON = "1970-01-05"


# ---------------------------------------------------------------- q401
@register(
    "q401_business_day_latency",
    f"""
    WITH lat AS (
        SELECT o.o_orderpriority,
               (5 * ((datediff('day', DATE '{_EPOCH_MON}',
                               CAST(l.l_shipdate AS DATE))) // 7)
                + LEAST(datediff('day', DATE '{_EPOCH_MON}',
                                 CAST(l.l_shipdate AS DATE)) % 7, 5))
               - (5 * ((datediff('day', DATE '{_EPOCH_MON}',
                                 CAST(o.o_orderdate AS DATE))) // 7)
                  + LEAST(datediff('day', DATE '{_EPOCH_MON}',
                                   CAST(o.o_orderdate AS DATE)) % 7, 5))
                   AS busdays
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(busdays) AS BIGINT) AS busdays_sum,
           CAST(MAX(busdays) AS BIGINT) AS busdays_max,
           CAST(ROUND(1e6 * SUM(busdays) / COUNT(*)) AS BIGINT)
               AS avg_busdays_micro
    FROM lat GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Order-to-ship latency in BUSINESS days per order priority "
    "(the SLA clock a fulfillment dashboard actually runs on — "
    "q337's freshness gate counts calendar days; weekends must "
    "not count against an urgent order): business days in "
    "[Monday-epoch, d) has the exact closed form 5*(days div 7) "
    "+ min(days mod 7, 5), so the latency is a DIFFERENCE of two "
    "such prefix counts — pure integer datediff arithmetic, no "
    "calendar UDF, engine-neutral (q388's datediff idiom). "
    "Scale: one orderkey-colocated join, then priority-domain "
    "aggregate; the weekday math is rowwise codegen.",
)
def q401_business_day_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def busprefix(col: str):
        days = F.datediff(F.col(col).cast("date"), F.lit(_EPOCH_MON).cast("date"))
        return 5 * (days - days % 7) / 7 + F.least(days % 7, F.lit(5))

    lat = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderpriority",
        (busprefix("l_shipdate") - busprefix("o_orderdate"))
        .cast("long")
        .alias("busdays"),
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum("busdays").cast("long").alias("busdays_sum"),
            F.max("busdays").cast("long").alias("busdays_max"),
            F.round(F.lit(1e6) * F.sum("busdays") / F.count("*"))
            .cast("long")
            .alias("avg_busdays_micro"),
        )
        .orderBy("o_orderpriority")
    )
