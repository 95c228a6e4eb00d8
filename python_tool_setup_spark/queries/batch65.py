"""Round-4 gates, batch 65: metric contribution analysis (q334 —
which segments drove the year-over-year change) and mix-shift
decomposition (q335 — how much of a rate change is real
within-segment movement vs population mix — the Oaxaca-Blinder
shape every metrics platform reimplements).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import prefix_rank
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_Y1 = "1995"
_Y2 = "1996"


# ---------------------------------------------------------------- q334
@register(
    "q334_contribution_analysis",
    f"""
    WITH seg AS (
        SELECT c.c_mktsegment AS segment,
               SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '{_Y1}-01-01'
                         AND o.o_orderdate < TIMESTAMP '{_Y2}-01-01'
                   THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                   ELSE 0 END) AS rev1,
               SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '{_Y2}-01-01'
                         AND o.o_orderdate < TIMESTAMP '1997-01-01'
                   THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                   ELSE 0 END) AS rev2
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    ),
    tot AS (SELECT SUM(rev2 - rev1) AS total_delta FROM seg)
    SELECT segment,
           CAST(rev1 AS BIGINT) AS rev1_cents,
           CAST(rev2 AS BIGINT) AS rev2_cents,
           CAST(rev2 - rev1 AS BIGINT) AS delta_cents,
           CAST(ROUND(CAST(rev2 - rev1 AS DOUBLE)
               / CAST((SELECT total_delta FROM tot) AS DOUBLE)
               * 1000000.0) AS BIGINT) AS share_of_change_micro,
           CAST(ROW_NUMBER() OVER (ORDER BY abs(rev2 - rev1) DESC,
               segment) AS BIGINT) AS impact_rank
    FROM seg ORDER BY impact_rank
    """,
    doc="Metric contribution analysis (the root-cause readout every "
    "metrics platform runs when a topline moves: WHICH segments "
    "drove the change and by how much): year-over-year revenue "
    "per market segment in exact cents (orders joined to the "
    "broadcast customer dimension), per-segment delta, its share "
    "of the total change (the shares sum to exactly 1 by "
    "construction — additivity is the whole point of the "
    "decomposition) and an impact rank by absolute delta with "
    "deterministic tiebreaks. One fact-scan aggregate with "
    "conditional sums — both periods in a single pass, no "
    "per-period scans; the segment table is metadata.",
)
def q334_contribution_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    in_y1 = (F.col("o_orderdate") >= F.lit(f"{_Y1}-01-01").cast("timestamp")) & (
        F.col("o_orderdate") < F.lit(f"{_Y2}-01-01").cast("timestamp")
    )
    in_y2 = (F.col("o_orderdate") >= F.lit(f"{_Y2}-01-01").cast("timestamp")) & (
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    seg = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum(F.when(in_y1, cents).otherwise(0)).alias("rev1"),
            F.sum(F.when(in_y2, cents).otherwise(0)).alias("rev2"),
        )
    )
    tot = seg.agg(F.sum(F.col("rev2") - F.col("rev1")).alias("total_delta"))
    out = seg.crossJoin(F.broadcast(tot))  # 1-row scalar attach
    delta = F.col("rev2") - F.col("rev1")
    ranked = prefix_rank(
        out.withColumn("_absd", F.abs(delta)),
        [("_absd", "desc"), ("segment", "asc")],
        alias="impact_rank",
    )
    return ranked.select(
        "segment",
        F.col("rev1").cast("long").alias("rev1_cents"),
        F.col("rev2").cast("long").alias("rev2_cents"),
        delta.cast("long").alias("delta_cents"),
        F.round(
            delta.cast("double") / F.col("total_delta").cast("double") * 1000000.0
        )
        .cast("long")
        .alias("share_of_change_micro"),
        F.col("impact_rank").cast("long").alias("impact_rank"),
    ).orderBy("impact_rank")


# ---------------------------------------------------------------- q335
@register(
    "q335_mix_shift_decomposition",
    f"""
    WITH seg AS (
        SELECT c.c_mktsegment AS segment,
               SUM(CASE WHEN o.o_orderdate < TIMESTAMP '{_Y2}-01-01'
                   THEN 1 ELSE 0 END) AS n1,
               SUM(CASE WHEN o.o_orderdate < TIMESTAMP '{_Y2}-01-01'
                         AND o.o_orderpriority = '1-URGENT'
                   THEN 1 ELSE 0 END) AS u1,
               SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '{_Y2}-01-01'
                         AND o.o_orderdate < TIMESTAMP '1997-01-01'
                   THEN 1 ELSE 0 END) AS n2,
               SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '{_Y2}-01-01'
                         AND o.o_orderdate < TIMESTAMP '1997-01-01'
                         AND o.o_orderpriority = '1-URGENT'
                   THEN 1 ELSE 0 END) AS u2
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderdate >= TIMESTAMP '{_Y1}-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY c.c_mktsegment
    ),
    tot AS (
        SELECT SUM(n1) AS t1, SUM(n2) AS t2 FROM seg
    ),
    d AS (
        SELECT segment, n1, u1, n2, u2,
               CAST(u1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS r1,
               CAST(u2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS r2,
               CAST(n1 AS DOUBLE)
                   / CAST((SELECT t1 FROM tot) AS DOUBLE) AS w1,
               CAST(n2 AS DOUBLE)
                   / CAST((SELECT t2 FROM tot) AS DOUBLE) AS w2
        FROM seg
    )
    SELECT segment,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(ROUND(r1 * 1000000.0) AS BIGINT) AS rate1_micro,
           CAST(ROUND(r2 * 1000000.0) AS BIGINT) AS rate2_micro,
           CAST(ROUND((w2 * (r2 - r1)) * 1000000.0) AS BIGINT)
               AS within_effect_micro,
           CAST(ROUND(((w2 - w1) * r1) * 1000000.0) AS BIGINT)
               AS mix_effect_micro
    FROM d ORDER BY segment
    """,
    doc="Mix-shift decomposition of a rate metric (the Oaxaca-"
    "Blinder shape every metrics platform reimplements to answer "
    "'did the urgent-order RATE really move, or did the customer "
    "MIX shift toward urgent-heavy segments?'): per segment, "
    "period rates r and population weights w, with the exact "
    "identity delta_overall = sum(w2*(r2-r1)) + sum((w2-w1)*r1) "
    "splitting the change into within-segment movement vs mix "
    "effect — both reported per segment, micro-quantized from "
    "exact integer counts with divisions in identical "
    "association (the decomposition identity is asserted by the "
    "unit test). One fact-scan conditional aggregate over the "
    "broadcast-joined dimension; everything after is the "
    "metadata segment table.",
)
def q335_mix_shift_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    y1s = F.lit(f"{_Y1}-01-01").cast("timestamp")
    y2s = F.lit(f"{_Y2}-01-01").cast("timestamp")
    y3s = F.lit("1997-01-01").cast("timestamp")
    p1 = (F.col("o_orderdate") >= y1s) & (F.col("o_orderdate") < y2s)
    p2 = (F.col("o_orderdate") >= y2s) & (F.col("o_orderdate") < y3s)
    urgent = F.col("o_orderpriority") == "1-URGENT"
    seg = (
        o.filter((F.col("o_orderdate") >= y1s) & (F.col("o_orderdate") < y3s))
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum(F.when(p1, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(p1 & urgent, 1).otherwise(0)).alias("u1"),
            F.sum(F.when(p2, 1).otherwise(0)).alias("n2"),
            F.sum(F.when(p2 & urgent, 1).otherwise(0)).alias("u2"),
        )
    )
    tot = seg.agg(F.sum("n1").alias("t1"), F.sum("n2").alias("t2"))
    d = seg.crossJoin(F.broadcast(tot))  # 1-row scalar attach
    r1 = F.col("u1").cast("double") / F.col("n1").cast("double")
    r2 = F.col("u2").cast("double") / F.col("n2").cast("double")
    w1 = F.col("n1").cast("double") / F.col("t1").cast("double")
    w2 = F.col("n2").cast("double") / F.col("t2").cast("double")
    return d.select(
        "segment",
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(r1 * 1000000.0).cast("long").alias("rate1_micro"),
        F.round(r2 * 1000000.0).cast("long").alias("rate2_micro"),
        F.round((w2 * (r2 - r1)) * 1000000.0)
        .cast("long")
        .alias("within_effect_micro"),
        F.round(((w2 - w1) * r1) * 1000000.0)
        .cast("long")
        .alias("mix_effect_micro"),
    ).orderBy("segment")
