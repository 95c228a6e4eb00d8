"""Round-5 gates, batch 124: audience reach curve (q458 — the
cumulative count of DISTINCT users ever seen, by day: the
diminishing-returns curve marketing spend is planned against,
computed scalably as a first-appearance histogram + day-domain
prefix), join funnel retention (q459 — row counts surviving each
step of the lineitem->orders->customer->nation star join: the
per-step match-rate diagnostic that localizes WHERE rows leak,
which q381's orphan totals can't), and a delta-encoding advisor
(q460 — measured gap bit-widths of sorted key/timestamp columns
vs their raw 64 bits: the storage-encoding estimate behind every
'sort before write' recommendation, exact via binary length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin, prefix_agg
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table


# ---------------------------------------------------------------- q458
@register(
    "q458_reach_curve",
    """
    WITH firsts AS (
        SELECT user_id,
               MIN(date_diff('day', DATE '1970-01-05', CAST(ts AS DATE)))
                   AS d0
        FROM events GROUP BY user_id
    ),
    hist AS (SELECT d0, COUNT(*) AS new_users FROM firsts GROUP BY d0)
    SELECT CAST(d0 AS BIGINT) AS day_idx,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (ORDER BY d0) AS BIGINT)
               AS cumulative_reach
    FROM hist ORDER BY d0
    """,
    doc="Audience reach curve (cumulative distinct users ever seen, "
    "by day — the diminishing-returns curve media/growth spend "
    "is planned against; q396 buckets users weekly, this is the "
    "daily integral): computed WITHOUT a running distinct — "
    "each user's FIRST day via one user-keyed aggregate, then "
    "the day-domain new-user histogram's prefix sum gives the "
    "exact cumulative distinct (first-appearance decomposition "
    "— the same trick as q366's Heaps curve). Spark runs the "
    "prefix through blockrank (no unpartitioned window); the "
    "oracle's global window proves it exact. Scale: one "
    "user-keyed shuffle, then |days| metadata.",
)
def q458_reach_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-05").cast("date")
            )
        ).alias("d0")
    )
    hist = firsts.groupBy("d0").agg(F.count("*").alias("new_users"))
    pre = prefix_agg(hist, [("d0", "asc")], {"p": ("sum", "new_users")})
    return pre.select(
        F.col("d0").cast("long").alias("day_idx"),
        F.col("new_users").cast("long").alias("new_users"),
        (F.coalesce("p", F.lit(0)) + F.col("new_users"))
        .cast("long")
        .alias("cumulative_reach"),
    ).orderBy("day_idx")


# ---------------------------------------------------------------- q459
@register(
    "q459_join_funnel_retention",
    """
    WITH s0 AS (SELECT COUNT(*) AS n FROM lineitem),
    s1 AS (
        SELECT COUNT(*) AS n FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    s2 AS (
        SELECT COUNT(*) AS n FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    s3 AS (
        SELECT COUNT(*) AS n FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation nt ON nt.n_nationkey = c.c_nationkey
    ),
    steps AS (
        SELECT 'step0_lineitem' AS step, (SELECT n FROM s0) AS rows_,
               (SELECT n FROM s0) AS prev
        UNION ALL
        SELECT 'step1_orders', (SELECT n FROM s1), (SELECT n FROM s0)
        UNION ALL
        SELECT 'step2_customer', (SELECT n FROM s2), (SELECT n FROM s1)
        UNION ALL
        SELECT 'step3_nation', (SELECT n FROM s3), (SELECT n FROM s2)
    )
    SELECT step,
           CAST(rows_ AS BIGINT) AS rows_surviving,
           CAST(prev - rows_ AS BIGINT) AS rows_lost,
           CAST(ROUND(1e6 * rows_ / prev) AS BIGINT) AS retention_micro
    FROM steps ORDER BY step
    """,
    doc="Join funnel retention through the star schema "
    "(lineitem -> +orders -> +customer -> +nation, with rows "
    "surviving, rows LOST, and per-step retention — the "
    "diagnostic that localizes WHICH inner join leaks rows; "
    "q381 counts orphans per FK in isolation, this measures the "
    "compounding funnel the actual query runs; on an intact "
    "warehouse every retention is exactly 1.0, so any other "
    "number IS the finding): four cumulative-join counts, "
    "per-step ratios as integer micro. Scale: each step is the "
    "same co-partitioned join the production query pays; the "
    "audit certifies referential health at query shape, not "
    "key-by-key.",
)
def q459_join_funnel_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    nt = load_table(spark, sf_dir, "nation")
    # Four separate count actions; unpinned, step k re-executes every
    # upstream join (1+2+3 join stages). Inner equi-joins keep their
    # cardinality under projection, so each step is pinned as ONLY the
    # key column the next step needs — each join runs once, narrow.
    s0 = li.count()
    j1 = pin(
        li.join(o, o.o_orderkey == li.l_orderkey).select(
            o.o_custkey.alias("o_custkey")
        )
    )
    s1 = j1.count()
    j2 = pin(
        j1.join(F.broadcast(c), c.c_custkey == F.col("o_custkey")).select(
            c.c_nationkey.alias("c_nationkey")
        )
    )
    s2 = j2.count()
    s3 = j2.join(
        F.broadcast(nt), nt.n_nationkey == F.col("c_nationkey")
    ).count()
    steps = [
        ("step0_lineitem", s0, s0),
        ("step1_orders", s1, s0),
        ("step2_customer", s2, s1),
        ("step3_nation", s3, s2),
    ]
    return spark.createDataFrame(
        [
            (step, n, prev - n, round(1e6 * n / prev))
            for step, n, prev in steps
        ],
        "step string, rows_surviving long, rows_lost long,"
        " retention_micro long",
    )


# ---------------------------------------------------------------- q460
@register(
    "q460_delta_encoding_advisor",
    """
    WITH ordered AS (
        SELECT o_orderkey AS v,
               LAG(o_orderkey) OVER (ORDER BY o_orderkey) AS pv
        FROM orders
    ),
    gaps AS (
        SELECT v - pv AS g FROM ordered WHERE pv IS NOT NULL AND v > pv
    ),
    bits AS (SELECT LEN(bin(g)) AS b FROM gaps)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(MAX(b) AS BIGINT) AS max_gap_bits,
           CAST(ROUND(1e3 * SUM(b) / COUNT(*)) AS BIGINT)
               AS avg_gap_bits_milli,
           CAST(ROUND(1e6 * (1e0 - SUM(b) / (64e0 * COUNT(*))))
               AS BIGINT) AS savings_share_micro
    FROM bits
    """,
    doc="Delta-encoding advisor for the sorted order-key column "
    "(bit-width of successive gaps — floor(log2(gap))+1 computed "
    "EXACTLY as the binary-string length, the same integer in "
    "both engines, no libm log2 — versus the raw 64-bit width: "
    "the measured evidence behind 'sort before write' and the "
    "reason q230's sorted writes and q62's clustering shrink "
    "files; avg gap bits ~ log2(keyspace/n), so savings track "
    "density): the lag is an ordered prefix over the key "
    "domain — at scale this audit runs per FILE (sorted runs "
    "are file-local), so the oracle's global window stands in "
    "for the per-file layout. Scale: one sort-domain pass, "
    "metadata out.",
)
def q460_delta_encoding_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = o.select(F.col("o_orderkey").alias("v"))
    pre = prefix_agg(base, [("v", "asc")], {"pv": ("max", "v")})
    gaps = pre.where(
        F.col("pv").isNotNull() & (F.col("v") > F.col("pv"))
    ).select((F.col("v") - F.col("pv")).alias("g"))
    bits = gaps.select(F.length(F.bin("g")).alias("b"))
    return bits.agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.max("b").cast("long").alias("max_gap_bits"),
        F.round(F.lit(1e3) * F.sum("b") / F.count("*"))
        .cast("long")
        .alias("avg_gap_bits_milli"),
        F.round(
            F.lit(1e6)
            * (F.lit(1.0) - F.sum("b") / (F.lit(64.0) * F.count("*")))
        )
        .cast("long")
        .alias("savings_share_micro"),
    )
