"""Round-5 gates, batch 136: join-cardinality estimator audit
(q483 — the CBO sanity check: the textbook containment estimate
|R join S| = n_R * n_S / max(d_R, d_S) against the ACTUAL join
count, per declared join; the FK joins validate the estimator,
the correlated date join (l_shipdate = o_orderdate, where shipdate
is orderdate plus a small lag) shows exactly the correlation that
breaks independence assumptions — the measured evidence behind
"collect column stats / add a join hint here") and a weak-
supervision labeling-function report (q484 — the Snorkel-style LF
summary every programmatic-labeling pipeline reads before training
a label model: per labeling function its polarity, coverage,
overlap with other LFs, conflict rate, and agreement with the
majority-vote label, all from one scan that evaluates every LF as
a vectorized expression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

# (label, left table, left key, right table, right key, cast_date)
_CARD_JOINS = [
    ("lineitem_orders_bydate", "lineitem", "l_shipdate",
     "orders", "o_orderdate", True),
    ("lineitem_part", "lineitem", "l_partkey",
     "part", "p_partkey", False),
    ("orders_customer", "orders", "o_custkey",
     "customer", "c_custkey", False),
]

_EST_EXPR = (
    "CAST(ROUND(CAST(n_left AS DOUBLE) * n_right"
    " / GREATEST(d_left, d_right)) AS BIGINT)"
)


def _card_oracle_block(
    label: str, lt: str, lk: str, rt: str, rk: str, cast_date: bool
) -> str:
    lkey = f"CAST({lk} AS DATE)" if cast_date else lk
    rkey = f"CAST({rk} AS DATE)" if cast_date else rk
    return f"""
    SELECT '{label}' AS join_name, n_left, n_right, d_left, d_right,
           {_EST_EXPR} AS est_rows, actual_rows,
           {_EST_EXPR} <= 2 * actual_rows
               AND actual_rows <= 2 * {_EST_EXPR} AS within_2x
    FROM (
        SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM {lt}) AS n_left,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM {rt}) AS n_right,
            (SELECT CAST(COUNT(DISTINCT {lkey}) AS BIGINT) FROM {lt})
                AS d_left,
            (SELECT CAST(COUNT(DISTINCT {rkey}) AS BIGINT) FROM {rt})
                AS d_right,
            (SELECT CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT)
             FROM (SELECT {lkey} AS k, COUNT(*) AS c FROM {lt}
                   GROUP BY 1) a
             JOIN (SELECT {rkey} AS k, COUNT(*) AS c FROM {rt}
                   GROUP BY 1) b ON a.k = b.k) AS actual_rows
    )
    """


@register(
    "q483_join_cardinality_audit",
    "SELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        _card_oracle_block(*j) for j in _CARD_JOINS
    )
    + "\n) ORDER BY join_name",
    doc="Join-cardinality estimator audit (CBO sanity: the "
    "containment estimate n1*n2/max(d1,d2) every cost-based "
    "optimizer starts from, vs the actual join count): FK joins "
    "(orders-customer, lineitem-part) validate the estimator; "
    "the correlated date join (shipdate = orderdate + small lag) "
    "is the canonical independence-assumption breaker, so its "
    "within_2x verdict is the measured 'collect stats / hint "
    "this join' evidence. Per join: two map-side-combined "
    "count/distinct aggregates + the actual join count; the "
    "estimate is derived from exact integers through shared "
    "expression text, the verdict cross-multiplies in integers. "
    "Scale: the audit costs the joins it audits — run once on a "
    "sample partition to price the full-table plan.",
)
def q483_join_cardinality_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    out = None
    for label, lt, lk, rt, rk, cast_date in _CARD_JOINS:
        left = load_table(spark, sf_dir, lt)
        right = load_table(spark, sf_dir, rt)
        lkey = F.col(lk).cast("date") if cast_date else F.col(lk)
        rkey = F.col(rk).cast("date") if cast_date else F.col(rk)
        # actual join cardinality as sum of per-key count products —
        # identical to COUNT(*) of the join, but O(input) instead of
        # O(output): the correlated date join's true output grows
        # quadratically in SF (dates don't scale with data), so
        # materializing it just to count would dominate at scale.
        lc = (
            left.groupBy(lkey.alias("_k"))
            .agg(F.count(F.lit(1)).alias("_cl"))
        )
        rc = (
            right.groupBy(rkey.alias("_k"))
            .agg(F.count(F.lit(1)).alias("_cr"))
        )
        # ONE full-outer join of the two per-key histograms yields
        # every statistic at once (the r10-before plan scanned each
        # table twice — once for count/countDistinct, once for the
        # histogram): n_side = Σ counts (all histogram rows survive a
        # full join), d_side = # non-null keys with a count (null join
        # keys never match, exactly countDistinct's null exclusion),
        # actual = Σ _cl*_cr over matched keys. One scan per table.
        row = (
            lc.join(rc, "_k", "full_outer")
            .agg(
                F.coalesce(F.sum("_cl"), F.lit(0))
                .cast("long")
                .alias("n_left"),
                F.coalesce(F.sum("_cr"), F.lit(0))
                .cast("long")
                .alias("n_right"),
                F.count(
                    F.when(
                        F.col("_k").isNotNull()
                        & F.col("_cl").isNotNull(),
                        1,
                    )
                )
                .cast("long")
                .alias("d_left"),
                F.count(
                    F.when(
                        F.col("_k").isNotNull()
                        & F.col("_cr").isNotNull(),
                        1,
                    )
                )
                .cast("long")
                .alias("d_right"),
                F.coalesce(F.sum(F.col("_cl") * F.col("_cr")), F.lit(0))
                .cast("long")
                .alias("actual_rows"),
            )
            .select(
                F.lit(label).alias("join_name"),
                "n_left",
                "n_right",
                "d_left",
                "d_right",
                F.expr(_EST_EXPR).alias("est_rows"),
                "actual_rows",
                (
                    (F.expr(_EST_EXPR) <= 2 * F.col("actual_rows"))
                    & (F.col("actual_rows") <= 2 * F.expr(_EST_EXPR))
                ).alias("within_2x"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("join_name")


# ---------------------------------------------------------------- q484
# Labeling functions over documents: vote +1 = low quality,
# -1 = high quality, 0 = abstain. Shared expression text — every
# primitive (LENGTH / REPLACE / POSITION / CASE) is global and
# identical in Spark SQL and DuckDB.
_LFS = {
    "lf_short": "CASE WHEN n_chars < 150 THEN 1 ELSE 0 END",
    "lf_long": "CASE WHEN n_chars > 450 THEN -1 ELSE 0 END",
    "lf_no_stopword": (
        "CASE WHEN LENGTH(text) - LENGTH(REPLACE(text, ' the ', ''))"
        " = 0 THEN 1 ELSE 0 END"
    ),
    "lf_topic_spark": (
        "CASE WHEN POSITION('spark' IN text) > 0 THEN -1 ELSE 0 END"
    ),
}


def _lf_oracle_block(name: str) -> str:
    others = [n for n in _LFS if n != name]
    any_other = " OR ".join(f"{o} <> 0" for o in others)
    any_conflict = " OR ".join(f"{name} * {o} < 0" for o in others)
    return f"""
    SELECT '{name}' AS lf_name,
           CAST(SIGN(SUM({name})) AS BIGINT) AS polarity,
           CAST(SUM(CASE WHEN {name} <> 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_votes,
           CAST(ROUND(SUM(CASE WHEN {name} <> 0 THEN 1 ELSE 0 END)
               * 1000000.0 / COUNT(*)) AS BIGINT) AS coverage_ppm,
           CAST(ROUND(SUM(CASE WHEN {name} <> 0 AND ({any_other})
               THEN 1 ELSE 0 END) * 1000000.0
               / GREATEST(1, SUM(CASE WHEN {name} <> 0 THEN 1
                                      ELSE 0 END))) AS BIGINT)
               AS overlap_ppm,
           CAST(ROUND(SUM(CASE WHEN {any_conflict} THEN 1 ELSE 0 END)
               * 1000000.0
               / GREATEST(1, SUM(CASE WHEN {name} <> 0 THEN 1
                                      ELSE 0 END))) AS BIGINT)
               AS conflict_ppm,
           CAST(ROUND(SUM(CASE WHEN {name} <> 0 AND mj <> 0
                   AND SIGN({name}) = mj THEN 1 ELSE 0 END)
               * 1000000.0
               / GREATEST(1, SUM(CASE WHEN {name} <> 0 AND mj <> 0
                                      THEN 1 ELSE 0 END)))
               AS BIGINT) AS majority_agree_ppm
    FROM votes
    """


@register(
    "q484_labeling_function_report",
    "WITH v0 AS (\n    SELECT "
    + ",\n           ".join(f"{e} AS {n}" for n, e in _LFS.items())
    + "\n    FROM documents\n),\nvotes AS (\n    SELECT *, CAST(SIGN("
    + " + ".join(_LFS)
    + ") AS BIGINT) AS mj FROM v0\n)\nSELECT * FROM (\n"
    + "\nUNION ALL\n".join(_lf_oracle_block(n) for n in _LFS)
    + "\n) ORDER BY lf_name",
    doc="Weak-supervision labeling-function report (the Snorkel LF "
    "summary read before training any label model: per LF its "
    "polarity, coverage, overlap with other LFs, conflict rate, "
    "and agreement with the majority-vote label): every LF is a "
    "vectorized JVM expression over the documents scan (length / "
    "stopword-absence / topic-keyword rules — shared expression "
    "text on both engines, REPLACE/POSITION are global "
    "primitives in each), votes land in one row per doc, the "
    "majority label is SIGN of the vote sum, and all seven "
    "statistics per LF are conditional aggregates of that single "
    "pass — one scan total for the whole panel, ratios "
    "ppm-quantized from exact integer counts. Scale: adding an "
    "LF adds a column, not a pass; the report stays |LF| rows.",
)
def q484_labeling_function_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    votes = d.select(
        *[F.expr(e).alias(n) for n, e in _LFS.items()]
    ).withColumn(
        "mj",
        F.signum(sum(F.col(n) for n in _LFS)).cast("long"),
    )
    total = F.count(F.lit(1))
    # ONE stacked aggregation pass (the q475/q468 recipe): every LF's
    # six statistics are columns of a single votes.agg — the old
    # per-LF union re-scanned documents once per labeling function (4
    # scans in the r10 plan corpus) to produce 4 metadata rows. The
    # per-LF expressions are verbatim the same aggregates, so the
    # values are bit-identical; the stacked row explode is bounded by
    # |_LFS| = 4.
    cols = []
    for name in _LFS:
        others = [n for n in _LFS if n != name]
        voted = F.col(name) != 0
        n_votes = F.sum(voted.cast("long"))
        any_other = None
        any_conf = None
        for o in others:
            cond_o = F.col(o) != 0
            cond_c = F.col(name) * F.col(o) < 0
            any_other = cond_o if any_other is None else any_other | cond_o
            any_conf = cond_c if any_conf is None else any_conf | cond_c
        decided = voted & (F.col("mj") != 0)
        cols.extend(
            [
                F.signum(F.sum(name)).cast("long").alias(f"{name}__polarity"),
                n_votes.cast("long").alias(f"{name}__n_votes"),
                F.round(n_votes * 1000000.0 / total)
                .cast("long")
                .alias(f"{name}__coverage_ppm"),
                F.round(
                    F.sum((voted & any_other).cast("long"))
                    * 1000000.0
                    / F.greatest(F.lit(1), n_votes)
                )
                .cast("long")
                .alias(f"{name}__overlap_ppm"),
                F.round(
                    F.sum(any_conf.cast("long"))
                    * 1000000.0
                    / F.greatest(F.lit(1), n_votes)
                )
                .cast("long")
                .alias(f"{name}__conflict_ppm"),
                F.round(
                    F.sum(
                        (decided & (F.signum(F.col(name)) == F.col("mj")))
                        .cast("long")
                    )
                    * 1000000.0
                    / F.greatest(F.lit(1), F.sum(decided.cast("long")))
                )
                .cast("long")
                .alias(f"{name}__majority_agree_ppm"),
            ]
        )
    one = votes.agg(*cols)
    fields = [
        "polarity",
        "n_votes",
        "coverage_ppm",
        "overlap_ppm",
        "conflict_ppm",
        "majority_agree_ppm",
    ]
    stacked = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("lf_name"),
                        *[
                            F.col(f"{name}__{f}").alias(f)
                            for f in fields
                        ],
                    )
                    for name in _LFS
                ]
            )
        ).alias("s")
    ).select("s.*")
    return stacked.orderBy("lf_name")
