"""Round-5 gates, batch 73: Bloom-filter semi-join pre-reduction
(q350 — the shuffle-avoidance pattern for 'filter a huge fact side
by a selective dim-side key set': ship an m-bit filter, not the
keys; measure its false-positive cost exactly) and Cramér's V
(q351 — the normalized chi-square association between two
categoricals, the symmetric cousin of q294's mutual information).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.operators.blockrank import pin
from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_M_BITS = 8192
_K_HASH = 3
_PRICE_CUT = 250000


def _pos_spark(key, i: int):
    """Bloom bit position i for a key: md5-derived 60-bit int mod m
    (the repo's md5->BIGINT idiom, engine-exact)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(key.cast("string"), F.lit(f"|{i}"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % _M_BITS
    )


def _pos_sql(key: str, i: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({key} AS VARCHAR) || '|' || {i}), "
        f"1, 15)) AS BIGINT) % {_M_BITS}"
    )


# ---------------------------------------------------------------- q350
@register(
    "q350_bloom_semi_join",
    f"""
    WITH keys AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_totalprice > {_PRICE_CUT}
    ),
    bits AS (
        SELECT DISTINCT {_pos_sql('k', 'i')} AS pos
        FROM keys, generate_series(0, {_K_HASH - 1}) AS t(i)
    ),
    probes AS (
        SELECT c.c_custkey AS k, i,
               {_pos_sql('c.c_custkey', 'i')} AS pos
        FROM customer c, generate_series(0, {_K_HASH - 1}) AS t(i)
    ),
    cand AS (
        SELECT k FROM probes JOIN bits USING (pos)
        GROUP BY k HAVING COUNT(DISTINCT i) = {_K_HASH}
    ),
    truth AS (
        SELECT c.c_custkey AS k FROM customer c
        WHERE EXISTS (SELECT 1 FROM keys WHERE keys.k = c.c_custkey)
    )
    SELECT CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS n_keys,
           CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS n_bits_set,
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_probed,
           CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
           CAST((SELECT COUNT(*) FROM cand) -
                (SELECT COUNT(*) FROM truth) AS BIGINT) AS n_false_pos,
           CAST(ROUND(CAST((SELECT COUNT(*) FROM cand) -
                           (SELECT COUNT(*) FROM truth) AS DOUBLE)
               / CAST((SELECT COUNT(*) FROM customer) -
                      (SELECT COUNT(*) FROM truth) AS DOUBLE)
               * 1000000.0) AS BIGINT) AS fp_rate_micro
    """,
    doc="Bloom-filter semi-join pre-reduction, measured exactly: the "
    "selective side (high-value buyer keys) sets k=3 md5-derived "
    "bits in an m=8192 filter; the big side probes all k positions "
    "against the SET-BIT table (bounded by m — broadcast metadata, "
    "the whole point: at 100 TB you ship 1 KB of bits instead of "
    "shuffling the fact table on the join key) and survivors go to "
    "the exact semi-join. Zero false negatives by construction "
    "(every true key passes all its own bits); the gate counts the "
    "false-positive overhead the m/k choice buys. This is the "
    "DataFrame-native spelling of the runtime-filter/bloom-pushdown "
    "Spark applies internally, made explicit and measurable. All "
    "hashing via the engine-exact md5->BIGINT idiom.",
)
def q350_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # Three consumers each for the filtered key set (bit build, truth
    # semi-join, n_keys) and the customer key column (probes, truth,
    # n_probed): pin both narrow frames so orders and customer are
    # scanned ONCE instead of 3x each. bits is bounded by the filter
    # domain (_K_HASH hash positions), pinned to stop the cand probe
    # and the n_bits_set count from re-running the distinct.
    keys = pin(
        o.filter(F.col("o_totalprice") > _PRICE_CUT)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    bits = pin(
        keys.select(
            F.explode(
                F.array(*[_pos_spark(F.col("k"), i) for i in range(_K_HASH)])
            ).alias("pos")
        )
        .distinct()
    )
    ck = pin(c.select(F.col("c_custkey").alias("k")))
    probes = ck.select(
        "k",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _pos_spark(F.col("k"), i).alias("pos"),
                    )
                    for i in range(_K_HASH)
                ]
            )
        ).alias("pr"),
    ).select("k", "pr.i", "pr.pos")
    cand = (
        probes.join(F.broadcast(bits), "pos")
        .groupBy("k")
        .agg(F.count_distinct("i").alias("hits"))
        .filter(F.col("hits") == _K_HASH)
        .select("k")
    )
    truth = ck.join(F.broadcast(keys), "k", "left_semi")
    stats = [
        keys.agg(F.count(F.lit(1)).alias("n_keys")),
        bits.agg(F.count(F.lit(1)).alias("n_bits_set")),
        ck.agg(F.count(F.lit(1)).alias("n_probed")),
        cand.agg(F.count(F.lit(1)).alias("n_candidates")),
        truth.agg(F.count(F.lit(1)).alias("n_true")),
    ]
    out = stats[0]
    for s in stats[1:]:
        out = out.crossJoin(F.broadcast(s))
    fp = F.col("n_candidates") - F.col("n_true")
    return out.select(
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("n_bits_set").cast("long").alias("n_bits_set"),
        F.col("n_probed").cast("long").alias("n_probed"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
        F.col("n_true").cast("long").alias("n_true"),
        fp.cast("long").alias("n_false_pos"),
        F.round(
            fp.cast("double")
            / (F.col("n_probed") - F.col("n_true")).cast("double")
            * 1000000.0
        )
        .cast("long")
        .alias("fp_rate_micro"),
    )


# ---------------------------------------------------------------- q351
@register(
    "q351_cramers_v",
    """
    WITH cells AS (
        SELECT o_orderpriority AS x, o_orderstatus AS y, COUNT(*) AS nxy
        FROM orders GROUP BY 1, 2
    ),
    margins AS (
        SELECT x, y, nxy,
               SUM(nxy) OVER (PARTITION BY x) AS nx,
               SUM(nxy) OVER (PARTITION BY y) AS ny
        FROM cells
    ),
    tot AS (
        SELECT SUM(nxy) AS n,
               COUNT(DISTINCT x) AS r, COUNT(DISTINCT y) AS c
        FROM cells
    ),
    terms AS (
        SELECT CAST(ROUND(
            (CAST(nxy AS DOUBLE) - CAST(nx AS DOUBLE) * ny / n)
            * (CAST(nxy AS DOUBLE) - CAST(nx AS DOUBLE) * ny / n)
            / (CAST(nx AS DOUBLE) * ny / n) * 1000000.0) AS BIGINT)
            AS chi_micro
        FROM margins, tot
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(r AS BIGINT) AS n_rows,
           CAST(c AS BIGINT) AS n_cols,
           CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
           CAST(SUM(chi_micro) AS BIGINT) AS chi2_micro,
           CAST(ROUND(sqrt(CAST(SUM(chi_micro) AS DOUBLE) / 1e6
               / (CAST(n AS DOUBLE) * LEAST(r - 1, c - 1)))
               * 1000000.0) AS BIGINT) AS v_micro
    FROM terms, tot
    GROUP BY n, r, c
    """,
    doc="Cramér's V association between order priority and order "
    "status (the normalized chi-square — the symmetric, [0,1]- "
    "bounded categorical-association number beside q294's mutual "
    "information; what a feature-leakage audit reports for "
    "categorical pairs): expected counts nx*ny/n in double with "
    "identical expression shape on both engines, per-cell "
    "(o-e)^2/e written as d*d (never pow), micro-quantized BEFORE "
    "the sum, sqrt applied once to the dequantized total. Scale: "
    "the cell table is |priorities| x |statuses| metadata after "
    "one groupBy.",
)
def q351_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("x"), F.col("o_orderstatus").alias("y")
    ).agg(F.count(F.lit(1)).alias("nxy"))
    margins = cells.select(
        "x",
        "y",
        "nxy",
        F.sum("nxy").over(Window.partitionBy("x")).alias("nx"),
        F.sum("nxy").over(Window.partitionBy("y")).alias("ny"),
    )
    tot = cells.agg(
        F.sum("nxy").alias("n"),
        F.count_distinct("x").alias("r"),
        F.count_distinct("y").alias("c"),
    )
    e = F.col("nx").cast("double") * F.col("ny") / F.col("n")
    dd = F.col("nxy").cast("double") - e
    terms = margins.crossJoin(F.broadcast(tot)).select(
        "n",
        "r",
        "c",
        F.round(dd * dd / e * 1000000.0).cast("long").alias("chi_micro"),
    )
    return (
        terms.groupBy("n", "r", "c")
        .agg(F.sum("chi_micro").alias("chi2_micro"))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("r").cast("long").alias("n_rows"),
            F.col("c").cast("long").alias("n_cols"),
            ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
            F.col("chi2_micro").cast("long").alias("chi2_micro"),
            F.round(
                F.sqrt(
                    F.col("chi2_micro").cast("double")
                    / F.lit(1e6)
                    / (
                        F.col("n").cast("double")
                        * F.least(F.col("r") - 1, F.col("c") - 1)
                    )
                )
                * 1000000.0
            )
            .cast("long")
            .alias("v_micro"),
        )
    )
