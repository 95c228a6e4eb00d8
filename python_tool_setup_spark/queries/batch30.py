"""Round-3 gates, batch 30: tokenizer-pipeline closure — BPE merge
APPLICATION (q251: q175 counts the pairs, this derives the top-K
merge rules and applies them corpus-wide with greedy leftmost-first
semantics via boundary-padded replace — pure string expressions, no
Python in the loop) and the deterministic mixture SCHEDULE (q252:
closed-form interleave positions from per-source ranks — the
reproducible training order that q71's mixture weights feed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_tool_setup_spark.queries import register
from python_tool_setup_spark.tables import load_table

_N_MERGES = 5
_TOP_UNITS = 15


def _oracle_sql() -> str:
    """Build the DuckDB oracle: derive the same K merges as scalar
    subqueries and nest the same K boundary-safe replaces."""
    base = """
    WITH words AS (
        SELECT tok AS w, COUNT(*) AS cnt
        FROM documents,
             UNNEST(regexp_split_to_array(lower(text), '[^a-z]+')) AS t(tok)
        WHERE tok <> '' GROUP BY tok
    ),
    pc AS (
        SELECT p.pair, SUM(cnt) AS c
        FROM words,
             UNNEST(list_transform(generate_series(1, length(w) - 1),
                                   i -> substr(w, i, 2))) AS p(pair)
        GROUP BY p.pair
    ),
    merges AS (
        SELECT pair, ROW_NUMBER() OVER (ORDER BY c DESC, pair) AS rk
        FROM pc QUALIFY rk <= {k}
    ),
    spaced AS (
        SELECT ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s,
               cnt
        FROM words
    ),
    merged AS (
        SELECT {expr} AS s, cnt FROM spaced
    ),
    units AS (
        SELECT u.unit, SUM(cnt) AS n
        FROM merged, UNNEST(string_split(trim(s), ' ')) AS u(unit)
        GROUP BY u.unit
    )
    SELECT unit, CAST(n AS BIGINT) AS n
    FROM units ORDER BY n DESC, unit LIMIT {top}
    """
    expr = "s"
    for i in range(1, _N_MERGES + 1):
        m = f"(SELECT pair FROM merges WHERE rk = {i})"
        expr = (
            f"replace({expr}, ' ' || substr({m}, 1, 1) || ' ' || "
            f"substr({m}, 2, 1) || ' ', ' ' || {m} || ' ')"
        )
    return base.format(k=_N_MERGES, expr=expr, top=_TOP_UNITS)


# ---------------------------------------------------------------- q251
@register(
    "q251_bpe_apply",
    _oracle_sql(),
    doc=f"BPE merge application (q175's counterpart — train counts "
    f"pairs, THIS applies the rules): the top-{_N_MERGES} character "
    "pairs by corpus frequency (deterministic count-desc/pair-asc "
    "rank) become merge rules applied corpus-wide in rank order with "
    "greedy leftmost-first, non-overlapping semantics — the exact "
    "contract of BPE tokenization, realized as boundary-padded "
    "string replace on the spaced representation (' a b c ' -> "
    "' ab c '), a pure codegen expression chain: both engines' "
    "replace() is leftmost-first non-overlapping, so parity is "
    f"byte-exact. The merged-unit vocabulary (top {_TOP_UNITS} units "
    "by weighted frequency) is the gate's pinned output. The merge "
    "table is bounded metadata (one 5-row collect); tokenization "
    "itself runs at scan speed over the distinct-word domain with "
    "frequencies carried as weights — the corpus is never re-scanned "
    "per rule.",
)
def q251_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = words.select(
        "cnt",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    merges = [
        r["pair"]
        for r in pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("c"))
        .orderBy(F.col("c").desc(), "pair")
        .limit(_N_MERGES)
        .collect()  # the merge TABLE: bounded metadata
    ]
    s = F.concat(F.lit(" "), F.array_join(F.split("w", ""), " "), F.lit(" "))
    for m in merges:
        s = F.replace(
            s, F.lit(f" {m[0]} {m[1]} "), F.lit(f" {m} ")
        )
    return (
        words.select(s.alias("s"), "cnt")
        .select(F.explode(F.split(F.trim("s"), " ")).alias("unit"), "cnt")
        .groupBy("unit")
        .agg(F.sum("cnt").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "unit")
        .limit(_TOP_UNITS)
    )


# ---------------------------------------------------------------- q252
@register(
    "q252_mixture_schedule",
    """
    WITH lang_pick AS (SELECT MIN(lang) AS l FROM documents),
    a AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS rk
        FROM documents, lang_pick WHERE lang = l
    ),
    b AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS rk
        FROM documents, lang_pick WHERE lang <> l
    ),
    sched AS (
        SELECT ((rk - 1) // 2) * 3 + ((rk - 1) % 2) AS pos,
               doc_id, 'primary' AS src
        FROM a
        UNION ALL
        SELECT (rk - 1) * 3 + 2, doc_id, 'secondary' FROM b
    )
    SELECT CAST(pos AS BIGINT) AS pos, doc_id, src
    FROM sched WHERE pos < 30 ORDER BY pos
    """,
    doc="Deterministic mixture SCHEDULE — the ordering half of data "
    "mixing (q71 fixes the WEIGHTS; this fixes the ORDER): a 2:1 "
    "interleave of the primary language against the rest, computed "
    "arithmetically from per-source ranks (primary rank r occupies "
    "global slots block*3+{0,1}, secondary fills slot block*3+2) — "
    "NO global sort or driver loop, just rank windows per source and "
    "closed-form positions, so a 100 TB mixture schedule "
    "materializes as a column expression and any worker can compute "
    "its slice independently. Reproducibility is the point: the "
    "schedule is a pure function of (doc_id order, weights), so "
    "training runs replay byte-identically. The first 30 slots are "
    "pinned (the pattern P P S P P S ... is visible in the output).",
)
def q252_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    lp = d.agg(F.min("lang").alias("l"))
    tagged = d.crossJoin(F.broadcast(lp)).select(
        "doc_id", (F.col("lang") == F.col("l")).alias("is_primary")
    )
    wa = Window.partitionBy("is_primary").orderBy("doc_id")
    ranked = tagged.withColumn("rk", F.row_number().over(wa))
    sched = ranked.select(
        F.when(
            F.col("is_primary"),
            ((F.col("rk") - 1) / 2).cast("long") * 3 + (F.col("rk") - 1) % 2,
        )
        .otherwise((F.col("rk") - 1) * 3 + 2)
        .cast("bigint")
        .alias("pos"),
        "doc_id",
        F.when(F.col("is_primary"), "primary")
        .otherwise("secondary")
        .alias("src"),
    )
    return sched.filter(F.col("pos") < 30).orderBy("pos")
