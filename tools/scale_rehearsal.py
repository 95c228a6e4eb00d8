"""Scale rehearsal: run the headline operators at sf0.1 and at a
10x-scaled synthetic sf1 (~6M lineitem) and report per-query wall
time, the scale ratio, and join-strategy flips.

sf1 is staged once under /tmp/sf1_rehearsal by unioning 10
key-offset copies of every sf0.1 table (referential integrity
preserved: every key column in every table gets the same per-copy
offset, so joins land exactly as at sf0.1 but 10x heavier). Text and
embeddings are perturbed per copy so dedup/ANN don't see 10 exact
clones of the corpus.

Usage: python tools/scale_rehearsal.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from python_tool_setup_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1_rehearsal"
COPIES = 10

# per-table key columns that must shift together per copy
OFFSETS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

HEADLINE = [
    "q86_tpch_q5ish",
    "q36_minhash_lsh_neardup",
    "q72_dup_clusters",
    "q41_ann_lsh",
    "q42_ivf_ann",
    "q117_pagerank",
    "q118_bm25_search",
    "q122_sequence_packing",
]


# Key columns form cross-table ENTITY FAMILIES (o_custkey joins
# c_custkey, l_orderkey joins o_orderkey, ...). Every member of a
# family must shift by the SAME per-copy offset — the family's span —
# or copies 1..N-1 silently match nothing in any join. (Offsetting
# each table by its own span broke referential integrity: orders'
# span is 10x customer's, so shifted o_custkey values had no
# customers. Caught by review; the fix keys spans by family.)
KEY_FAMILY = {
    "c_custkey": "custkey",
    "o_custkey": "custkey",
    "o_orderkey": "orderkey",
    "l_orderkey": "orderkey",
    "p_partkey": "partkey",
    "l_partkey": "partkey",
    "s_suppkey": "suppkey",
    "l_suppkey": "suppkey",
    "event_id": "event_id",
    # events.user_id joins customer.c_custkey (q126 stream-static) and
    # orders.o_custkey (q127 cogroup), so it must shift with the
    # custkey family or cross-copy events match only copy-0 customers.
    "user_id": "custkey",
    "doc_id": "doc_id",
    "vec_id": "vec_id",
}


def family_spans(spark: SparkSession) -> dict[str, int]:
    spans: dict[str, int] = {}
    for table, cols in OFFSETS.items():
        if not cols:
            continue
        df = spark.read.parquet(f"{SF01}/{table}.parquet")
        row = df.agg(*[F.max(c).alias(c) for c in cols]).collect()[0]
        for c in cols:
            fam = KEY_FAMILY[c]
            spans[fam] = max(spans.get(fam, 0), int(row[c]) + 1)
    return spans


def source_fingerprint() -> dict[str, list[int]]:
    out = {}
    for table in OFFSETS:
        p = f"{SF01}/{table}.parquet"
        st = os.stat(p)
        # nanosecond mtime: whole seconds alias same-size regenerations
        out[table] = [st.st_mtime_ns, st.st_size]
    return out


def stage_sf1(spark: SparkSession) -> None:
    import json as _json
    import shutil

    fp_path = f"{SF1}/_FINGERPRINT.json"
    fp = source_fingerprint()
    if os.path.exists(fp_path):
        try:
            with open(fp_path) as fh:
                if _json.load(fh) == fp:
                    return  # staged corpus matches the current source
        except (OSError, ValueError):
            pass  # truncated/corrupt fingerprint -> treat as stale
    # stale, partial, or wrong-generation staging: rebuild from scratch
    if os.path.exists(SF1):
        shutil.rmtree(SF1)
    os.makedirs(SF1, exist_ok=True)
    spans = family_spans(spark)
    for table, cols in OFFSETS.items():
        dest = f"{SF1}/{table}.parquet"
        src = spark.read.parquet(f"{SF01}/{table}.parquet")
        if not cols:  # tiny dims: keep as-is (region/nation are fixed)
            src.write.mode("overwrite").parquet(dest)
            continue
        parts = []
        for i in range(COPIES):
            c = src
            for col in cols:
                c = c.withColumn(
                    col, F.col(col) + F.lit(i * spans[KEY_FAMILY[col]])
                )
            if table == "documents" and i > 0:
                # vary the text so exact/near-dup ops see distinct docs
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" copy{i}"))
                )
            if table == "embeddings" and i > 0:
                # small deterministic per-copy perturbation of one dim
                # (closure factory: F.transform builds the expression
                # eagerly, and the lambda must take exactly 2 params)
                def perturb(copy_idx):
                    return lambda x, j: (
                        x
                        + (j == F.lit(copy_idx % 64)).cast("float")
                        * (0.01 * copy_idx)
                    ).cast("float")

                c = c.withColumn(
                    "embedding", F.transform("embedding", perturb(i))
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"staged {table}: {n} rows", flush=True)
    with open(fp_path, "w") as fh:
        _json.dump(fp, fh)  # committed LAST: partial staging never passes


def join_strategies(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        s: plan.count(s)
        for s in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
        )
        if plan.count(s)
    }


def main() -> None:
    spark = get_spark()
    stage_sf1(spark)
    from python_tool_setup_spark.queries import all_queries

    qs = all_queries()
    names = sys.argv[1:] or HEADLINE
    report = {}
    for name in names:
        q = qs[name]
        entry = {}
        # warm the codegen/JIT path once at tiny scale so the first
        # timed leg doesn't pay plan compilation the second leg skips
        try:
            q.spark_fn(spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass
        for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            t0 = time.time()
            df = q.spark_fn(spark, sf_dir)
            n = df.count()
            dt = time.time() - t0
            entry[label] = {"sec": round(dt, 2), "rows": n}
            try:
                entry[label]["joins"] = join_strategies(df)
            except Exception:
                pass
            print(f"{name} @ {label}: {dt:.2f}s, {n} rows", flush=True)
        entry["ratio"] = round(
            entry["sf1"]["sec"] / max(entry["sf0.1"]["sec"], 1e-9), 2
        )
        report[name] = entry
    print(json.dumps(report))


if __name__ == "__main__":
    main()
