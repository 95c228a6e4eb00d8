"""Local mimic of the driver's DuckDB-oracle correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the
given sf dir, compares row count, sorted-column-name schema, and an
order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from python_tool_setup_spark.queries import all_queries
from python_tool_setup_spark.session import get_spark
from python_tool_setup_spark.tables import TABLE_NAMES, table_path


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            elif isinstance(v, bool):
                v = str(bool(v))
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    failures = []
    for name, q in sorted(all_queries().items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.spark_fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        if q.oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            ores = con.execute(q.oracle)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: schema {sorted(scols)} != {sorted(ocols)}")
            failures.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(orows)}")
            failures.append(name)
            continue
        s_n = normalize([tuple(r) for r in srows], scols)
        o_n = normalize(orows, ocols)
        if s_n != o_n:
            diff = [i for i, (a, b) in enumerate(zip(s_n, o_n)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {diff}")
            for i in diff[:2]:
                print(f"   spark : {s_n[i]}")
                print(f"   duckdb: {o_n[i]}")
            failures.append(name)
            continue
        print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
