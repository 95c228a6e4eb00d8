"""Local mimic of the driver's DuckDB-oracle correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the
given sf dir, compares row count, sorted-column-name schema, and an
order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]

Fidelity contract (round 7): the r1-r6 mimic collapsed every value
through ``f"{v:.9g}"``/``str`` float re-formatting, which normalized
``Decimal('56332097')`` (Spark toPandas) and ``56332097.0`` (DuckDB
pandas fetch of a DECIMAL/HUGEINT final) to the SAME string — masking
exactly the class that failed the driver in r5/r6 (q521, q533). This
version fetches BOTH engines via their pandas path (``toPandas()`` /
``.df()``) and stringifies cell values verbatim, so a DECIMAL final
column diverges here exactly as it does on the driver. It also flags
any decimal/interval column in a final schema as a contract violation
even when the values happen to hash equal.
"""

from __future__ import annotations

import datetime
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from python_tool_setup_spark.queries import all_queries
from python_tool_setup_spark.session import get_spark
from python_tool_setup_spark.tables import TABLE_NAMES, table_path

# Final-schema types that are banned from gate outputs because the two
# engines' pandas fetches represent them differently (DuckDB coerces
# DECIMAL/HUGEINT to float64; Spark keeps Decimal objects), so equal
# values hash differently on the driver.
_BANNED_SPARK_TYPES = ("decimal", "interval")


def _cell(v) -> str:
    """Stringify one pandas cell the way the driver's value hash sees it.

    No numeric re-formatting: a float64 must stringify as a float and a
    Decimal as a Decimal, or the mimic masks driver divergence. The ONE
    normalization kept is temporal: pandas represents a DATE column as
    datetime64 on one engine and datetime.date objects on the other, a
    representation (not value) difference the driver's green history on
    date-emitting gates (q481-class DATE finals, q25 timestamps) shows
    it tolerates — normalize both to ISO text.
    """
    # pandas.Timestamp is a datetime subclass; date-valued timestamps
    # print as dates so datetime64 vs datetime.date columns agree.
    if isinstance(v, datetime.datetime):
        if v.hour == v.minute == v.second == v.microsecond == 0 and (
            getattr(v, "nanosecond", 0) == 0
        ):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def normalize(pdf):
    cols = sorted(pdf.columns)
    out = [
        tuple(_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
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
            banned = [
                f.name
                for f in sdf.schema.fields
                if any(b in f.dataType.simpleString() for b in _BANNED_SPARK_TYPES)
            ]
            if banned:
                print(
                    f"FAIL {name}: banned final-schema type on {banned} "
                    "(decimal/interval finals hash-diverge on the driver)"
                )
                failures.append(name)
                continue
            spdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        if q.oracle is None:
            print(f"ok   {name}: rows-only ({len(spdf)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            opdf = con.execute(q.oracle).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        if sorted(spdf.columns) != sorted(opdf.columns):
            print(
                f"FAIL {name}: schema {sorted(spdf.columns)} != "
                f"{sorted(opdf.columns)}"
            )
            failures.append(name)
            continue
        if len(spdf) != len(opdf):
            print(f"FAIL {name}: rowcount {len(spdf)} != {len(opdf)}")
            failures.append(name)
            continue
        s_n = normalize(spdf)
        o_n = normalize(opdf)
        if s_n != o_n:
            diff = [i for i, (a, b) in enumerate(zip(s_n, o_n)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {diff}")
            for i in diff[:2]:
                print(f"   spark : {s_n[i]}")
                print(f"   duckdb: {o_n[i]}")
            failures.append(name)
            continue
        print(f"ok   {name}: {len(spdf)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
