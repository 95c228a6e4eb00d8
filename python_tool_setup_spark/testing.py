"""Shared differential-test helpers: Spark result vs DuckDB oracle.

Mirrors the driver's comparison: row count + sorted-column-name schema +
order-insensitive value comparison (floats printed at 9 significant
digits so identical rounded values can't diverge in repr).
"""

from __future__ import annotations

import duckdb

from python_tool_setup_spark.tables import TABLE_NAMES, table_path


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def normalize(rows, columns):
    """Order-insensitive canonical form of a result set."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, bool):
                v = str(bool(v))
            elif isinstance(v, float):
                v = f"{v:.9g}"
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return out


def compare_query(spark, con, query, sf_dir: str) -> str | None:
    """Run one registered Query both ways; return None or a mismatch reason."""
    sdf = query.spark_fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if query.oracle is None:
        return None  # rows-only check: Spark side executed without error
    ores = con.execute(query.oracle)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    if sorted(scols) != sorted(ocols):
        return f"schema mismatch: {sorted(scols)} != {sorted(ocols)}"
    if len(srows) != len(orows):
        return f"rowcount mismatch: spark={len(srows)} oracle={len(orows)}"
    s_n, o_n = normalize(srows, scols), normalize(orows, ocols)
    if s_n != o_n:
        bad = next(i for i, (a, b) in enumerate(zip(s_n, o_n)) if a != b)
        return f"value mismatch at sorted row {bad}: {s_n[bad]} != {o_n[bad]}"
    return None
