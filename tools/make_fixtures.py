"""Deterministic fixture generator: the ten test tables, any scale.

Produces the same SCHEMAS and value distributions as the pre-generated
fixtures documented in FIXTURES.md / TESTDATA.md (`region nation
customer supplier part orders lineitem events documents embeddings`,
one parquet file per table, naive microsecond timestamps), so the full
test suite and every oracle gate run on a machine without the
pre-generated data — CI, a fresh clone, a laptop:

    python tools/make_fixtures.py /tmp/testdata --sf 0.001
    SPARK_GRAFT_TEST_SF_DIR=/tmp/testdata/sf0.001 pytest tests/

Values are seeded (numpy PCG64, seed 42) and therefore reproducible,
but they are NOT the driver's values: correctness tests never pin
fixture values — they compare Spark against the DuckDB oracle over the
SAME files, which holds on any data with these schemas.

Pure pyarrow/numpy (no Spark session) so the generate step is cheap in
CI; sf0.001 is ~10k rows total and takes well under a second.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
PTYPES = ["ECONOMY", "PROMO", "STANDARD", "SMALL", "LARGE"]
PADJ = ["cold", "small", "large", "fast", "slow", "big"]
PNOUN = ["widget", "bolt", "gear", "cog", "sprocket"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "fr", "de", "zh", "es"]
WORDS = (
    "the a data table scan join merge sort window filter group agg key "
    "row column value batch stream spark query order customer part line "
    "hash dup small big fast slow vector"
).split()

EPOCH_1995 = np.datetime64("1995-01-01", "us")
EPOCH_2024 = np.datetime64("2024-01-01", "us")
DAY_US = 86_400_000_000


def _ts(days: np.ndarray, base=EPOCH_1995) -> pa.Array:
    return pa.array(
        base + (days * DAY_US).astype("timedelta64[us]"),
        type=pa.timestamp("us"),
    )


def _round2(x: np.ndarray) -> np.ndarray:
    return np.round(x, 2)


def generate(out_dir: str, sf: float, seed: int = 42) -> dict[str, int]:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    n_cust = max(1, int(150_000 * sf))
    n_supp = max(1, int(10_000 * sf))
    n_part = max(1, int(200_000 * sf))
    n_ord = max(1, int(1_500_000 * sf))
    n_li = max(1, int(6_000_000 * sf))
    n_ev = max(1, int(1_000_000 * sf))
    n_doc = max(1, int(500_000 * sf))
    n_emb = max(1, int(500_000 * sf))

    def write(name: str, table: pa.Table) -> int:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
        return table.num_rows

    counts = {}
    counts["region"] = write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": REGIONS,
            }
        ),
    )
    counts["nation"] = write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )
    counts["customer"] = write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": _round2(rng.uniform(-999, 9999, n_cust)),
                "c_mktsegment": [
                    SEGMENTS[i] for i in rng.integers(0, 5, n_cust)
                ],
            }
        ),
    )
    counts["supplier"] = write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp), pa.int32()
                ),
                "s_acctbal": _round2(rng.uniform(-999, 9999, n_supp)),
            }
        ),
    )
    counts["part"] = write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": [
                    f"{PADJ[a]} {PNOUN[b]}"
                    for a, b in zip(
                        rng.integers(0, len(PADJ), n_part),
                        rng.integers(0, len(PNOUN), n_part),
                    )
                ],
                "p_brand": [
                    f"Brand#{i}" for i in rng.integers(1, 25, n_part)
                ],
                "p_type": [PTYPES[i] for i in rng.integers(0, 5, n_part)],
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": _round2(900 + 0.1 * np.arange(n_part)),
            }
        ),
    )
    # orders span 1995-01-01 .. ~2001-08 like the reference fixtures
    odays = rng.integers(0, 2405, n_ord)
    counts["orders"] = write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, n_cust, n_ord), pa.int64()
                ),
                "o_orderstatus": [
                    STATUSES[i] for i in rng.integers(0, 3, n_ord)
                ],
                "o_totalprice": _round2(rng.uniform(900, 300_000, n_ord)),
                "o_orderdate": _ts(odays),
                "o_orderpriority": [
                    PRIORITIES[i] for i in rng.integers(0, 5, n_ord)
                ],
            }
        ),
    )
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    price = _round2(qty * rng.uniform(900, 2100, n_li))
    counts["lineitem"] = write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(
                    rng.integers(0, n_ord, n_li), pa.int64()
                ),
                "l_partkey": pa.array(
                    rng.integers(0, n_part, n_li), pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.integers(0, n_supp, n_li), pa.int64()
                ),
                "l_linenumber": pa.array(
                    rng.integers(1, 8, n_li), pa.int32()
                ),
                "l_quantity": qty,
                "l_extendedprice": price,
                "l_discount": _round2(rng.integers(0, 11, n_li) / 100.0),
                "l_tax": _round2(rng.integers(0, 9, n_li) / 100.0),
                "l_returnflag": [
                    RETURNFLAGS[i] for i in rng.integers(0, 3, n_li)
                ],
                "l_linestatus": [
                    LINESTATUSES[i] for i in rng.integers(0, 2, n_li)
                ],
                "l_shipdate": _ts(rng.integers(1, 2500, n_li)),
            }
        ),
    )
    # events: ~30 days of traffic from 2024-01-01, ordered by ts
    ev_us = np.sort(
        rng.integers(0, 30 * DAY_US, n_ev).astype("timedelta64[us]")
    )
    counts["events"] = write(
        "events",
        pa.table(
            {
                "event_id": pa.array(range(n_ev), pa.int64()),
                "ts": pa.array(EPOCH_2024 + ev_us, pa.timestamp("us")),
                "user_id": pa.array(
                    rng.integers(0, max(2, n_ev // 50), n_ev), pa.int64()
                ),
                "event_type": [
                    EVENT_TYPES[i] for i in rng.integers(0, 5, n_ev)
                ],
                "value": _round2(rng.uniform(0, 330, n_ev)),
                "props": [
                    json.dumps({"k": int(k)})
                    for k in rng.integers(0, 100, n_ev)
                ],
            }
        ),
    )
    texts = [
        " ".join(
            WORDS[i]
            for i in rng.integers(0, len(WORDS), rng.integers(10, 120))
        )
        for _ in range(n_doc)
    ]
    counts["documents"] = write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n_doc), pa.int64()),
                "text": texts,
                "lang": [LANGS[i] for i in rng.integers(0, 5, n_doc)],
                "source": [
                    f"src{i}" for i in rng.integers(0, 20, n_doc)
                ],
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
    )
    emb = rng.normal(0, 1, (n_emb, 64)).astype(np.float32)
    counts["embeddings"] = write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(n_emb), pa.int64()),
                "embedding": pa.array(
                    list(emb), pa.list_(pa.float32())
                ),
                "label": pa.array(
                    rng.integers(0, 10, n_emb), pa.int32()
                ),
            }
        ),
    )
    return counts


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_root", help="root dir; tables land in out_root/sf{sf}/")
    ap.add_argument("--sf", type=float, default=0.001)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    sf_name = f"sf{args.sf:g}"
    out_dir = os.path.join(args.out_root, sf_name)
    counts = generate(out_dir, args.sf, args.seed)
    print(json.dumps({"out_dir": out_dir, "rows": counts}))


if __name__ == "__main__":
    main()
