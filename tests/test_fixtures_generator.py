"""tools/make_fixtures.py contract: the generated tables must carry
EXACTLY the documented fixture schemas (FIXTURES.md — the suite and
every oracle gate assume them) and be deterministic for a given seed,
so CI fixture generation is reproducible."""

from __future__ import annotations

import hashlib
import importlib.util
import os
import sys
import tempfile

import pyarrow.parquet as pq

_spec = importlib.util.spec_from_file_location(
    "make_fixtures",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "make_fixtures.py",
    ),
)
make_fixtures = importlib.util.module_from_spec(_spec)
sys.modules["make_fixtures"] = make_fixtures
_spec.loader.exec_module(make_fixtures)

EXPECTED = {
    "region": "r_regionkey:int32,r_name:string",
    "nation": "n_nationkey:int32,n_name:string,n_regionkey:int32",
    "customer": (
        "c_custkey:int64,c_name:string,c_nationkey:int32,"
        "c_acctbal:double,c_mktsegment:string"
    ),
    "supplier": (
        "s_suppkey:int64,s_name:string,s_nationkey:int32,s_acctbal:double"
    ),
    "part": (
        "p_partkey:int64,p_name:string,p_brand:string,p_type:string,"
        "p_size:int32,p_retailprice:double"
    ),
    "orders": (
        "o_orderkey:int64,o_custkey:int64,o_orderstatus:string,"
        "o_totalprice:double,o_orderdate:timestamp[us],"
        "o_orderpriority:string"
    ),
    "lineitem": (
        "l_orderkey:int64,l_partkey:int64,l_suppkey:int64,"
        "l_linenumber:int32,l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_tax:double,l_returnflag:string,"
        "l_linestatus:string,l_shipdate:timestamp[us]"
    ),
    "events": (
        "event_id:int64,ts:timestamp[us],user_id:int64,"
        "event_type:string,value:double,props:string"
    ),
    "documents": (
        "doc_id:int64,text:string,lang:string,source:string,n_chars:int64"
    ),
    "embeddings": (
        "vec_id:int64,embedding:list<element: float>,label:int32"
    ),
}


def _schema_sig(path: str) -> str:
    s = pq.read_schema(path)
    return ",".join(f"{s.field(i).name}:{s.field(i).type}" for i in range(len(s)))


def test_generated_schemas_and_determinism():
    with tempfile.TemporaryDirectory() as tmp:
        a, b = os.path.join(tmp, "a"), os.path.join(tmp, "b")
        counts = make_fixtures.generate(a, sf=0.0005, seed=42)
        make_fixtures.generate(b, sf=0.0005, seed=42)
        assert set(counts) == set(EXPECTED)
        assert counts["region"] == 5 and counts["nation"] == 25
        assert counts["lineitem"] == 3000  # 6M * 0.0005
        for name, want in EXPECTED.items():
            pa_path = os.path.join(a, f"{name}.parquet")
            assert _schema_sig(pa_path) == want, name
            h1 = hashlib.sha256(open(pa_path, "rb").read()).hexdigest()
            h2 = hashlib.sha256(
                open(os.path.join(b, f"{name}.parquet"), "rb").read()
            ).hexdigest()
            assert h1 == h2, f"{name}: generation is not deterministic"
