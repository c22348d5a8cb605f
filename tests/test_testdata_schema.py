"""Schema-drift canary for the driver-generated testdata.

The driver regenerates /root/testdata between rounds; a silent dtype
change there (e.g. events.ts flipping from TIMESTAMP(NANOS)-as-long to
timestamp[us] in round 3) breaks every query that assumes the old type.
This test pins the column names and the *family* of each dtype so the
next refresh fails loudly in seconds instead of erroring 10 oracle
queries at round end.

Runs on pyarrow metadata only — no Spark session, <1s.
"""

from __future__ import annotations

import os

import pytest

pa = pytest.importorskip("pyarrow")
import pyarrow.parquet as pq  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_CANARY_SF", "/root/testdata/sf0.001")

# dtype families the queries actually rely on. "ts_any" accepts every
# vintage the entry file knows how to normalize (see __spark_entry__._t):
# int64 nanos, timestamp[us/ns/ms], with or without tz.
INT = {"int32", "int64"}
FLOAT = {"float", "double"}
STR = {"string", "large_string"}
TS = {"int64"} | {
    f"timestamp[{u}{tz}]" for u in ("s", "ms", "us", "ns") for tz in ("", ", tz=UTC")
}

EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": INT, "r_name": STR},
    "nation": {"n_nationkey": INT, "n_name": STR, "n_regionkey": INT},
    "customer": {
        "c_custkey": INT, "c_name": STR, "c_nationkey": INT,
        "c_acctbal": FLOAT, "c_mktsegment": STR,
    },
    "supplier": {
        "s_suppkey": INT, "s_name": STR, "s_nationkey": INT, "s_acctbal": FLOAT,
    },
    "part": {
        "p_partkey": INT, "p_name": STR, "p_brand": STR, "p_type": STR,
        "p_size": INT, "p_retailprice": FLOAT,
    },
    "orders": {
        "o_orderkey": INT, "o_custkey": INT, "o_orderstatus": STR,
        "o_totalprice": FLOAT, "o_orderdate": TS, "o_orderpriority": STR,
    },
    "lineitem": {
        "l_orderkey": INT, "l_partkey": INT, "l_suppkey": INT,
        "l_linenumber": INT, "l_quantity": FLOAT, "l_extendedprice": FLOAT,
        "l_discount": FLOAT, "l_tax": FLOAT, "l_returnflag": STR,
        "l_linestatus": STR, "l_shipdate": TS,
    },
    "events": {
        "event_id": INT, "ts": TS, "user_id": INT, "event_type": STR,
        "value": FLOAT, "props": STR,
    },
    "documents": {
        "doc_id": INT, "text": STR, "lang": STR, "source": STR, "n_chars": INT,
    },
    "embeddings": {
        "vec_id": INT,
        "embedding": {"list<element: float>", "list<element: double>",
                      "list<item: float>", "list<item: double>"},
        "label": INT,
    },
}


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_testdata_schema(table: str) -> None:
    path = os.path.join(SF_DIR, f"{table}.parquet")
    assert os.path.exists(path), f"TESTDATA SCHEMA CHANGED: {table} missing"
    schema = pq.read_schema(path)
    got = {f.name: str(f.type) for f in schema}
    want = EXPECTED[table]
    missing = set(want) - set(got)
    assert not missing, (
        f"TESTDATA SCHEMA CHANGED: {table} lost columns {sorted(missing)} "
        f"(has {sorted(got)})"
    )
    for col, families in want.items():
        assert got[col] in families, (
            f"TESTDATA SCHEMA CHANGED: {table}.{col} is now {got[col]!r}, "
            f"queries assume one of {sorted(families)} — update "
            f"__spark_entry__._t normalization and this canary together"
        )
