"""Testdata drift tripwire.

Round 4's only breakage was SILENT environment drift: the driver
regenerated events.parquet with a different timestamp physical type and
every event-time consumer failed at query time, far from the cause.
This test pins the driver-generated schemas so the NEXT regeneration
fails HERE, in one place, with a message naming the normalization choke
points to extend.

Columns with known-tolerated flavors get a set of accepted types, and
the engine-side normalization for them is type-driven
(catalog.normalize_event_time, functions/vector casts) — so a new
flavor means: add it to ACCEPTED below *and* teach the choke point,
then re-run tests/test_event_time_flavors.py / test_vector_flavors.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE

# column -> accepted pyarrow type strings (sets where drift is already
# tolerated by a type-driven choke point).
ACCEPTED = {
    # normalized by catalog.normalize_event_time + streaming/sources.py
    ("events", "ts"): {
        "timestamp[us]",
        "timestamp[us, tz=UTC]",
        "timestamp[ns]",
        "int64",  # TIMESTAMP(NANOS) read as long under nanosAsLong
    },
    # cast at use sites (functions/vector, embeddings/*): float or double
    ("embeddings", "embedding"): {
        "list<element: float>",
        "list<item: float>",
        "list<element: double>",
        "list<item: double>",
    },
}

EXACT = {
    "region": [("r_regionkey", "int32"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int32"),
        ("n_name", "string"),
        ("n_regionkey", "int32"),
    ],
    "customer": [
        ("c_custkey", "int64"),
        ("c_name", "string"),
        ("c_nationkey", "int32"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "int64"),
        ("s_name", "string"),
        ("s_nationkey", "int32"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "int64"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int32"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "int64"),
        ("o_custkey", "int64"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp[us]"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "int64"),
        ("l_partkey", "int64"),
        ("l_suppkey", "int64"),
        ("l_linenumber", "int32"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp[us]"),
    ],
    "events": [
        ("event_id", "int64"),
        ("ts", None),  # ACCEPTED set
        ("user_id", "int64"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "int64"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "int64"),
    ],
    "embeddings": [
        ("vec_id", "int64"),
        ("embedding", None),  # ACCEPTED set
        ("label", "int32"),
    ],
}


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_CORRECT])
@pytest.mark.parametrize("table", sorted(EXACT))
def test_testdata_schema_is_known(sf_dir, table):
    schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
    got = [(f.name, str(f.type)) for f in schema]
    want = EXACT[table]
    assert [n for n, _ in got] == [n for n, _ in want], (
        f"{table}: column set/order drifted — the driver regenerated "
        f"testdata; audit every consumer of {table} ({got})"
    )
    for (name, typ), (_, want_typ) in zip(got, want):
        if (table, name) in ACCEPTED:
            assert typ in ACCEPTED[(table, name)], (
                f"{table}.{name} arrived as {typ} — a NEW physical "
                "flavor. Teach the type-driven choke point "
                "(catalog.normalize_event_time / vector casts), add the "
                "flavor to ACCEPTED, and re-run the flavor tests."
            )
        else:
            assert typ == want_typ, (
                f"{table}.{name}: {typ} != {want_typ} — testdata "
                "regenerated with a new type; fix at the catalog choke "
                "point, not per query."
            )
