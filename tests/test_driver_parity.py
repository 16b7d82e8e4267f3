"""Mirror of the driver's correctness gate: every queries() entry with an
oracle must match DuckDB exactly at sf0.001 (and sf0.01 when RUN_SF001=0)."""

from __future__ import annotations

import importlib
import sys

import pytest

sys.path.insert(0, "/root/repo")
entry_mod = importlib.import_module("__spark_entry__")

from tests.oracle_utils import compare, duckdb_con  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        return
    con = duckdb_con(sf_dir)
    try:
        compare(df, con, ORACLES[name], name)
    finally:
        con.close()
