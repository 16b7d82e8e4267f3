"""Fast oracle hygiene gate: every registered DuckDB oracle must at
least PLAN against the sf0.001 views. Catches SQL assembly breakage
(f-string refactors, fragment reuse) in seconds, without waiting for
the full execution-parity suite."""

from __future__ import annotations

import duckdb
import pytest

from floatchat_datapipeline_spark.queries import registry

from tests.conftest import SF_SMOKE

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield c
    c.close()


def test_every_oracle_plans(con):
    bad = {}
    for name, spec in registry().items():
        if spec.oracle is None:
            continue
        try:
            con.execute(f"EXPLAIN {spec.oracle}")
        except Exception as e:  # noqa: BLE001 — collecting all failures
            bad[name] = str(e).splitlines()[0]
    assert not bad, bad
