"""Round-14 optimization-round tests: pin behaviors changed or audited
by the second optimization pass."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_fk_orphan_audit_empty_child_emits_no_row(spark, sf_dir, tmp_path):
    """An EMPTY child table must contribute NO row for its edge — the
    oracle's GROUP BY fk shape — not a fabricated all-zero row (the
    r13-noted latent divergence, fixed in r14 by grouping the final
    aggregate on fk)."""
    from floatchat_datapipeline_spark.queries import q_fk_orphan_audit

    d = str(tmp_path)
    for t in ("lineitem", "orders", "part", "supplier", "customer"):
        shutil.copy(os.path.join(sf_dir, f"{t}.parquet"), d)
    # schema-identical but 0-row events table
    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet")).head(0)
    for c in ev.columns:
        if pd.api.types.is_datetime64_any_dtype(ev[c]):
            ev[c] = ev[c].astype("datetime64[us]")
    pq.write_table(
        pa.Table.from_pandas(ev, preserve_index=False),
        os.path.join(d, "events.parquet"),
    )

    rows = {r.fk: r for r in q_fk_orphan_audit(spark, d).collect()}
    assert "events.user->supplier" not in rows
    assert sorted(rows) == [
        "lineitem->orders",
        "lineitem->part",
        "lineitem->supplier",
        "orders->customer",
    ]

    # full oracle parity on the empty-child fixture
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from oracle_utils import compare, duckdb_con

    import __spark_entry__ as entry_mod

    con = duckdb_con(d)
    compare(
        q_fk_orphan_audit(spark, d),
        con,
        entry_mod.oracle_sql()["fk_orphan_audit"],
        "fk_orphan_audit[empty-child]",
    )
