"""Leakage-safe split — the invariant that justifies its existence:
no duplicate cluster ever straddles a split boundary, and in particular
every LSH candidate pair lands in the same split."""

from __future__ import annotations

from floatchat_datapipeline_spark.operators.dedup import minhash_lsh_pairs
from floatchat_datapipeline_spark.catalog import load_table
from floatchat_datapipeline_spark.queries import q_doc_leakage_safe_split

from tests.conftest import SF_SMOKE


def test_one_split_per_component_and_pairs_never_straddle(spark):
    out = q_doc_leakage_safe_split(spark, SF_SMOKE)
    rows = out.collect()
    docs = load_table(spark, SF_SMOKE, "documents")
    assert len(rows) == docs.count()  # every doc assigned exactly once

    split_of = {r["doc_id"]: r["split"] for r in rows}
    by_comp: dict[int, set[str]] = {}
    for r in rows:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_comp.values())

    pairs = minhash_lsh_pairs(docs, spark).collect()
    assert pairs  # fixture has near-dups, the test is not vacuous
    for p in pairs:
        assert split_of[p["id_a"]] == split_of[p["id_b"]], p

    # all three splits are populated at this scale
    assert {r["split"] for r in rows} == {"train", "valid", "test"}
