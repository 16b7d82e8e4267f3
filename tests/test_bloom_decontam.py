"""Bloom decontamination — one-sided error + map-only probe plan.

The bloom path may over-flag (false positives from filter saturation)
but must NEVER under-flag: every doc the exact semi-join marks
contaminated carries at least as many bloom flags. And the probe side
must stay shuffle-free — the whole point of the sketch is that the
100 TB train side is scanned exactly once with zero exchanges.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from floatchat_datapipeline_spark.catalog import load_table
from floatchat_datapipeline_spark.operators.decontam import (
    BLOOM_BITS,
    bloom_build,
    bloom_decontaminate,
    ngram_decontaminate,
)


def _split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
    )


def test_bloom_flags_are_a_superset_of_exact(spark, sf_dir):
    train, holdout = _split(spark, sf_dir)
    words = bloom_build(holdout)
    bloom = {
        r["doc_id"]: r["n_flagged"]
        for r in bloom_decontaminate(train, words).collect()
    }
    exact = {
        r["doc_id"]: r["n_shared"]
        for r in ngram_decontaminate(train, holdout).collect()
    }
    assert set(bloom) == set(exact)  # one row per train doc on both paths
    # no false negatives: every exactly-shared shingle also hits the filter
    for doc_id, n_shared in exact.items():
        assert bloom[doc_id] >= n_shared, doc_id
    assert any(n > 0 for n in exact.values())  # fixture isn't vacuous


def test_bloom_build_is_bounded_by_filter_size(spark, sf_dir):
    _, holdout = _split(spark, sf_dir)
    words = bloom_build(holdout)
    assert len(words) == BLOOM_BITS // 64
    assert any(w != 0 for w in words)


def test_bloom_probe_plan_has_no_shuffle_and_no_join(spark, sf_dir):
    train, holdout = _split(spark, sf_dir)
    words = bloom_build(holdout)
    plan = (
        bloom_decontaminate(train, words)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
