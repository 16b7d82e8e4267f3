"""Skew guards in the pair generators (VERDICT r01 'What's wrong #3').

A degenerate key — every doc sharing a band key or a stop-phrase shingle —
must NOT produce a quadratic pair explosion or an unbounded per-key
collect_list. The guard drops keys whose frequency exceeds the cap BEFORE
any list is materialized.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from floatchat_datapipeline_spark.operators.dedup import (
    _cap_key_frequency,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)

N_DOCS = 60


def _identical_docs(spark):
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(N_DOCS)]
    return spark.createDataFrame(rows, "doc_id int, text string")


def _stop_shingle_docs(spark):
    # Every doc opens with the same trigram; the rest is unique per doc.
    rows = [(i, f"the quick fox a{i} b{i} c{i}") for i in range(N_DOCS)]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_lsh_bucket_cap_bounds_pairs(spark):
    docs = _identical_docs(spark)
    # Uncapped: every band bucket holds all docs -> full quadratic fan-out.
    assert (
        minhash_lsh_pairs(docs, spark, max_bucket_size=None).count()
        == N_DOCS * (N_DOCS - 1) // 2
    )
    # Capped: the degenerate buckets are dropped entirely.
    assert minhash_lsh_pairs(docs, spark, max_bucket_size=10).count() == 0


def test_ngram_doc_freq_cap_bounds_pairs(spark):
    docs = _stop_shingle_docs(spark)
    # Uncapped: the shared shingle pairs every doc with every other
    # (jaccard 1/7 > threshold).
    uncapped = ngram_jaccard_pairs(docs, threshold=0.05, max_doc_freq=None)
    assert uncapped.count() == N_DOCS * (N_DOCS - 1) // 2
    # Capped: the stop shingle is dropped, no intersections remain.
    assert ngram_jaccard_pairs(docs, threshold=0.05, max_doc_freq=10).count() == 0


def test_default_caps_never_bind_at_test_scale(spark, sf_dir):
    """Default caps (4096) are far above the 500-doc test corpus, so the
    capped defaults return exactly the uncapped answer — oracle parity is
    untouched."""
    from floatchat_datapipeline_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    with_cap = ngram_jaccard_pairs(docs)
    no_cap = ngram_jaccard_pairs(docs, max_doc_freq=None)
    assert with_cap.exceptAll(no_cap).count() == 0
    assert no_cap.exceptAll(with_cap).count() == 0


def test_cap_filter_shares_exchange_with_groupby(spark):
    """The window count partitions by the same key as the downstream
    groupBy, so the guard must not add a second shuffle: exactly one
    Exchange below the final aggregate."""
    df = spark.createDataFrame([(i, i % 7) for i in range(100)], "id int, k int")
    capped = _cap_key_frequency(df, ["k"], 50).groupBy("k").agg(
        F.collect_list("id").alias("ids")
    )
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_semdedup_centroid_count_scales_sqrt():
    """n_centroids defaults to max(8, isqrt(N)): 4x corpus -> 2x clusters,
    so expected membership (and the quadratic in-cluster pair stage per
    cluster) grows sqrt(N), not N."""
    from floatchat_datapipeline_spark.operators.clusters import (
        auto_n_centroids,
    )

    assert auto_n_centroids(64) == 8
    assert auto_n_centroids(10_000) == 100
    assert auto_n_centroids(40_000) == 200
    assert auto_n_centroids(10_000) * auto_n_centroids(10_000) <= 10_000
    # mean membership N/k == sqrt(N): doubles when corpus quadruples
    assert 40_000 / auto_n_centroids(40_000) == 2 * (
        10_000 / auto_n_centroids(10_000)
    )


def test_semdedup_over_cap_cluster_is_skipped_not_exploded(spark):
    """A degenerate mega-cluster past max_cluster produces NO pairs (its
    members all stay kept) instead of a quadratic pair explosion."""
    from floatchat_datapipeline_spark.operators.clusters import semdedup

    # all-identical vectors -> one cluster of 40, every non-min a dup
    emb = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0), F.lit(3.0)).alias("embedding"),
    )
    dedup = semdedup(emb, threshold=0.9, n_centroids=2)
    assert dedup.filter(~F.col("is_kept")).count() == 39
    capped = semdedup(emb, threshold=0.9, n_centroids=2, max_cluster=10)
    assert capped.filter(~F.col("is_kept")).count() == 0
    assert capped.count() == 40
