"""Vector-column flavor robustness — the embedding analog of the
event-time flavor tests.

Round 4 died of parquet-writer drift on events.ts (TIMESTAMP_NTZ); the
same class of drift on the embeddings table would be the element type
flipping between list<float> (today's writer) and list<double>. Every
vector operator casts to array<double> at its boundary, so both flavors
must produce IDENTICAL scores — float32 storage widens losslessly to the
double each float represents, and all arithmetic happens in double."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.catalog import load_table


@pytest.fixture(scope="module")
def flavor_dirs(spark, sf_dir, tmp_path_factory):
    """The same embeddings data written as list<float> and list<double>."""
    root = tmp_path_factory.mktemp("embflavors")
    emb = load_table(spark, sf_dir, "embeddings")
    out = {}
    for name, typ in (("f32", "array<float>"), ("f64", "array<double>")):
        d = str(root / name)
        emb.select(
            "vec_id", F.col("embedding").cast(typ).alias("embedding"), "label"
        ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
        out[name] = d
    return out


def _collect(df):
    return [tuple(r) for r in df.collect()]


def test_cosine_topk_identical_across_element_types(spark, flavor_dirs):
    from floatchat_datapipeline_spark.functions.vector import cosine_topk

    results = {}
    for name, d in flavor_dirs.items():
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        q = emb.filter(F.col("vec_id") == 1).first()["embedding"]
        results[name] = _collect(
            cosine_topk(
                emb.select(
                    "vec_id",
                    F.col("embedding").cast("array<double>").alias("embedding"),
                ),
                [float(x) for x in q],
                k=10,
            ).select("vec_id", "score")
        )
    assert results["f32"] == results["f64"]


def test_centroid_assignment_identical_across_element_types(
    spark, flavor_dirs
):
    from floatchat_datapipeline_spark.embeddings.search import (
        kmeans_centroids,
        nearest_centroid,
    )

    results = {}
    for name, d in flavor_dirs.items():
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        cents = kmeans_centroids(emb, 8)
        base = emb.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        results[name] = _collect(
            base.select(
                "vec_id", nearest_centroid("`embedding`", cents).alias("c")
            ).orderBy("vec_id")
        )
    assert results["f32"] == results["f64"]


def test_lsh_buckets_identical_across_element_types(spark, flavor_dirs):
    from floatchat_datapipeline_spark.embeddings.search import lsh_signature

    results = {}
    for name, d in flavor_dirs.items():
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        results[name] = _collect(
            emb.select(
                "vec_id", lsh_signature("embedding").alias("sig")
            ).orderBy("vec_id")
        )
    assert results["f32"] == results["f64"]
