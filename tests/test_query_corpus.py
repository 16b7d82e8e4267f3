"""Corpus smoke suite — the structural assertions the reference lacks.

Every one of the 79 corpus queries runs through semantic search; spot
categories also run their structured twin. Assertions: result count ≤ k,
scores monotone non-increasing, pre-filters honored, deterministic
ordering (rerun equality on a sample).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.api import FloatChatEngine
from floatchat_datapipeline_spark.corpus import CORPUS

K = 5


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return FloatChatEngine(spark, sf_dir)


@pytest.fixture(scope="module")
def all_hits(engine):
    """Run the whole corpus once; cache rows per query."""
    out = {}
    for cat, queries in CORPUS.items():
        for q in queries:
            out[(cat, q)] = engine.semantic_search(q, k=K).collect()
    return out


def test_corpus_counts():
    assert sum(len(v) for v in CORPUS.values()) == 79
    assert len(CORPUS) == 8


def test_every_query_returns_bounded_ranked_results(all_hits):
    for (cat, q), rows in all_hits.items():
        assert len(rows) <= K, (cat, q)
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True), (cat, q, scores)


def test_nontrivial_recall(all_hits):
    """At least 90% of queries should find something — the corpus and the
    summary vocabulary genuinely overlap."""
    nonempty = sum(1 for rows in all_hits.values() if rows)
    assert nonempty >= int(0.9 * len(all_hits)), f"{nonempty}/{len(all_hits)}"


def test_prefilter_honored(engine):
    hits = engine.semantic_search(
        "warm tropical water", k=K, where=F.col("temperature_max") >= 20
    ).collect()
    ids = [r["float_id"] for r in hits]
    ok = {
        r["float_id"]
        for r in engine.floats.filter(F.col("temperature_max") >= 20)
        .select("float_id")
        .collect()
    }
    assert set(ids) <= ok


def test_search_deterministic(engine):
    q = CORPUS["temperature"][0]
    a = [tuple(r) for r in engine.semantic_search(q, k=K).collect()]
    b = [tuple(r) for r in engine.semantic_search(q, k=K).collect()]
    assert a == b


def test_structured_twins(engine):
    # geographic: box query returns only intersecting floats
    box = engine.geo_box((-10.0, 10.0), (60.0, 80.0)).collect()
    for r in box:
        assert r["lat_max"] >= -10 and r["lat_min"] <= 10
        assert r["lon_max"] >= 60 and r["lon_min"] <= 80
    # negation is the exact complement
    n_all = engine.floats.count()
    n_out = engine.exclude_region((-10.0, 10.0), (60.0, 80.0)).count()
    assert n_out == n_all - len(box)
    # extremes ordering
    hot = engine.extremes("temperature", k=3).collect()
    temps = [r["temperature_max"] for r in hot]
    assert temps == sorted(temps, reverse=True)
    # multi-parameter is a conjunction
    mp = engine.multi_param(
        temperature=(20.0, None), salinity=(None, 35.0)
    ).collect()
    for r in mp:
        assert r["temperature_max"] >= 20 and r["salinity_min"] <= 35
    # depth
    for r in engine.depth_query(1000.0).collect():
        assert r["pressure_max"] >= 1000


def test_sql_passthrough(spark, sf_dir):
    from floatchat_datapipeline_spark.api import sql

    df = sql(
        spark,
        sf_dir,
        """
        SELECT f.float_id, f.total_profiles
        FROM float_metadata f
        WHERE f.temperature_max >= 20
        ORDER BY f.float_id LIMIT 5
        """,
    )
    rows = df.collect()
    assert 0 < len(rows) <= 5
    assert [r["float_id"] for r in rows] == sorted(r["float_id"] for r in rows)
