"""Adversarial cross-engine parity for the interval + graph operators.

The driver's testdata has essentially no (user, ts) collisions, so the
tie-break branches — close-before-open at equal instants, equal-s_us
island numbering, equal-rank candidate ordering — would pass vacuously.
These tests build collision-heavy in-memory tables and run the SAME
registry oracle SQL against them in DuckDB, so the tie rules themselves
are value-checked."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd

from floatchat_datapipeline_spark.operators.timeseries import (
    interval_union,
    peak_concurrency,
)
from tests.oracle_utils import compare


BASE = dt.datetime(2024, 1, 1)


def _collision_events():
    """Every pathological alignment: duplicate (user, ts) pairs, an
    interval opening exactly when another closes (ts delta == hold),
    triple-stacked identical instants, and interleaved users."""
    rows = []
    eid = 0
    # user 1: three events at the SAME instant + one exactly at close
    for s in [0, 0, 0, 300, 600, 600]:
        rows.append((eid, BASE + dt.timedelta(seconds=s), 1, "a", 1.0))
        eid += 1
    # user 2: open/close boundary chains across types
    for s, t in [(0, "a"), (300, "a"), (300, "b"), (600, "b"), (100, "a")]:
        rows.append((eid, BASE + dt.timedelta(seconds=s), 2, t, 2.0))
        eid += 1
    # user 3: far-apart islands with duplicate ts at the island starts
    for s in [0, 0, 10_000, 10_000]:
        rows.append((eid, BASE + dt.timedelta(seconds=s), 3, "a", 3.0))
        eid += 1
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )


def _con_with(pdf: pd.DataFrame) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register("events_src", pdf)
    con.execute(
        "CREATE VIEW events AS SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,"
        " user_id, event_type, value FROM events_src"
    )
    return con


def test_interval_union_tie_breaks_match_oracle(spark):
    from floatchat_datapipeline_spark.queries import (
        _EVENTS_INTERVAL_UNION_ORACLE,
    )

    pdf = _collision_events()
    df = spark.createDataFrame(pdf)
    con = _con_with(pdf)
    try:
        compare(
            interval_union(df),
            con,
            _EVENTS_INTERVAL_UNION_ORACLE,
            "interval_union/collisions",
        )
    finally:
        con.close()


def test_peak_concurrency_tie_breaks_match_oracle(spark):
    from floatchat_datapipeline_spark.queries import (
        _EVENTS_PEAK_CONCURRENCY_ORACLE,
    )

    pdf = _collision_events()
    df = spark.createDataFrame(pdf)
    con = _con_with(pdf)
    try:
        compare(
            peak_concurrency(df),
            con,
            _EVENTS_PEAK_CONCURRENCY_ORACLE,
            "peak_concurrency/collisions",
        )
    finally:
        con.close()


def test_peak_concurrency_close_before_open_semantics(spark):
    """Touching intervals ([0,300) then opening at exactly 300) must not
    overlap: peak stays 1."""
    rows = [(i, BASE + dt.timedelta(seconds=300 * i), 1, "a", 0.0) for i in range(4)]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    got = peak_concurrency(spark.createDataFrame(pdf)).collect()
    assert got[0].peak_concurrency == 1


def test_pagerank_excludes_never_coactive_users(spark):
    """A user alone in every one of their (type, slot) buckets produces
    no edges and is NOT a node — documented coactivity_edges semantics."""
    from floatchat_datapipeline_spark.operators.graph import (
        coactivity_edges,
        pagerank_fixed_point,
    )

    rows = [
        # users 1, 2 co-active in one slot; user 9 isolated far away
        (0, BASE, 1, "a", 0.0),
        (1, BASE + dt.timedelta(seconds=30), 2, "a", 0.0),
        (2, BASE + dt.timedelta(days=30), 9, "a", 0.0),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    ranks = pagerank_fixed_point(
        coactivity_edges(spark.createDataFrame(pdf)), iters=3
    ).collect()
    nodes = {r.node for r in ranks}
    assert nodes == {1, 2}
    assert len({r.rank for r in ranks}) == 1  # symmetric pair → equal rank


def test_mmr_rerank_duplicate_embeddings_match_oracle(spark):
    """Exact duplicate vectors make rel ties and sims of exactly 1.0 —
    the hardest case for the greedy argmax's (score, doc_id) ordering.
    Both engines must pick identical ids through 10 ranks × 5 queries."""
    import numpy as np

    from floatchat_datapipeline_spark.operators.similarity import mmr_rerank
    from floatchat_datapipeline_spark.queries import _EMB_MMR_RERANK_ORACLE

    rng = np.random.RandomState(7)
    base_vecs = rng.randn(10, 8)
    rows = []
    for i in range(30):  # 10 directions × 3 exact copies
        rows.append(
            (i, [float(x) for x in base_vecs[i % 10]], int(i % 3))
        )
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    df = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("embeddings", pdf)
    try:
        compare(
            mmr_rerank(df),
            con,
            _EMB_MMR_RERANK_ORACLE,
            "mmr_rerank/duplicates",
        )
    finally:
        con.close()


def test_pagerank_full_oracle_on_dense_collision_graph(spark):
    """End-to-end pagerank parity (edge build + 10 iterations) on a
    dense little graph with duplicate timestamps, hub/leaf asymmetry and
    a multi-type slot — the oracle replays edge construction AND the
    fixed-point recursion from the same custom events table."""
    from pyspark.sql import functions as F

    from floatchat_datapipeline_spark.operators.graph import (
        coactivity_edges,
        pagerank_fixed_point,
    )
    from floatchat_datapipeline_spark.queries import _EVENTS_PAGERANK_ORACLE

    rows = []
    eid = 0
    # slot 0 type a: users 1..5 (clique); user 1 repeats at same instant
    for u in [1, 1, 2, 3, 4, 5]:
        rows.append((eid, BASE, u, "a", 0.0))
        eid += 1
    # slot 0 type b overlaps users 1,2 only (duplicate edges across types)
    for u in [1, 2]:
        rows.append((eid, BASE + dt.timedelta(seconds=5), u, "b", 0.0))
        eid += 1
    # slot 1: hub user 1 meets 6,7 (asymmetric degrees)
    for u in [1, 6, 7]:
        rows.append((eid, BASE + dt.timedelta(seconds=700), u, "a", 0.0))
        eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df = spark.createDataFrame(pdf)
    got = (
        pagerank_fixed_point(coactivity_edges(df), iters=10)
        .select(
            F.col("node").alias("user_id"),
            F.col("rank").alias("rank_units"),
        )
        .orderBy(F.desc("rank_units"), "user_id")
    )
    con = _con_with(pdf)
    try:
        compare(got, con, _EVENTS_PAGERANK_ORACLE, "pagerank/collisions")
    finally:
        con.close()
