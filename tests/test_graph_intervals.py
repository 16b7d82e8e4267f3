"""Graph + interval operators: algebraic invariants and tiny hand-checked
cases (the oracle parity in test_driver_parity.py checks values; these
pin the algorithm's defining properties independently of DuckDB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from floatchat_datapipeline_spark.catalog import load_table
from floatchat_datapipeline_spark.operators.graph import (
    PAGERANK_MASS,
    coactivity_edges,
    pagerank_fixed_point,
)
from floatchat_datapipeline_spark.operators.timeseries import (
    interval_union,
    peak_concurrency,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_pagerank_uniform_on_symmetric_regular_graph(spark):
    """On a k-regular symmetric graph the uniform vector is the exact
    fixed point — and with integer arithmetic every node computes the
    IDENTICAL floor expressions, so ranks must be exactly equal."""
    # 4-cycle, both directions: every node has in/outdeg 2
    cyc = [(i, (i + 1) % 4) for i in range(4)]
    pairs = cyc + [(b, a) for a, b in cyc]
    got = pagerank_fixed_point(_edges(spark, pairs), iters=5).collect()
    ranks = {r.node: r.rank for r in got}
    assert len(ranks) == 4
    assert len(set(ranks.values())) == 1, ranks


def test_pagerank_mass_conservation_bounds(spark):
    """Floor divisions only ever DROP mass: total stays ≤ MASS and the
    per-iteration leak is bounded (≤ |V|·(outdeg+100) units ≈ nothing at
    mass 10^15), so the total must stay within a loose lower bound too."""
    star = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    got = pagerank_fixed_point(_edges(spark, star), iters=10).collect()
    total = sum(r.rank for r in got)
    assert total <= PAGERANK_MASS
    assert total >= PAGERANK_MASS - 10 * 6 * 1000  # 10 iters × |V| × slop


def test_pagerank_hub_outranks_leaves(spark):
    """In a symmetric star the hub receives every leaf's full rank and
    must dominate each leaf."""
    star = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    ranks = {
        r.node: r.rank
        for r in pagerank_fixed_point(_edges(spark, star), iters=10).collect()
    }
    hub = ranks[0]
    assert all(hub > v for k, v in ranks.items() if k != 0), ranks


def test_coactivity_edges_symmetric_and_selfloop_free(spark, sf_dir):
    ed = coactivity_edges(load_table(spark, sf_dir, "events"))
    assert ed.filter(F.col("src") == F.col("dst")).count() == 0
    fwd = ed.count()
    rev = ed.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    assert ed.intersect(rev).count() == fwd  # every edge has its mirror


def test_peak_concurrency_hand_case(spark):
    """Three intervals: [0,300), [100,400), [350,650) → overlap peaks at
    2 (first/second), third starts after the first closed."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=s), "a")
        for i, s in enumerate([0, 100, 350])
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    got = peak_concurrency(df).collect()
    assert len(got) == 1
    assert got[0].peak_concurrency == 2
    assert got[0].n_intervals == 3


def test_interval_union_hand_case_and_bounds(spark):
    """[0,300) ∪ [100,400) merge (covered 400 s); [1000,1300) is its own
    island; touching [1300,1600) merges with it (close-open adjacency)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=s), 7)
        for i, s in enumerate([0, 100, 1000, 1300])
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    got = interval_union(df).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_islands == 2
    assert r.n_intervals == 4
    assert r.covered_us == (400 + 600) * 1_000_000


def test_interval_union_bounds_on_real_data(spark, sf_dir):
    got = interval_union(load_table(spark, sf_dir, "events"))
    bad = got.filter(
        (F.col("covered_us") > F.col("n_intervals") * 300_000_000)
        | (F.col("covered_us") < 300_000_000)
        | (F.col("n_islands") > F.col("n_intervals"))
    )
    assert bad.count() == 0
