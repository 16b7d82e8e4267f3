"""Approximate-sketch path: the 100 TB substitutes for exact distinct
counts and exact quantiles, checked against their exact twins on the
test corpus. These have NO cross-engine oracle (HLL/t-digest layouts are
implementation-specific), so the exact Spark aggregate is the oracle —
the same pattern SURVEY §2.14 A9 documents.

Both sketches are partial-aggregable (merge-combinable per partition),
which is the property that makes them the scale path: state is O(sketch)
per group, not O(distinct values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT


def test_hll_distinct_within_relative_error(spark):
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] <= 0.05


def test_hll_distinct_per_group_merges(spark):
    """Grouped HLL must agree with grouped exact within rsd, proving the
    sketch merges correctly across partitions (partial aggregation)."""
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet").repartition(16)
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", 0.02).alias("approx"),
        )
        .collect()
    )
    assert len(rows) >= 3
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / max(r["exact"], 1) <= 0.05


def test_tdigest_percentile_within_rank_error(spark):
    """approx_percentile must land within a small RANK distance of the
    exact order statistic (value-distance is meaningless for skewed
    data; rank error is what t-digest bounds)."""
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    n = docs.count()
    exact_sorted = [
        r["n_chars"]
        for r in docs.select("n_chars").orderBy("n_chars").collect()
    ]
    row = docs.agg(
        F.expr(
            "approx_percentile(n_chars, array(0.5e0, 0.9e0, 0.99e0), 1000)"
        ).alias("p")
    ).first()
    for q, got in zip((0.5, 0.9, 0.99), row["p"]):
        # rank of the returned value in the exact sorted data
        import bisect

        lo = bisect.bisect_left(exact_sorted, got) / n
        hi = bisect.bisect_right(exact_sorted, got) / n
        assert lo - 0.02 <= q <= hi + 0.02, (q, got, lo, hi)


def test_cms_estimate_never_undercounts_and_collides_predictably(spark):
    """Count-min guarantee: est >= exact for every value, with equality
    when a value's buckets are collision-free. width=4 forces collisions
    so the overestimate branch is actually exercised."""
    from floatchat_datapipeline_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )
    from pyspark.sql import functions as F

    rows = [(w,) for w, n in
            [("a", 50), ("b", 30), ("c", 7), ("d", 3), ("e", 1)]
            for _ in range(n)]
    tok = spark.createDataFrame(rows, "token string")
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("exact"))
    sketch = cms_build(tok, width=4)
    assert sketch.count() <= 4 * 4  # bounded by depth x width, not data
    est = {
        r["token"]: r["est"]
        for r in cms_estimate(exact, sketch, width=4).collect()
    }
    ex = {r["token"]: r["exact"] for r in exact.collect()}
    assert all(est[t] >= ex[t] for t in ex)
    assert sum(est.values()) > sum(ex.values())  # width=4 must collide


def test_cms_weighted_build_equals_raw_build(spark):
    """Building from a pre-aggregated (value, count) table with
    weight_col must produce the bit-identical sketch as the raw stream."""
    from floatchat_datapipeline_spark.operators.sketches import cms_build
    from pyspark.sql import functions as F

    rows = [(w,) for w, n in [("x", 5), ("y", 2), ("z", 9)] for _ in range(n)]
    tok = spark.createDataFrame(rows, "token string")
    agg = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    raw = {(r["row"], r["bucket"]): r["c"] for r in cms_build(tok).collect()}
    wtd = {
        (r["row"], r["bucket"]): r["c"]
        for r in cms_build(agg, weight_col="n").collect()
    }
    assert raw == wtd and len(raw) > 0


def test_source_quantiles_sketch_tracks_exact(spark, sf_dir):
    """The approx_percentile (GK summary) scale path must track the exact
    percentile rollup within the sketch's rank-error bound. accuracy=10⁴
    bounds rank error at n/10⁴ — far below one rank at test scale, so the
    approx answer must land between the neighboring exact ranks (checked
    loosely as a small relative band on the value scale)."""
    from floatchat_datapipeline_spark.queries import (
        _source_quantiles_approx_df,
        q_source_quantiles,
        q_source_quantiles_sketch,
    )

    exact = {
        r["source"]: r
        for r in q_source_quantiles(spark, sf_dir).collect()
    }
    approx = {
        r["source"]: r
        for r in _source_quantiles_approx_df(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for src, e in exact.items():
        a = approx[src]
        assert a["n_docs"] == e["n_docs"]
        for p in ("p50", "p90", "p99"):
            # GK returns an actual data value at the bounded rank; exact
            # interpolates between ranks — allow one interpolation step.
            assert abs(a[p] - e[p]) <= max(0.02 * e[p], 50.0), (src, p, a[p], e[p])
    # the registered audit form certifies the same bound cross-engine
    for r in q_source_quantiles_sketch(spark, sf_dir).collect():
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"], r


def test_registry_hll_twin_tracks_exact_twin(spark):
    """The registry pair events_distinct_users / _sketch must agree per
    (day, event_type) cell within the sketch's rsd — the driver can only
    rows-check the sketch form, so this is its value gate."""
    from floatchat_datapipeline_spark.operators.windows import (
        distinct_users_rollup,
    )
    from floatchat_datapipeline_spark.queries import _base_registry

    reg = _base_registry()
    exact = {
        (r["day"], r["event_type"]): r["n_users"]
        for r in reg["events_distinct_users"].spark(spark, SF_CORRECT).collect()
    }
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
    from floatchat_datapipeline_spark.catalog import normalize_event_time

    approx = {
        (str(r["day"]), r["event_type"]): r["n_users"]
        for r in distinct_users_rollup(
            normalize_event_time(ev), approx=True
        ).collect()
    }
    assert set(exact) == set(approx)
    for key, ex in exact.items():
        assert abs(approx[key] - ex) / max(ex, 1) <= 0.05, (key, ex, approx[key])
    # the registered audit form certifies the same bound cross-engine
    rows = (
        reg["events_distinct_users_sketch"].spark(spark, SF_CORRECT).collect()
    )
    assert rows and all(r["sketch_ok"] for r in rows)
    assert {(r["day"], r["event_type"]): r["n_users"] for r in rows} == exact
