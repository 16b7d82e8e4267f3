"""Edge-semantics tests for the §2.14 operators — the cases the
sf-data oracle mirror can't isolate: as-of tie-breaking, funnel
ordering, component closure, pack/shard isolation, split stability."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.operators.clusters import (
    connected_components,
)
from floatchat_datapipeline_spark.operators.sampling import (
    pack_sequences,
    stratified_sample,
    train_test_split,
)
from floatchat_datapipeline_spark.operators.timeseries import (
    asof_join,
    binned_range_agg,
    event_funnel,
)


def _ts(m: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def events_df(spark):
    rows = [
        # user 1: view@0, view@5, click@5 (simultaneous), click@10
        (1, 1, _ts(0), "view", 1.0),
        (2, 1, _ts(5), "view", 2.0),
        (3, 1, _ts(5), "click", 10.0),
        (4, 1, _ts(10), "click", 20.0),
        # user 2: click with NO preceding view
        (5, 2, _ts(3), "click", 30.0),
        # user 3: purchase BEFORE click — funnel must stall at click
        (6, 3, _ts(0), "view", 1.0),
        (7, 3, _ts(1), "purchase", 99.0),
        (8, 3, _ts(2), "click", 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_asof_simultaneous_right_row_is_visible(events_df):
    clicks = events_df.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = events_df.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    out = {
        r["event_id"]: r
        for r in asof_join(
            clicks, views, on="user_id", payload_cols=("value",),
            right_order_col="event_id", payload_prefix="view_",
        ).collect()
    }
    # click@5 sees the view AT 5 (right sorts before left at equal ts)
    assert out[3]["view_value"] == 2.0 and out[3]["view_ts"] == _ts(5)
    # click@10 still sees the latest view (ts=5)
    assert out[4]["view_value"] == 2.0
    # user 2 has no view → NULL payload, row preserved
    assert out[5]["view_value"] is None and out[5]["view_ts"] is None


def test_asof_right_ties_break_to_highest_order(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts(9))], "event_id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, "k", _ts(1), 111.0), (11, "k", _ts(1), 222.0)],
        "event_id long, k string, ts timestamp, value double",
    )
    row = asof_join(
        left, right, on="k", payload_cols=("value",),
        right_order_col="event_id",
    ).collect()[0]
    assert row["asof_value"] == 222.0  # last write (highest event_id) wins


def test_binned_range_agg_window_is_half_open(spark):
    # build rows at +0s, +599s (in), +600s (out), before (out)
    probe = spark.createDataFrame(
        [(1, "k", _ts(10))], "event_id long, k string, ts timestamp"
    )
    base = _ts(10)
    build = spark.createDataFrame(
        [
            ("k", base, 1.0),
            ("k", base + dt.timedelta(seconds=599), 2.0),
            ("k", base + dt.timedelta(seconds=600), 4.0),
            ("k", base - dt.timedelta(seconds=1), 8.0),
        ],
        "k string, ts timestamp, value double",
    )
    row = binned_range_agg(probe, build, on="k", window_seconds=600).collect()[0]
    assert row["n_matches"] == 2
    assert row["value_cents"] == 300


def test_funnel_requires_stage_order(events_df):
    out = {r["user_id"]: r for r in event_funnel(events_df).collect()}
    # user 1: view@0 → click@5 (simultaneous-with-view-2 still ≥ view_ts)
    assert out[1]["view_ts"] == _ts(0) and out[1]["click_ts"] == _ts(5)
    assert out[1]["purchase_ts"] is None
    # user 3: purchase happened BEFORE the click stage → not counted
    assert out[3]["click_ts"] == _ts(2) and out[3]["purchase_ts"] is None
    # user 2 never viewed → absent entirely (funnel roots at stage 1)
    assert 2 not in out


def test_connected_components_transitive_closure(spark):
    # chain a-b, b-c, plus isolated pair x-y: two components
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    n = 12  # diameter > 1 forces multiple propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    out = connected_components(edges).collect()
    assert {r["component"] for r in out} == {0}
    assert len(out) == n + 1


def test_connected_components_deep_chain_logarithmic_rounds(spark):
    # large-star/small-star needs O(log diameter) rounds: a 256-link
    # chain (diameter 256) must converge well under the 20-round cap
    # (min-label propagation would need 256 rounds and raise).
    n = 256
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    out = connected_components(edges, max_iters=10).collect()
    assert {r["component"] for r in out} == {0}
    assert len(out) == n + 1


def test_connected_components_self_loop_and_isolated(spark):
    edges = spark.createDataFrame(
        [(40, 40), (7, 5)], "id_a long, id_b long"
    )
    out = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {40: 40, 5: 5, 7: 5}


def test_split_is_stable_under_corpus_growth(spark):
    small = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    s_small = {r["doc_id"]: r["split"] for r in train_test_split(small).collect()}
    s_big = {r["doc_id"]: r["split"] for r in train_test_split(big).collect()}
    assert all(s_big[k] == v for k, v in s_small.items())
    # rough proportions on the bigger draw
    n_train = sum(1 for v in s_big.values() if v == "train")
    assert 700 <= n_train <= 900


def test_stratified_sample_rates_and_independence(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
    )
    kept = stratified_sample(df, {"a": 100, "b": 0}, default_pct=0).collect()
    assert len(kept) == 1000  # all of a, none of b
    assert all(r["source"] == "a" for r in kept)


def test_pack_sequences_never_crosses_shards(spark):
    df = spark.createDataFrame(
        [(i, "w " * 99 + "w", "s%d" % (i % 3)) for i in range(30)],
        "doc_id long, text string, lang string",
    )
    out = pack_sequences(df, budget_tokens=250)
    # each doc is 100 tokens; packs restart per shard: offsets cycle
    rows = sorted(out.collect(), key=lambda r: (r["shard"], r["doc_id"]))
    for shard in {r["shard"] for r in rows}:
        sh = [r for r in rows if r["shard"] == shard]
        assert sh[0]["pack_id"] == 0 and sh[0]["pack_offset"] == 0
        for prev, cur in zip(sh, sh[1:]):
            start = cur["pack_id"] * 250 + cur["pack_offset"]
            assert start == (prev["pack_id"] * 250 + prev["pack_offset"]) + 100


def test_ewma_recenter_and_first_row_exempt(spark):
    """EWMA tracker updates on every row (anomalies included): after a
    level shift the chart flags the jump once, then re-centers instead
    of flagging forever. The first row per key seeds the state and is
    never flagged; keys are isolated."""
    from floatchat_datapipeline_spark.operators.timeseries import (
        ewma_anomalies,
    )

    rows = [
        # user 1: stable at 10, jump to 500 and STAY there.
        (1, 1, _ts(0), "x", 10.0),
        (2, 1, _ts(1), "x", 10.0),
        (3, 1, _ts(2), "x", 500.0),   # |500-10| > 150 -> flagged
        (4, 1, _ts(3), "x", 500.0),   # ewma=255 -> |500-255|=245 -> flagged
        (5, 1, _ts(4), "x", 500.0),   # ewma=377.5 -> 122.5 -> NOT flagged
        # user 2: one huge first row seeds state, never flagged.
        (6, 2, _ts(0), "x", 9999.0),
        (7, 2, _ts(1), "x", 9999.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = ewma_anomalies(df).toPandas().sort_values("event_id")
    assert list(out["event_id"]) == [3, 4]
    assert list(out["prev_ewma"]) == [10.0, 255.0]


def test_gapfill_linterp_midpoint_and_observed_passthrough(spark):
    """Interior gaps take the straight line between the surrounding
    observed buckets; observed buckets pass through unchanged; the grid
    spans exactly [first, last] observed hour per key."""
    from floatchat_datapipeline_spark.operators.timeseries import (
        gapfill_linterp,
    )

    rows = [
        # user 1: 100.00 at h0, 400.00 at h3 -> gaps at h1 (200.0), h2 (300.0)
        (1, 1, dt.datetime(2024, 1, 1, 0, 30), "x", 100.0),
        (2, 1, dt.datetime(2024, 1, 1, 3, 15), "x", 400.0),
        # user 2: single bucket -> no gaps at all
        (3, 2, dt.datetime(2024, 1, 1, 5, 0), "x", 50.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = gapfill_linterp(df).toPandas().sort_values(["user_id", "hour"])
    u1 = out[out.user_id == 1]
    assert list(u1["filled_value"]) == [10000.0, 20000.0, 30000.0, 40000.0]
    assert list(u1["is_gap"]) == [False, True, True, False]
    u2 = out[out.user_id == 2]
    assert len(u2) == 1 and not u2["is_gap"].iloc[0]


# ------------------------------------------------------------------ LTTB
def test_lttb_short_series_oracle_parity(spark, tmp_path):
    """Both engines must take the pass-through branch for a series with
    n <= nb+2 points and the greedy branch otherwise — the oracle's
    bucket division (npts-2) and recursive CTE only run on long series,
    so a 2-point corpus can't divide by zero or strand the recursion.
    (ADVICE r8: the oracle previously had no short-series guard.)"""
    import pandas as pd

    from floatchat_datapipeline_spark.queries import (
        _EVENTS_LTTB_ORACLE,
        _LTTB_BUCKETS,
        q_events_lttb,
    )
    from tests.oracle_utils import compare, duckdb_con

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    # "tiny": 2 hourly points — the npts-2 == 0 divide-by-zero case.
    for h in (0, 1):
        rows.append(("tiny", base + dt.timedelta(hours=h, minutes=5)))
    # "short": 6 points with a gap (hour 3 missing -> zero-filled).
    for h in (0, 1, 2, 4, 5):
        for _ in range((h % 3) + 1):
            rows.append(("short", base + dt.timedelta(hours=h, minutes=9)))
    # "long": > nb+2 hourly points, varying counts -> greedy branch.
    for h in range(_LTTB_BUCKETS + 40):
        for _ in range((h * 7) % 5 + 1):
            rows.append(("long", base + dt.timedelta(hours=h, minutes=3)))
    events = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [r[1] for r in rows],
            "user_id": [1] * len(rows),
            "event_type": [r[0] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    events.to_parquet(tmp_path / "events.parquet")
    out = q_events_lttb(spark, str(tmp_path))
    compare(out, duckdb_con(str(tmp_path)), _EVENTS_LTTB_ORACLE, "lttb_short")
    pdf = out.toPandas()
    assert len(pdf[pdf.event_type == "tiny"]) == 2
    assert len(pdf[pdf.event_type == "short"]) == 6  # gap hour zero-filled
    assert len(pdf[pdf.event_type == "long"]) == _LTTB_BUCKETS + 2
