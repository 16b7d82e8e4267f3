"""Round-13 operator tests: the global exclusive running max
(plans/scale.ranged_cummax_exclusive — the watermark recurrence),
the watermark policy census (S22), the purged temporal split (L36),
and the compaction bin-packing plan (Z6) — each against a brute-force
Python replay or the single-partition window it replaces."""

from __future__ import annotations

import pandas as pd


# ---------------------------------------------------------------------------
# ranged_cummax_exclusive == the global window it replaces
# ---------------------------------------------------------------------------


def test_ranged_cummax_equals_global_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from floatchat_datapipeline_spark.plans.scale import (
        ranged_cummax_exclusive,
    )

    # Adversarial order: values zig-zag so the running max changes both
    # within and across range partitions; unique key kk is the total
    # order.
    df = spark.range(0, 997).select(
        F.col("id").alias("kk"),
        ((F.col("id") * 37) % 101 - (F.col("id") % 7) * 13).alias("v"),
    )
    got = (
        ranged_cummax_exclusive(df, ["kk"], "v", "m", n_partitions=8)
        .orderBy("kk")
        .collect()
    )
    w = Window.orderBy("kk").rowsBetween(Window.unboundedPreceding, -1)
    want = (
        df.withColumn("m", F.max("v").over(w)).orderBy("kk").collect()
    )
    assert [(r.kk, r.m) for r in got] == [(r.kk, r.m) for r in want]
    # the overall first row has no predecessor
    assert got[0].m is None


# ---------------------------------------------------------------------------
# S22 — watermark policy census vs a Python replay of the recurrence
# ---------------------------------------------------------------------------


def test_watermark_policy_matches_python_replay(spark, sf_dir):
    from floatchat_datapipeline_spark.queries import (
        _WATERMARK_POLICIES,
        _WM_JITTER_MOD,
        _WM_JITTER_MUL,
        q_events_watermark_policy,
    )

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_id", "ts"]]
    ts_s = (ev["ts"].astype("datetime64[us]").astype("int64") // 1_000_000)
    akey = ts_s + (ev["event_id"] % _WM_JITTER_MOD) * _WM_JITTER_MUL % (
        _WM_JITTER_MOD
    )
    order = sorted(
        range(len(ev)), key=lambda i: (akey.iloc[i], ev["event_id"].iloc[i])
    )
    wm = None
    late = []
    for i in order:
        t = int(ts_s.iloc[i])
        late.append(max(wm - t, 0) if wm is not None else 0)
        wm = t if wm is None else max(wm, t)
    expected = {
        w: sum(1 for x in late if x > w) for w in _WATERMARK_POLICIES
    }
    got = {
        r.watermark_s: r.n_dropped
        for r in q_events_watermark_policy(spark, sf_dir).collect()
    }
    assert got == expected
    rows = q_events_watermark_policy(spark, sf_dir).collect()
    assert all(r.max_late_s == max(late) for r in rows)


def test_watermark_policy_zero_on_ordered_arrival(spark, tmp_path):
    """With in-order arrival (jitter removed by construction: one event
    per jitter bucket is impossible to force, so plant events whose
    jittered arrival preserves time order) the census must report 0."""
    from floatchat_datapipeline_spark.queries import (
        _WM_JITTER_MOD,
        q_events_watermark_policy,
    )

    # space events one jitter-modulus apart: any delay < MOD cannot
    # reorder them
    base = 1_700_000_000
    df = pd.DataFrame(
        {
            "event_id": range(50),
            "ts": pd.to_datetime(
                [(base + i * _WM_JITTER_MOD) * 1_000_000 for i in range(50)],
                unit="us",
            ),
            "user_id": [1] * 50,
            "event_type": ["click"] * 50,
            "value": [1.0] * 50,
            "props": ["{}"] * 50,
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    rows = q_events_watermark_policy(spark, str(tmp_path)).collect()
    assert [r.n_dropped for r in rows] == [0, 0, 0]
    assert all(r.max_late_s == 0 for r in rows)


# ---------------------------------------------------------------------------
# L36 — temporal split vs a Python replay
# ---------------------------------------------------------------------------


def test_temporal_split_matches_python_replay(spark, sf_dir):
    from floatchat_datapipeline_spark.queries import q_events_temporal_split

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["user_id", "ts"]]
    day = (
        ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    )
    mn, mx = int(day.min()), int(day.max())
    cut = mn + ((mx - mn + 1) * 7) // 10
    seg = pd.cut(
        day, [-float("inf"), cut - 0.5, cut + 0.5, float("inf")],
        labels=["tr", "em", "te"],
    )
    users_tr = set(ev["user_id"][seg == "tr"])
    users_te = set(ev["user_id"][seg == "te"])
    r = q_events_temporal_split(spark, sf_dir).collect()[0]
    assert r.cut_day == cut
    assert r.n_train == int((seg == "tr").sum())
    assert r.n_embargo == int((seg == "em").sum())
    assert r.n_test == int((seg == "te").sum())
    assert r.users_train == len(users_tr)
    assert r.users_test == len(users_te)
    assert r.users_both == len(users_tr & users_te)
    # the three segments partition the events
    assert r.n_train + r.n_embargo + r.n_test == len(ev)


# ---------------------------------------------------------------------------
# Z6 — compaction plan vs a Python replay of sequential fill
# ---------------------------------------------------------------------------


def test_compaction_plan_matches_python_replay(spark, sf_dir):
    from floatchat_datapipeline_spark.queries import (
        _COMPACTION_TARGET_CHARS,
        q_corpus_compaction_plan,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["source", "doc_id", "n_chars"]
    ]
    expected: dict[tuple, list[int]] = {}
    for source, grp in docs.groupby("source"):
        grp = grp.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        )
        cum = 0
        for n in grp["n_chars"]:
            b = cum // _COMPACTION_TARGET_CHARS
            cum += int(n)
            k = (source, b)
            if k not in expected:
                expected[k] = [0, 0]
            expected[k][0] += 1
            expected[k][1] += int(n)
    got = {
        (r.source, r.bin_id): [r.n_docs, r.bin_chars]
        for r in q_corpus_compaction_plan(spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in expected.items()}


def test_compaction_bins_respect_target(spark, sf_dir):
    """Sequential-fill invariants: bins tile 0..last with no gaps (a
    bin only closes by overflowing into the next), every non-last bin's
    cumulative content reaches its END boundary, and the per-source
    totals reconcile with the raw listing."""
    from floatchat_datapipeline_spark.queries import (
        _COMPACTION_TARGET_CHARS,
        q_corpus_compaction_plan,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    raw_totals = docs.groupby("source")["n_chars"].sum().to_dict()
    rows = q_corpus_compaction_plan(spark, sf_dir).collect()
    per_source: dict[str, list] = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r)
    for source, rs in per_source.items():
        rs = sorted(rs, key=lambda r: r.bin_id)
        assert [r.bin_id for r in rs] == list(range(len(rs))), source
        cum = 0
        for r in rs:
            cum += r.bin_chars
            if r.bin_id < len(rs) - 1:
                # the next bin exists, so this bin's content crossed
                # its end boundary
                assert cum >= (r.bin_id + 1) * _COMPACTION_TARGET_CHARS
        assert cum == raw_totals[source]
    # at least one source produced more than one bin at every SF
    assert any(len(rs) > 1 for rs in per_source.values())
