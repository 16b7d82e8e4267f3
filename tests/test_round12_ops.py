"""Round-12 operator tests: the data-contract audits (K16/K17/V21), the
deterministic bootstrap (A65), entropy rate (A66), Brier decomposition
(A67), and the SPRT walk (TS35) — each against a brute-force Python
replay or a planted-signal fixture."""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np
import pandas as pd
import pytest


def _write(path: str, df: pd.DataFrame) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# K16 / K17 — key + FK audits against pandas brute force at sf0.001
# ---------------------------------------------------------------------------


def test_table_key_audit_matches_pandas(spark, sf_dir):
    from floatchat_datapipeline_spark.queries import q_table_key_audit

    rows = {
        (r.table_name, r.key_col): r
        for r in q_table_key_audit(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    li = pd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"))
    # unique contract keys hold on generated data
    for t, k in (
        ("embeddings", "vec_id"),
        ("documents", "doc_id"),
        ("events", "event_id"),
        ("orders", "o_orderkey"),
    ):
        r = rows[(t, k)]
        assert r.unique_ok and r.n_dup_rows == 0 and r.n_null_rows == 0
        assert r.n_rows == r.n_keys
    # the legitimately-repeated keys DO report multiplicity
    vc = ev["user_id"].value_counts()
    r = rows[("events", "user_id")]
    assert r.n_keys == len(vc)
    assert r.max_multiplicity == int(vc.max())
    assert r.n_dup_rows == int(vc[vc > 1].sum())
    assert bool(r.unique_ok) == (r.n_dup_rows == 0)
    r = rows[("lineitem", "l_orderkey")]
    assert r.max_multiplicity == int(li["l_orderkey"].value_counts().max())


def test_fk_orphan_audit_detects_broken_edge(spark, sf_dir):
    from floatchat_datapipeline_spark.queries import q_fk_orphan_audit

    rows = {r.fk: r for r in q_fk_orphan_audit(spark, sf_dir).collect()}
    for clean in (
        "lineitem->orders",
        "lineitem->part",
        "lineitem->supplier",
        "orders->customer",
    ):
        assert rows[clean].n_orphan_rows == 0
        assert rows[clean].row_coverage == 1.0
    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    supp = pd.read_parquet(os.path.join(sf_dir, "supplier.parquet"))
    users = set(ev["user_id"].astype(str))
    parents = set(supp["s_suppkey"].astype(str))
    orphan_keys = users - parents
    r = rows["events.user->supplier"]
    assert r.n_orphan_keys == len(orphan_keys)
    assert r.n_orphan_rows == int(
        ev["user_id"].astype(str).isin(orphan_keys).sum()
    )
    # the broken edge must actually discriminate on generated data
    assert r.n_orphan_rows > 0 and r.row_coverage < 1.0


# ---------------------------------------------------------------------------
# V21 — dead-embedding audit on planted pathologies
# ---------------------------------------------------------------------------


def test_emb_dead_rows_counts_planted_pathologies(spark, tmp_path):
    from floatchat_datapipeline_spark.queries import q_emb_dead_rows

    d = str(tmp_path)
    good = np.float32([0.5] * 64)
    _write(
        os.path.join(d, "embeddings.parquet"),
        pd.DataFrame(
            {
                "vec_id": np.int64(range(6)),
                "embedding": [
                    good,
                    None,  # null
                    np.float32([0.5] * 32),  # wrong dim
                    np.float32([float("nan")] + [0.5] * 63),  # NaN
                    np.float32([float("inf")] + [0.5] * 63),  # Inf
                    np.float32([0.0] * 64),  # zero norm
                ],
                "label": np.int32([0] * 6),
            }
        ),
    )
    r = q_emb_dead_rows(spark, d).collect()[0]
    assert (r.n_vecs, r.n_null, r.n_wrong_dim) == (6, 1, 1)
    assert (r.n_nonfinite, r.n_zero_norm) == (2, 1)
    assert r.dead_fraction == pytest.approx(5 / 6)


# ---------------------------------------------------------------------------
# A65 — bootstrap CI against an exact Python replay
# ---------------------------------------------------------------------------


def test_events_bootstrap_ci_matches_replay(spark, sf_dir):
    from floatchat_datapipeline_spark.queries import q_events_bootstrap_ci

    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    out = {r.event_type: r for r in q_events_bootstrap_ci(spark, sf_dir).collect()}
    for etype, g in ev.groupby("event_type"):
        per_user = g.groupby("user_id").agg(
            n_u=("cents", "size"), s_u=("cents", "sum")
        )
        means = []
        for b in range(20):
            ws = wn = 0
            for uid, row in per_user.iterrows():
                m4 = _md5_long(f"bs|{uid}|{b}") % 4
                w = {0: 0, 3: 2}.get(m4, 1)
                ws += w * row.s_u
                wn += w * row.n_u
            if wn:
                means.append(ws / wn)
        means.sort()
        r = out[etype]
        assert r.n_resamples == len(means)
        assert r.mean_cents == pytest.approx(
            per_user.s_u.sum() / per_user.n_u.sum()
        )
        if len(means) >= 2:
            assert r.ci_low_cents == means[1]
            assert r.ci_high_cents == means[-2]


# ---------------------------------------------------------------------------
# A66 — entropy rate: deterministic chain -> 0, replay at sf0.001
# ---------------------------------------------------------------------------


def _events_frame(d: str, types: list[str]) -> None:
    n = len(types)
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(range(n), unit="h")
    _write(
        os.path.join(d, "events.parquet"),
        pd.DataFrame(
            {
                "event_id": np.int64(range(n)),
                "ts": ts,
                "user_id": np.int64([1] * n),
                "event_type": types,
                "value": [1.0] * n,
                "props": ["{}"] * n,
            }
        ),
    )


def test_entropy_rate_zero_for_deterministic_chain(spark, tmp_path):
    from floatchat_datapipeline_spark.queries import q_events_entropy_rate

    d = str(tmp_path)
    _events_frame(d, ["a", "b"] * 20)  # a->b->a->b: next is determined
    r = q_events_entropy_rate(spark, d).collect()[0]
    assert r.n_states == 2
    assert r.entropy_rate_nats == 0.0
    assert r.normalized_entropy == 0.0


def test_entropy_rate_single_state_nulls_normalized(spark, tmp_path):
    from floatchat_datapipeline_spark.queries import q_events_entropy_rate

    d = str(tmp_path)
    _events_frame(d, ["a"] * 10)  # one state: ln(k) = 0
    r = q_events_entropy_rate(spark, d).collect()[0]
    assert r.n_states == 1
    assert r.entropy_rate_nats == 0.0
    assert r.normalized_entropy is None


def test_entropy_rate_matches_replay(spark, sf_dir):
    from floatchat_datapipeline_spark.queries import q_events_entropy_rate

    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    prev = ev.groupby("user_id")["event_type"].shift()
    steps = pd.DataFrame(
        {"f": prev, "t": ev["event_type"]}
    ).dropna()
    cells = steps.groupby(["f", "t"]).size()
    rowt = steps.groupby("f").size()
    lmic = lambda x: round(math.log(x) * 1_000_000)
    h_micro = sum(
        n * (lmic(rowt[f]) - lmic(n)) for (f, t), n in cells.items()
    )
    n_tr = int(cells.sum())
    r = q_events_entropy_rate(spark, sf_dir).collect()[0]
    assert r.n_transitions == n_tr
    assert r.entropy_rate_nats == h_micro / (n_tr * 1e6)
    k = steps["t"].nunique()
    assert r.normalized_entropy == h_micro / (n_tr * lmic(k))


# ---------------------------------------------------------------------------
# A67 — Brier decomposition replay
# ---------------------------------------------------------------------------


def test_brier_decomposition_matches_replay(spark, sf_dir):
    from floatchat_datapipeline_spark.queries import (
        q_doc_brier_decomposition,
    )

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    h = docs["doc_id"].map(lambda i: _md5_long(f"cal|{i}") % 400)
    raw = (docs["n_chars"] * 2 + h - 200) * 1000
    p = (raw // 1200).clip(0, 1000).astype("int64")
    toks = docs["text"].map(lambda t: t.count(" ") + 1)
    pos = (toks >= 55).astype("int64")
    n = len(docs)
    o = int(pos.sum())
    brier = float(((p - 1000 * pos) ** 2).sum()) / (n * 1e6)
    df = pd.DataFrame({"bin": (p // 100).clip(upper=9), "p": p, "pos": pos})
    g = df.groupby("bin").agg(nk=("p", "size"), ok=("pos", "sum"), sk=("p", "sum"))
    rel = sum(
        round(float((r.sk - 1000 * r.ok) ** 2) * 1000 / r.nk)
        for r in g.itertuples()
    ) / (n * 1e9)
    res = sum(
        round(float((r.ok * n - o * r.nk) ** 2) / r.nk)
        for r in g.itertuples()
    ) / (n**3)
    unc = o * (n - o) / (n * n)
    r = q_doc_brier_decomposition(spark, sf_dir).collect()[0]
    assert (r.n_docs, r.n_pos) == (n, o)
    assert r.brier == round(brier, 9)
    assert r.reliability == round(rel, 9)
    assert r.resolution == round(res, 9)
    assert r.uncertainty == round(unc, 9)
    # Murphy inequality sanity: calibration error and discrimination
    # are both bounded by the Brier scale
    assert 0 <= r.resolution <= r.uncertainty + 1e-9


# ---------------------------------------------------------------------------
# TS35 — SPRT planted crossings
# ---------------------------------------------------------------------------


def test_sprt_crosses_up_on_all_positive(spark, tmp_path):
    from floatchat_datapipeline_spark.queries import (
        _SPRT_BOUND,
        _SPRT_STEP_POS,
        q_events_sprt,
    )

    d = str(tmp_path)
    n = 30
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(range(n), unit="m")
    _write(
        os.path.join(d, "events.parquet"),
        pd.DataFrame(
            {
                "event_id": np.int64(range(n)),
                "ts": ts,
                "user_id": np.int64([1] * n),
                "event_type": ["click"] * n,
                "value": [100.0] * n,  # every outcome positive
                "props": ["{}"] * n,
            }
        ),
    )
    r = q_events_sprt(spark, d).collect()[0]
    expect = math.ceil(_SPRT_BOUND / _SPRT_STEP_POS)
    assert r.decision == "accept_h1"
    assert r.decision_step == expect
    assert r.llr_final_nanos == n * _SPRT_STEP_POS


def test_sprt_crosses_down_on_all_negative(spark, tmp_path):
    from floatchat_datapipeline_spark.queries import (
        _SPRT_BOUND,
        _SPRT_STEP_NEG,
        q_events_sprt,
    )

    d = str(tmp_path)
    n = 80
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(range(n), unit="m")
    _write(
        os.path.join(d, "events.parquet"),
        pd.DataFrame(
            {
                "event_id": np.int64(range(n)),
                "ts": ts,
                "user_id": np.int64([1] * n),
                "event_type": ["click"] * n,
                "value": [1.0] * n,  # every outcome negative
                "props": ["{}"] * n,
            }
        ),
    )
    r = q_events_sprt(spark, d).collect()[0]
    expect = math.ceil(_SPRT_BOUND / -_SPRT_STEP_NEG)
    assert r.decision == "accept_h0"
    assert r.decision_step == expect


def test_sprt_continue_inside_boundaries(spark, tmp_path):
    from floatchat_datapipeline_spark.queries import q_events_sprt

    d = str(tmp_path)
    # alternate outcomes: the walk oscillates near 0 and never crosses
    n = 20
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(range(n), unit="m")
    _write(
        os.path.join(d, "events.parquet"),
        pd.DataFrame(
            {
                "event_id": np.int64(range(n)),
                "ts": ts,
                "user_id": np.int64([1] * n),
                "event_type": ["click"] * n,
                "value": [100.0, 1.0] * (n // 2),
                "props": ["{}"] * n,
            }
        ),
    )
    r = q_events_sprt(spark, d).collect()[0]
    assert r.decision == "continue"
    assert r.decision_step is None


# ---------------------------------------------------------------------------
# L35 — RAKE replay; A68 — Hill on a planted Pareto; S21 — stream twin
# ---------------------------------------------------------------------------


def test_rake_keywords_matches_replay(spark, sf_dir):
    from floatchat_datapipeline_spark.queries import (
        _RAKE_CHUNK,
        _RAKE_STOPWORDS,
        _RAKE_TOPK,
        q_doc_rake_keywords,
    )

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    phrases = []  # (phrase_tuple)
    for _, row in docs.iterrows():
        run: list[str] = []
        for tok in row["text"].split(" "):
            if tok == "" or tok in _RAKE_STOPWORDS:
                if run:
                    for i in range(0, len(run), _RAKE_CHUNK):
                        phrases.append(tuple(run[i : i + _RAKE_CHUNK]))
                    run = []
            else:
                run.append(tok)
        if run:
            for i in range(0, len(run), _RAKE_CHUNK):
                phrases.append(tuple(run[i : i + _RAKE_CHUNK]))
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    for ph in phrases:
        for w in ph:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(ph)
    nanos = {w: round(deg[w] * 1e9 / freq[w]) for w in freq}
    scored: dict[str, tuple[int, int]] = {}
    for ph in phrases:
        txt = " ".join(ph)
        s = sum(nanos[w] for w in ph)
        n, _ = scored.get(txt, (0, s))
        scored[txt] = (n + 1, s)
    want = sorted(
        ((s / 1e9, p, n) for p, (n, s) in scored.items()),
        key=lambda t: (-t[0], t[1]),
    )[: _RAKE_TOPK]
    got = q_doc_rake_keywords(spark, sf_dir).collect()
    assert [
        (r.rake_score, r.phrase, r.n_occurrences) for r in got
    ] == want


def test_hill_recovers_planted_pareto(spark, tmp_path):
    from floatchat_datapipeline_spark.queries import q_orders_hill_tail

    d = str(tmp_path)
    # deterministic Pareto(alpha=2) via inverse-CDF on an evenly spaced
    # grid: x_i = (1 - u_i)^(-1/2), u_i = i/(n+1)
    n = 5000
    alpha = 2.0
    xs = [(1 - (i + 1) / (n + 1)) ** (-1 / alpha) * 100 for i in range(n)]
    _write(
        os.path.join(d, "orders.parquet"),
        pd.DataFrame(
            {
                "o_orderkey": np.int64(range(n)),
                "o_custkey": np.int64([1] * n),
                "o_orderstatus": ["F"] * n,
                "o_totalprice": xs,
                "o_orderdate": [pd.Timestamp("2024-03-01")] * n,
                "o_orderpriority": ["1-URGENT"] * n,
            }
        ),
    )
    r = q_orders_hill_tail(spark, d).collect()[0]
    assert r.k == 100
    # Hill on the top-100 of a clean Pareto(2) recovers alpha within
    # the estimator's sampling error at this k
    assert r.tail_alpha == pytest.approx(2.0, rel=0.35)
    # and a bounded-uniform sample reports a much larger alpha
    _write(
        os.path.join(d, "orders.parquet"),
        pd.DataFrame(
            {
                "o_orderkey": np.int64(range(n)),
                "o_custkey": np.int64([1] * n),
                "o_orderstatus": ["F"] * n,
                "o_totalprice": [100.0 + (i % 50) for i in range(n)],
                "o_orderdate": [pd.Timestamp("2024-03-01")] * n,
                "o_orderpriority": ["1-URGENT"] * n,
            }
        ),
    )
    r2 = q_orders_hill_tail(spark, d).collect()[0]
    assert r2.tail_alpha > 20


def test_stream_sprt_equals_batch(spark, sf_dir):
    from floatchat_datapipeline_spark.queries import (
        q_events_sprt,
        q_stream_sprt,
    )

    batch = sorted(
        tuple(r) for r in q_events_sprt(spark, sf_dir).collect()
    )
    stream = sorted(
        tuple(r) for r in q_stream_sprt(spark, sf_dir).collect()
    )
    assert stream == batch
