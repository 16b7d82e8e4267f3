"""Round-8 operators: market-basket lift, Pareto skyline, RFM/ntile,
Benford, TF-IDF, edit-distance blocking, link prediction, Holt trend,
Gini via ranged rank, unigram-drift TVD — hand-built semantic cases +
the plan shapes behind their scale claims."""

from __future__ import annotations

from pyspark.sql import functions as F

from floatchat_datapipeline_spark.plans.checks import plan_string
from floatchat_datapipeline_spark.queries import registry


# --------------------------------------------------------------- trunc div
def test_trunc_div_matches_both_engines():
    """Python // FLOORS; Spark `div` and DuckDB `//` truncate toward
    zero. _trunc_div must match the engines, including on negatives —
    this is the Holt recurrence's parity foundation."""
    import duckdb

    from floatchat_datapipeline_spark.operators.timeseries import (
        _trunc_div,
    )

    cases = [(a, b) for a in range(-25, 26) for b in (1, 2, 3, 4, 7)]
    want = duckdb.sql(
        "SELECT a // b FROM (SELECT unnest(?) a, unnest(?) b)",
        params=[[c[0] for c in cases], [c[1] for c in cases]],
    ).fetchall()
    for (a, b), (w,) in zip(cases, want):
        assert _trunc_div(a, b) == w, (a, b)
    assert _trunc_div(-7, 2) == -3  # Python floor would say -4


# --------------------------------------------------------------- Holt trend
def test_holt_linear_hand_series(spark):
    """Level/trend replay on a 3-point series, alpha=beta=1/4:
    x = [400, 800, 400] cents-worth of hourly value.
      t1: L=400, B=0
      t2: L=(800+3*400)//4=500, B=((500-400)+0)//4=25
      t3: L=(400+3*525)//4=493, B=((493-500)+75)//4=17
    """
    from datetime import datetime

    from floatchat_datapipeline_spark.operators.timeseries import (
        holt_linear,
    )

    rows = [
        ("a", datetime(2024, 1, 1, 0), 4.0),
        ("a", datetime(2024, 1, 1, 1), 8.0),
        ("a", datetime(2024, 1, 1, 2), 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type: string, ts: timestamp, value: double"
    )
    got = {
        r["hx"]: (r["level"], r["trend"], r["forecast_next"])
        for r in holt_linear(df).collect()
    }
    hx0 = min(got)
    assert got[hx0] == (400, 0, 400)
    assert got[hx0 + 1] == (500, 25, 525)
    assert got[hx0 + 2] == (493, 17, 510)


# ------------------------------------------------------------- skyline plan
def test_skyline_has_no_join(spark, sf_dir):
    """A34's claim: the O(n^2) dominance test is rewritten as two
    running-max windows over ONE hash exchange on p_type — no
    self-join anywhere in the plan."""
    q = registry()["part_skyline"].spark
    plan = plan_string(q(spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Arguments: hashpartitioning") == 1, plan


# ---------------------------------------------------------------- gini plan
def test_ranged_pid_frame_is_range_partitioned(spark, sf_dir):
    """The stage every ranged_cumsum consumer (gini, rfm, KS,
    cumulative users, Spearman) rides: repartitionByRange on the total
    order. Pinned on the pre-checkpoint frame because the checkpoint
    that makes ranged_cumsum deterministic replaces downstream explain
    output with an ExistingRDD scan."""
    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.plans.scale import _ranged_pid_frame

    cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = plan_string(_ranged_pid_frame(cust, ["n", "o_custkey"], 32))
    assert "rangepartitioning" in plan, plan


def test_gini_rank_rides_the_checkpoint_seam(spark, sf_dir):
    """A37's claim: no partition-less window anywhere — the rank
    arrives through the materialized ranged frame (ExistingRDD scan),
    and the only windows in the composed plan partition by _pid or the
    32-row offsets domain."""
    q = registry()["gini_spend"].spark
    plan = plan_string(q(spark, sf_dir))
    assert "ExistingRDD" in plan, plan
    assert "ntile" not in plan.lower(), plan


# ----------------------------------------------------------------- TF-IDF
def test_tfidf_hand_corpus(spark, tmp_path):
    """3 docs; 'cat' in 1 of 3 docs twice -> score (2*3)/1 = 6;
    'the' everywhere -> (1*3)/3 = 1."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["the cat cat", "the dog", "the fish"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [11, 7, 8],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    q = registry()["doc_tfidf_topk"].spark
    out = {
        (r["doc_id"], r["term"]): (r["rnk"], r["score"])
        for r in q(spark, str(tmp_path)).collect()
    }
    assert out[(1, "cat")] == (1, 6.0)
    assert out[(1, "the")] == (2, 1.0)
    assert out[(2, "dog")] == (1, 3.0)
    assert (2, "the") in out and out[(2, "the")][0] == 2


# ------------------------------------------------------- edit-dist blocking
def test_editdist_cap_binds_on_giant_block(spark, tmp_path):
    """70 near-identical docs land in one (lang, band) block; the
    posting-list cap must keep only the first 64 by doc_id, so pairs =
    C(64,2) = 2016 and no doc_id above the 64th appears."""
    import pandas as pd

    n = 70
    docs = pd.DataFrame(
        {
            "doc_id": range(1, n + 1),
            "text": ["alpha beta gamma delta epsilon zeta"] * n,
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": [35] * n,
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    q = registry()["doc_editdist_pairs"].spark
    rows = q(spark, str(tmp_path)).collect()
    assert len(rows) == 64 * 63 // 2
    assert max(max(r["id_a"], r["id_b"]) for r in rows) == 64
    assert all(r["dist"] == 0 for r in rows)


# ---------------------------------------------------------- link prediction
def test_link_prediction_hand_graph(spark):
    """Path graph 1-2-3: the only candidate non-edge is (1,3) through
    middle node 2; deg(1)=deg(3)=1, cn=1 -> jaccard 1/(1+1-1) = 1.0."""
    from floatchat_datapipeline_spark.operators.graph import (
        link_prediction_scores,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src: bigint, dst: bigint"
    )
    rows = link_prediction_scores(edges, top_k=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["user_a"], r["user_b"], r["common_neighbors"]) == (1, 3, 1)
    assert r["jaccard"] == 1.0


def test_link_prediction_excludes_existing_edges(spark):
    """Triangle 1-2-3 (complete): every 2-path closes an existing edge,
    so there are NO candidates."""
    from floatchat_datapipeline_spark.operators.graph import (
        link_prediction_scores,
    )

    pairs = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a != b]
    edges = spark.createDataFrame(pairs, "src: bigint, dst: bigint")
    assert link_prediction_scores(edges, top_k=10).count() == 0


# -------------------------------------------------------------- mkt basket
def test_market_basket_hand_case(spark, tmp_path):
    """Brands A,B co-bought in 3 of 4 orders; n_A=4, n_B=3 ->
    support 3/4, lift (3*4)/(4*3) = 1.0."""
    import pandas as pd

    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 2, 3, 3, 4],
            "l_partkey": [10, 20, 10, 20, 10, 20, 10],
        }
    )
    part = pd.DataFrame(
        {"p_partkey": [10, 20], "p_brand": ["A", "B"]}
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    part.to_parquet(tmp_path / "part.parquet")
    q = registry()["market_basket_lift"].spark
    rows = q(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["brand_a"], r["brand_b"], r["n_pair"]) == ("A", "B", 3)
    assert r["support"] == 0.75
    assert r["lift"] == 1.0


# ------------------------------------------------------------ unigram drift
def test_unigram_drift_hand_case(spark, tmp_path):
    """Source p: 'a a b' (2/3, 1/3); source q: 'a b b b' (1/4, 3/4).
    TVD = (|2*4-1*3| + |1*4-3*3|) / (2*3*4) = (5+5)/24 = 5/12."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a a b", "a b b b"],
            "lang": ["en", "en"],
            "source": ["p", "q"],
            "n_chars": [5, 7],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    q = registry()["source_unigram_drift"].spark
    rows = q(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_a"], r["source_b"]) == ("p", "q")
    assert r["tvd"] == 10 / 24


# ------------------------------------------------------------------ Benford
def test_benford_digit_extraction_is_integer_path(spark, sf_dir):
    """Digits must come from the BIGINT cents string — shares sum to 1
    and every digit is 1..9 (a float log10 path would admit 0 on
    boundary values)."""
    q = registry()["benford_digits"].spark
    rows = q(spark, sf_dir).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-12


# ------------------------------------------------------------ capped session
def test_capped_sessions_duration_cap_binds(spark):
    """Events every 10 min for 100 min: gap never exceeds 30 min, but
    the 30-min duration cap forces splits the windowed sessionizer
    cannot express — sessions restart at t=0, t=40min (first event
    past 0+30), t=80min."""
    from datetime import datetime, timedelta

    from floatchat_datapipeline_spark.operators.timeseries import (
        capped_sessions,
    )

    t0 = datetime(2024, 1, 1)
    rows = [
        (7, t0 + timedelta(minutes=10 * i), i) for i in range(11)
    ]
    df = spark.createDataFrame(
        rows, "user_id: bigint, ts: timestamp, event_id: bigint"
    )
    got = sorted(
        (r["session_seq"], r["n_events"])
        for r in capped_sessions(df).collect()
    )
    # minutes 0,10,20,30 | 40,...,70 | 80,90,100
    assert got == [(1, 4), (2, 4), (3, 3)]


def test_capped_sessions_gap_still_splits(spark):
    from datetime import datetime, timedelta

    from floatchat_datapipeline_spark.operators.timeseries import (
        capped_sessions,
    )

    t0 = datetime(2024, 1, 1)
    rows = [(1, t0, 1), (1, t0 + timedelta(seconds=1801), 2)]
    df = spark.createDataFrame(
        rows, "user_id: bigint, ts: timestamp, event_id: bigint"
    )
    assert capped_sessions(df).count() == 2


# ----------------------------------------------------------------- RFM ntile
def test_rfm_ntile_closed_form():
    """The closed-form bucket rule used by rfm_segments must replay
    NTILE(4) exactly for every n (first n mod 4 buckets take one extra
    row) — checked against DuckDB's ntile over a sweep of frame
    sizes."""
    import duckdb

    def closed_form(rank: int, n: int, k: int = 4) -> int:
        r = n % k
        big = n // k + 1
        small = max(n // k, 1)
        cutoff = r * big
        if rank <= cutoff:
            return (rank - 1) // big + 1
        return r + (rank - cutoff - 1) // small + 1

    for n in list(range(1, 41)) + [1001, 1002, 1003, 1004]:
        want = duckdb.sql(
            f"SELECT ntile(4) OVER (ORDER BY i) FROM range({n}) t(i)"
        ).fetchall()
        for rank, (w,) in enumerate(want, start=1):
            assert closed_form(rank, n) == w, (rank, n)


def test_rfm_plan_has_no_global_ntile(spark, sf_dir):
    """A35's scale claim: quartiles come from ranged_cumsum ranks +
    closed-form arithmetic — the plan must carry range partitioning
    and NO ntile window (which would be a single-partition sort over
    every customer)."""
    q = registry()["rfm_segments"].spark
    plan = plan_string(q(spark, sf_dir))
    assert "ExistingRDD" in plan, plan
    assert "ntile" not in plan.lower(), plan


# ------------------------------------------------------------------- k-core
def test_k_core_peels_tendrils_keeps_clique(spark):
    """K4 clique (everyone degree 3) + a pendant chain hanging off it:
    the 3-core keeps exactly the clique — the chain peels away over
    successive rounds (node 5 starts with degree 1, node 6 gains
    nothing from losing 5, ...), and the certificate confirms the
    fixed point."""
    from floatchat_datapipeline_spark.operators.graph import k_core

    clique = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a != b]
    chain = [(4, 5), (5, 4), (5, 6), (6, 5), (6, 7), (7, 6)]
    edges = spark.createDataFrame(
        clique + chain, "src: bigint, dst: bigint"
    )
    rows = {r["user_id"]: r for r in k_core(edges, k=3, rounds=8).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert all(r["core_degree"] == 3 for r in rows.values())
    assert all(r["converged"] for r in rows.values())


def test_k_core_empty_when_overdemanding(spark):
    from floatchat_datapipeline_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 1)], "src: bigint, dst: bigint"
    )
    assert k_core(edges, k=2, rounds=4).count() == 0


# ------------------------------------------------------------ plan pins
def test_capped_sessions_single_bucket_shuffle(spark, sf_dir):
    """TS15: one hash exchange into the 64-way bucket grouping, one
    Arrow seam (FlatMapGroupsInPandas) — per-key Arrow batches would
    show as the same plan but die at high key cardinality, so the
    bucket column must be the grouping key."""
    q = registry()["events_capped_sessions"].spark
    plan = plan_string(q(spark, sf_dir))
    assert plan.count("Arguments: hashpartitioning") == 1, plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "_b" in plan, plan


def test_ks_cdf_is_range_partitioned(spark, sf_dir):
    """A39: both cumulative-count passes ride the materialized ranged
    frames — a partition-less `sum() OVER (ORDER BY cents)` would
    single-thread the pooled distinct-value domain."""
    q = registry()["events_ks_test"].spark
    plan = plan_string(q(spark, sf_dir))
    assert "ExistingRDD" in plan, plan
    assert "unboundedpreceding" not in plan.lower() or "_pid" in plan, plan


def test_markov_reuses_user_exchange(spark, sf_dir):
    """TS16: the lag window and nothing else touches the raw log — one
    hash exchange on user_id, one on the 25-cell census, plus the tiny
    from_type row-total window. No join nodes at all."""
    q = registry()["events_markov_transitions"].spark
    plan = plan_string(q(spark, sf_dir))
    assert "Join" not in plan, plan
