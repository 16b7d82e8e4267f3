"""CI gate for the degenerate-input robustness class (ROBUSTNESS.md).

Round 11's sweep found 27 registry queries aborting under ANSI mode on
pathological-but-legal inputs (zero-norm embeddings, constant series,
empty comparison groups, single rows); round 12 drained the queue. This
test pins the CLASS: every query that ever aborted must keep running —
not necessarily return rows — on both degenerate fixture variants, plus
a canary set of heavy seam consumers (cosine/k-means/ranked stats) that
share the guarded code paths.

The full-registry version lives in `tools/degenerate_sweep.py` (run it
when adding queries); this gate keeps the known-risk set cheap enough
for every pytest run. A query added to the registry with an unguarded
divisor in the same families will usually reuse these seams and fail
here; the per-round tool run catches the rest.
"""

from __future__ import annotations

import importlib
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

entry_mod = importlib.import_module("__spark_entry__")
sweep = importlib.import_module("degenerate_sweep")

# Every query the round-11 sweep caught aborting (ROBUSTNESS.md), plus
# seam-consumer canaries that exercise the guarded paths from other
# angles (cosine top-k, LSH, hybrid fusion, filtered ANN).
RISK_QUERIES = sorted(
    [
        # vector geometry (zero-norm / degenerate k-means)
        "ann_ivf_topk",
        "ann_nprobe_recall_curve",
        "ann_pq_topk",
        "emb_centroid_audit",
        "emb_centroid_classifier",
        "emb_cosine_histogram",
        "emb_mmr_rerank",
        "emb_near_dup",
        "emb_semdedup",
        # degenerate statistics (empty groups / zero variance / ties)
        "doc_quality_funnel",
        "events_blocking_audit",
        "events_cramers_v",
        "events_cuped",
        "events_hurst",
        "events_js_divergence",
        "events_kruskal_wallis",
        "events_ks_test",
        "events_mannwhitney",
        "events_rank_biserial",
        "events_sax_motifs",
        "events_twap",
        "events_value_trend",
        "minhash_recall_audit",
        "spend_rank_correlation",
        "trade_reciprocity",
        # round-11 fixes (empty document / idle stream gate lives in
        # test_pyds.py; the doc one re-runs here)
        "doc_bpe_tokens",
        # seam-consumer canaries
        "cosine_topk",
        "emb_filtered_topk",
        "emb_knn_label",
        "ann_lsh_topk",
        "doc_hybrid_rrf",
        "semantic_search",
        "emb_audit",
        "events_anova_f",
        # round-12 guard-bearing additions (born with guards; keep them)
        "table_key_audit",
        "fk_orphan_audit",
        "emb_dead_rows",
        "events_bootstrap_ci",
        "events_entropy_rate",
        "doc_brier_decomposition",
        "events_sprt",
        "stream_sprt",
        "doc_rake_keywords",
        "orders_hill_tail",
    ]
)

_BASE = "/tmp/degenerate_gate"


@pytest.fixture(scope="session")
def degenerate_dirs():
    dirs = {}
    for name, gen in (("tiny", sweep.gen_tiny), ("constant", sweep.gen_constant)):
        d = os.path.join(_BASE, name)
        gen(d)
        dirs[name] = d
    return dirs


@pytest.fixture(scope="session")
def risk_queries():
    qs = entry_mod.queries()
    missing = [n for n in RISK_QUERIES if n not in qs]
    assert not missing, f"risk-list queries missing from registry: {missing}"
    return qs


@pytest.mark.parametrize("variant", ["tiny", "constant"])
@pytest.mark.parametrize("name", RISK_QUERIES)
def test_degenerate_input_does_not_abort(
    spark, degenerate_dirs, risk_queries, variant, name
):
    # 0 rows is a legitimate answer on these inputs; an engine abort
    # (ANSI DIVIDE_BY_ZERO / INVALID_ARRAY_INDEX / ...) is the bug.
    rows = risk_queries[name](spark, degenerate_dirs[variant]).collect()
    assert rows is not None


# ---------------------------------------------------------------------------
# Structural divisor safety (round 13, VERDICT r12 item 3 / ADVICE):
# the stats-family degenerate guards used to be SEQUENTIAL CaseWhen
# branches whose ORDER was load-bearing — the empty-variant branch had
# to run first or a later branch's own condition divided by zero under
# ANSI mode, and nothing but convention prevented a refactor from
# reordering them. Round 13 removed the branches entirely: every
# divisor that can run degenerate now sits under F.try_divide, so the
# NULL falls out of the arithmetic itself and there IS no order to get
# wrong. These tests pin both halves of that invariant:
#   1. each degenerate case alone (empty variant / n too small /
#      zero variance) yields a NULL statistic, not an abort — fed
#      straight into the factored report helpers, which is exactly the
#      entry point a reordered/rewritten guard would have to break;
#   2. the helpers' SOURCE no longer contains a sequential guard chain
#      (reintroducing one fails here, forcing the structural form).
# ---------------------------------------------------------------------------


def _collect_stat(spark, rows, cols, report, stat_col):
    df = report(spark.createDataFrame(rows, cols))
    out = df.collect()
    assert len(out) == len(rows)
    return {r["event_type"]: r[stat_col] for r in out}


def test_anova_guard_is_structural(spark):
    from floatchat_datapipeline_spark.queries import _anova_f_report

    stats = _collect_stat(
        spark,
        [
            # one EMPTY variant (n1 = 0): between-term divisor
            ("empty", 4, 0, 4, 40, 0, 44, 500),
            # one observation per variant: n - 3 = 0
            ("n3", 1, 1, 1, 10, 11, 12, 365),
            # zero within-group variance (all values equal per variant)
            ("zerovar", 2, 2, 2, 20, 20, 20, 600),
            # healthy row must still produce a number
            ("ok", 2, 2, 2, 10, 30, 50, 1000),
        ],
        ["event_type", "n0", "n1", "n2", "s0", "s1", "s2", "q"],
        _anova_f_report,
        "f_stat",
    )
    assert stats["empty"] is None
    assert stats["n3"] is None
    assert stats["zerovar"] is None
    assert stats["ok"] is not None


def test_kruskal_wallis_guard_is_structural(spark):
    from floatchat_datapipeline_spark.queries import _kruskal_wallis_report

    # (event_type, v, t0, t1, t2) tally rows; the helper windows then
    # aggregates per type.
    rows = [
        # EMPTY variant 2 across the whole type
        ("empty", 10, 2, 1, 0),
        ("empty", 20, 1, 2, 0),
        # all values tied -> tie3 = n^3 - n -> corr = 0
        ("tied", 10, 2, 2, 2),
        # healthy
        ("ok", 10, 2, 0, 1),
        ("ok", 20, 0, 2, 1),
    ]
    df = spark.createDataFrame(rows, ["event_type", "v", "t0", "t1", "t2"])
    out = {
        r["event_type"]: r["h"]
        for r in __import__(
            "floatchat_datapipeline_spark.queries", fromlist=["x"]
        )._kruskal_wallis_report(df).collect()
    }
    assert out["empty"] is None
    assert out["tied"] is None
    assert out["ok"] is not None


def test_stats_guard_sources_have_no_sequential_branches():
    """Reintroducing an order-dependent CaseWhen guard chain in the
    hardened family must fail CI, not wait for a degenerate abort."""
    import inspect

    from floatchat_datapipeline_spark import queries as q

    for fn in (
        q._anova_f_report,
        q._kruskal_wallis_report,
        q._cramers_v_report,
        q.q_events_mannwhitney,
        q.q_events_rank_biserial,
    ):
        src = inspect.getsource(fn)
        assert "try_divide" in src, f"{fn.__name__}: structural guard gone"
        assert "any_empty" not in src, (
            f"{fn.__name__}: sequential branch-order guard reintroduced"
        )
