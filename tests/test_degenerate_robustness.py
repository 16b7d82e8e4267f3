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
