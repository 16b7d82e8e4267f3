"""SURVEY.md §2 completeness gate.

Every operator ID in the §2 inventory must be claimed either by a
queries() entry's survey_ops tags (oracle-checked) or by a named module
with its own tests (MODULE_COVERED). If an ID is neither, this test
fails — coverage regressions are build breaks, not judgment calls.
"""

from __future__ import annotations

from floatchat_datapipeline_spark.queries import registry

# §2 IDs implemented (and tested) outside the driver-query surface.
MODULE_COVERED: dict[str, str] = {
    # sources
    "S1": "sources/erddap.py (URL pushdown builder; also under the "
    "driver value gate via `erddap_url_build`)",
    # S5/S6/K9 are CACHE contracts (hit-vs-miss side effects on a local
    # staging dir, checkpoint replay), not row transforms: the observable
    # is WHICH IO happened, which no row-level DuckDB oracle can express.
    # Gate = pytest round-trips asserting hit/miss/corrupt-re-fetch and
    # restart-resume behavior (tests/test_erddap_staging.py,
    # tests/test_streaming.py); the ROWS the cache yields are already
    # value-gated downstream by erddap_staged_scan / erddap_stream_scan.
    "S5": "sources/staging.py — cache contract (observable = which IO "
    "happened on hit/miss/corrupt, not rows; no row-level oracle form — "
    "the rows it yields are value-gated by erddap_staged_scan); "
    "tests/test_erddap_staging.py",
    "S6": "sources/staging.py — bulk staging, same cache contract as S5 "
    "(same no-row-level-oracle rationale)",
    # sinks — set-at-a-time MERGE semantics, tests/test_sinks.py
    "K2": "sinks/upsert.append_new (DO NOTHING)",
    "K3": "sinks/upsert._swap_write (bulk parquet write)",
    "K4": "embeddings written as ArrayType parquet (catalog embeddings table)",
    "K5": "sinks/upsert.append_new over the embeddings table",
    "K6": "sinks/upsert.upsert (update = delete + re-add, one MERGE)",
    "K7": "sinks/upsert.delete_keys",
    "K9": "sources/staging.stage cache + streaming checkpoint — replay/"
    "resume contract (observable = offsets surviving restart, not rows; "
    "no row-level oracle form — the streamed rows are value-gated by "
    "erddap_stream_scan); tests/test_streaming.py",
    # filters at the source seam
    "F8": "sources/erddap.ErddapRequest (server-side predicates in URL; "
    "also under the driver value gate via `erddap_url_build`)",
    # text templates with golden tests
    "C4": "functions/text.sync_document_v4 (tests/test_text_templates.py)",
    # custom Python DataSource (Spark 4 API): one partition per staged file
    "S12": "sources/pyds.ErddapStagedDataSource (tests/test_pyds.py)",
    # streaming Python DataSource: per-arrival micro-batches, offset replay
    "S13": "sources/pyds.ErddapStreamDataSource (tests/test_pyds.py)",
    # Python DataSource write side: commit-protocol report sink
    "K10": "sources/pyds.ErddapReportDataSource (tests/test_pyds.py)",
    # zero-cost in-flight pipeline metrics via df.observe
    "A15": "plans/metrics.observe_quality (tests/test_metrics.py)",
    # additive parquet schema evolution: mergeSchema bootstrap + pinned
    # steady-state reads (tests/test_schema_evolution.py)
    "S17": "sources/evolution.py (tests/test_schema_evolution.py)",
    # interchange formats (ORC/CSV/JSON micro-exact roundtrip) + dynamic
    # partition overwrite, tests/test_formats.py
    "S18": "sources/formats.py (tests/test_formats.py)",
}

SURVEY_IDS = [
    f"{prefix}{i}"
    for prefix, n in [
        ("S", 10), ("K", 9), ("P", 11), ("F", 11), ("R", 4), ("A", 8),
        ("J", 5), ("O", 6), ("D", 4), ("C", 10), ("V", 7),
    ]
    for i in range(1, n + 1)
] + [
    # §2.14 parity-plus: time-series joins, corpus prep, dup-group closure
    "TS1", "TS2", "TS3", "TS4", "TS5",
    "L1", "L2", "L3", "L4", "L5", "L6", "L7", "L8", "L9", "L10", "L11",
    "L12", "L13", "L14",
    "D5", "V8", "A9", "A10", "A11", "A12", "A13", "V9", "V10", "V11",
    "Z1",
    # hard relational shapes (TPC-H Q13/Q17/Q21/Q22/Q15/Q18/Q7 analogs)
    "J6", "J7", "J8", "J9", "O7", "A14", "J10",
    # stream-static enrichment join
    "S11",
    # disjunctive multi-attribute predicate join (Q19 analog)
    "F12",
    # windowed ranking buckets (ntile deciles; approx_percentile scale twin)
    "O8",
    # cogrouped applyInPandas custom operator (as-of join twin)
    "U1",
    # custom Python DataSource (erddap_staged format)
    "S12",
    # native VARIANT semi-structured path (parse_json + try_variant_get)
    "P12",
    # streaming Python DataSource (erddap_stream format)
    "S13",
    # skew-proof salted two-phase aggregation
    "Z2",
    # Python DataSource commit-protocol write side
    "K10",
    # Python UDTF lateral table function
    "U2",
    # observed in-flight pipeline metrics
    "A15",
    # remaining TPC-H shapes — with these all 22 canonical patterns exist:
    # Q2 correlated-min (J11), Q4 EXISTS (J12), Q8 market share (J13),
    # Q9 profit (A19), Q10 returned-revenue top-k (J14), Q11 scalar-subquery
    # HAVING (A16), Q12 conditional agg (A17), Q16 grouped distinct with
    # exclusion list (A18), Q20 nested semi-joins (J15)
    "J11", "J12", "J13", "J14", "J15", "A16", "A17", "A18", "A19",
    # winnowing fingerprint selection (MOSS; local-sampling guarantee)
    "L15",
    # winnow match-candidate pairs (capped inverted index)
    "L16",
    # BPE merge-candidate counting (tokenizer-training step 1)
    "L17",
    # inter-source corpus overlap via corpus-level MinHash
    "L18",
    # equi-width corpus length histogram
    "A21",
    # cross-table constraint audit (dbt-tests / Deequ role)
    "A22",
    # association-rule mining (session-basket support/lift)
    "A23",
    # telemetry debounce (same-value cooldown suppression)
    "D6",
    # strict per-key rate limiting (iterative; recursive-CTE oracle)
    "D7",
    # OHLC candlestick downsampling (argmin/argmax single-pass)
    "TS7",
    # EWMA control-chart anomaly detection (continuous-state recurrence)
    "TS8",
    # gap-fill linear interpolation (TimescaleDB interpolate() beside locf)
    "TS9",
    # session path mining (top event-type journeys)
    "TS6",
    # robust median/MAD outlier detection (modified z-score)
    "A20",
    # MMR diversified rerank (Carbonell & Goldstein 1998)
    "V12",
    # SCD2 history compaction (change log -> validity intervals)
    "K11",
    # transformWithStateInPandas typed-state operator (Spark 4 API)
    "S14",
    # streaming near-dup admission control (stream-static LSH join)
    "S15",
    # streaming EWMA control chart (one-double GroupState per key)
    "S16",
    # fixed-point PageRank over the co-activity graph (iterative joins)
    "G1",
    # interval max-overlap sweep (peak concurrency)
    "I1",
    # interval-union coverage (gaps-and-islands merge)
    "I2",
    # incremental view maintenance (additive partial-state merge)
    "K12",
    # bucketed-layout co-located join (zero-exchange SMJ)
    "Z3",
    # bloom-prefiltered semi-join (manual runtime-filter form)
    "J16",
    # additive parquet schema evolution (mergeSchema / pinned reads)
    "S17",
    # trailing-window sliding distinct count (bucket-contribution)
    "A24",
    # seasonal-baseline spike detection (hour-of-day, exact integers)
    "TS10",
    # OLS trend from exact integer sums (normal equations)
    "A25",
    # triangle census (degree-ordered node-iterator)
    "G2",
    # single-pass column profiler (Deequ/GE role; HLL twin at scale)
    "A26",
    # spatial grid-bucket join (all pairs within radius)
    "J17",
    # Pareto/ABC cumulative-share classification
    "A27",
    # exact weighted median (collapsed-domain window cumsum)
    "A28",
    # corpus-mixing largest-remainder budget apportionment
    "L19",
    # character-entropy gibberish filter
    "L20",
    # categorical distribution drift monitor
    "A29",
    # daily growth accounting (new vs returning, cumulative users)
    "A30",
    # grid-density hotspot detection (3x3 smoothing, integer gate)
    "J18",
    # A/B lift report (integer cross-multiplied gate)
    "A31",
    # Theil-Sen robust trend (median of pairwise slopes)
    "A32",
    # interchange formats + dynamic partition overwrite
    "S18",
    # exact-k deterministic stratified sample (bottom-k by salted hash)
    "L21",
    # BFS reach horizon (frontier expansion, set-algebra iterations)
    "G3",
    # conversion-latency percentiles (funnel gap R-7 quantiles)
    "TS11",
    # integer CUSUM changepoint detection (alarm-reset recurrence)
    "TS12",
    # prefix-filtered exact set-similarity join (PPJoin)
    "L22",
    # first/last-touch revenue attribution (as-of join + struct-min)
    "TS13",
    # market-basket lift (basket-bounded pair self-join)
    "A33",
    # Pareto skyline via running-max windows vs NOT EXISTS oracle
    "A34",
    # RFM quartile segmentation (totalized ntile)
    "A35",
    # Benford first-digit audit (integer digit path)
    "A36",
    # TF-IDF keyword extraction (exact-integer score)
    "L23",
    # edit-distance near-dup pairs (levenshtein, capped blocks)
    "D8",
    # graph link prediction (Jaccard common neighbors)
    "G4",
    # Holt level+trend fixed-point smoothing
    "TS14",
    # Gini spend concentration (ranged global rank)
    "A37",
    # inter-source unigram TVD drift (exact cross-products)
    "L24",
    # gap + max-duration sessionization (capped recurrence)
    "TS15",
    # product-adoption curve (cumulative first-seen users)
    "A38",
    # degree distribution + CCDF of the co-activity graph
    "G5",
    # streaming capped sessionization (GroupState recurrence)
    "S19",
    # first-order Markov transition matrix (lag census)
    "TS16",
    # exact two-sample Kolmogorov-Smirnov drift statistic
    "A39",
    # exact Spearman rank correlation (ranged ranks)
    "A40",
    # index of dispersion (burstiness of hourly counts)
    "A41",
    # k-core decomposition (module-covered; see MODULE_COVERED)
    "G6",
    # diversified top-k (per-source cap + global TakeOrdered)
    "O9",
    # sorted-neighborhood ER blocking (rank-offset neighbor joins)
    "D9",
    # time-weighted average (LOCF duration weighting)
    "TS17",
    # chi-square independence (sorted-array float fold)
    "A42",
    # corpus novelty curve (first-occurrence shingle attribution)
    "L26",
    # ratio-to-parent hierarchy rollup (region > nation shares)
    "A43",
    # out-of-order arrival audit (watermark sizing)
    "TS18",
    # binary-signature Hamming ANN (packed sign bits)
    "V13",
    # nearest-direction as-of join (two-pass arbitration)
    "TS19",
    # cohort LTV curve (revenue retention triangle)
    "A44",
    # autocorrelation function of hourly counts (exact-sum Pearson lags)
    "TS20",
    # Cohen's kappa inter-rater agreement (integer 2x2 contingency)
    "A45",
    # Fellegi-Sunter record-linkage scoring over blocked pairs
    "D10",
    # winsorized robust stats (integer-cents quantile clamp)
    "A46",
    # fill-in-the-middle (FIM) PSM training transformation
    "L25",
    # JL +-1 random-projection ANN (integer shortlist + exact rerank)
    "V14",
    # interval overlap join (activity spans x merged incident windows)
    "I3",
    # U-shaped positional multi-touch attribution (exact cent split)
    "TS21",
    # classifier reliability diagram (fixed-bin calibration curve)
    "A47",
    # M4 pixel-perfect downsampling (first/last/min/max per bucket)
    "TS22",
    # corpus shard/compaction planner (ranged-cumsum greedy packing)
    "Z4",
    # sample-ratio-mismatch guardrail (1-df chi-square, integer gate)
    "A48",
    # dedup audit rollup (cluster-size histogram + removable counts)
    "D11",
    # Zipf-law fit per language (integer log-space normal equations)
    "L27",
    # Kaplan-Meier survival curve (exact nano-nat log products)
    "A50",
    # LTTB greedy downsampling (integer triangle areas, recursive oracle)
    "TS23",
    # lang x source mutual information (integer micro-nat terms)
    "A51",
    # perceptual-hash banded near-dup over binary media columns
    "D12",
    # personalized PageRank (seed-teleport BIGINT fixed point)
    "G7",
    # top-1% whale revenue share (ranged descending rank)
    "A52",
    # SCD2 time-travel as-of snapshot read
    "K13",
    # dedup token-budget report (removable token mass per source)
    "L28",
    # uptime report (active seconds minus merged incident overlap)
    "I4",
    # Wilson 95% lower confidence bound (fixed pure-double tree)
    "A53",
    # degree assortativity of the trade graph (exact integer sums)
    "G8",
    # streaming sample-ratio-mismatch guardrail (complete-mode state)
    "S20",
    # robust rate-of-change alarms (MAD in derivative space)
    "TS24",
    # ANN recall certificate (RP top-k vs exact brute force)
    "V15",
    # CUPED variance-reduced A/B readout (integer moment sums)
    "A54",
    # Mann-Whitney U rank-sum test (doubled midranks, tie-corrected z)
    "A55",
    # label-propagation communities (self-vote, min-label determinism)
    "G9",
    # rolling robust baseline (R-7 median/MAD over the hourly spine)
    "TS25",
    # weighted reservoir sample (Efraimidis-Spirakis ln(u)/w keys)
    "L29",
    # single-changepoint detection (integer prefix sums, fixed gain tree)
    "TS26",
    # prefix-dimension retrieval audit (Matryoshka truncation safety)
    "V16",
    # corpus datasheet (per-source release manifest rollup)
    "L30",
    # CDC log apply (latest-op-wins + tombstones, one hash agg)
    "K14",
    # Mann-Kendall trend test (integer S/Var18, cross-multiplied z gate)
    "TS27",
    # HHI market concentration (ppm-quantized exact integer shares)
    "A56",
    # OOV-rate curve over the bigram vocabulary (TakeOrdered top-k)
    "L31",
    # versioned snapshots + time-travel diff (atomic pointer publish)
    "K15",
    # blocking-scheme quality audit (pair counts from group sizes)
    "D13",
    # quality-filter funnel (ordered integer rule cascade)
    "L32",
    # directed-graph reciprocity (reversed-key edge-list self-join)
    "G10",
    # Wald-Wolfowitz runs test (cross-multiplied z² decision)
    "A57",
    # LSH blocking recall certificate (exact PPJoin truth vs bands)
    "D14",
    # Kruskal-Wallis H test (doubled midranks, chi-square gate)
    "A58",
    # seasonality strength (order-free quantized variance decomposition)
    "TS28",
    # top-k WITH TIES (broadcast threshold, no global rank window)
    "O10",
    # IVF nprobe recall curve (memoized quantizer, one-plan sweep)
    "V17",
    # shuffle-skew advisor (keys-sized histogram, integer salt factor)
    "Z5",
    # HITS hubs & authorities (BIGINT fixed-point, div-rescale norm)
    "G11",
    # one-way ANOVA F test (exact moment sums, F(2, inf) gate)
    "A59",
    # time-series discord discovery (all-integer matrix-profile NN)
    "TS29",
    # Jensen-Shannon divergence drift (quantize-before-sum integer JSD)
    "A60",
    # delete-one-group jackknife CI (exact decimal normal sums)
    "A61",
    # Hurst exponent via aggregated variance (quantized-log OLS)
    "TS30",
    # embedding centroid audit (exact distributed centroid algebra)
    "V18",
    # SAX motif mining (z-score symbolization, sliding-word counts)
    "TS31",
    # golden-record survivorship (max-struct election over D5 clusters)
    "D15",
    # seasonal-naive MASE backtest (all-integer error sums)
    "TS32",
    # Kneser-Ney bigram scoring (continuation counts, quantized ln p)
    "L33",
    # shot-boundary detection (frame-chunk histograms, L1 threshold)
    "M1",
    # Theil T inequality index (quantize-before-sum entropy terms)
    "A62",
    # keyset pagination (seek-method, broadcast tuple boundaries)
    "O11",
    # dedup threshold sweep (memoized PPJoin pair-frame rollup)
    "D16",
    # embedding anisotropy report (stride-pair cosine histogram)
    "V19",
    # peak detection with prominence (strict local maxima, one window)
    "TS33",
    # Cramer's V effect size (quantized chi2 cells, strength labels)
    "A63",
    # token burstiness (zeros-included var/mean identity)
    "L34",
    # Allen interval-algebra census (13-relation integer CASE ladder)
    "I5",
    # rank-biserial effect size (doubled-midrank 2U kept integral)
    "A64",
    # longest degraded streak (median flag + gaps-and-islands)
    "TS34",
    # nearest-centroid classifier eval (corpus x labels exact dots)
    "V20",
    # primary-key integrity audit (group-size counters, no pairs)
    "K16",
    # referential-integrity audit (key-cardinality orphan rollups)
    "K17",
    # dead-embedding audit (null/dim/non-finite/zero-norm classes)
    "V21",
    # deterministic cluster bootstrap CI (hash-weighted resamples)
    "A65",
    # behavior entropy rate (quantized-ln conditional entropy)
    "A66",
    # Brier decomposition (reliability/resolution/uncertainty)
    "A67",
    # Wald SPRT (integer LLR walk, first boundary crossing)
    "TS35",
    # streaming SPRT (bounded GroupState sequential decision)
    "S21",
    # RAKE keyphrases (islands -> chunks, nano-quantized word scores)
    "L35",
    # Hill tail index (TakeOrdered probe, quantized log-spreads)
    "A68",
    # watermark policy census (ranged exclusive cummax, drop pricing)
    "S22",
    # temporal split with embargo (purged cut + leakage readout)
    "L36",
    # compaction plan (sequential-fill bin packing over the manifest)
    "Z6",
]

# North-star families (BASELINE.json) that must also be present.
NORTH_STAR = (
    "dedup-exact", "dedup-minhash", "dedup-lsh", "dedup-simhash",
    "dedup-jaccard", "dedup-embedding", "text-analysis", "text-quality",
    "lang-id", "fingerprint", "bpe-tokens", "corpus-selection",
    "streaming-window", "streaming-session", "streaming-stateful",
    "streaming-dedup", "multimodal-metadata", "multimodal-frames",
)


def _claimed() -> set[str]:
    tags: set[str] = set(MODULE_COVERED)
    for spec in registry().values():
        tags.update(spec.survey_ops)
    return tags


def test_every_survey_operator_is_claimed():
    missing = [i for i in SURVEY_IDS if i not in _claimed()]
    assert not missing, f"SURVEY §2 ids with no implementation claim: {missing}"


def test_north_star_families_present():
    claimed = _claimed()
    missing = [t for t in NORTH_STAR if t not in claimed]
    assert not missing, missing


def test_oracle_coverage_ratio():
    """The overwhelming majority of query entries must be value-checked
    (oracle present), not rows-only."""
    specs = registry().values()
    with_oracle = sum(1 for s in specs if s.oracle is not None)
    assert with_oracle / len(list(specs)) >= 0.95


def test_readme_query_count_is_generated_and_current():
    """README.md's query count is emitted by tools/gen_coverage.py into a
    marker span — it drifted to 162 while the registry was 191 when it
    was hand-written. Regenerate with `python tools/gen_coverage.py`."""
    import re
    from pathlib import Path

    from floatchat_datapipeline_spark.queries import _base_registry

    readme = (Path(__file__).resolve().parents[1] / "README.md").read_text()
    m = re.search(r"<!--QUERY_COUNT-->(\d+)<!--/QUERY_COUNT-->", readme)
    assert m, "README.md lost its QUERY_COUNT marker"
    assert int(m.group(1)) == len(_base_registry()), (
        "README query count stale; run python tools/gen_coverage.py"
    )
