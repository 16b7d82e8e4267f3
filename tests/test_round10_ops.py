"""Unit/property tests for the round-10 operator batch beyond the oracle
gate: invariants the DuckDB hash can't state directly (the MK gate fires
on a real trend, the OOV curve is a brute-force match and monotone, the
staged scan reads exactly the staged rows through the custom format)."""

import itertools
import math

from pyspark.sql import functions as F

from floatchat_datapipeline_spark.queries import (
    _mann_kendall_report,
    q_vocab_oov_rate,
)


def _mk_brute(xs):
    """Brute-force Mann-Kendall: S, Var18, significance — the textbook
    O(n²) definition."""
    s = sum(
        (0 if a == b else (1 if b > a else -1))
        for a, b in itertools.combinations(xs, 2)
    )
    n = len(xs)
    ties = {}
    for x in xs:
        ties[x] = ties.get(x, 0) + 1
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    sig = s != 0 and 180000 * (abs(s) - 1) ** 2 > 38416 * var18
    return s, var18, sig


def _mk_spark(spark, xs):
    daily = spark.createDataFrame(
        [("t", d, x) for d, x in enumerate(xs)],
        "event_type string, day long, x long",
    )
    return _mann_kendall_report(daily).collect()[0]


def test_mann_kendall_fires_on_monotone_trend(spark):
    """A strictly increasing series must be flagged up + significant —
    the gate the stationary synthetic events honestly never trip."""
    row = _mk_spark(spark, list(range(12)))
    n = 12
    assert row.s_stat == n * (n - 1) // 2  # every pair concordant
    assert row.direction == "up"
    assert row.significant is True


def test_mann_kendall_flat_and_noise_match_brute_force(spark):
    """Constant, alternating, and pseudo-random series match the
    textbook O(n²) computation exactly (S, Var18, significance)."""
    cases = [
        [5] * 10,
        [1, 2] * 8,
        [(7 * i * i + 3 * i) % 23 for i in range(20)],
        list(range(10, 0, -1)),
    ]
    for xs in cases:
        s, var18, sig = _mk_brute(xs)
        row = _mk_spark(spark, xs)
        assert (row.s_stat, row.var18, row.significant) == (s, var18, sig)
        want_dir = "up" if s > 0 else ("down" if s < 0 else "flat")
        assert row.direction == want_dir


def test_oov_rate_brute_force_and_monotone(spark, sf_dir):
    """The OOV curve equals a pure-Python bigram count replay at
    sf0.001, binds at k=64 (oov > 0), is monotone non-increasing in k,
    and saturates honestly at k=1024 (vocab smaller than k)."""
    from floatchat_datapipeline_spark.catalog import load_table

    texts = [
        r.text
        for r in load_table(spark, sf_dir, "documents")
        .select("text")
        .collect()
    ]
    counts = {}
    total = 0
    for t in texts:
        toks = t.split(" ")
        for a, b in zip(toks, toks[1:]):
            bg = f"{a} {b}"
            counts[bg] = counts.get(bg, 0) + 1
            total += 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    rows = {
        r.vocab_k: r for r in q_vocab_oov_rate(spark, sf_dir).collect()
    }
    assert set(rows) == {64, 256, 1024}
    prev = None
    for k in (64, 256, 1024):
        top = ranked[:k]
        in_occ = sum(c for _, c in top)
        r = rows[k]
        assert (r.vocab_tokens, r.in_occ, r.total) == (
            len(top),
            in_occ,
            total,
        )
        assert r.oov_occ == total - in_occ
        assert math.isclose(r.oov_rate, (total - in_occ) / total)
        if prev is not None:
            assert r.oov_rate <= prev
        prev = r.oov_rate
    assert rows[64].oov_occ > 0  # the curve binds
    assert rows[1024].vocab_tokens < 1024  # honest saturation


def test_staged_scan_partitions_and_rows(spark, sf_dir):
    """The S12 gate query's staged directory reads back through the
    custom format with one partition per staged file and exactly the
    sliced row count — the scale contract of the DataSource."""
    import glob
    import os

    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import q_erddap_staged_scan
    from floatchat_datapipeline_spark.sinks.bucketed import _layout_tag
    from floatchat_datapipeline_spark.sources.pyds import (
        ErddapStagedDataSource,
    )

    n_slice = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 13 == 0)
        .count()
    )
    total = (
        q_erddap_staged_scan(spark, sf_dir).agg(F.sum("n_rows")).first()[0]
    )
    assert total == n_slice
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    path = os.path.join(warehouse, f"erddap_staged_{_layout_tag(sf_dir)}")
    files = glob.glob(os.path.join(path, "*.csv"))
    spark.dataSource.register(ErddapStagedDataSource)
    df = (
        spark.read.format("erddap_staged")
        .option("path", path)
        .option(
            "ddl",
            "event_id bigint, user_id bigint, "
            "event_type string, value double",
        )
        .load()
    )
    assert df.rdd.getNumPartitions() == len(files) > 1
    assert df.count() == n_slice


def test_schema_evolution_null_fill_pattern(spark, sf_dir):
    """Gen 0 parts predate p_size and retail_cents, gen 1 predates only
    retail_cents — the NULL-fill shape mergeSchema must produce."""
    from floatchat_datapipeline_spark.queries import (
        q_parts_schema_evolution,
    )

    rows = {r.gen: r for r in q_parts_schema_evolution(spark, sf_dir).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0].n_size == 0 and rows[0].n_cents == 0
    assert rows[1].n_size == rows[1].n_rows and rows[1].n_cents == 0
    assert rows[2].n_size == rows[2].n_rows
    assert rows[2].n_cents == rows[2].n_rows > 0


def test_version_diff_partitions_by_change_algebra(spark, sf_dir):
    """The four diff classes partition both snapshots: removed+changed+
    unchanged == |v1|, added+changed+unchanged == |v2|; and cents move
    only in the changed class (changed new−old == 100·n_changed by
    construction)."""
    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import q_events_version_diff

    rows = {r.change: r for r in q_events_version_diff(spark, sf_dir).collect()}
    assert set(rows) == {"added", "removed", "changed", "unchanged"}
    ev = load_table(spark, sf_dir, "events")
    n_v1 = ev.filter(F.col("event_id") % 2 == 0).count()
    n_v2 = (
        ev.filter(
            (F.col("event_id") % 2 == 0) & (F.col("event_id") % 10 != 0)
        ).count()
        + ev.filter(
            (F.col("event_id") % 2 == 1) & (F.col("event_id") % 9 == 0)
        ).count()
    )
    assert (
        rows["removed"].n_keys
        + rows["changed"].n_keys
        + rows["unchanged"].n_keys
        == n_v1
    )
    assert (
        rows["added"].n_keys
        + rows["changed"].n_keys
        + rows["unchanged"].n_keys
        == n_v2
    )
    ch = rows["changed"]
    assert ch.new_cents - ch.old_cents == 100 * ch.n_keys
    un = rows["unchanged"]
    assert un.new_cents == un.old_cents


def test_blocking_audit_bounds_and_caught_subset(spark, sf_dir):
    """caught ≤ gt (blocks can only LOSE true pairs), caught ≤
    candidates (caught pairs are candidates), ratios in [0, 1], and the
    audit binds: completeness strictly below 1 somewhere (cross-day
    true pairs exist) and reduction strictly above 0 everywhere."""
    from floatchat_datapipeline_spark.queries import q_events_blocking_audit

    rows = q_events_blocking_audit(spark, sf_dir).collect()
    assert len(rows) == 5
    assert any(r.pair_completeness < 1.0 for r in rows)
    for r in rows:
        assert 0 <= r.caught_pairs <= r.gt_pairs
        assert r.caught_pairs <= r.candidate_pairs
        assert 0.0 <= r.pair_completeness <= 1.0
        assert 0.0 < r.reduction_ratio < 1.0


def test_quality_funnel_is_a_funnel(spark, sf_dir):
    """Stage k's n_in equals stage k−1's n_out (the cascade chains),
    every rule kills at least one doc at every SF (the binding
    discipline), and survivors are positive."""
    from floatchat_datapipeline_spark.queries import q_doc_quality_funnel

    rows = sorted(
        q_doc_quality_funnel(spark, sf_dir).collect(),
        key=lambda r: r.stage,
    )
    assert [r.rule for r in rows] == [
        "min_length",
        "min_tokens",
        "word_shape",
        "repetition",
    ]
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_in == prev.n_out
    for r in rows:
        assert r.n_killed >= 1
        assert r.n_in - r.n_killed == r.n_out
    assert rows[-1].n_out > 0


def _runs_brute(xs):
    """Textbook Wald–Wolfowitz over one series: median split (above =
    x > med, R-7 median), runs count, cross-multiplied z² decision."""
    import statistics

    med = statistics.median(xs)  # R-7 on even n == quantile_cont
    sides = [1 if x > med else 0 for x in xs]
    runs = 1 + sum(a != b for a, b in zip(sides, sides[1:]))
    n, n1 = len(xs), sum(sides)
    n2 = n - n1
    a = runs * n - 2 * n1 * n2 - n
    b = 2 * n1 * n2 * (2 * n1 * n2 - n)
    sig = n1 > 0 and n2 > 0 and b > 0 and 10000 * a * a * (n - 1) > 38416 * b
    return n, n1, n2, runs, sig


def test_runs_test_brute_force_and_extremes(spark):
    """A strictly alternating series (max runs) and a clustered
    low-then-high series (2 runs) must both reject randomness; noise
    cases match the textbook computation exactly."""
    from floatchat_datapipeline_spark.queries import _runs_test_report

    cases = [
        [10, 90] * 10,                     # alternation → non_random
        [10] * 10 + [90] * 10,             # clustering → non_random
        [(11 * i * i + 5 * i) % 37 for i in range(24)],
        [3, 7, 5],
    ]
    for xs in cases:
        daily = spark.createDataFrame(
            [("t", d, x) for d, x in enumerate(xs)],
            "event_type string, day long, x long",
        )
        row = _runs_test_report(daily).collect()[0]
        n, n1, n2, runs, sig = _runs_brute(xs)
        assert (
            row.n_days,
            row.n_above,
            row.n_below,
            row.runs,
            row.non_random,
        ) == (n, n1, n2, runs, sig)
    # the two extremes both fire, in opposite directions
    assert _runs_brute([10, 90] * 10)[4] is True
    assert _runs_brute([10] * 10 + [90] * 10)[4] is True


def test_trade_reciprocity_invariants(spark, sf_dir):
    """Reciprocated-edge count is EVEN (both directions of a mutual
    pair count), weighted mass never exceeds total, ratios in [0,1]."""
    from floatchat_datapipeline_spark.queries import q_trade_reciprocity

    r = q_trade_reciprocity(spark, sf_dir).collect()[0]
    assert r.n_edges > 0
    assert r.n_reciprocated % 2 == 0
    assert 0 <= r.n_reciprocated <= r.n_edges
    assert 0 <= r.w_reciprocated <= r.w_total
    assert 0.0 <= r.edge_reciprocity <= 1.0
    assert 0.0 <= r.weighted_reciprocity <= 1.0
    # weighted reciprocity cannot exceed edge reciprocity's support:
    # min(w, w_rev) is zero exactly on non-reciprocated edges
    if r.n_reciprocated == 0:
        assert r.w_reciprocated == 0


def test_formats_roundtrip_all_formats_agree(spark, sf_dir):
    """CSV, JSON, and ORC legs must produce identical rollups — any
    format-specific precision loss would split them."""
    from floatchat_datapipeline_spark.queries import q_formats_roundtrip

    rows = q_formats_roundtrip(spark, sf_dir).collect()
    assert {r.fmt for r in rows} == {"csv", "json", "orc"}
    vals = {
        (r.n_rows, r.cents, r.id_sum, r.ts_micros_sum) for r in rows
    }
    assert len(vals) == 1


def test_report_roundtrip_manifest_accounts_every_row(spark, sf_dir):
    """The commit-protocol manifest's TOTAL equals the slice count and
    _SUCCESS exists — the all-or-nothing visibility contract."""
    import os

    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import (
        q_erddap_report_roundtrip,
    )
    from floatchat_datapipeline_spark.sinks.bucketed import _layout_tag

    total = (
        q_erddap_report_roundtrip(spark, sf_dir)
        .agg(F.sum("n_rows"))
        .first()[0]
    )
    n_slice = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 19 == 0)
        .count()
    )
    assert total == n_slice
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    path = os.path.join(warehouse, f"erddap_report_{_layout_tag(sf_dir)}")
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    manifest = (
        open(os.path.join(path, "_MANIFEST.txt")).read().strip().splitlines()
    )
    assert manifest[-1] == f"TOTAL\t{n_slice}"


def test_minhash_recall_audit_invariants(spark, sf_dir):
    """caught ≤ min(true, candidates); ratios in (0, 1]; the candidate
    set is a real superset-attempt (nonzero both sides)."""
    from floatchat_datapipeline_spark.queries import q_minhash_recall_audit

    r = q_minhash_recall_audit(spark, sf_dir).collect()[0]
    assert r.n_true > 0 and r.n_candidates > 0
    assert 0 <= r.n_caught <= r.n_true
    assert r.n_caught <= r.n_candidates
    assert 0.0 <= r.recall <= 1.0
    assert 0.0 <= r.bucket_precision <= 1.0


def test_stream_scan_matches_staged_scan_semantics(spark, sf_dir):
    """The streaming source drains the full staged backlog: its row
    total equals the slice count (same contract the batch format's
    partition test pins)."""
    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import q_erddap_stream_scan

    total = (
        q_erddap_stream_scan(spark, sf_dir).agg(F.sum("n_rows")).first()[0]
    )
    n_slice = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 23 == 0)
        .count()
    )
    assert total == n_slice


def test_nprobe_recall_curve_monotone(spark, sf_dir):
    """Recall must be non-decreasing in nprobe (more probed clusters
    can only ADD candidates), totals fixed at 5 queries × 10, and the
    nprobe=4 point dominates the single-probe point strictly at this
    SF (the curve discriminates)."""
    from floatchat_datapipeline_spark.queries import (
        q_ann_nprobe_recall_curve,
    )

    rows = {
        r.nprobe: r for r in q_ann_nprobe_recall_curve(spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2, 4}
    for r in rows.values():
        assert r.n_total == 50
        assert 0 <= r.n_hits <= r.n_total
    assert rows[1].n_hits <= rows[2].n_hits <= rows[4].n_hits
    assert rows[1].n_hits < rows[4].n_hits


def test_join_skew_advisor_contrast_and_salt(spark, sf_dir):
    """lineitem's order-size distribution is skewed (heavy keys bind at
    2× mean) while events' user traffic is honestly uniform (0 heavy);
    the salt factor is exactly ceil(max_freq·32/n_rows)."""
    from floatchat_datapipeline_spark.queries import q_join_skew_advisor

    rows = {r.table_name: r for r in q_join_skew_advisor(spark, sf_dir).collect()}
    assert set(rows) == {"events", "lineitem"}
    assert rows["lineitem"].heavy_keys > 0
    assert rows["events"].heavy_keys == 0
    for r in rows.values():
        assert r.n_keys <= r.n_rows
        assert r.median_freq <= r.max_freq
        want_salt = -(-r.max_freq * 32 // r.n_rows)  # ceil div
        assert r.recommended_salt == want_salt
        assert r.skew_ratio >= 1.0


def _kw_brute(groups):
    """Textbook Kruskal-Wallis with tie correction via scipy-free
    midranks."""
    allv = sorted(v for g in groups for v in g)
    n = len(allv)
    # midrank of value v over the pooled sample
    first = {}
    cnt = {}
    for i, v in enumerate(allv, 1):
        first.setdefault(v, i)
        cnt[v] = cnt.get(v, 0) + 1
    rank = {v: first[v] + (cnt[v] - 1) / 2 for v in cnt}
    hsum = sum(
        (sum(rank[v] for v in g)) ** 2 / len(g) for g in groups
    )
    h0 = 12.0 / (n * (n + 1)) * hsum - 3 * (n + 1)
    tie3 = sum(t**3 - t for t in cnt.values())
    return h0 / (1 - tie3 / (n**3 - n))


def test_kruskal_wallis_brute_force_and_shifted_group(spark):
    """A shifted third group must fire significance; unshifted noise
    matches the textbook H within 1e-9 (same fold, rounded)."""
    from floatchat_datapipeline_spark.queries import _kruskal_wallis_report

    def run(groups):
        tallies = {}
        for j, g in enumerate(groups):
            for v in g:
                key = v
                tallies.setdefault(key, [0, 0, 0])[j] += 1
        rows = [
            ("t", v, c[0], c[1], c[2]) for v, c in sorted(tallies.items())
        ]
        df = spark.createDataFrame(
            rows, "event_type string, v long, t0 long, t1 long, t2 long"
        )
        return _kruskal_wallis_report(df).collect()[0]

    noise = [
        [(7 * i * i + j) % 40 for i in range(25)] for j in (0, 1, 2)
    ]
    row = run(noise)
    assert abs(row.h - _kw_brute(noise)) < 1e-6
    assert row.significant is False
    shifted = [list(range(30)), list(range(30)), [v + 100 for v in range(30)]]
    row2 = run(shifted)
    assert row2.significant is True
    assert abs(row2.h - _kw_brute(shifted)) < 1e-6


def test_seasonal_strength_reads_planted_signal(spark, sf_dir):
    """A planted strong hour-of-day signal reads strength > 0.9; pure
    flat data reads NULL (zero total variance, guarded); and the real
    corpus reads small-but-positive, shrinking with n like noise."""
    from floatchat_datapipeline_spark.queries import (
        _seasonal_strength_report,
        q_events_seasonal_strength,
    )

    seasonal = [
        ("t", h % 24, 1000 * (h % 24) + (h * 7) % 3)
        for h in range(240)
    ]
    row = _seasonal_strength_report(
        spark.createDataFrame(
            seasonal, "event_type string, hod long, x long"
        )
    ).collect()[0]
    assert row.strength > 0.9
    flat = spark.createDataFrame(
        [("t", h % 24, 5) for h in range(48)],
        "event_type string, hod long, x long",
    )
    assert _seasonal_strength_report(flat).collect()[0].strength is None
    for r in q_events_seasonal_strength(spark, sf_dir).collect():
        assert r.sst > 0
        assert 0.0 <= r.strength < 0.5
        assert 0 <= r.ssb <= r.sst


def test_topk_with_ties_semantics(spark, sf_dir):
    """At least 10 rows come back, every row's coverage ≥ the 10th
    value, exactly the WITH TIES contract: dropping the tie filter to
    a bare LIMIT 10 must lose the boundary ties this SF has."""
    from floatchat_datapipeline_spark.queries import q_part_qty_topk_ties

    rows = q_part_qty_topk_ties(spark, sf_dir).collect()
    assert len(rows) > 10  # ties bind at every test SF
    cut = sorted((r.n_suppliers for r in rows), reverse=True)[9]
    assert all(r.n_suppliers >= cut for r in rows)
    n_at_cut = sum(1 for r in rows if r.n_suppliers == cut)
    assert n_at_cut >= len(rows) - 9  # the surplus rows ARE the ties
    ranks = {r.cov_rank for r in rows}
    assert min(ranks) == 1 and max(ranks) <= 10


def test_nation_hhi_bounds(spark, sf_dir):
    """HHI invariants: single-supplier nations would hit 10¹²; every
    nation's HHI lies in (0, 10¹²], top share ≤ 10⁶, and HHI ≥
    top_share² (the largest term of the sum)."""
    from floatchat_datapipeline_spark.queries import q_nation_hhi

    for r in q_nation_hhi(spark, sf_dir).collect():
        assert 0 < r.hhi_ppm2 <= 10**12
        assert 0 < r.top_share_ppm <= 10**6
        assert r.hhi_ppm2 >= r.top_share_ppm**2
        # n equal suppliers would give ~1e12/n; concentration can only
        # push the index ABOVE that floor.
        assert r.hhi_ppm2 >= (10**12) // r.n_suppliers - r.n_suppliers


def _anova_brute(groups):
    """Textbook one-way ANOVA F over integer-valued groups."""
    import numpy as np

    allv = np.concatenate(groups).astype(float)
    gm = allv.mean()
    ssb = sum(len(g) * (np.mean(g) - gm) ** 2 for g in groups)
    ssw = sum(((np.asarray(g, dtype=float) - np.mean(g)) ** 2).sum() for g in groups)
    k, n = len(groups), len(allv)
    return (ssb / (k - 1)) / (ssw / (n - k))


def _anova_spark(spark, groups):
    from floatchat_datapipeline_spark.queries import _anova_f_report

    row = {"event_type": "t"}
    for j, g in enumerate(groups):
        row[f"n{j}"] = len(g)
        row[f"s{j}"] = sum(g)
    row["q"] = sum(x * x for g in groups for x in g)
    g = spark.createDataFrame(
        [tuple(row[c] for c in
               ("event_type", "n0", "n1", "n2", "s0", "s1", "s2", "q"))],
        "event_type string, n0 long, n1 long, n2 long, "
        "s0 long, s1 long, s2 long, q long",
    )
    return _anova_f_report(g).collect()[0]


def test_anova_f_fires_on_shifted_group(spark):
    """A group shifted by +50 against two equal groups must produce a
    large significant F — the gate the identical synthetic variants
    honestly never trip — matching the numpy brute force to 1e-6."""
    groups = [
        [100 + (i % 7) for i in range(40)],
        [100 + ((i * 3) % 7) for i in range(40)],
        [150 + (i % 7) for i in range(40)],
    ]
    row = _anova_spark(spark, groups)
    assert row.significant is True
    assert abs(row.f_stat - _anova_brute(groups)) < 1e-6


def test_anova_f_identical_groups_near_zero(spark):
    """Three identical groups give F == 0 exactly (SSB == 0 on the
    integer grid) and no significance."""
    g = [7, 9, 11, 13, 15] * 8
    row = _anova_spark(spark, [list(g), list(g), list(g)])
    assert row.significant is False
    assert row.f_stat == 0.0


def test_anova_f_noise_matches_brute_force(spark):
    """Pseudo-random same-distribution groups match numpy to 1e-6 and
    stay under the F(2, inf) gate."""
    groups = [
        [(17 * i * i + 5 * i + j) % 40 for i in range(60)]
        for j in (0, 13, 27)
    ]
    row = _anova_spark(spark, groups)
    assert abs(row.f_stat - _anova_brute(groups)) < 1e-6
    assert row.significant is False


def test_hits_ranks_star_suppliers(spark):
    """Hand bipartite graph: supplier 100 is bought by all four
    customers, supplier 200 by two, supplier 300 by one — authority
    order must be 100 > 200 > 300, and the best hub is a customer
    pointing at the most authoritative basket. Scores stay exact
    BIGINTs that sum to ~HITS_SCALE after the rescale."""
    from floatchat_datapipeline_spark.operators.graph import (
        HITS_SCALE,
        hits_fixed_point,
    )

    edges = spark.createDataFrame(
        [(c, 100) for c in (1, 2, 3, 4)]
        + [(c, 200) for c in (1, 2)]
        + [(3, 300)],
        "src long, dst long",
    )
    rows = hits_fixed_point(edges, iters=4).collect()
    auth = {r.node: r.units for r in rows if r.side == "auth"}
    hub = {r.node: r.units for r in rows if r.side == "hub"}
    assert auth[100] > auth[200] > auth[300] > 0
    # customers 1,2 (two strong suppliers) out-hub 4 (one supplier)
    assert hub[1] == hub[2] > hub[4]
    for side in (auth, hub):
        total = sum(side.values())
        assert HITS_SCALE // 2 <= total < 2 * HITS_SCALE


def test_discord_finds_planted_anomaly(spark):
    """A 12-periodic series with one flattened window: the top discord
    must anchor inside the planted disturbance, with the exact integer
    nn_dist2 of the brute-force python replay."""
    from floatchat_datapipeline_spark.queries import _discord_report

    period = [0, 2, 5, 9, 5, 2] * 2  # 12-hour cycle
    series = [period[h % 12] for h in range(240)]
    for h in range(120, 132):
        series[h] = 9  # planted plateau
    dense = spark.createDataFrame(
        [("t", h, c) for h, c in enumerate(series)],
        "event_type string, h long, c long",
    )
    got = {r.rnk: r for r in _discord_report(dense, window=12, k=1).collect()}
    top = got[1]
    # brute force NN distance per window
    wins = [series[i : i + 12] for i in range(len(series) - 11)]
    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))
    nn = [
        min(
            d2(wins[i], wins[j])
            for j in range(len(wins))
            if abs(i - j) >= 12
        )
        for i in range(len(wins))
    ]
    best = max(range(len(nn)), key=lambda i: (nn[i], -i))
    assert (top.window_h, top.nn_dist2) == (best, nn[best])
    assert 109 <= top.window_h <= 131  # overlaps the planted plateau


def test_js_divergence_brute_force_and_bounds(spark, sf_dir):
    """The per-type JSD equals a pure-python replay of the binned
    half-vs-half counts at sf0.001 (same 1e-9 quantization), and every
    reading sits in [0, ln 2]."""
    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import (
        q_events_js_divergence,
    )

    rows = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "unix_micros(ts) div 3600000000 AS h",
            "CAST(round(value * 100) AS BIGINT) div 5000 AS bin",
        )
        .collect()
    )
    h0 = min(r.h for r in rows)
    h1 = max(r.h for r in rows)
    mid = (h0 + h1 + 1) / 2
    counts = {}
    for r in rows:
        key = (r.event_type, r.bin)
        c = counts.setdefault(key, [0, 0])
        c[1 if r.h >= mid else 0] += 1
    got = {r.event_type: r for r in q_events_js_divergence(spark, sf_dir).collect()}
    types = {et for et, _ in counts}
    for et in types:
        bins = {b: c for (e, b), c in counts.items() if e == et}
        n1 = sum(c[0] for c in bins.values())
        n2 = sum(c[1] for c in bins.values())
        nanos = 0
        for c1, c2 in bins.values():
            p, q = c1 / n1, c2 / n2
            contrib = 0.0
            if c1 > 0:
                contrib += 0.5 * (p * math.log(2.0 * p / (p + q)))
            if c2 > 0:
                contrib += 0.5 * (q * math.log(2.0 * q / (q + p)))
            nanos += round(contrib * 1e9)
        r = got[et]
        assert (r.n1, r.n2, r.jsd_nanos) == (n1, n2, nanos)
        assert 0 <= r.jsd <= math.log(2.0) + 1e-9


def test_jackknife_ci_brute_force(spark, sf_dir):
    """theta_hat/se/CI equal a numpy delete-one-bucket replay at
    sf0.001 (same nano quantization), and the CI brackets theta_hat."""
    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import (
        q_events_jackknife_ci,
    )

    rows = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "user_id % 20 AS j",
            "CAST(round(value * 100) AS BIGINT) AS v",
        )
        .collect()
    )
    buckets = {}
    for r in rows:
        b = buckets.setdefault(r.event_type, {}).setdefault(r.j, [0, 0])
        b[0] += 1
        b[1] += r.v
    got = {r.event_type: r for r in q_events_jackknife_ci(spark, sf_dir).collect()}
    for et, bs in buckets.items():
        n = sum(c for c, _ in bs.values())
        s = sum(v for _, v in bs.values())
        ts = [
            round((s - sj) / max(n - nj, 1) * 1e9)
            for nj, sj in bs.values()
        ]
        g = len(ts)
        st, st2 = sum(ts), sum(t * t for t in ts)
        var = (g - 1) * float(g * st2 - st * st) / (g * g) / 1e18
        se = math.sqrt(var)
        r = got[et]
        assert r.g == g
        assert r.theta_hat == round(s / n, 9)
        assert r.se_jack == round(se, 9)
        assert r.ci_lo <= r.theta_hat <= r.ci_hi


def _hurst_of(spark, series):
    from floatchat_datapipeline_spark.queries import _hurst_from_dense

    dense = spark.createDataFrame(
        [("t", h, c) for h, c in enumerate(series)],
        "event_type string, hx long, c long",
    )
    return _hurst_from_dense(spark, dense).collect()[0]


def test_hurst_trend_vs_noise(spark):
    """A linear ramp (maximal long-range structure) must read H near 1
    while bounded pseudo-random noise reads H near 1/2 — the
    discriminating contrast of the aggregated-variance method."""
    import hashlib

    trend = _hurst_of(spark, list(range(320)))
    assert trend.n_scales == 5
    assert trend.hurst > 0.9
    noise = _hurst_of(
        spark,
        [
            int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 32
            for i in range(320)
        ],
    )
    assert 0.3 < noise.hurst < 0.7


def test_hurst_matches_numpy_replay(spark):
    """var_slope equals the numpy aggregated-variance replay (same
    1e-6 log quantization and integer normal equations) exactly."""
    import numpy as np

    series = [(13 * i * i * i + 7 * i) % 23 for i in range(160)]
    pts = []
    for m in (1, 2, 4, 8, 16):
        nb = len(series) // m
        s = np.add.reduceat(
            np.asarray(series[: nb * m], dtype=np.int64),
            range(0, nb * m, m),
        )
        ss, ss2 = int(s.sum()), int((s * s).sum())
        numv = nb * ss2 - ss * ss
        if numv > 0:
            pts.append(
                (
                    round(math.log(m) * 1e6),
                    round(math.log(numv / (nb * nb * m * m)) * 1e6),
                )
            )
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    want = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9)
    got = _hurst_of(spark, series)
    assert got.var_slope == want


def test_centroid_audit_numpy_replay(spark, sf_dir):
    """cos_to_global and dispersion equal the numpy replay over the
    same 1e-6 micro quantization at sf0.001, and a label's centroid
    cosine lives in [-1, 1] while dispersion is non-negative."""
    import numpy as np

    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import q_emb_centroid_audit

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull() & (F.size("embedding") == 64))
        .collect()
    )
    mics = {}
    for r in rows:
        mics.setdefault(r.label, []).append(
            np.array([round(float(x) * 1e6) for x in r.embedding], dtype=np.int64)
        )
    gsum = sum(np.sum(v, axis=0) for v in mics.values())
    got = {r.label: r for r in q_emb_centroid_audit(spark, sf_dir).collect()}
    assert set(got) == set(mics)
    for lab, vecs in mics.items():
        s = np.sum(vecs, axis=0)
        dot = float(np.dot(s.astype(object), gsum.astype(object)))
        nl = float(np.dot(s.astype(object), s.astype(object)))
        ng = float(np.dot(gsum.astype(object), gsum.astype(object)))
        q = sum(int(np.dot(v, v)) for v in vecs)
        n = len(vecs)
        cos = dot / (math.sqrt(nl) * math.sqrt(ng))
        disp = (q / n - nl / (n * n)) / 1e12
        r = got[lab]
        assert r.n_vecs == n
        assert abs(r.cos_to_global - cos) < 1e-8
        assert abs(r.dispersion - disp) < 1e-8
        assert -1 - 1e-9 <= r.cos_to_global <= 1 + 1e-9
        assert r.dispersion >= 0


def test_sax_motifs_periodic_plant(spark):
    """A clean 12-periodic series must surface its own repeating words
    at the top, with counts matching the exact python replay of the
    same z-score symbolization."""
    from floatchat_datapipeline_spark.queries import _sax_from_dense

    series = [(0, 1, 3, 8, 3, 1) * 2][0] * 30  # 12-periodic, 360 hours
    series = list(series)
    dense = spark.createDataFrame(
        [("t", h, c) for h, c in enumerate(series)],
        "event_type string, h long, c long",
    )
    got = _sax_from_dense(dense).collect()
    # python replay
    nb = len(series)
    sc = sum(series)
    sc2 = sum(c * c for c in series)
    mu = sc / nb
    sig = math.sqrt((nb * sc2 - sc * sc) / (nb * nb))
    syms = [
        "a" if (c - mu) / sig < -0.4307 else
        ("c" if (c - mu) / sig > 0.4307 else "b")
        for c in series
    ]
    words = {}
    for i in range(nb - 3):
        w = "".join(syms[i : i + 4])
        words[w] = words.get(w, 0) + 1
    ranked = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r.motif, r.n_occ) for r in got] == ranked
    # a 12-periodic series has at most 12 distinct words; the top one
    # must recur ~nb/12 times (real motif structure, not noise)
    assert got[0].n_occ >= nb // 12 - 1


def test_golden_records_survivorship_rules(spark, sf_dir):
    """Every golden record's canonical member really belongs to its
    cluster, carries the cluster-max n_chars (doc_id-ascending
    tiebreak), and clusters have >= 2 members — replayed against the
    D5 cluster map itself."""
    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import (
        q_doc_dup_clusters,
        q_doc_golden_records,
    )

    comp = {
        r.doc_id: r.component
        for r in q_doc_dup_clusters(spark, sf_dir).collect()
    }
    chars = {
        r.doc_id: (r.n_chars, r.lang, r.source)
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    members = {}
    for doc, c in comp.items():
        members.setdefault(c, []).append(doc)
    rows = q_doc_golden_records(spark, sf_dir).collect()
    assert {r.component for r in rows} == set(members)
    for r in rows:
        docs = members[r.component]
        assert r.n_members == len(docs) >= 2
        best = max(docs, key=lambda d: (chars[d][0], -d))
        assert r.canonical_doc_id == best
        assert r.canonical_n_chars == chars[best][0]
        assert (r.canonical_lang, r.canonical_source) == chars[best][1:]
        assert r.n_sources == len({chars[d][2] for d in docs})


def test_mase_planted_seasonality(spark):
    """A perfectly 24-periodic series scores MASE 0 (seasonal-naive is
    exact) and beats_naive; a hash-mixed series scores MASE around 1
    and does not beat the 1-hour naive decisively."""
    import hashlib

    from floatchat_datapipeline_spark.queries import _mase_from_dense

    periodic = [(h % 24) for h in range(240)]
    dense = spark.createDataFrame(
        [("t", h, c) for h, c in enumerate(periodic)],
        "event_type string, h long, c long",
    )
    row = _mase_from_dense(dense).collect()[0]
    assert row.mase == 0.0 and row.mae_seasonal == 0.0
    assert row.beats_naive is True
    noise = [
        int(hashlib.md5(str(h).encode()).hexdigest()[:4], 16) % 9
        for h in range(240)
    ]
    dense2 = spark.createDataFrame(
        [("t", h, c) for h, c in enumerate(noise)],
        "event_type string, h long, c long",
    )
    row2 = _mase_from_dense(dense2).collect()[0]
    assert 0.7 < row2.mase < 1.3


def test_kn_logprob_python_replay(spark, sf_dir):
    """Per-doc KN nanos equal an exact pure-python replay of the
    interpolated bigram model at sf0.001, and every average logprob is
    negative (probabilities < 1)."""
    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import q_doc_kn_logprob

    texts = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    c12, docbi = {}, {}
    for d, toks in texts.items():
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
            db = docbi.setdefault(d, {})
            db[(a, b)] = db.get((a, b), 0) + 1
    c1, n1f, n1b = {}, {}, {}
    for (a, b), c in c12.items():
        c1[a] = c1.get(a, 0) + c
        n1f[a] = n1f.get(a, 0) + 1
        n1b[b] = n1b.get(b, 0) + 1
    B = len(c12)
    got = {r.doc_id: r for r in q_doc_kn_logprob(spark, sf_dir).collect()}
    for d, bis in docbi.items():
        nanos = sum(
            m
            * round(
                math.log(
                    (c12[k] - 0.75) / c1[k[0]]
                    + (0.75 * n1f[k[0]] / c1[k[0]]) * (n1b[k[1]] / B)
                )
                * 1e9
            )
            for k, m in bis.items()
        )
        r = got[d]
        assert (r.n_bigrams, r.kn_nanos) == (sum(bis.values()), nanos)
        assert r.kn_avg_logprob < 0


def test_shot_boundaries_planted_cut(spark):
    """A blob built as 70 'a' bytes then 70 'z' bytes splits into
    frames that are pure-'a' then pure-'z': exactly one boundary, at
    the cut, with the exact L1 of two disjoint histograms; a uniform
    blob yields zero boundaries."""
    from floatchat_datapipeline_spark.queries import (
        _shot_boundaries_from_media,
    )

    # 141 bytes -> 141 % 7 + 1 = 2 frames of 71/70 bytes; the a/z cut
    # lands exactly on the frame edge, so the two histograms are
    # disjoint and exactly one boundary exists
    cut = ("a" * 71 + "z" * 70).encode()
    flat = b"q" * 141
    media = spark.createDataFrame(
        [(1, bytearray(cut)), (2, bytearray(flat))],
        "doc_id long, content binary",
    )
    rows = {r.doc_id: r for r in _shot_boundaries_from_media(spark, media).collect()}
    # python replay
    def replay(blob):
        n = len(blob)
        nf = n % 7 + 1
        frames = [[0] * 16 for _ in range(nf)]
        for i, b in enumerate(blob):
            frames[(i * nf) // n][b // 16] += 1
        nb, mx = 0, 0
        for f in range(nf - 1):
            l1 = sum(abs(a - b) for a, b in zip(frames[f], frames[f + 1]))
            tm = sum(frames[f]) + sum(frames[f + 1])
            mx = max(mx, l1)
            if 4 * l1 > tm:
                nb += 1
        return nf, nb, mx
    for doc, blob in ((1, cut), (2, flat)):
        nf, nb, mx = replay(blob)
        r = rows[doc]
        assert (r.n_frames, r.n_boundaries, r.max_l1) == (nf, nb, mx)
    assert rows[1].n_boundaries == 1   # exactly the planted cut
    assert rows[2].n_boundaries == 0   # uniform blob never fires


def test_theil_replay_and_bounds(spark, sf_dir):
    """Per-nation Theil equals the python replay of the quantized term
    sum at sf0.001 and respects 0 <= T <= ln(N)."""
    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import q_nation_spend_theil

    orders = {
        (r.o_custkey): r.spend
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("spend")
        )
        .collect()
    }
    nat = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    by_nation = {}
    for ck, x in orders.items():
        by_nation.setdefault(nat[ck], []).append(x)
    got = {r.nationkey: r for r in q_nation_spend_theil(spark, sf_dir).collect()}
    assert set(got) == set(by_nation)
    for nk, xs in by_nation.items():
        n, s = len(xs), sum(xs)
        nanos = sum(
            round((x * n / s) * math.log(x * n / s) * 1e9) for x in xs
        )
        r = got[nk]
        assert r.n_customers == n
        assert math.isclose(r.theil, nanos / (1e9 * n), rel_tol=1e-12)
        assert -1e-9 <= r.theil <= math.log(n) + 1e-9


def test_keyset_pages_equal_offset(spark, sf_dir):
    """Keyset pages 2-3 must equal the OFFSET 10..30 slice of the
    global (price DESC, key ASC) order — seek == offset."""
    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import q_orders_keyset_pages

    # HALF_UP like Spark's F.round — python round() banker-rounds, so
    # an o_totalprice*100 landing exactly on .5 would diverge.
    allrows = sorted(
        (
            (math.floor(r.o_totalprice * 100 + 0.5), r.o_orderkey)
            for r in load_table(spark, sf_dir, "orders").collect()
        ),
        key=lambda t: (-t[0], t[1]),
    )
    want = allrows[10:30]
    got = q_orders_keyset_pages(spark, sf_dir).collect()
    assert [(r.price_cents, r.o_orderkey) for r in got] == want
    assert [(r.page, r.rnk) for r in got] == [
        (p, k) for p in (2, 3) for k in range(1, 11)
    ]


def test_threshold_sweep_monotone_and_consistent(spark, sf_dir):
    """Pair/doc counts are non-increasing in theta, the 0.5 row equals
    the full PPJoin pair frame, and doc counts match a python replay
    of the pair list."""
    from floatchat_datapipeline_spark.queries import (
        q_dedup_threshold_sweep,
        q_doc_ppjoin_pairs,
    )

    pairs = [
        (r.id_a, r.id_b, r.jaccard)
        for r in q_doc_ppjoin_pairs(spark, sf_dir).collect()
    ]
    rows = q_dedup_threshold_sweep(spark, sf_dir).collect()
    assert [r.theta for r in rows] == [0.5, 0.6, 0.7, 0.8, 0.9]
    prev_p, prev_d = None, None
    for r in rows:
        hit = [(a, b) for a, b, j in pairs if j >= r.theta - 1e-12]
        assert r.n_pairs == len(hit)
        assert r.n_docs == len({d for ab in hit for d in ab})
        if prev_p is not None:
            assert r.n_pairs <= prev_p and r.n_docs <= prev_d
        prev_p, prev_d = r.n_pairs, r.n_docs
    assert rows[0].n_pairs == len(pairs)
    assert rows[0].n_pairs > 0  # the sweep binds


def test_cosine_histogram_replay(spark, sf_dir):
    """Bucket counts and quantized means equal a numpy replay of the
    stride-pair cosines at sf0.001, buckets stay within [-10, 9], and
    the total pair count matches the stride construction."""
    import numpy as np

    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import q_emb_cosine_histogram

    vecs = {
        r.vec_id: np.array(
            [round(float(x) * 1e6) for x in r.embedding], dtype=np.int64
        )
        for r in load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull() & (F.size("embedding") == 64))
        .collect()
    }
    buckets = {}
    n_total = 0
    for o in (1, 17, 131):
        for vid, va in vecs.items():
            vb = vecs.get(vid + o)
            if vb is None:
                continue
            n_total += 1
            cos = float(np.dot(va, vb)) / (
                math.sqrt(float(np.dot(va, va)))
                * math.sqrt(float(np.dot(vb, vb)))
            )
            b = math.floor(cos * 10)
            cnt, nan = buckets.get(b, (0, 0))
            buckets[b] = (cnt + 1, nan + round(cos * 1e9))
    got = {r.bucket: r for r in q_emb_cosine_histogram(spark, sf_dir).collect()}
    assert set(got) == set(buckets)
    assert sum(r.n_pairs for r in got.values()) == n_total > 0
    for b, (cnt, nan) in buckets.items():
        r = got[b]
        assert r.n_pairs == cnt
        assert math.isclose(r.mean_cos, nan / (1e9 * cnt), rel_tol=1e-12)
        assert -10 <= b <= 9


def test_peak_hours_planted_spike(spark, sf_dir):
    """Every reported peak strictly exceeds its ±2 neighbors in the
    dense series replay, prominence equals the margin over the tallest
    neighbor, and the per-type ranking is (prominence, count, hour)."""
    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import q_events_peak_hours

    hours = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "event_type", "unix_micros(ts) div 3600000000 AS h"
        )
        .collect()
    )
    h0 = min(r.h for r in hours)
    h1 = max(r.h for r in hours)
    series = {}
    for r in hours:
        s = series.setdefault(r.event_type, [0] * (h1 - h0 + 1))
        s[r.h - h0] += 1
    got = q_events_peak_hours(spark, sf_dir).collect()
    assert got, "no peaks found at all"
    for r in got:
        s = series[r.event_type]
        i = r.peak_h - h0
        nbs = [s[i - 2], s[i - 1], s[i + 1], s[i + 2]]
        assert s[i] == r.c > max(nbs)
        assert r.prominence == r.c - max(nbs)
    # full replay of the per-type top-5 ordering
    for et, s in series.items():
        peaks = [
            (s[i] - max(s[i - 2], s[i - 1], s[i + 1], s[i + 2]), s[i], i + h0)
            for i in range(2, len(s) - 2)
            if s[i] > max(s[i - 2], s[i - 1], s[i + 1], s[i + 2])
        ]
        want = sorted(peaks, key=lambda t: (-t[0], -t[1], t[2]))[:5]
        mine = [
            (r.prominence, r.c, r.peak_h) for r in got if r.event_type == et
        ]
        assert mine == want


def _cramers_cells(spark, triples):
    from floatchat_datapipeline_spark.queries import _cramers_v_report

    cells = spark.createDataFrame(
        triples, "event_type string, dow long, o long"
    )
    return _cramers_v_report(cells).collect()[0]


def test_cramers_v_extremes(spark):
    """A diagonal (perfectly dependent) contingency reads V == 1 /
    'large'; a uniform grid reads V == 0 / 'negligible'."""
    diag = [(f"t{i}", i, 50) for i in range(4)]
    row = _cramers_cells(spark, diag)
    assert row.cramers_v == 1.0 and row.strength == "large"
    flat = [(f"t{i}", j, 25) for i in range(4) for j in range(4)]
    row2 = _cramers_cells(spark, flat)
    assert row2.cramers_v == 0.0 and row2.strength == "negligible"


def test_cramers_v_matches_numpy(spark):
    """An arbitrary contingency matches the scipy-free numpy chi2 and
    V to 1e-6 (same 1e-9 quantization tolerance)."""
    import numpy as np

    obs = np.array([[30, 10, 5], [10, 25, 15], [5, 10, 40]])
    triples = [
        (f"t{i}", j, int(obs[i, j]))
        for i in range(3)
        for j in range(3)
    ]
    n = obs.sum()
    exp = np.outer(obs.sum(1), obs.sum(0)) / n
    chi2 = ((obs - exp) ** 2 / exp).sum()
    v = math.sqrt(chi2 / n / 2)
    row = _cramers_cells(spark, triples)
    assert abs(row.chi2 - chi2) < 1e-6
    assert abs(row.cramers_v - v) < 1e-6


def test_burstiness_replay_and_floor(spark, sf_dir):
    """Top-20 burstiness equals the python replay (df >= 5, zeros-
    included var/mean identity) and every reported ratio is positive."""
    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import q_vocab_burstiness

    texts = [
        r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    nd = len(texts)
    per_tok = {}
    for t in texts:
        counts = {}
        for tok in t.split(" "):
            if tok:
                counts[tok] = counts.get(tok, 0) + 1
        for tok, c in counts.items():
            df, tt, q = per_tok.get(tok, (0, 0, 0))
            per_tok[tok] = (df + 1, tt + c, q + c * c)
    scored = [
        (round((nd * q - tt * tt) / (nd * tt), 9), tok, df, tt)
        for tok, (df, tt, q) in per_tok.items()
        if df >= 5
    ]
    want = sorted(scored, key=lambda t: (-t[0], t[1]))[:20]
    got = q_vocab_burstiness(spark, sf_dir).collect()
    assert [(r.burstiness, r.token, r.df, r.total_occ) for r in got] == want
    assert all(r.burstiness > 0 for r in got)


def test_allen_relations_partition_the_join(spark, sf_dir):
    """The 13-class histogram sums to the exact (activity x incident)
    per-user pair count, and each class matches a python replay of the
    interval sets at sf0.001."""
    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import (
        q_incident_allen_relations,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "user_id",
            "event_type",
            "unix_micros(ts) div 1000000 AS es",
        )
        .collect()
    )
    act = {}
    for r in ev:
        key = (r.user_id, r.es // 86400)
        lo, hi = act.get(key, (r.es, r.es))
        act[key] = (min(lo, r.es), max(hi, r.es))
    acts = {}
    for (u, _), (lo, hi) in act.items():
        if hi > lo:
            acts.setdefault(u, []).append((lo, hi))
    errs = {}
    for r in ev:
        if r.event_type == "error":
            errs.setdefault(r.user_id, []).append(r.es)
    incs = {}
    for u, ts in errs.items():
        ts.sort()
        cur = [ts[0], ts[0] + 3600]
        for e in ts[1:]:
            if e <= cur[1]:
                cur[1] = e + 3600
            else:
                incs.setdefault(u, []).append(tuple(cur))
                cur = [e, e + 3600]
        incs.setdefault(u, []).append(tuple(cur))

    def allen(a1, a2, b1, b2):
        if a1 == b1 and a2 == b2:
            return "equals"
        if a2 < b1:
            return "before"
        if b2 < a1:
            return "after"
        if a2 == b1:
            return "meets"
        if b2 == a1:
            return "met_by"
        if a1 == b1:
            return "starts" if a2 < b2 else "started_by"
        if a2 == b2:
            return "finishes" if a1 > b1 else "finished_by"
        if a1 > b1 and a2 < b2:
            return "during"
        if a1 < b1 and a2 > b2:
            return "contains"
        return "overlaps" if a1 < b1 else "overlapped_by"

    hist = {}
    total = 0
    for u, sp in acts.items():
        for a1, a2 in sp:
            for b1, b2 in incs.get(u, []):
                total += 1
                rel = allen(a1, a2, b1, b2)
                hist[rel] = hist.get(rel, 0) + 1
    got = {r.relation: r.n_pairs for r in q_incident_allen_relations(spark, sf_dir).collect()}
    assert got == hist
    assert sum(got.values()) == total > 0


def test_rank_biserial_brute_force(spark, sf_dir):
    """CL and r equal the O(n²) brute-force U (ties at half weight)
    over the raw rows at sf0.001, and r stays in [-1, 1]."""
    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import q_events_rank_biserial

    rows = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "user_id % 2 AS grp",
            "CAST(round(value * 100) AS BIGINT) AS v",
        )
        .collect()
    )
    groups = {}
    for r in rows:
        groups.setdefault(r.event_type, ([], []))[r.grp].append(r.v)
    got = {r.event_type: r for r in q_events_rank_biserial(spark, sf_dir).collect()}
    for et, (a, b) in groups.items():
        u2 = 0  # 2*U_a: wins count 2, ties count 1
        for x in a:
            for y in b:
                u2 += 2 if x > y else (1 if x == y else 0)
        cl = u2 / (2 * len(a) * len(b))
        r = got[et]
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert abs(r.common_language - cl) < 1e-9
        assert abs(r.rank_biserial - (1 - 2 * cl)) < 1e-9
        assert -1 <= r.rank_biserial <= 1


def test_degraded_streak_replay(spark, sf_dir):
    """Longest-run, start hour, and degraded-hour totals equal the
    python gaps-and-islands replay over the dense spine at sf0.001."""
    import numpy as np

    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import (
        q_events_degraded_streak,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("event_type", "unix_micros(ts) div 3600000000 AS h")
        .collect()
    )
    h0 = min(r.h for r in ev)
    h1 = max(r.h for r in ev)
    series = {}
    for r in ev:
        s = series.setdefault(r.event_type, [0] * (h1 - h0 + 1))
        s[r.h - h0] += 1
    got = {r.event_type: r for r in q_events_degraded_streak(spark, sf_dir).collect()}
    for et, s in series.items():
        med = float(np.percentile(s, 50, method="linear"))
        flags = [i for i, c in enumerate(s) if c > 2 * med]
        if not flags:
            assert et not in got
            continue
        runs = []
        start = prev = flags[0]
        for i in flags[1:]:
            if i == prev + 1:
                prev = i
            else:
                runs.append((prev - start + 1, start))
                start = prev = i
        runs.append((prev - start + 1, start))
        best = max(runs, key=lambda t: (t[0], -t[1]))
        r = got[et]
        assert r.n_degraded_hours == len(flags)
        assert (r.longest_run, r.run_start_h) == (best[0], best[1] + h0)


def test_centroid_classifier_numpy_replay(spark, sf_dir):
    """Per-label accuracy equals the numpy nearest-centroid replay
    (same micro quantization, same min-label tie-break) at sf0.001."""
    import numpy as np

    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.queries import (
        q_emb_centroid_classifier,
    )

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull() & (F.size("embedding") == 64))
        .collect()
    )
    vecs = [
        (
            r.label,
            np.array(
                [round(float(x) * 1e6) for x in r.embedding],
                dtype=np.int64,
            ),
        )
        for r in rows
    ]
    cents = {}
    for lab, v in vecs:
        cents[lab] = cents.get(lab, np.zeros(64, dtype=np.int64)) + v
    stats = {}
    for lab, v in vecs:
        best = max(
            cents.items(),
            key=lambda kv: (
                float(np.dot(v, kv[1]))
                / (
                    math.sqrt(float(np.dot(v, v)))
                    * math.sqrt(float(np.dot(kv[1], kv[1])))
                ),
                -kv[0],
            ),
        )[0]
        n, ok = stats.get(lab, (0, 0))
        stats[lab] = (n + 1, ok + (1 if best == lab else 0))
    got = {r.label: r for r in q_emb_centroid_classifier(spark, sf_dir).collect()}
    assert set(got) == set(stats)
    for lab, (n, ok) in stats.items():
        r = got[lab]
        assert (r.n_vecs, r.n_correct) == (n, ok)
        assert math.isclose(r.accuracy, ok / n)
