"""Round-11 operator tests: the ERDDAP URL-builder value gate, the
ANOVA empty-variant guard, and the HITS iteration-count guard."""

from __future__ import annotations

import pytest


def test_erddap_url_build_golden(spark, sf_dir):
    """The built URL for nation 0 must equal the hand-written literal —
    every builder quirk (variable join, constraint order, float repr,
    bare int, unquoted Z-time, quote safe-set) is on this string."""
    from floatchat_datapipeline_spark.queries import q_erddap_url_build

    rows = q_erddap_url_build(spark, sf_dir).collect()
    assert len(rows) == 25
    assert [r.n_nationkey for r in rows] == list(range(25))
    assert all(r.n_constraints == 6 for r in rows)
    assert rows[0].url == (
        "https://www.ifremer.fr/erddap/tabledap/floats_0.nc?"
        "platform_number,time,latitude,longitude,pres,temp,psal"
        "&latitude>=-60.0&latitude<=30.0&longitude>=20.0"
        "&longitude<120&cycle_number=0&time>=2020-01-01T00:00:00Z"
    )
    # float repr must keep the trailing .0 (ERDDAP treats 30 and 30.0
    # identically, but the oracle string would diverge silently)
    assert "&latitude<=54.0&" in rows[24].url


def test_erddap_request_rejects_unknown_op():
    from floatchat_datapipeline_spark.sources.erddap import ErddapRequest

    req = ErddapRequest(
        dataset="d", variables=("a",), constraints=(("a", "!=", 1),)
    )
    with pytest.raises(ValueError, match="unsupported constraint op"):
        req.url()


def test_anova_degenerate_rows_null_out(spark):
    """Every zero-divisor moment row must null f_stat AND significant
    instead of aborting (Spark ANSI DIVIDE_BY_ZERO) or reporting a
    meaningless significant=true (DuckDB inf/NaN ordering above the
    threshold): an empty variant (s_j²/n_j), one observation per
    variant (n−3 = 0), and zero within-group variance (ssw = 0, here
    two identical values per variant). A fully-populated row is
    untouched."""
    from floatchat_datapipeline_spark.queries import _anova_f_report

    g = spark.createDataFrame(
        [
            ("empty1", 5, 0, 5, 100, 0, 110, 5000),
            ("one_each", 1, 1, 1, 10, 20, 30, 1400),
            # two identical values per variant: q == Σ s_j²/n_j
            ("zero_ssw", 2, 2, 2, 20, 40, 60, 2800),
            ("full", 5, 5, 5, 100, 105, 110, 7000),
        ],
        "event_type string, n0 long, n1 long, n2 long,"
        " s0 long, s1 long, s2 long, q long",
    )
    rows = {r.event_type: r for r in _anova_f_report(g).collect()}
    for name in ("empty1", "one_each", "zero_ssw"):
        assert rows[name].f_stat is None, name
        assert rows[name].significant is None, name
    assert rows["full"].f_stat is not None
    assert rows["full"].significant is not None


def test_hits_rejects_zero_iters(spark):
    from floatchat_datapipeline_spark.operators.graph import (
        hits_fixed_point,
    )

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iters must be >= 1"):
        hits_fixed_point(edges, iters=0)
