"""ERDDAP pushdown builder + staging cache tests (S1/F8, S5/S6/K9)."""

from __future__ import annotations

import os
import shutil
import tempfile

from floatchat_datapipeline_spark.sources.erddap import (
    ErddapRequest,
    indian_ocean_request,
)
from floatchat_datapipeline_spark.sources.staging import stage


def test_url_encodes_projection_and_predicates():
    req = indian_ocean_request()
    url = req.url()
    assert url.startswith("https://www.ifremer.fr/erddap/tabledap/ArgoFloats.nc?")
    # projection first
    assert "platform_number,time,latitude,longitude,pres,temp,psal" in url
    # predicates pushed into the query string
    assert "&latitude%3E=-60.0" in url or "&latitude>=-60.0" in url
    assert "time%3E=2020-01-01T00:00:00Z" in url or "time>=2020-01-01T00:00:00Z" in url


def test_residual_filter_matches_constraints(spark):
    req = ErddapRequest(
        "d", ("latitude",), (("latitude", ">=", -10.0), ("latitude", "<", 10.0))
    )
    df = spark.range(-20, 20).selectExpr("CAST(id AS DOUBLE) AS latitude")
    got = sorted(r[0] for r in df.filter(req.residual_filter()).collect())
    assert got == [float(x) for x in range(-10, 10)]


def test_invalid_op_rejected():
    import pytest

    with pytest.raises(ValueError):
        ErddapRequest("d", ("x",), (("x", "!=", 1),)).url()


def test_stage_cache_skips_existing():
    d = tempfile.mkdtemp(prefix="stage-test-")
    try:
        calls = {"n": 0}

        def produce() -> bytes:
            calls["n"] += 1
            return b"payload"

        r1 = stage(d, {"a.nc": produce, "b.nc": produce})
        assert r1 == {"a.nc": True, "b.nc": True} and calls["n"] == 2
        r2 = stage(d, {"a.nc": produce, "b.nc": produce, "c.nc": produce})
        assert r2 == {"a.nc": False, "b.nc": False, "c.nc": True}
        assert calls["n"] == 3  # cache satisfied a and b
        assert open(os.path.join(d, "a.nc"), "rb").read() == b"payload"
    finally:
        shutil.rmtree(d, ignore_errors=True)
