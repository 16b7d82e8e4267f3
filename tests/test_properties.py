"""Property-based tests (hypothesis) for the pure decode/encode kernels.

These run without Spark — they pin the per-row functions that executors
apply inside mapInPandas/pandas_udf, where a silent edge-case bug would
corrupt data at scale without failing any fixed-fixture test.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from floatchat_datapipeline_spark.embeddings.encoder import _StubModel
from floatchat_datapipeline_spark.sources.netcdf import decode_cf_time

TOKENS = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
)
TEXTS = st.lists(TOKENS, min_size=1, max_size=30).map(" ".join)


@settings(max_examples=200, deadline=None)
@given(TEXTS)
def test_stub_encoder_unit_norm_and_determinism(text):
    m = _StubModel()
    v1, v2 = m.encode([text])[0], m.encode([text])[0]
    assert np.array_equal(v1, v2)
    assert abs(float(np.dot(v1, v1)) - 1.0) < 1e-9


@settings(max_examples=200, deadline=None)
@given(TEXTS, TEXTS)
def test_stub_encoder_cosine_bounded(a, b):
    m = _StubModel()
    va, vb = m.encode([a, b])
    cos = float(np.dot(va, vb))
    assert -1e-9 <= cos <= 1.0 + 1e-9
    # identical text ⇒ cosine exactly 1 within fp tolerance
    assert abs(float(np.dot(va, va)) - 1.0) < 1e-9


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(min_value=0, max_value=40000, allow_nan=False),
            st.just(float("nan")),
        ),
        min_size=1,
        max_size=20,
    ),
    st.sampled_from(["days", "hours", "seconds"]),
)
def test_cf_time_decode_roundtrip(values, unit):
    """Finite offsets decode to base + offset exactly (µs precision);
    NaN decodes to NaT, never raises."""
    units = f"{unit} since 2000-01-01"
    out = decode_cf_time(np.array(values), units)
    base = pd.Timestamp("2000-01-01")
    mult = {"days": 86400, "hours": 3600, "seconds": 1}[unit]
    for v, ts in zip(values, out):
        if math.isnan(v):
            assert pd.isna(ts)
        else:
            expect_us = round(v * mult * 1_000_000)
            got_us = (ts - base).value // 1000
            assert abs(got_us - expect_us) <= 1
