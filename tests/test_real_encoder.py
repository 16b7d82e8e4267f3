"""Real-encoder seam (reference embeddings/embed.py:22-44, loaded at
fastapi_app.py:377-386): runs ONLY when sentence-transformers is
importable. The container ships without it, so these normally skip — the
point is that the seam can't rot silently: if the lib appears, the seam
must load all-MiniLM-L6-v2 and produce 384-d normalized vectors.

Driver-side only on purpose: Spark's Python workers inherit their env
from JVM start, so flipping SPARK_GRAFT_REAL_ENCODER mid-session would
leave executors on the stub while the driver uses the real model —
encode_udf coverage for the real model belongs in a deployment smoke
test, not here.
"""

from __future__ import annotations

import importlib.util

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    importlib.util.find_spec("sentence_transformers") is None,
    reason="sentence-transformers not installed (expected in this container)",
)


@pytest.fixture()
def real_model(monkeypatch):
    import floatchat_datapipeline_spark.embeddings.encoder as enc

    monkeypatch.setenv("SPARK_GRAFT_REAL_ENCODER", "1")
    monkeypatch.setattr(enc, "_MODEL", None)
    yield enc
    enc._MODEL = None  # don't leak the real model into stub-oracle tests


def test_real_encoder_loads_and_encodes_384d(real_model):
    enc = real_model
    m = enc.get_model()
    assert not isinstance(m, enc._StubModel)
    v = enc.encode_query("warm tropical surface water")
    assert len(v) == 384
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3  # MiniLM normalizes

    batch = np.asarray(m.encode(["a short doc", "another doc"]))
    assert batch.shape == (2, 384)
    # determinism: same text, same vector
    again = enc.encode_query("warm tropical surface water")
    assert np.allclose(v, again)


def test_real_encoder_vectors_bucket_nondegenerately(real_model, spark):
    """With the dim-adaptive lsh_signature, 384-d real vectors must spread
    across buckets instead of collapsing into one (ADVICE r01)."""
    from floatchat_datapipeline_spark.embeddings.search import lsh_signature

    enc = real_model
    m = enc.get_model()
    texts = [f"document {i} about topic {i % 7}" for i in range(24)]
    vecs = [[float(x) for x in row] for row in np.asarray(m.encode(texts))]
    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id int, embedding array<double>"
    )
    sigs = {r["sig"] for r in df.select(lsh_signature("embedding").alias("sig")).collect()}
    assert len(sigs) > 1
