"""Multimodal plumbing tests — sniffing, frame fan-out, feature shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.catalog import load_table
from floatchat_datapipeline_spark.operators.multimodal import (
    FRAME_MOD,
    N_HIST_BUCKETS,
    decode_image,
    extract_features,
    media_metadata,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return synth_media(docs)


def test_sniffer_matches_synthesis_rule(media):
    rows = media_metadata(media).select("doc_id", "media_type").collect()
    expect = {0: "png", 1: "wav", 2: "raw"}
    assert all(r["media_type"] == expect[r["doc_id"] % 3] for r in rows)


def test_frame_counts(media):
    frames = sample_frames(media)
    counts = frames.groupBy("doc_id").count()
    lens = media.select("doc_id", F.length("content").alias("n"))
    joined = counts.join(lens, "doc_id").collect()
    assert all(r["count"] == r["n"] % FRAME_MOD + 1 for r in joined)
    # frame keys unique per (doc, frame)
    assert frames.count() == frames.select("doc_id", "frame_key").distinct().count()


def test_feature_vector_shape_and_norm(media):
    feats = extract_features(media.limit(50)).collect()
    for r in feats:
        v = np.array(r["features"])
        assert len(v) == N_HIST_BUCKETS
        assert abs(v.sum() - 1.0) < 1e-9
        assert (v >= 0).all()


def test_decode_stub_raises_without_pillow():
    try:
        import PIL  # noqa: F401

        pytest.skip("pillow present; decode seam is live")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG....")
