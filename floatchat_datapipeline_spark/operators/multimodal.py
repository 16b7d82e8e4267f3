"""Multimodal binary-column operators (north-star, BASELINE.json).

Images/audio/video are opaque ``binary`` columns with typed metadata —
the 100 TB pattern: bytes stay columnar in parquet, metadata predicates
prune before any decode, and the decode itself runs as Arrow-batched
Python (``mapInPandas``) only on the filtered slice.

Decode stack is deliberately two-layered:
- **Plumbing (real, oracle-checked)**: magic-byte sniffing, byte length,
  content digests, frame-index fan-out (the 1→N UDTF shape a video
  frame-sampler has), byte-histogram features (the fixed-width vector
  shape an image encoder has).
- **Codec (stubbed)**: real JPEG/WAV decoding needs PIL/ffmpeg, which
  this container doesn't ship; ``decode_image`` raises
  NotImplementedError behind an import-try so a deployment with the libs
  drops them in without touching the Spark plumbing.

Synthetic media for the test tables: document text bytes behind a
deterministic magic prefix (doc_id % 3 → png/wav/raw), so every operator
output is SQL-expressible (DuckDB blob + base64 + md5 agree with Spark
bit-for-bit — verified) and the driver oracle value-checks the plumbing.
"""

from __future__ import annotations

import base64
import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PNG_MAGIC = b"\x89PNG"
WAV_MAGIC = b"RIFF"
N_HIST_BUCKETS = 16
FRAME_MOD = 7


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic binary test media from the documents table:
    (doc_id, content BINARY) with doc_id%3 choosing the magic prefix."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit(PNG_MAGIC), payload))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit(WAV_MAGIC), payload))
        .otherwise(payload)
        .alias("content"),
    )


def sniff_media_type(content: Column | str) -> Column:
    """Magic-byte classification — a pure JVM expression (no decode)."""
    c = F.col(content) if isinstance(content, str) else content
    head = F.substring(c, 1, 4)
    return (
        F.when(head == F.lit(PNG_MAGIC), "png")
        .when(head == F.lit(WAV_MAGIC), "wav")
        .otherwise("raw")
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata row per blob: sniffed type, byte length, digest.
    All JVM-side — the predicate surface that prunes before any decode."""
    # digest over hex(content), not base64: Spark's base64 chunks with
    # CRLF every 76 chars (MIME legacy), so it isn't engine-portable.
    return media.select(
        "doc_id",
        sniff_media_type("content").alias("media_type"),
        F.length("content").alias("n_bytes"),
        F.md5(F.hex("content")).alias("content_digest"),
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_key", StringType()),
    ]
)


def sample_frames(media: DataFrame) -> DataFrame:
    """1→N frame sampler (the video-decode UDTF shape): each blob yields
    ``len % 7 + 1`` frame rows with a per-frame content key. Arrow batches
    in, long frame table out — a real decoder swaps the key computation
    for pixel extraction and nothing else changes."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, keys = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                b64 = base64.b64encode(bytes(content)).decode()
                n = len(content) % FRAME_MOD + 1
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    keys.append(
                        hashlib.md5(f"{b64}_{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_key": keys,
                }
            )

    return media.mapInPandas(gen, FRAME_SCHEMA)


@F.pandas_udf(ArrayType(DoubleType()))
def byte_histogram_udf(contents: pd.Series) -> pd.Series:
    """Fixed-width feature vector per blob (the image-embedding shape):
    16-bucket byte-value histogram, L1-normalized."""
    out = []
    for content in contents:
        arr = np.frombuffer(bytes(content), dtype="uint8")
        if len(arr) == 0:
            out.append([0.0] * N_HIST_BUCKETS)
            continue
        hist = np.bincount(arr // 16, minlength=N_HIST_BUCKETS).astype("float64")
        out.append(list(hist / hist.sum()))
    return pd.Series(out)


def extract_features(media: DataFrame) -> DataFrame:
    return media.select(
        "doc_id", byte_histogram_udf(F.col("content")).alias("features")
    )


PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("w0", LongType()),
        StructField("w1", LongType()),
    ]
)


def phash_signatures(media: DataFrame) -> DataFrame:
    """64-bit SimHash-style byte-bucket signature per blob, packed into
    two 32-bit BIGINT words (the V13 layout): bit b is set iff byte
    bucket b (= byte div 4) holds more than 1/64 of the blob's mass
    (exact cross-multiply, 64·mass > total).

    One Arrow-batched numpy pass per partition (guide: hand whole
    batches to vectorized native code) — the byte histogram never
    leaves the worker as rows. The previous JVM form exploded one row
    PER BYTE while carrying the blob's full hex string through the
    generator (a quadratic string materialization: ~600× the input
    bytes on this corpus) and then paid two histogram shuffles; this is
    the map-side shape a real image encoder has (see extract_features).
    Zero-length blobs yield no signature row — mirroring the oracle,
    whose per-byte unnest produces no rows for them."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, w0s, w1s = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                # NULL blob: the replaced JVM hex-explode pipeline and
                # the oracle's unnest both silently drop it; bytes(None)
                # would raise instead (round-13 advice)
                if content is None:
                    continue
                arr = np.frombuffer(bytes(content), dtype="uint8")
                if len(arr) == 0:
                    continue
                mass = np.bincount(arr >> 2, minlength=64).astype("int64")
                bits = np.flatnonzero(64 * mass > len(arr))
                w0 = int(np.sum(1 << bits[bits < 32], dtype="int64"))
                w1 = int(np.sum(1 << (bits[bits >= 32] - 32), dtype="int64"))
                ids.append(doc_id)
                w0s.append(w0)
                w1s.append(w1)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "w0": pd.Series(w0s, dtype="int64"),
                    "w1": pd.Series(w1s, dtype="int64"),
                }
            )

    return media.select("doc_id", "content").mapInPandas(gen, PHASH_SCHEMA)


def decode_image(content: bytes):
    """Codec seam — real pixel decode. Needs PIL; not in this container."""
    try:
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        return Image.open(io.BytesIO(content))
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires pillow on the executors; the Spark "
            "plumbing (media_metadata/sample_frames/extract_features) is "
            "codec-independent"
        ) from e
