"""Edge-semantics tests for decontamination, repetition, chunking, and
gap-fill — the boundary cases the sf-data oracle mirror can't isolate:
short-doc guards, exactly-one-shared-shingle, trailing-chunk dropping,
LOCF across multi-hour gaps."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.operators.decontam import (
    ngram_decontaminate,
    repetition_stats,
)
from floatchat_datapipeline_spark.operators.sampling import chunk_documents
from floatchat_datapipeline_spark.operators.timeseries import gapfill_locf


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_only_overlapping_docs(spark):
    holdout = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    train = _docs(
        spark,
        [
            # shares the 5-gram "beta gamma delta epsilon zeta"
            (1, "x beta gamma delta epsilon zeta y"),
            # same words, different order — no shared 5-gram
            (2, "zeta epsilon delta gamma beta alpha"),
            # too short to have any 5-gram
            (3, "alpha beta"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in ngram_decontaminate(train, holdout).collect()
    }
    assert out[1]["contaminated"] and out[1]["n_shared"] == 1
    assert not out[2]["contaminated"] and out[2]["n_shared"] == 0
    assert not out[3]["contaminated"]
    assert len(out) == 3  # every train row survives, flagged or not


def test_repetition_stats_ratios_and_flag(spark):
    docs = _docs(
        spark,
        [
            (1, "spam spam spam spam"),  # top word = 4/4, top bigram 3/3
            (2, "a b c d"),  # all distinct: word 1/4, bigram 1/3
            (3, "solo"),  # single word: no bigrams at all
        ],
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[1]["top_word_frac"] == 1.0
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[1]["is_repetitive"]
    assert out[2]["top_word_frac"] == 0.25
    assert out[2]["n_tokens"] == 4
    assert not out[2]["is_repetitive"] or out[2]["top_bigram_frac"] > 0.05
    assert out[3]["top_bigram_frac"] == 0.0  # coalesced, not NULL


def test_chunks_drop_covered_trailing_start(spark):
    # 100 tokens, chunk 64 stride 48: starts 1 and 49; 97 is fully
    # covered by the chunk at 49 (49..100) and must be dropped.
    text = " ".join(f"w{i}" for i in range(1, 101))
    out = chunk_documents(_docs(spark, [(1, text)])).orderBy("chunk_id").collect()
    assert [(r["start_token"], r["n_chunk_tokens"]) for r in out] == [
        (1, 64),
        (49, 52),
    ]
    assert out[0]["chunk_text"].startswith("w1 ")
    assert out[1]["chunk_text"].endswith(" w100")


def test_chunks_short_doc_single_chunk(spark):
    out = chunk_documents(_docs(spark, [(1, "a b c")])).collect()
    assert len(out) == 1
    assert out[0]["n_chunk_tokens"] == 3
    assert out[0]["chunk_text"] == "a b c"


def test_chunks_cover_every_token(spark):
    # any token index must fall inside >= 1 chunk, for awkward lengths
    for n in (1, 47, 48, 49, 64, 65, 111, 112, 113, 200):
        text = " ".join(f"t{i}" for i in range(n))
        rows = chunk_documents(_docs(spark, [(1, text)])).collect()
        covered = set()
        for r in rows:
            covered.update(
                range(r["start_token"], r["start_token"] + r["n_chunk_tokens"])
            )
        assert covered == set(range(1, n + 1)), f"n={n}"


def test_gapfill_locf_carries_last_cents_forward(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 10), 1.00),
        (1, dt.datetime(2024, 1, 1, 0, 50), 2.00),
        (1, dt.datetime(2024, 1, 1, 3, 5), 7.50),
        (2, dt.datetime(2024, 1, 1, 5, 0), 4.00),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = gapfill_locf(ev)
    u1 = [r.asDict() for r in out.filter(F.col("user_id") == 1).orderBy("hour").collect()]
    assert [r["hour"].hour for r in u1] == [0, 1, 2, 3]
    assert [r["is_gap"] for r in u1] == [False, True, True, False]
    assert [r["n_events"] for r in u1] == [2, 0, 0, 1]
    # hours 1-2 carry hour 0's 300 cents; hour 3 observes 750
    assert [r["filled_cents"] for r in u1] == [300, 300, 300, 750]
    assert [r["value_cents"] for r in u1] == [300, None, None, 750]
    # single-hour user: one row, no gaps
    u2 = out.filter(F.col("user_id") == 2).collect()
    assert len(u2) == 1 and not u2[0]["is_gap"]


def test_rolling_window_includes_equal_ts_ties(spark):
    from floatchat_datapipeline_spark.operators.windows import (
        rolling_window_agg,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        (1, 1, t0, 1.00),
        (2, 1, t0, 2.00),  # same instant — RANGE frame must include both
        (3, 1, t0 + dt.timedelta(minutes=30), 4.00),
        (4, 1, t0 + dt.timedelta(minutes=61), 8.00),  # row 1/2 aged out
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {r["event_id"]: r for r in rolling_window_agg(ev).collect()}
    # RANGE peers: both t0 rows see each other regardless of row order
    assert out[1]["n_window"] == 2 and out[2]["n_window"] == 2
    assert out[1]["cents_window"] == 300
    assert out[3]["n_window"] == 3 and out[3]["cents_window"] == 700
    assert out[4]["n_window"] == 2 and out[4]["cents_window"] == 1200


def test_quantize_roundtrip_and_zero_vector(spark):
    from pyspark.sql import functions as F

    from floatchat_datapipeline_spark.functions.vector import (
        dequantize,
        quantize,
    )

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, vec array<double>",
    )
    scale, q = quantize(F.col("vec"))
    out = {
        r["vec_id"]: r
        for r in df.select(
            "vec_id",
            scale.alias("s"),
            q.alias("q"),
            dequantize(q, scale).alias("recon"),
        ).collect()
    }
    assert out[1]["q"] == [127, -64, 32, 0]  # round(0.25/ (1/127)) = 31.75→32
    assert abs(out[1]["s"] - 1 / 127) < 1e-12
    assert max(abs(a - b) for a, b in zip([1.0, -0.5, 0.25, 0.0], out[1]["recon"])) <= out[1]["s"] / 2 + 1e-12
    # zero vector: scale 0, all-zero codes, no NaN/NULL anywhere
    assert out[2]["s"] == 0.0 and out[2]["q"] == [0, 0, 0, 0]
    assert out[2]["recon"] == [0.0, 0.0, 0.0, 0.0]


def test_segment_dedup_drops_shared_segments_and_reassembles(spark):
    from floatchat_datapipeline_spark.operators.dedup import segment_dedup

    boiler = " ".join(f"b{i}" for i in range(10))  # one exact 10-token segment
    uniq1 = " ".join(f"u{i}" for i in range(10))
    uniq2 = " ".join(f"v{i}" for i in range(7))  # short trailing segment
    docs = _docs(
        spark,
        [
            (1, f"{boiler} {uniq1} {uniq2}"),  # 3 segments, 1st shared
            (2, boiler),                        # doc is ONLY the boilerplate
            (3, uniq1.replace("u", "w")),       # fully unique, untouched
        ],
    )
    out = {r["doc_id"]: r for r in segment_dedup(docs).collect()}
    assert len(out) == 3
    # shared segment dropped, survivors keep original order
    assert out[1]["clean_text"] == f"{uniq1} {uniq2}"
    assert out[1]["n_kept"] == 2 and out[1]["n_dropped"] == 1
    # a doc that was pure boilerplate still appears, emptied
    assert out[2]["clean_text"] == "" and out[2]["n_kept"] == 0
    assert out[2]["n_dropped"] == 1
    # unique doc passes through byte-identical
    assert out[3]["clean_text"] == uniq1.replace("u", "w")
    assert out[3]["n_dropped"] == 0


def test_segment_dedup_respects_doc_freq_cap(spark):
    from floatchat_datapipeline_spark.operators.dedup import segment_dedup

    seg = " ".join(f"s{i}" for i in range(10))
    docs = _docs(spark, [(1, seg), (2, seg), (3, seg)])
    # cap 3: segment appears in exactly 3 docs -> NOT above cap -> kept
    out = {
        r["doc_id"]: r for r in segment_dedup(docs, max_doc_freq=3).collect()
    }
    assert all(out[i]["n_dropped"] == 0 for i in (1, 2, 3))
    # default cap 1: all three copies dropped
    out = {r["doc_id"]: r for r in segment_dedup(docs).collect()}
    assert all(out[i]["clean_text"] == "" for i in (1, 2, 3))
