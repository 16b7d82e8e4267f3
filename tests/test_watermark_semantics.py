"""Late-data semantics — the behavior watermarks exist for.

Two checkpointed AvailableNow runs over the same source dir: run 1
establishes the watermark (persisted in the checkpoint's offset log);
run 2 delivers one event OLDER than the watermark — which must be
dropped, its window having been finalized — and one fresh event. Append
mode emits a window only once the watermark passes its end, so emitted
rows are exactly the on-time aggregates.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string

SCHEMA = "ts timestamp, v double"


def _run(spark, src, ckpt, out):
    """One AvailableNow run into a parquet sink (file sinks support
    checkpoint recovery; the memory sink does not)."""
    stream = spark.readStream.schema(_parse_datatype_string(SCHEMA)).json(src)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.sum("v").alias("total"))
        .select(F.col("window.start").alias("h"), "total")
    )
    query = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    df = spark.read.parquet(out)
    return {r["h"].strftime("%H:%M"): r["total"] for r in df.collect()}


def test_late_event_dropped_fresh_event_counted(spark):
    root = tempfile.mkdtemp(prefix="wm-test-")
    src, ckpt, out = (os.path.join(root, d) for d in ("src", "ckpt", "out"))
    os.makedirs(src)
    try:
        # run 1: [10:00) gets 2 events; max ts 11:59 → watermark 10:59
        with open(os.path.join(src, "b0.json"), "w") as f:
            f.write(
                "\n".join(
                    json.dumps(r)
                    for r in (
                        {"ts": "2024-01-01 10:05:00", "v": 1.0},
                        {"ts": "2024-01-01 10:10:00", "v": 2.0},
                        {"ts": "2024-01-01 11:59:00", "v": 4.0},
                    )
                )
            )
        rows1 = _run(spark, src, ckpt, out)
        # nothing finalized yet: [10:00) ends at 11:00 > watermark 10:59
        assert rows1 == {}, rows1

        # run 2: 08:30 is below the persisted 10:59 watermark → dropped;
        # 12:30 is fresh; 13:59 advances the watermark to 12:59
        with open(os.path.join(src, "b1.json"), "w") as f:
            f.write(
                "\n".join(
                    json.dumps(r)
                    for r in (
                        {"ts": "2024-01-01 08:30:00", "v": 100.0},
                        {"ts": "2024-01-01 12:30:00", "v": 8.0},
                        {"ts": "2024-01-01 13:59:00", "v": 16.0},
                    )
                )
            )
        rows2 = _run(spark, src, ckpt, out)
        # finalized now: [10:00) WITHOUT the late 100.0, and [11:00).
        # [12:00) stays open (ends 13:00 > watermark 12:59); the late
        # 08:00 window must never appear.
        assert rows2 == {"10:00": 3.0, "11:00": 4.0}, rows2
    finally:
        shutil.rmtree(root, ignore_errors=True)


JOIN_SCHEMA = "u long, id long, t string, ts timestamp, v double"


def _run_join(spark, src, ckpt, out):
    from floatchat_datapipeline_spark.streaming.windows import (
        interval_join_stream,
    )

    stream = spark.readStream.schema(
        _parse_datatype_string(JOIN_SCHEMA)
    ).json(src)
    joined = interval_join_stream(
        stream.filter(F.col("t") == "error"),
        stream.filter(F.col("t") == "click"),
        on="u",
        window_seconds=600,
        id_col="id",
        ts_col="ts",
        value_col="v",
    )
    query = (
        joined.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return {
        (r["probe_id"], r["match_id"])
        for r in spark.read.parquet(out).collect()
    }


def test_stream_join_drops_build_rows_below_watermark(spark):
    """Cross-checkpoint late-data semantics for the stream-stream
    interval join: a build-side row arriving BELOW the persisted
    watermark must not resurrect a pair with an already-passed probe
    row; fresh rows on both sides still pair."""
    root = tempfile.mkdtemp(prefix="wmj-test-")
    src, ckpt, out = (os.path.join(root, d) for d in ("src", "ckpt", "out"))
    os.makedirs(src)
    try:
        # run 1: pairs (1,2) and (3,4); max ts 14:00 → watermark 13:00
        with open(os.path.join(src, "b0.json"), "w") as f:
            f.write(
                "\n".join(
                    json.dumps(r)
                    for r in (
                        {"u": 1, "id": 1, "t": "error", "ts": "2024-01-01 10:00:00", "v": 0.0},
                        {"u": 1, "id": 2, "t": "click", "ts": "2024-01-01 10:05:00", "v": 1.0},
                        {"u": 9, "id": 3, "t": "error", "ts": "2024-01-01 14:00:00", "v": 0.0},
                        {"u": 9, "id": 4, "t": "click", "ts": "2024-01-01 14:00:00", "v": 2.0},
                    )
                )
            )
        pairs1 = _run_join(spark, src, ckpt, out)
        assert pairs1 == {(1, 2), (3, 4)}, pairs1

        # run 2: click id=5 @10:06 is below the persisted 13:00 watermark
        # → dropped at input, must NOT pair with error id=1; the fresh
        # (6,7) pair at 14:05/14:07 must emit.
        with open(os.path.join(src, "b1.json"), "w") as f:
            f.write(
                "\n".join(
                    json.dumps(r)
                    for r in (
                        {"u": 1, "id": 5, "t": "click", "ts": "2024-01-01 10:06:00", "v": 9.0},
                        {"u": 2, "id": 6, "t": "error", "ts": "2024-01-01 14:05:00", "v": 0.0},
                        {"u": 2, "id": 7, "t": "click", "ts": "2024-01-01 14:07:00", "v": 3.0},
                    )
                )
            )
        pairs2 = _run_join(spark, src, ckpt, out)
        assert (1, 5) not in pairs2, pairs2
        assert pairs2 == {(1, 2), (3, 4), (6, 7)}, pairs2
    finally:
        shutil.rmtree(root, ignore_errors=True)
