"""Regression: event-time normalization must be type-driven, not
writer-enumerated. The driver's events.parquet has shipped with ts as
TIMESTAMP(NANOS) (round ≤3) and as no-tz timestamp[us] → TIMESTAMP_NTZ
under Spark 4 defaults (round 4, which broke 9/82 queries and crashed the
bench). Write the same rows in every flavor and assert the catalog + the
epoch helpers produce identical values for each."""

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from floatchat_datapipeline_spark import catalog
from floatchat_datapipeline_spark.functions.eventtime import (
    epoch_micros,
    epoch_seconds,
    long_div,
)
from floatchat_datapipeline_spark.operators.windows import sessionize

ROWS = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 1, 500000), 10, "click", 1.0, "{}"),
    (2, datetime.datetime(2024, 1, 1, 0, 40, 2, 250000), 10, "view", 2.0, "{}"),
    (3, datetime.datetime(2024, 1, 1, 1, 59, 3, 0), 11, "click", 3.0, "{}"),
]
COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _write_flavor(dirpath: str, flavor: str) -> None:
    ts_us = [int(r[1].replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6) for r in ROWS]
    if flavor == "ntz_us":
        ts_arr = pa.array(ts_us, pa.timestamp("us"))
    elif flavor == "utc_us":
        ts_arr = pa.array(ts_us, pa.timestamp("us", tz="UTC"))
    elif flavor == "nanos":
        ts_arr = pa.array([t * 1000 for t in ts_us], pa.timestamp("ns"))
    else:
        raise ValueError(flavor)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS], pa.string()),
        }
    )
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(table, os.path.join(dirpath, "events.parquet"))


@pytest.mark.parametrize("flavor", ["ntz_us", "utc_us", "nanos"])
def test_load_table_normalizes_every_flavor(spark, tmp_path, flavor):
    sf_dir = str(tmp_path / flavor)
    _write_flavor(sf_dir, flavor)
    df = catalog.load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    micros = [r[0] for r in df.select(epoch_micros("ts")).orderBy("ts").collect()]
    assert micros == [1704067201500000, 1704069602250000, 1704074343000000]
    # downstream event-time consumers run clean on every flavor
    assert sessionize(df).count() == 3


def test_epoch_helpers_accept_ntz(spark, tmp_path):
    """Even if a frame bypasses the catalog choke point and arrives NTZ,
    the epoch helpers must not raise (the round-4 bench-crash mode)."""
    sf_dir = str(tmp_path / "raw")
    _write_flavor(sf_dir, "ntz_us")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        assert isinstance(raw.schema["ts"].dataType, TimestampNTZType)
        got = raw.select(
            epoch_seconds("ts").alias("s"),
            long_div(epoch_micros("ts"), 3_600_000_000).alias("h"),
        ).orderBy("s").collect()
        assert [r["s"] for r in got] == [1704067201, 1704069602, 1704074343]
        assert [r["h"] for r in got] == [473352, 473352, 473353]
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def test_stream_table_normalizes_ntz(spark, tmp_path):
    from floatchat_datapipeline_spark.streaming.sources import stream_table

    sf_dir = str(tmp_path / "stream_ntz")
    _write_flavor(sf_dir, "ntz_us")
    sdf = stream_table(spark, sf_dir, "events")
    assert isinstance(sdf.schema["ts"].dataType, TimestampType)
    # withWatermark requires TIMESTAMP — this raised on NTZ in round 4
    sdf.withWatermark("ts", "10 minutes")
