"""S18 — interchange formats: ORC/CSV/JSON round trips at microsecond
timestamp precision, pinned-schema text reads, dynamic partition
overwrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.catalog import load_table
from floatchat_datapipeline_spark.sources.formats import (
    dynamic_partition_overwrite,
    read_table,
    write_table,
)


def _events_sample(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
        .limit(200)
    )


@pytest.mark.parametrize("fmt", ["orc", "csv", "json"])
def test_roundtrip_preserves_rows_and_micros(spark, sf_dir, tmp_path, fmt):
    df = _events_sample(spark, sf_dir)
    path = str(tmp_path / fmt)
    write_table(df, path, fmt)
    back = read_table(
        spark,
        path,
        fmt,
        schema=None if fmt == "orc" else df.schema,
    )
    assert back.schema == df.schema
    a = df.orderBy("event_id").collect()
    b = back.orderBy("event_id").collect()
    assert a == b  # includes microsecond-exact ts equality


def test_text_reads_require_pinned_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path), "csv")
    with pytest.raises(ValueError, match="unsupported"):
        write_table(None, str(tmp_path), "avro")


def test_dynamic_partition_overwrite_replaces_only_touched_days(
    spark, tmp_path
):
    path = str(tmp_path / "part")
    base = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 3)],
        "day: string, v: int",
    )
    write_table(base, path, partition_by=("day",))
    # overwrite ONLY day 2 with a new row set
    delta = spark.createDataFrame(
        [("2024-01-02", 99)], "day: string, v: int"
    )
    dynamic_partition_overwrite(delta, path, ("day",))
    # partition-column type inference reads 'day' back as DATE — compare
    # through str() (the partition VALUE layout is what's under test)
    got = sorted(
        (str(r["day"]), r["v"]) for r in spark.read.parquet(path).collect()
    )
    assert got == [("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 99)]
    # conf restored (scoped): session default back to static/unset
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
        .upper()
        == "STATIC"
    )
