"""S12 — custom Python DataSource (`erddap_staged`): registration, schema
contract, one-partition-per-staged-file planning, typed decode, empty
scrape. The per-file partitioning is the scale property: the reference's
300-file scrape becomes 300 parallel read tasks with no driver loop."""

from __future__ import annotations

import os

import pytest

from floatchat_datapipeline_spark.sources.pyds import ErddapStagedDataSource


@pytest.fixture(scope="module")
def staged_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("erddap_staged")
    for i, rows in enumerate(
        [
            [("f1", "10.5", "1"), ("f1", "11.0", "2")],
            [("f2", "20.25", "3")],
            [("f3", "", "4")],  # missing temp → NULL
        ]
    ):
        with open(d / f"float_{i}.csv", "w") as fh:
            fh.write("float_id,temp,level\n")
            for r in rows:
                fh.write(",".join(r) + "\n")
    return str(d)


DDL = "float_id string, temp double, level bigint"


def _read(spark, path):
    spark.dataSource.register(ErddapStagedDataSource)
    return (
        spark.read.format("erddap_staged")
        .option("path", path)
        .option("ddl", DDL)
        .load()
    )


def test_reads_all_files_with_types(spark, staged_dir):
    df = _read(spark, staged_dir)
    rows = {tuple(r) for r in df.collect()}
    assert ("f1", 10.5, 1) in rows
    assert ("f2", 20.25, 3) in rows
    assert ("f3", None, 4) in rows
    assert len(rows) == 4
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "double", "bigint",
    ]


def test_one_partition_per_staged_file(spark, staged_dir):
    df = _read(spark, staged_dir)
    assert df.rdd.getNumPartitions() == 3


def test_empty_scrape_is_valid_empty_frame(spark, tmp_path):
    df = _read(spark, str(tmp_path))
    assert df.count() == 0
    assert df.columns == ["float_id", "temp", "level"]


def test_filters_compose_on_top(spark, staged_dir):
    from pyspark.sql import functions as F

    df = _read(spark, staged_dir).filter(F.col("temp") > 15)
    assert [r["float_id"] for r in df.collect()] == ["f2"]


def test_missing_ddl_errors(spark, staged_dir):
    spark.dataSource.register(ErddapStagedDataSource)
    with pytest.raises(Exception, match="ddl"):
        (
            spark.read.format("erddap_staged")
            .option("path", staged_dir)
            .load()
            .collect()
        )
