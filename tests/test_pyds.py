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


# ---------------------------------------------------------------------------
# S13 — streaming variant (`erddap_stream`): per-arrival micro-batches with
# checkpointed offsets; new files picked up across separate runs.
# ---------------------------------------------------------------------------


def _write_file(d, i, rows):
    import os
    p = os.path.join(d, f"arrival_{i:04d}.csv")
    with open(p, "w") as fh:
        fh.write("float_id,temp,level\n")
        for r in rows:
            fh.write(",".join(r) + "\n")


def _run_stream(spark, landing, ckpt, out_dir):
    from floatchat_datapipeline_spark.sources.pyds import (
        ErddapStreamDataSource,
    )

    spark.dataSource.register(ErddapStreamDataSource)
    sdf = (
        spark.readStream.format("erddap_stream")
        .option("path", landing)
        .option("ddl", DDL)
        .load()
    )
    # The memory sink cannot recover from a checkpoint; the parquet sink
    # can — and an exactly-once file sink IS the production shape.
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def test_stream_picks_up_new_files_across_runs(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    import os
    os.makedirs(landing)

    _write_file(landing, 0, [("f1", "10.5", "1"), ("f1", "11.0", "2")])
    _write_file(landing, 1, [("f2", "20.25", "3")])
    out1 = _run_stream(spark, landing, ckpt, out_dir)
    assert out1.count() == 3

    # A new arrival between runs is exactly the /upload pattern: the
    # checkpointed offset resumes past the first two files — the sink
    # grows by ONLY the new file's rows (no reprocessing).
    _write_file(landing, 2, [("f3", "30.0", "4")])
    out2 = _run_stream(spark, landing, ckpt, out_dir)
    got = {tuple(r) for r in out2.collect()}
    assert got == {
        ("f1", 10.5, 1),
        ("f1", 11.0, 2),
        ("f2", 20.25, 3),
        ("f3", 30.0, 4),
    }


def test_stream_survives_idle_trigger(spark, tmp_path):
    """A trigger with NO new files (end offset == start offset) must be
    a no-op, not a stream kill: Spark's simple-reader wrapper validates
    idle batches by calling next() on the returned rows
    (datasource_internal.add_result_to_cache), so read() must return an
    ITERATOR — a bare list raised TypeError and terminated the query on
    its first quiet poll (found by tools/degenerate_sweep.py)."""
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    import os

    os.makedirs(landing)
    _write_file(landing, 0, [("f1", "10.5", "1")])
    assert _run_stream(spark, landing, ckpt, out_dir).count() == 1
    # No new arrival: the second run's only trigger is idle.
    assert _run_stream(spark, landing, ckpt, out_dir).count() == 1

    # Contract pin: read() hands back an iterator (picklable for the
    # prefetch cache), even when there is nothing to read.
    from pyspark.sql.types import StructType

    from floatchat_datapipeline_spark.sources.pyds import (
        ErddapStreamReader,
    )

    rdr = ErddapStreamReader(
        StructType.fromDDL(DDL),
        {"path": str(tmp_path / "empty"), "ddl": DDL},
    )
    rows, end = rdr.read({"n": 0})
    assert hasattr(rows, "__next__")
    assert end == {"n": 0}
    assert list(rows) == []
    # The executor replay path (cache miss / checkpoint recovery) has
    # the same iterator contract (DATA_SOURCE_INVALID_RETURN_TYPE on a
    # bare list) — an idle batch is never cached, so it ALWAYS replays.
    replay = rdr.readBetweenOffsets({"n": 0}, {"n": 0})
    assert hasattr(replay, "__next__")
    assert list(replay) == []


# ---------------------------------------------------------------------------
# K10 — write side (`erddap_report`): per-task part files made visible
# all-or-nothing by the driver-side commit (manifest + _SUCCESS).
# ---------------------------------------------------------------------------


def test_report_writer_commit_protocol(spark, tmp_path):
    import os
    from floatchat_datapipeline_spark.sources.pyds import (
        ErddapReportDataSource,
    )

    spark.dataSource.register(ErddapReportDataSource)
    out = str(tmp_path / "report")
    df = spark.createDataFrame(
        [("f1", 10.5), ("f2", None), ("f3", 30.0)], "float_id string, temp double"
    ).repartition(2)
    df.write.format("erddap_report").option("path", out).mode("append").save()

    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    manifest = open(os.path.join(out, "_MANIFEST.txt")).read().strip().splitlines()
    assert manifest[-1] == "TOTAL\t3"
    parts = [ln.split("\t")[0] for ln in manifest[:-1]]
    # every listed part exists and together they carry all rows
    rows = []
    for p in parts:
        with open(os.path.join(out, p)) as fh:
            lines = fh.read().strip().splitlines()
        assert lines[0] == "float_id,temp"
        rows += lines[1:]
    assert len(rows) == 3
    assert any(r.startswith("f2,") for r in rows)  # NULL renders as empty
