"""sinks/versioned.py — snapshot isolation, pointer atomicity contract,
time-travel reads, vacuum retention (K15 plumbing; the value-level gate
is the events_version_diff registry query)."""

from __future__ import annotations

import os

import pytest

from floatchat_datapipeline_spark.sinks.versioned import (
    latest_version,
    read_version,
    vacuum,
    versions,
    write_version,
)


@pytest.fixture()
def vpath(tmp_path):
    return str(tmp_path / "vtable")


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_write_read_roundtrip_and_versions(spark, vpath):
    assert latest_version(vpath) is None
    assert write_version(_df(spark, [(1, "a")]), vpath) == 1
    assert write_version(_df(spark, [(1, "a"), (2, "b")]), vpath) == 2
    assert versions(vpath) == [1, 2]
    assert latest_version(vpath) == 2
    assert read_version(spark, vpath).count() == 2
    assert read_version(spark, vpath, 1).count() == 1


def test_old_snapshot_is_immutable_under_new_writes(spark, vpath):
    write_version(_df(spark, [(1, "a")]), vpath)
    before = {tuple(r) for r in read_version(spark, vpath, 1).collect()}
    write_version(_df(spark, [(9, "z")]), vpath)
    after = {tuple(r) for r in read_version(spark, vpath, 1).collect()}
    assert before == after == {(1, "a")}


def test_pointer_fallback_and_missing_table(spark, vpath):
    with pytest.raises(FileNotFoundError):
        read_version(spark, vpath)
    write_version(_df(spark, [(1, "a")]), vpath)
    os.remove(os.path.join(vpath, "_LATEST"))
    # recovery: max staged dir stands in for the pointer
    assert latest_version(vpath) == 1
    assert read_version(spark, vpath).count() == 1


def test_vacuum_keeps_newest_and_latest(spark, vpath):
    for i in range(4):
        write_version(_df(spark, [(i, "x")]), vpath)
    removed = vacuum(vpath, keep=2)
    assert removed == [1, 2]
    assert versions(vpath) == [3, 4]
    assert read_version(spark, vpath).count() == 1
