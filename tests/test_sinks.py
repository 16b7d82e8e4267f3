"""Sink semantics tests — upsert (K1), conflict-skip (K2), delete (K7).

Each mirrors the reference's ON CONFLICT behavior (db_handler.py:180-187,
:237-245) and additionally proves idempotency: replaying a batch leaves
the table unchanged, which is what lets streaming retries be safe.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from floatchat_datapipeline_spark.sinks.upsert import append_new, delete_keys, upsert


@pytest.fixture()
def tmp_table():
    d = tempfile.mkdtemp(prefix="sink-test-")
    yield f"{d}/t"
    shutil.rmtree(d, ignore_errors=True)


def _rows(spark, path):
    return {
        tuple(r) for r in spark.read.parquet(path).select("k", "v").collect()
    }


def test_upsert_new_wins(spark, tmp_table):
    df1 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    upsert(df1, tmp_table, ("k",))
    assert _rows(spark, tmp_table) == {("a", 1), ("b", 2)}
    df2 = spark.createDataFrame([("b", 20), ("c", 3)], "k string, v int")
    upsert(df2, tmp_table, ("k",))
    assert _rows(spark, tmp_table) == {("a", 1), ("b", 20), ("c", 3)}
    # idempotent replay
    upsert(df2, tmp_table, ("k",))
    assert _rows(spark, tmp_table) == {("a", 1), ("b", 20), ("c", 3)}


def test_append_new_existing_wins(spark, tmp_table):
    df1 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    append_new(df1, tmp_table, ("k",))
    df2 = spark.createDataFrame([("b", 99), ("c", 3)], "k string, v int")
    append_new(df2, tmp_table, ("k",))
    # b keeps its ORIGINAL value — DO NOTHING semantics
    assert _rows(spark, tmp_table) == {("a", 1), ("b", 2), ("c", 3)}
    append_new(df2, tmp_table, ("k",))
    assert _rows(spark, tmp_table) == {("a", 1), ("b", 2), ("c", 3)}


def test_delete_keys(spark, tmp_table):
    df1 = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "k string, v int"
    )
    upsert(df1, tmp_table, ("k",))
    bad = spark.createDataFrame([("b",)], "k string")
    delete_keys(spark, tmp_table, bad)
    assert _rows(spark, tmp_table) == {("a", 1), ("c", 3)}
    delete_keys(spark, tmp_table, bad)
    assert _rows(spark, tmp_table) == {("a", 1), ("c", 3)}


def test_export_jsonl_roundtrip(spark, tmp_table):
    from floatchat_datapipeline_spark.sinks.export import (
        collection_stats,
        export_jsonl,
    )

    df = spark.createDataFrame(
        [("a", "s1", True), ("b", "s1", False), ("c", "s2", True)],
        "id string, source string, has_temp boolean",
    )
    export_jsonl(df, tmp_table)
    back = spark.read.json(tmp_table)
    assert {tuple(r) for r in back.select("id", "source", "has_temp").collect()} == {
        ("a", "s1", True),
        ("b", "s1", False),
        ("c", "s2", True),
    }
    stats = {
        (r["source"], r["n_docs"], r["n_has_temp"])
        for r in collection_stats(df, flag_cols=("has_temp",)).collect()
    }
    assert stats == {("s1", 2, 1), ("s2", 1, 1)}


def test_crash_window_recovery(spark, tmp_table):
    """ADVICE r01: a crash between _swap_write's two renames leaves only
    <path>.old. _read_existing must recover from the backup so the next
    write merges against the last fully-published table."""
    import os

    df1 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    upsert(df1, tmp_table, ("k",))
    # Simulate the crash window: current renamed to backup, publish lost.
    os.rename(tmp_table, tmp_table + ".old")
    df2 = spark.createDataFrame([("b", 20), ("c", 3)], "k string, v int")
    upsert(df2, tmp_table, ("k",))
    # 'a' survived via the backup; publish cleaned the backup up.
    assert _rows(spark, tmp_table) == {("a", 1), ("b", 20), ("c", 3)}
    assert not os.path.exists(tmp_table + ".old")


def test_external_format_option_passthrough(spark, tmp_table):
    """S7/K3 seam: write_external/load_external pass format + options
    straight to the DataSource API. Parquet stands in for JDBC (the test
    container has no database); a JDBC deployment swaps fmt and options
    only."""
    from floatchat_datapipeline_spark.catalog import load_external
    from floatchat_datapipeline_spark.sinks.upsert import write_external

    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    write_external(df, "parquet", {"path": tmp_table}, mode="overwrite")
    back = load_external(spark, "parquet", {"path": tmp_table})
    assert {tuple(r) for r in back.select("k", "v").collect()} == {("a", 1), ("b", 2)}
    # append mode accumulates — the to_sql bulk-insert shape
    write_external(df, "parquet", {"path": tmp_table}, mode="append")
    assert load_external(spark, "parquet", {"path": tmp_table}).count() == 4


def test_compact_table_reduces_files_and_preserves_rows(spark, tmp_path):
    from floatchat_datapipeline_spark.sinks.upsert import compact_table

    path = str(tmp_path / "frag")
    # fragment: 20 files of 50 rows each
    spark.range(1000).withColumn("v", F.col("id") * 2).repartition(
        20
    ).write.parquet(path)
    import os

    n_before = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert n_before == 20
    n_out = compact_table(spark, path, target_file_bytes=1 << 30)
    assert n_out == 1
    n_after = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert n_after == 1
    out = spark.read.parquet(path)
    assert out.count() == 1000
    assert out.agg(F.sum("v")).first()[0] == 999 * 1000  # sum 2i, i<1000


def test_compact_table_cluster_sort_tightens_stats(spark, tmp_path):
    from floatchat_datapipeline_spark.sinks.upsert import compact_table

    path = str(tmp_path / "clust")
    spark.range(10000).withColumn(
        "k", (F.col("id") * 2654435761) % 10000  # scrambled order
    ).repartition(16).write.parquet(path)
    compact_table(spark, path, target_file_bytes=64 * 1024, sort_by=("k",))
    import os

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    assert len(files) > 1
    # range-partitioned + sorted: per-file k ranges must not overlap
    import pyarrow.parquet as pq

    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["k"])["k"].to_pylist()
        ranges.append((min(t), max(t)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (ranges,)


def test_compact_table_zorder_prunes_on_either_dimension(spark, tmp_path):
    """Z-order layout: after compact_table(zorder_by=(x, y)), a point
    predicate on EITHER column overlaps only a fraction of the files'
    min/max ranges — the file-skipping property. A plain sort_by=(x,)
    layout prunes on x but matches essentially every file for any y
    predicate, which is exactly what z-ordering exists to fix."""
    from floatchat_datapipeline_spark.sinks.upsert import compact_table
    import os
    import pyarrow.parquet as pq

    # a TRUE 64x64 grid — x and y independent (deriving both from
    # id % 64 would make them bijectively linked, i.e. 1-D data where
    # any sort bounds both dims and z-order proves nothing)
    base = (
        spark.range(4096)
        .withColumn("x", F.col("id") % 64)
        .withColumn("y", (F.col("id") / 64).cast("long") % 64)
    )

    def ranges(path):
        out = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(path, f), columns=["x", "y"])
            xs, ys = t["x"].to_pylist(), t["y"].to_pylist()
            out.append((min(xs), max(xs), min(ys), max(ys)))
        return out

    def match_frac(rngs, col, probes):
        """Mean fraction of files a point predicate on `col` overlaps."""
        lo, hi = (0, 1) if col == "x" else (2, 3)
        hits = [
            sum(1 for r in rngs if r[lo] <= p <= r[hi]) / len(rngs)
            for p in probes
        ]
        return sum(hits) / len(hits)

    probes = [0, 13, 27, 42, 56, 63]

    zpath = str(tmp_path / "zord")
    base.repartition(8).write.parquet(zpath)
    n = compact_table(
        spark, zpath, target_file_bytes=2 * 1024, zorder_by=("x", "y")
    )
    assert n >= 8  # enough files for pruning fractions to mean anything
    zr = ranges(zpath)
    # both dimensions prune: a point predicate reads well under the
    # whole table no matter which column it hits
    assert match_frac(zr, "x", probes) <= 0.6, zr
    assert match_frac(zr, "y", probes) <= 0.6, zr

    lpath = str(tmp_path / "lin")
    base.repartition(8).write.parquet(lpath)
    compact_table(spark, lpath, target_file_bytes=2 * 1024, sort_by=("x",))
    lr = ranges(lpath)
    # linear layout: x prunes hard, y reads ~every file
    assert match_frac(lr, "x", probes) <= 0.3, lr
    assert match_frac(lr, "y", probes) >= 0.9, lr
    # and z's worst dimension beats linear's worst dimension by 1.5x
    z_worst = max(match_frac(zr, c, probes) for c in ("x", "y"))
    l_worst = max(match_frac(lr, c, probes) for c in ("x", "y"))
    assert z_worst * 1.5 <= l_worst, (z_worst, l_worst)


def test_zorder_key_is_pure_expression(spark):
    """with_zorder_key's output key must be computable without any
    shuffle: the plan below the key projection is scan-only."""
    from floatchat_datapipeline_spark.functions.zorder import (
        with_zorder_key,
        zvalue,
        quantize,
    )

    df = spark.range(256).withColumn("a", F.col("id") % 16).withColumn(
        "b", F.col("id") % 7
    )
    keyed = with_zorder_key(df, ("a", "b"), bits=4)
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # interleave sanity: a=0b0101 lands on even bit positions (1,0,1,0
    # -> bits 0 and 4), b=0b0011 on odd positions (1,1,0,0 -> bits 1
    # and 3): z = 0b11011 = 27
    row = (
        spark.range(1)
        .select(
            zvalue([F.lit(0b0101), F.lit(0b0011)], bits=4).alias("z")
        )
        .first()
    )
    assert row["z"] == 0b11011, bin(row["z"])
