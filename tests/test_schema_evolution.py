"""Schema evolution (S17): additive parquet widening, both read paths,
and the scan properties that must survive merging (pruning, pushdown)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from floatchat_datapipeline_spark.plans.checks import (
    plan_string,
    pushed_filters,
    scan_read_schema,
)
from floatchat_datapipeline_spark.sources.evolution import (
    append_evolved,
    evolved_schema,
    read_evolving,
    read_pinned,
)


def _build_evolving_dir(spark, tmp_path):
    path = os.path.join(str(tmp_path), "evolving")
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], ["id", "name"]
    )
    append_evolved(v1, path)
    v2 = spark.createDataFrame(
        [(3, "c", 9.5), (4, "d", 7.25)], ["id", "name", "score"]
    )
    append_evolved(v2, path)
    return path


def test_merge_schema_unions_and_null_fills(spark, tmp_path):
    path = _build_evolving_dir(spark, tmp_path)
    df = read_evolving(spark, path)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score is None and rows[2].score is None
    assert rows[3].score == 9.5 and rows[4].score == 7.25


def test_pinned_schema_read_skips_discovery_and_matches(spark, tmp_path):
    path = _build_evolving_dir(spark, tmp_path)
    schema = evolved_schema(spark, path)
    df = read_pinned(spark, path, schema)
    assert set(df.columns) == {"id", "name", "score"}
    assert df.count() == 4
    # old-part rows NULL-fill the late column under the pinned schema too
    assert df.filter(F.col("score").isNull()).count() == 2


def test_evolved_scan_keeps_pruning_and_pushdown(spark, tmp_path):
    """Merging schemas must not widen reads or strip pushdown: a
    2-column projection reads 2 columns, and a filter on the LATE column
    still reaches PushedFilters."""
    path = _build_evolving_dir(spark, tmp_path)
    df = read_evolving(spark, path)
    pruned = df.select("id", "score")
    assert set(scan_read_schema(pruned)) == {"id", "score"}
    filtered = df.filter(F.col("score") > 8).select("id")
    assert "GreaterThan(score" in pushed_filters(filtered)


def test_subset_append_after_widening(spark, tmp_path):
    """A late part may also LACK the widened column (an old writer still
    running) — reads keep working, NULL-filling it."""
    path = _build_evolving_dir(spark, tmp_path)
    old_writer = spark.createDataFrame([(5, "e")], ["id", "name"])
    append_evolved(old_writer, path)
    df = read_evolving(spark, path)
    assert df.count() == 5
    assert df.filter(F.col("id") == 5).first().score is None


def test_pinned_read_has_no_merge_in_plan(spark, tmp_path):
    path = _build_evolving_dir(spark, tmp_path)
    schema = evolved_schema(spark, path)
    plan = plan_string(read_pinned(spark, path, schema).select("id"))
    # pinned read is a plain parquet scan of the requested columns
    assert "Scan parquet" in plan
    assert set(scan_read_schema(read_pinned(spark, path, schema).select("id"))) == {"id"}
