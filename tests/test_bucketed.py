"""Bucketed-table plan pins: the write-time shuffle must buy back the
query-time Exchange (the whole point of sinks/bucketed.py at 100 TB)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.catalog import load_table
from floatchat_datapipeline_spark.plans.checks import plan_string
from floatchat_datapipeline_spark.sinks.bucketed import (
    read_bucketed,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge joins so the test observes Exchange elision, not
    broadcasting (small test tables would otherwise all broadcast)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_elides_both_exchanges(
    spark, sf_dir, tmp_path, no_broadcast
):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(
        orders, "b_orders", ("o_orderkey",), 4, path=str(tmp_path / "bo")
    )
    write_bucketed(
        lineitem, "b_lineitem", ("l_orderkey",), 4, path=str(tmp_path / "bl")
    )
    joined = read_bucketed(spark, "b_orders").join(
        read_bucketed(spark, "b_lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    plan = plan_string(joined)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    # and the answer is still the plain join's answer
    expected = orders.join(
        lineitem, F.col("o_orderkey") == F.col("l_orderkey")
    ).count()
    assert joined.count() == expected
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_aggregation_elides_exchange(
    spark, sf_dir, tmp_path, no_broadcast
):
    """groupBy on the bucket key also reuses the write-time layout."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(
        lineitem, "b_li_agg", ("l_orderkey",), 4, path=str(tmp_path / "bla")
    )
    agg = (
        read_bucketed(spark, "b_li_agg")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert "Exchange" not in plan_string(agg), plan_string(agg)
    assert agg.count() == lineitem.select("l_orderkey").distinct().count()
    spark.sql("DROP TABLE IF EXISTS b_li_agg")


def test_ensure_bucketed_recovers_from_orphaned_location(spark, sf_dir):
    """A fresh session's in-memory catalog forgets managed tables while
    their warehouse directories survive; ensure_bucketed_order_tables
    must clear the orphaned location and rebuild instead of dying on
    LOCATION_ALREADY_EXISTS."""
    import os

    from floatchat_datapipeline_spark.sinks.bucketed import (
        ensure_bucketed_order_tables,
    )

    lt, ot = ensure_bucketed_order_tables(spark, sf_dir)
    # memoized fast path: same names, no rewrite
    assert (lt, ot) == ensure_bucketed_order_tables(spark, sf_dir)
    # simulate the orphan: drop from the catalog (managed drop removes
    # the dir), then recreate a non-empty location with no table behind it
    spark.sql(f"DROP TABLE {lt}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    loc = os.path.join(warehouse, lt)
    os.makedirs(loc, exist_ok=True)
    # realistic orphan: Spark table-output shaped (part-* + _SUCCESS)
    with open(os.path.join(loc, "part-00000-dead.parquet"), "w") as f:
        f.write("junk")
    open(os.path.join(loc, "_SUCCESS"), "w").close()
    lt2, ot2 = ensure_bucketed_order_tables(spark, sf_dir)
    assert (lt2, ot2) == (lt, ot)
    assert spark.catalog.tableExists(lt2)
    assert spark.table(lt2).count() > 0


def test_ensure_bucketed_never_deletes_unrelated_directory(spark, sf_dir):
    """ADVICE r6: the stale-layout rmtree must NOT delete a directory at
    the expected path that does not look like Spark table output — fail
    loudly (LOCATION_ALREADY_EXISTS) and leave the user's files alone."""
    import os

    import pytest

    from floatchat_datapipeline_spark.sinks.bucketed import (
        ensure_bucketed_order_tables,
    )

    lt, ot = ensure_bucketed_order_tables(spark, sf_dir)
    spark.sql(f"DROP TABLE {lt}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    loc = os.path.join(warehouse, lt)
    os.makedirs(loc, exist_ok=True)
    keep = os.path.join(loc, "important-notes.txt")
    with open(keep, "w") as f:
        f.write("not yours")
    with pytest.raises(Exception):
        ensure_bucketed_order_tables(spark, sf_dir)
    assert os.path.exists(keep)
    # clean up so later tests can rebuild
    os.remove(keep)
    os.rmdir(loc)
    lt2, _ = ensure_bucketed_order_tables(spark, sf_dir)
    assert spark.catalog.tableExists(lt2)


def test_bucketed_tag_distinguishes_same_basename_dirs(tmp_path):
    """Two sf_dirs sharing a basename must map to different table tags
    (ADVICE r6: /a/sf1 and /b/sf1 previously collided on the memo)."""
    from floatchat_datapipeline_spark.sinks.bucketed import _layout_tag

    a = str(tmp_path / "a" / "sf1")
    b = str(tmp_path / "b" / "sf1")
    assert _layout_tag(a) != _layout_tag(b)
    # stable for the same dir (trailing slash / relative form included)
    assert _layout_tag(a) == _layout_tag(a + "/")


def test_parquet_table_guard_classifies_residue(tmp_path):
    """ADVICE r8: residue of a crashed write — an empty dir or one
    holding ONLY _started/_committed/.crc sidecars — must be deletable
    (self-heal), while foreign files or dotfiles-only dirs stay
    protected."""
    import os

    from floatchat_datapipeline_spark.sinks.bucketed import (
        _looks_like_parquet_table,
    )

    def mk(name, files):
        d = tmp_path / name
        os.makedirs(d)
        for f in files:
            (d / f).write_text("x")
        return str(d)

    assert _looks_like_parquet_table(mk("empty", []))
    assert _looks_like_parquet_table(
        mk("residue", ["_started_123", "_committed_123", ".part-0.crc"])
    )
    assert _looks_like_parquet_table(
        mk("table", ["part-00000.parquet", "_SUCCESS", "._SUCCESS.crc"])
    )
    assert not _looks_like_parquet_table(mk("foreign", ["notes.txt"]))
    assert not _looks_like_parquet_table(
        mk("mixed", ["part-00000.parquet", "notes.txt"])
    )
    assert not _looks_like_parquet_table(mk("dotonly", [".gitkeep"]))
    # dotfiles alongside a real table are fine
    assert _looks_like_parquet_table(
        mk("table_dot", ["part-0.parquet", ".DS_Store"])
    )
