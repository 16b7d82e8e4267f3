"""Scale-pattern tests: salted aggregation equivalence, bucketed
co-located joins (shuffle-free), rebalance no-op on wide inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.catalog import load_table
from floatchat_datapipeline_spark.plans.checks import plan_string
from floatchat_datapipeline_spark.plans.scale import rebalance
from floatchat_datapipeline_spark.plans.skew import salted_agg


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = salted_agg(
        ev,
        ["user_id"],
        {
            "n": ("count", "event_id"),
            "vmax": ("max", "value"),
            "vmin": ("min", "value"),
        },
    )
    want = ev.groupBy("user_id").agg(
        F.count("event_id").alias("n"),
        F.max("value").alias("vmax"),
        F.min("value").alias("vmin"),
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_salted_agg_rejects_non_algebraic():
    with pytest.raises(ValueError):
        salted_agg(None, ["k"], {"bad": ("avg", "x")})


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Bucketing both sides of a join on its key removes the shuffle —
    the co-location strategy for repeated big-big joins at scale."""
    import shutil

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # in-memory catalog forgets tables between sessions; clear stale dirs
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_lineitem")
    # force the sort-merge path: a broadcast join would hide the point
    # (its BroadcastExchange isn't the shuffle bucketing removes)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = plan_string(joined, mode="simple")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    want = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert n == want


def test_rebalance_noop_on_wide_input(spark):
    df = spark.range(0, 10000, 1, 64)
    assert rebalance(df) is df


def test_rebalance_noop_on_multi_split_file_scan(spark, tmp_path):
    """VERDICT r01 #7: on a file scan wider than the target, rebalance
    must return the SAME DataFrame (no repartition) using only file
    metadata — no RDD materialization."""
    path = str(tmp_path / "wide")
    spark.range(0, 200_000).selectExpr(
        "id", "repeat(uuid(), 8) AS pad"
    ).repartition(64).write.parquet(path)
    df = spark.read.parquet(path)
    assert rebalance(df, target=4) is df


def test_rebalance_repartitions_narrow_file_scan(spark, tmp_path):
    path = str(tmp_path / "narrow")
    spark.range(0, 100).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    out = rebalance(df, target=8)
    assert out is not df
    assert "Repartition" in out._jdf.queryExecution().optimizedPlan().toString()
