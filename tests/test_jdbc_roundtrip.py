"""JDBC round-trip for the external source/sink seams (reference S7/K3).

The reference syncs rows between Postgres/Supabase and its vector store
(sync_supabase_to_chromadb.py:87-115 reads via SQL with pushed-down
predicates; ingest/db_handler.py:258-284 bulk-inserts with to_sql).
Our seams are `load_external` (catalog.py) and `write_external`
(sinks/upsert.py) — thin format/option passthroughs to Spark's JDBC
DataSource, which at cluster scale gives parallel partitioned scans and
per-executor batched inserts against a real database.

The sandbox has no network database, but Spark ships Apache Derby (its
Hive-metastore backend) in its own jars, so an embedded on-disk Derby
database exercises the REAL JDBC code path end-to-end: driver loading,
option passthrough, type mapping, mode semantics, partitioned reads, and
predicate pushdown into the remote scan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.catalog import load_external, load_table
from floatchat_datapipeline_spark.plans.checks import plan_string
from floatchat_datapipeline_spark.sinks.upsert import write_external

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    home = tmp_path_factory.mktemp("derby")
    # derby.log / database files land under derby.system.home; set it
    # before the engine boots (first connection) so the repo stays clean.
    spark.sparkContext._jvm.System.setProperty(
        "derby.system.home", str(home)
    )
    return "jdbc:derby:testdb;create=true"


def _options(url: str, table: str) -> dict[str, str]:
    return {"url": url, "dbtable": table, "driver": DERBY_DRIVER}


def test_jdbc_write_read_roundtrip(spark, sf_dir, derby_url):
    src = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
        .limit(200)
    )
    write_external(
        src, "jdbc", _options(derby_url, "customers"), mode="overwrite"
    )
    back = load_external(spark, "jdbc", _options(derby_url, "customers"))
    assert back.count() == src.count()
    # Spark's JDBC writer quotes identifiers, so Derby preserves the
    # lowercase column names on the round trip.
    a = {r["c_custkey"]: r["c_name"] for r in src.collect()}
    b = {r["c_custkey"]: r["c_name"] for r in back.collect()}
    assert a == b


def test_jdbc_append_mode(spark, derby_url):
    df = spark.range(10).select(F.col("id").alias("k"))
    write_external(df, "jdbc", _options(derby_url, "appendt"), mode="overwrite")
    write_external(df, "jdbc", _options(derby_url, "appendt"), mode="append")
    back = load_external(spark, "jdbc", _options(derby_url, "appendt"))
    assert back.count() == 20


def test_jdbc_predicate_pushdown(spark, derby_url):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_external(df, "jdbc", _options(derby_url, "pushd"), mode="overwrite")
    scan = load_external(spark, "jdbc", _options(derby_url, "pushd"))
    filtered = scan.filter(F.col("k") > 90).select("k")
    plan = plan_string(filtered)
    # The predicate must reach the remote scan (PushedFilters on the
    # JDBCRelation node), not run as a post-scan Spark filter only.
    assert "PushedFilters:" in plan and "GreaterThan(k,90" in plan, plan
    assert filtered.count() == 9


def test_jdbc_partitioned_parallel_read(spark, derby_url):
    df = spark.range(1000).select(F.col("id").alias("k"))
    write_external(df, "jdbc", _options(derby_url, "part"), mode="overwrite")
    opts = _options(derby_url, "part") | {
        "partitionColumn": "k",
        "lowerBound": "0",
        "upperBound": "1000",
        "numPartitions": "4",
    }
    back = load_external(spark, "jdbc", opts)
    # The scan itself must be split into 4 range-partitioned JDBC queries
    # (what makes a 100 TB table scan parallel across executors).
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
