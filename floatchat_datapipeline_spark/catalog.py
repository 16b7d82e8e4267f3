"""Table catalog over the parquet lakehouse test tables.

``load_table`` is the single scan entry point — every query plan starts
here, so predicate pushdown and column pruning reach the parquet reader
through one choke point. At cluster scale the same function would resolve
to a real catalog (Hive/Glue/Unity) table; the parquet-directory layout is
the local stand-in.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)
EXTRA_TABLES = ("events", "documents", "embeddings")
ALL_TABLES = TPCH_TABLES + EXTRA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_session_confs(spark: SparkSession) -> None:
    """Apply runtime-settable SQL confs the lakehouse tables need.

    The driver (and any embedding application) may hand us a vanilla
    SparkSession built without our session factory, so confs that gate a
    *read* must be set at the scan choke point, not only in session.py.
    ``spark.sql.legacy.parquet.nanosAsLong`` is runtime-settable and lets
    a TIMESTAMP(NANOS) column in events.parquet read as long nanos;
    ``inferTimestampNTZ.enabled=false`` makes a no-timezone
    ``timestamp[us]`` parquet column read as TIMESTAMP (session-tz UTC)
    instead of TIMESTAMP_NTZ, so event-time operators (watermarks,
    unix_micros, long casts) work without per-consumer special-casing.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP regardless of how the
    parquet writer encoded it. Type-driven, not writer-enumerated — the
    driver's events.parquet has shipped as TIMESTAMP(NANOS) (read as long
    nanos under nanosAsLong), as no-tz ``timestamp[us]`` (read as
    TIMESTAMP_NTZ under Spark 4 defaults), and as plain TIMESTAMP; all
    three normalize here. The session timezone is pinned UTC (session.py),
    so NTZ→TIMESTAMP is a pure metadata re-tag, and nano values are
    microsecond-aligned so the `div 1000` truncation is lossless.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        # `div` = integer division: double division would round 19-digit
        # nano values (> 2^53) and corrupt the microsecond component.
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    elif isinstance(dt, TimestampNTZType):
        df = df.withColumn(col, F.col(col).cast(TimestampType()))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test table. Lazy — filters/projections placed on the result
    are pushed into the parquet scan by Catalyst."""
    if name not in ALL_TABLES:
        raise KeyError(f"unknown table {name!r}; known: {ALL_TABLES}")
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_time(df, "ts")
    return df


def load_external(
    spark: SparkSession,
    fmt: str,
    options: dict[str, str] | None = None,
    schema=None,
) -> DataFrame:
    """External-source scan seam (reference S7 — ingest/db_handler.py
    pd.read_sql scans; sync_supabase_to_chromadb.py:87-115).

    Thin format/option passthrough: ``load_external(spark, "jdbc",
    {"url": ..., "dbtable": ..., "partitionColumn": ..., "lowerBound":
    ..., "upperBound": ..., "numPartitions": ...})`` gives a parallel
    JDBC scan with predicate pushdown; any other DataSource V2 format
    rides the same call. Tested with a parquet fake (no DB in the test
    container)."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    return reader.load()


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql() plans."""
    for name in ALL_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
