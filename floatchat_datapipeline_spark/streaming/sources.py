"""Streaming sources — file-arrival streams (reference S10, SURVEY.md §2.12).

The reference's incremental surface is an HTTP endpoint that spools each
upload to a file and processes it synchronously (fastapi_app.py:614-655).
The Spark-native equivalent is a file-arrival source on a landing
directory: every new file is discovered by the next micro-batch, the
extension gate (reference F11, :628-632) becomes `pathGlobFilter`, and
exactly-once bookkeeping comes from the source's checkpointed file log
instead of the reference's task-status dict.

``stream_table`` streams the driver's test parquet — the batch/stream
parity harness: the same operator expressions run over readStream and must
produce the batch answer under Trigger.AvailableNow.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from floatchat_datapipeline_spark.catalog import (
    ALL_TABLES,
    ensure_session_confs,
    normalize_event_time,
)


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """File-source stream over one test table's parquet. Schema comes from
    a batch peek (file streams require an explicit schema); the events
    TIMESTAMP(NANOS) → microsecond conversion mirrors catalog.load_table."""
    if name not in ALL_TABLES:
        raise KeyError(f"unknown table {name!r}")
    ensure_session_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema: StructType = spark.read.parquet(path).schema
    # File streams require a directory base path; select the one table
    # file out of the shared sf_dir with the glob gate.
    df = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )
    if name == "events":
        df = normalize_event_time(df, "ts")
    return df


def stream_landing(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    glob: str = "*.json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Landing-directory ingest stream (JSON lines per arriving file).
    `glob` is the extension gate; `max_files_per_trigger` bounds batch
    size the way the reference bounds per-request work."""
    reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(landing_dir)
