"""Streaming ingest job — landing dir → cleaned, keyed table (K1 + S10).

The Spark replacement for the reference's per-upload synchronous pipeline
(fastapi_app.py:614-778): files land in a directory, each micro-batch
cleans the new rows and MERGEs them into the target table keyed on
event_id/float_id. Checkpoint + idempotent upsert give the exactly-once
end-to-end result the reference approximates with task dicts, ON CONFLICT
and retry loops.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from floatchat_datapipeline_spark.sinks.upsert import upsert
from floatchat_datapipeline_spark.streaming.run import run_foreach_batch
from floatchat_datapipeline_spark.streaming.sources import stream_landing


def ingest_landing_to_table(
    spark: SparkSession,
    landing_dir: str,
    table_path: str,
    checkpoint_dir: str,
    schema: StructType,
    keys: tuple[str, ...],
    glob: str = "*.json",
    transform=None,
) -> None:
    """Drain `landing_dir` (AvailableNow) into the parquet table at
    `table_path`, upserting on `keys`. `transform` is an optional
    DataFrame→DataFrame cleaning stage applied per batch (the F1-F7 chain
    in the argo pipeline)."""
    stream = stream_landing(spark, landing_dir, schema, glob)

    def _merge(batch_df, _batch_id: int) -> None:
        if transform is not None:
            batch_df = transform(batch_df)
        upsert(batch_df, table_path, keys)

    run_foreach_batch(stream, _merge, checkpoint_dir)
