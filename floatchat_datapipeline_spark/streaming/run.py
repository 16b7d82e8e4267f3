"""Stream execution helpers — run a streaming plan to a batch result.

``materialize`` runs a streaming DataFrame under Trigger.AvailableNow into
a memory sink and returns the result table: the batch/stream parity
harness (every streaming queries() entry goes through it, so the DuckDB
oracle can check streaming semantics). AvailableNow processes the full
backlog in bounded micro-batches and terminates — the production pattern
for batch-over-stream jobs (reference's periodic full syncs, SURVEY.md
§2.12 row 3).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame

# State-partition width for harness streams. A stateful query spins up one
# state-store instance per shuffle partition and pays a per-partition
# commit on EVERY micro-batch — so the width should be sized to the STATE
# (thousands of keys here), not inherited from the batch shuffle width
# (or a vanilla session's 200 default, which makes 200 near-empty state
# commits per batch). At cluster scale you size this up with keyspace ×
# executor count; it's pinned per-query at first checkpoint either way.
STREAM_SHUFFLE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8")
)


def materialize(
    sdf: DataFrame,
    name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Run `sdf` to completion (AvailableNow) into an in-memory table and
    return it as a batch DataFrame. Stops any prior query of the same name
    so the call is re-runnable within a session.

    The streaming query plans under STREAM_SHUFFLE_PARTITIONS (fresh
    checkpoint per call, so the width isn't pinned by an old state dir);
    the session's batch shuffle width is restored afterwards."""
    spark = sdf.sparkSession
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    # Harness checkpoints are throwaway (deleted in the finally below),
    # so put them on tmpfs when the host has one: the state-store delta
    # writes of a stream-stream join otherwise hit disk through the
    # page cache, which measured as the DOMINANT and most VARIABLE cost
    # of these queries (same-code spread 3.6-9.0 s on stream_error_clicks,
    # PLANS.md round 13). Production checkpoints go to durable storage —
    # this shortcut is valid precisely because the dir dies with the call.
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    ckpt = tempfile.mkdtemp(prefix=f"ckpt-{name}-", dir=ckpt_base)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS)
        )
        query = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def run_foreach_batch(
    sdf: DataFrame,
    batch_fn,
    checkpoint_dir: str,
    name: str = "ingest",
) -> None:
    """Run a stream through `batch_fn(df, batch_id)` to completion with a
    persistent checkpoint — the foreachBatch upsert-ingest pattern. Replays
    after failure are safe iff `batch_fn` is idempotent (our keyed sinks
    are)."""
    query = (
        sdf.writeStream.foreachBatch(batch_fn)
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
