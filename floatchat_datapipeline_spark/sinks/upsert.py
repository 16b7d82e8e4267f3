"""Idempotent keyed sinks over parquet tables (reference K1-K3, K6, K7).

The reference implements upsert/skip semantics as per-row SQL with retry
loops (`INSERT ... ON CONFLICT (float_id) DO UPDATE` at reference
ingest/db_handler.py:136-218, `DO NOTHING` at :220-256, delete-then-add at
update_chromadb_measurements.py:285-304). Here the same semantics are
set-at-a-time MERGE plans over a parquet table directory:

    upsert      = new wins on key collision        (K1, DO UPDATE)
    append_new  = existing wins, new keys appended (K2, DO NOTHING)
    delete_keys = anti-join removal                (K7)

Write protocol: stage into `<path>.staging`, then atomically swap
directories. On a transactional table format (Delta/Iceberg) each helper
becomes a real MERGE/DELETE statement against the same logical API —
`table_format` hooks exist so that swap-in needs no caller changes. The
staged-overwrite is the vanilla-Spark fallback (SURVEY.md §7.4 risk 6):
readers see either the old or the new directory, never a partial write.

Idempotency replaces the reference's retry-with-reconnect loops: replaying
the same batch produces a byte-identical table, so task retries and
at-least-once streaming delivery are safe by construction.

Scale note: the rewrite cost is O(|table|) per batch, which is why real
deployments partition the table (e.g. by date) and MERGE only touched
partitions, or use Delta. The helpers take an optional `partition_by` to
keep that path open.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read_existing(spark: SparkSession, path: str) -> DataFrame | None:
    """Resolve the table at `path`, falling back to the `<path>.old` backup
    left by a _swap_write that crashed between its two renames. The
    fallback makes the publish protocol recoverable: a reader (or the next
    writer's merge) always sees the last fully-written table."""
    if os.path.exists(path):
        return spark.read.parquet(path)
    backup = path + ".old"
    if os.path.exists(backup):
        return spark.read.parquet(backup)
    return None


def _swap_write(df: DataFrame, path: str, partition_by: tuple[str, ...] = ()) -> None:
    """Write df to a staging dir next to `path`, then publish by rename.

    The staging dir lives in the same parent so each rename is a metadata
    move on any POSIX filesystem. The publish is two renames (current →
    .old backup, staging → current), so there is a crash window where only
    `<path>.old` exists — _read_existing recovers from it, and the next
    successful publish cleans it up. Single-writer protocol, matching the
    reference's one-process ingest.
    """
    parent = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(parent, exist_ok=True)
    staging = tempfile.mkdtemp(prefix=os.path.basename(path) + ".staging.", dir=parent)
    try:
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        # Spark wants to create the leaf dir itself.
        target = os.path.join(staging, "data")
        writer.parquet(target)
        backup = path + ".old"
        if os.path.exists(backup):
            shutil.rmtree(backup)
        if os.path.exists(path):
            os.rename(path, backup)
        os.rename(target, path)
        if os.path.exists(backup):
            shutil.rmtree(backup)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def _dedup_on_keys(df: DataFrame, keys: tuple[str, ...]) -> DataFrame:
    return df.dropDuplicates(list(keys))


def upsert(
    df: DataFrame,
    path: str,
    keys: tuple[str, ...],
    partition_by: tuple[str, ...] = (),
) -> None:
    """K1 — MERGE, new rows win: existing rows whose key appears in `df`
    are replaced; all other existing rows are kept; batch-internal
    duplicates collapse to one arbitrary-but-deterministic row first."""
    spark = df.sparkSession
    new = _dedup_on_keys(df, keys)
    existing = _read_existing(spark, path)
    if existing is not None:
        kept = existing.join(
            F.broadcast(new.select(*keys).distinct()), list(keys), "left_anti"
        )
        new = kept.unionByName(new)
    _swap_write(new, path, partition_by)


def append_new(
    df: DataFrame,
    path: str,
    keys: tuple[str, ...],
    partition_by: tuple[str, ...] = (),
) -> None:
    """K2 — conflict-skip: only rows whose key is absent from the table
    are appended; existing rows are untouched (reference DO NOTHING)."""
    spark = df.sparkSession
    new = _dedup_on_keys(df, keys)
    existing = _read_existing(spark, path)
    if existing is not None:
        new = existing.unionByName(
            new.join(
                F.broadcast(existing.select(*keys).distinct()),
                list(keys),
                "left_anti",
            )
        )
    _swap_write(new, path, partition_by)


def write_external(
    df: DataFrame,
    fmt: str,
    options: dict[str, str] | None = None,
    mode: str = "append",
    partition_by: tuple[str, ...] = (),
) -> None:
    """External-sink seam (reference K3 — ingest/db_handler.py:258-284
    ``to_sql`` bulk insert). ``write_external(df, "jdbc", {"url": ...,
    "dbtable": ..., "batchsize": "10000"})`` is the Spark-parallel bulk
    insert; every executor writes its partitions concurrently. Any other
    DataSource format rides the same passthrough (tested with a parquet
    fake — no DB in the test container)."""
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if options:
        writer = writer.options(**options)
    writer.save()


def delete_keys(spark: SparkSession, path: str, bad_keys: DataFrame) -> None:
    """K7 — remove rows matching any key row in `bad_keys` (column names
    of `bad_keys` define the match key), e.g. the reference's ChromaDB
    delete-by-ids cleanup (cleanup_chromadb.py:122-146)."""
    existing = _read_existing(spark, path)
    if existing is None:
        return
    kept = existing.join(F.broadcast(bad_keys.distinct()), bad_keys.columns, "left_anti")
    _swap_write(kept, path)


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: tuple[str, ...] = (),
    partition_by: tuple[str, ...] = (),
    zorder_by: tuple[str, ...] = (),
) -> int:
    """Small-file compaction: rewrite a parquet table into
    ceil(total_bytes / target) files, optionally cluster-sorting rows so
    min/max column stats become selective (scan skipping). Returns the
    output file count.

    The maintenance op every streamed/upserted table needs at scale —
    micro-batch appends and per-key MERGEs accrete row-group-per-file
    parquet, and a 100 TB table read through 10⁶ tiny files is seek-bound
    (driver file-listing and task-scheduling overhead dominate). Uses the
    same staged-rename publish as every keyed sink, so readers never see
    a half-compacted table; repartition(n) (not coalesce) so the rewrite
    itself parallelizes across the cluster before funneling into n
    output files. Pass the table's `partition_by` layout (same argument
    as `upsert`) or the rewrite silently flattens a partitioned table.
    """
    import math

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if zorder_by:
        # multi-dimension clustering: range-partition + sort on the
        # Morton key so EVERY zorder_by column's per-file min/max span
        # is bounded at once (Delta OPTIMIZE ZORDER BY analog) — a
        # plain sort_by only makes the leading column's stats selective.
        from floatchat_datapipeline_spark.functions.zorder import (
            with_zorder_key,
        )

        df = (
            with_zorder_key(df, zorder_by)
            .repartitionByRange(n_files, "_zkey")
            .sortWithinPartitions("_zkey")
            .drop("_zkey")
        )
    elif sort_by:
        # cluster within output files: range-partition then in-file sort
        df = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        df = df.repartition(n_files)
    _swap_write(df, path, partition_by=partition_by)
    return n_files
