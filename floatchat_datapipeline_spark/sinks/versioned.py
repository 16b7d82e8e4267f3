"""Versioned snapshot sink — time-travel reads over vanilla parquet (K15).

The reference's stores are overwrite-in-place (ChromaDB collections are
mutated by delete-then-add, update_chromadb_measurements.py:285-304;
Postgres rows by ON CONFLICT DO UPDATE, ingest/db_handler.py:136-218) —
once a sync runs, yesterday's state is gone. Lakehouse table formats keep
it: every commit is a new immutable snapshot and readers can pin one
("time travel", Delta `versionAsOf` / Iceberg snapshot ids). This module
is the raw-parquet form of that contract:

    <path>/v=1/, <path>/v=2/, ...   immutable snapshot directories
    <path>/_LATEST                  pointer file, atomically renamed in

A writer stages the new snapshot dir fully, then publishes by writing a
temp pointer file and `os.rename`-ing it over `_LATEST` (atomic on any
POSIX filesystem) — readers either see the previous pointer or the new
one, never a partial snapshot. Old versions stay readable until an
explicit `vacuum` (retention), exactly the Delta/Iceberg trade: storage
for history.

Scale: a snapshot write is one parquet write (no rewrite of history);
`read_version` is pure metadata (pick a directory) so a time-travel read
costs the same scan as a latest read; `vacuum` is bounded directory
removal. The pointer file is one inode — no listing race at any file
count.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_VDIR = re.compile(r"^v=(\d+)$")


def versions(path: str) -> list[int]:
    """Sorted list of snapshot versions present at `path`."""
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        m = _VDIR.match(name)
        if m and os.path.isdir(os.path.join(path, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(path: str) -> int | None:
    """The published version per the `_LATEST` pointer (None if the
    table does not exist yet). Falls back to the max staged dir if the
    pointer is missing — the recovery mirror of upsert._read_existing."""
    ptr = os.path.join(path, "_LATEST")
    try:
        with open(ptr) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        vs = versions(path)
        return vs[-1] if vs else None


def write_version(df: DataFrame, path: str) -> int:
    """Write `df` as the next immutable snapshot and publish it via the
    atomic pointer rename. Returns the new version number."""
    cur = latest_version(path)
    nxt = (cur or 0) + 1
    os.makedirs(path, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(path, f"v={nxt}"))
    tmp = os.path.join(path, f"_LATEST.tmp.{nxt}")
    with open(tmp, "w") as fh:
        fh.write(str(nxt))
    os.rename(tmp, os.path.join(path, "_LATEST"))
    return nxt


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: `version=None` reads the published latest;
    an explicit version pins a historical snapshot."""
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no published version at {path}")
    return spark.read.parquet(os.path.join(path, f"v={v}"))


def vacuum(path: str, keep: int = 2) -> list[int]:
    """Remove snapshots older than the newest `keep`, never removing
    the published latest. Returns the versions removed."""
    vs = versions(path)
    latest = latest_version(path)
    removable = [v for v in vs[:-keep] if v != latest] if keep else []
    for v in removable:
        shutil.rmtree(os.path.join(path, f"v={v}"))
    return removable
