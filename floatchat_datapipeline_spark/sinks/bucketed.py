"""Bucketed-table layout — co-located joins without a shuffle.

The reference leans on Postgres btree indexes (`ingest/schema.sql:36-40`,
float_id/profile_time/lat/lon) to make its per-float lookups and joins
cheap. The Spark-native analog for JOIN locality is table bucketing:
hash-partition rows into a fixed number of buckets on the join key AT
WRITE TIME, record the layout in the catalog, and every subsequent join
or aggregation on that key reads co-located buckets instead of shuffling
the table.

Why this matters at 100 TB: a fact-fact join (e.g. profiles ⋈ floats on
float_id, or events ⋈ events self-joins) shuffles BOTH sides on every
query — at 100 TB that is the dominant cost and the least reliable stage
(disk spill, fetch failures). Bucketing moves that shuffle to write time,
once, amortized over every downstream query. Spark's scan reports the
bucket spec to the planner, which elides the Exchange on both sides of a
sort-merge join when bucket counts match (tests/test_bucketed.py pins
exactly that plan shape).

Bucket-count sizing: buckets are the unit of join parallelism AND the
file count per partition — pick `n_buckets` so a bucket of the LARGER
table is a few hundred MB (e.g. 100 TB / 512 MB ≈ 200k buckets is too
many files; bucket the 100 TB fact at ~4096-16384 and let AQE handle the
rest). Both join sides must share the bucket count (or be exact
multiples, which Spark 3.1+ coalesces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: tuple[str, ...],
    n_buckets: int,
    path: str | None = None,
    sort_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed parquet table registered in the session
    catalog. One output file per bucket (the pre-write repartition below),
    so the optional `sort_by` order survives and sort-merge joins skip
    their Sort as well as their Exchange.

    `path` makes it an external table (local tests use a tmp dir); omit
    for a managed table under the warehouse."""
    from pyspark.sql import functions as F

    # One file per bucket: co-partition by the same hash Spark's bucket
    # scan assumes, so each task writes exactly its bucket's rows.
    out = df.repartition(n_buckets, *[F.col(k) for k in keys])
    writer = out.write.format("parquet").mode(mode).bucketBy(
        n_buckets, *keys
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table THROUGH THE CATALOG — `spark.table` carries
    the bucket spec into planning; a raw `spark.read.parquet(path)` of
    the same files would not, and every join would shuffle again."""
    return spark.table(table)


def _layout_tag(sf_dir: str) -> str:
    """Tag = basename (readable) + hash of the FULL resolved path: two
    datasets whose directories share a basename (/a/sf1 vs /b/sf1) must
    not collide on the memoized layout, or the second caller would
    silently read buckets built from the first dataset."""
    import hashlib
    import os
    import re

    full = os.path.abspath(sf_dir.rstrip("/"))
    digest = hashlib.md5(full.encode()).hexdigest()[:8]
    base = re.sub(r"[^0-9a-zA-Z]+", "_", os.path.basename(full))
    return f"{base}_{digest}"


def _looks_like_parquet_table(loc: str) -> bool:
    """True iff `loc` is safe for the stale-layout rmtree in
    ensure_bucketed_order_tables: either a real Spark table directory
    (at least one part-* data file or _SUCCESS marker, everything else
    recognized sidecars) or pure write residue (empty, or ONLY
    _started/_committed/.crc sidecars — what a crashed previous write
    leaves behind; without this branch the stale location is never
    cleaned and the next saveAsTable dies with 'location is not
    empty'). A directory holding any foreign file, or only generic
    dotfiles (.gitkeep, .DS_Store, ...), is NOT ours to delete."""
    import os

    saw_table_file = False
    saw_generic_dotfile = False
    for root, _dirs, files in os.walk(loc):
        for f in files:
            if f.startswith(("part-", "_SUCCESS")):
                saw_table_file = True
            elif f.startswith(("_committed", "_started")) or f.endswith(
                ".crc"
            ):
                pass  # committer residue / checksum sidecars
            elif f.startswith("."):
                saw_generic_dotfile = True
            else:
                return False
    return saw_table_file or not saw_generic_dotfile


def ensure_bucketed_order_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = 16
) -> tuple[str, str]:
    """Memoized per (session, sf): persist slim lineitem/orders
    projections bucketed by orderkey — the write-once layout build whose
    cost every co-located join afterwards amortizes (the ANN-index
    lifecycle applied to table layout). Returns the two table names.

    Slimming to the join/agg columns at write time doubles as projection
    pushdown baked into the layout: the bucketed scan reads 3+2 columns,
    never the full TPC-H width."""
    import os
    import shutil

    from floatchat_datapipeline_spark.catalog import load_table

    tag = _layout_tag(sf_dir)
    lt, ot = f"bkt_lineitem_{tag}", f"bkt_orders_{tag}"
    if spark.catalog.tableExists(lt) and spark.catalog.tableExists(ot):
        return lt, ot
    # A fresh session's in-memory catalog forgets managed tables, but
    # their warehouse directories survive — and saveAsTable refuses to
    # CREATE over a non-empty location. The layout is a derived cache of
    # the source parquet, so a stale orphaned location is safe to drop —
    # but ONLY if it actually looks like a parquet table directory; an
    # unrelated directory parked at that path is not ours to delete.
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for table in (lt, ot):
        if not spark.catalog.tableExists(table):
            loc = os.path.join(warehouse, table)
            if os.path.exists(loc) and _looks_like_parquet_table(loc):
                shutil.rmtree(loc)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, lt, ("l_orderkey",), n_buckets, sort_by=("l_orderkey",))
    write_bucketed(
        orders, ot, ("o_orderkey",), n_buckets, sort_by=("o_orderkey",)
    )
    return lt, ot
