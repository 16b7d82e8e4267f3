"""Schema evolution over raw parquet directories — additive columns.

The reference migrates schemas by hand (`ingest/schema.sql` is a fixed
DDL; new fields mean ALTER TABLE + backfill scripts). A lakehouse ingest
path instead accumulates parquet parts whose schemas WIDEN over time
(new telemetry fields, new model-score columns), and readers must see
one union schema with NULLs for columns a part predates.

Spark's native seam is `mergeSchema`: the scan unions every part's
footer schema. That is exactly right — and exactly the thing to bound at
100 TB: footer-merging is a driver-side pass over EVERY file footer, so
these helpers expose it as the BOOTSTRAP/RECOVERY path, while the steady
state pins the evolved schema once (`evolved_schema` → pass `schema=` on
read) so scans skip footer discovery entirely. Delta/Iceberg make the
same trade via the table log; this is the raw-parquet form of it.

Both paths preserve the two scan properties the plan tests pin
repo-wide: column pruning (ReadSchema lists only referenced columns —
merging schemas does not widen reads) and predicate pushdown on columns
present in a file's footer (parquet returns NULL-safe misses for absent
columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def append_evolved(df: DataFrame, path: str) -> None:
    """Append a part whose schema may be a superset (or subset) of the
    parts already at `path`. Plain parquet append — per-file schemas are
    self-describing; reconciliation happens at read time. Additive-only
    evolution is the supported contract (renames/type-changes need a
    rewrite, same as every parquet-based table format)."""
    df.write.mode("append").parquet(path)


def read_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Bootstrap/recovery read: union ALL part schemas via mergeSchema.
    Columns absent from older parts read as NULL. Costs one driver-side
    footer pass over every file — fine for schema discovery, wrong as
    the steady-state path at 100 TB file counts."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def evolved_schema(spark: SparkSession, path: str) -> StructType:
    """Discover the union schema once (footer pass), to be pinned by the
    caller (metastore, table registry, or code) for steady-state reads."""
    return read_evolving(spark, path).schema


def read_pinned(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Steady-state read: explicit schema, NO footer discovery. Parts
    missing a pinned column yield NULLs for it; parts carrying extra
    not-yet-pinned columns simply don't project them."""
    return spark.read.schema(schema).parquet(path)
