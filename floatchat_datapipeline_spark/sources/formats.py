"""Interchange formats — ORC / CSV / JSON beside the parquet default,
plus dynamic-partition overwrite (S18).

The reference's interchange surface is pandas `to_csv`/ad-hoc text dumps
(`export_chromadb_to_text.py`); an engine that replaces it must read and
write the formats neighboring systems actually exchange. Design rules at
scale:

- **Schema is PINNED for text formats.** CSV/JSON schema inference is a
  full extra pass over the data and is version-unstable; `read_table`
  therefore REQUIRES an explicit schema for csv/json (the
  sources/evolution.py steady-state rule applied to text). Parquet/ORC
  carry their own schema — the pin is optional there.
- **Timestamps round-trip at microsecond precision.** CSV gets an
  explicit `timestampFormat` with 6 fractional digits; default formats
  silently truncate to millis and the event-time parity gates would
  drift.
- **Dynamic partition overwrite** replaces ONLY the partitions present
  in the incoming batch (`partitionOverwriteMode=dynamic`) — the
  idempotent daily-backfill write. The conf is set per-write and
  restored, so the session default (static) is never leaked into other
  writers.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_TEXT_FORMATS = {"csv", "json"}
_SELF_DESCRIBING = {"parquet", "orc"}

# Microsecond-precision round-trip for text formats (both CSV and JSON
# default to millisecond timestampFormat and silently truncate).
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
CSV_OPTIONS = {"header": "true", "timestampFormat": _TS_FMT}
JSON_OPTIONS = {"timestampFormat": _TS_FMT}


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    if fmt not in _TEXT_FORMATS | _SELF_DESCRIBING:
        raise ValueError(f"unsupported format: {fmt}")
    writer = df.write.format(fmt).mode(mode)
    opts = CSV_OPTIONS if fmt == "csv" else JSON_OPTIONS if fmt == "json" else {}
    for k, v in opts.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
) -> DataFrame:
    if fmt in _TEXT_FORMATS and schema is None:
        raise ValueError(
            f"{fmt} reads require an explicit schema (inference is a "
            "full extra data pass and version-unstable; pin it)"
        )
    reader = spark.read.format(fmt)
    opts = CSV_OPTIONS if fmt == "csv" else JSON_OPTIONS if fmt == "json" else {}
    for k, v in opts.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


@contextmanager
def _scoped_conf(spark: SparkSession, key: str, value: str):
    prev = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def dynamic_partition_overwrite(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...],
    fmt: str = "parquet",
) -> None:
    """Overwrite ONLY the partitions present in `df` — untouched
    partitions survive. The idempotent daily-backfill write: re-running
    a day replaces that day and nothing else. Conf is scoped to this
    write and restored afterwards."""
    spark = df.sparkSession
    with _scoped_conf(
        spark, "spark.sql.sources.partitionOverwriteMode", "dynamic"
    ):
        write_table(df, path, fmt, partition_by, mode="overwrite")
