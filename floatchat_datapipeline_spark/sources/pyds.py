"""Custom Python DataSource for the staged-ERDDAP CSV protocol (S12).

The reference's ingest loop is "one HTTP download per float, then parse"
(load_data.py download loop; download.py per-file scrape). The Spark-4
Python DataSource API lets that protocol become a real `spark.read`
format instead of driver-side glue: `spark.read.format("erddap_staged")`
plans ONE InputPartition PER STAGED FILE — the reference's per-float
download unit — so a 300-file scrape (download.py's cap) reads as 300
parallel tasks with no driver loop and no repartition afterwards.

The fetch itself stays out of the executor (this container has no
network): files are staged by sources/staging.py into a local directory
and the DataSource reads that cache — exactly the reference's
download-then-parse split. At deployment the `read` body is where an
HTTP fetch per partition would go; everything Spark-side (registration,
schema contract, partition planning, per-partition iteration) is real
and tested (tests/test_pyds.py).

Usage:
    spark.dataSource.register(ErddapStagedDataSource)
    df = (spark.read.format("erddap_staged")
          .option("path", staged_dir)
          .option("ddl", "float_id string, temp double, lat double")
          .load())
"""

from __future__ import annotations

import csv
import glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# The DataSource instantiates inside a session-less Python planning
# worker, where pyspark's DDL parser (which calls into the JVM via an
# active session) is unavailable — so the schema contract parses with a
# self-contained map covering the scalar types ERDDAP CSVs carry.
_DDL_TYPES = {
    "string": StringType(),
    "double": DoubleType(),
    "float": FloatType(),
    "bigint": LongType(),
    "long": LongType(),
    "int": IntegerType(),
    "integer": IntegerType(),
    "boolean": BooleanType(),
}


def _schema_from_ddl(ddl: str) -> StructType:
    fields = []
    for part in ddl.split(","):
        name, _, typ = part.strip().partition(" ")
        typ = typ.strip().lower()
        if typ not in _DDL_TYPES:
            raise ValueError(
                f"erddap_staged: unsupported type {typ!r} for column "
                f"{name!r}; supported: {sorted(_DDL_TYPES)}"
            )
        fields.append(StructField(name, _DDL_TYPES[typ]))
    return StructType(fields)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ErddapStagedDataSource(DataSource):
    """`erddap_staged` format: one partition per staged CSV file."""

    @classmethod
    def name(cls) -> str:
        return "erddap_staged"

    def schema(self):
        ddl = self.options.get("ddl")
        if not ddl:
            raise ValueError(
                "erddap_staged requires the 'ddl' option (schema contract "
                "comes from the ERDDAP dataset metadata, not inference)"
            )
        return _schema_from_ddl(ddl)

    def reader(self, schema: StructType) -> "ErddapStagedReader":
        return ErddapStagedReader(schema, self.options)


class ErddapStagedReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("erddap_staged requires the 'path' option")
        self.pattern = options.get("glob", "*.csv")

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self.path, self.pattern)))
        # Empty scrape → one empty partition (a scan of nothing is a
        # valid frame, matching spark.read.csv on an empty dir contract).
        return [_FilePartition(p) for p in files] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        casts = [
            (
                float
                if isinstance(f.dataType, (DoubleType, FloatType))
                else int
                if isinstance(f.dataType, (LongType, IntegerType))
                else (lambda v: v.lower() == "true")
                if isinstance(f.dataType, BooleanType)
                else str
            )
            for f in self.schema.fields
        ]
        names = [f.name for f in self.schema.fields]
        with open(partition.path, newline="") as fh:
            rows = csv.DictReader(fh)
            for row in rows:
                yield tuple(
                    cast(row[name]) if row.get(name) not in (None, "") else None
                    for name, cast in zip(names, casts)
                )


# ---------------------------------------------------------------------------
# Streaming variant — the reference's /upload endpoint as a source (S13)
# ---------------------------------------------------------------------------


class ErddapStreamDataSource(DataSource):
    """`erddap_stream` format: the staged directory as a STREAM — each
    micro-batch picks up files that arrived since the last committed
    offset, the DataSource-API analog of the reference's per-upload
    ingest (fastapi_app.py /upload: spool file, process, acknowledge).
    The offset is the count of processed files over the sorted listing
    (files are staged append-only with monotonically sortable names, the
    staging contract); `readBetweenOffsets` replays any committed range
    for exactly-once recovery from the checkpoint."""

    @classmethod
    def name(cls) -> str:
        return "erddap_stream"

    def schema(self):
        ddl = self.options.get("ddl")
        if not ddl:
            raise ValueError("erddap_stream requires the 'ddl' option")
        return _schema_from_ddl(ddl)

    def simpleStreamReader(self, schema: StructType):
        return ErddapStreamReader(schema, self.options)


class ErddapStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options):
        # Reuse the batch reader's typed per-file decode.
        self._batch = ErddapStagedReader(schema, options)

    def initialOffset(self) -> dict:
        return {"n": 0}

    def _files(self):
        return sorted(
            glob.glob(os.path.join(self._batch.path, self._batch.pattern))
        )

    def _rows(self, files):
        # Materialized list, not a generator: the simple-reader protocol
        # PICKLES the returned rows into the prefetch cache so the batch
        # can replay from the checkpoint without re-reading the source.
        out = []
        for p in files:
            out.extend(self._batch.read(_FilePartition(p)))
        return out

    def read(self, start: dict):
        files = self._files()
        n0 = start.get("n", 0)
        # iter(), not the bare list: on an IDLE trigger (no new files,
        # end offset == start offset) Spark's simple-reader wrapper
        # validates emptiness by calling next() on the returned batch
        # (datasource_internal.add_result_to_cache) and a bare list
        # raises TypeError, killing the stream on its first quiet poll.
        # A list_iterator stays picklable for the prefetch cache.
        return iter(self._rows(files[n0:])), {"n": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        # iter() for the same protocol reason as read(): this is the
        # EXECUTOR replay path (prefetch-cache miss / checkpoint
        # recovery), and plan_data_source_read rejects a bare list with
        # DATA_SOURCE_INVALID_RETURN_TYPE — masked in the harness
        # because the driver-side cache always served the batch.
        files = self._files()
        return iter(self._rows(files[start.get("n", 0):end.get("n", 0)]))

    def commit(self, end: dict) -> None:
        # Nothing to clean up: the staged cache is the durable record.
        pass


# ---------------------------------------------------------------------------
# Write side — the K8 text-report export as a commit-protocol sink (K10)
# ---------------------------------------------------------------------------


class _ReportCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class ErddapReportDataSource(DataSource):
    """`erddap_report` write format: each task writes its partition as a
    CSV part file to a staging name, and the driver-side `commit` renders
    the manifest (part list + row counts + a _SUCCESS marker) only after
    EVERY task reported in — the all-or-nothing visibility contract the
    reference's report export (K8, sinks/export.py analog) gets for free
    from a single process and a distributed writer must earn through the
    commit protocol. `abort` removes the partials."""

    @classmethod
    def name(cls) -> str:
        return "erddap_report"

    def writer(self, schema: StructType, overwrite: bool):
        path = self.options.get("path")
        if not path:
            raise ValueError("erddap_report requires the 'path' option")
        return ErddapReportWriter(schema, path)


class ErddapReportWriter(DataSourceWriter):
    def __init__(self, schema: StructType, path: str):
        self.schema = schema
        self.path = path

    def write(self, iterator) -> _ReportCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"part-{pid:05d}.csv")
        names = [f.name for f in self.schema.fields]
        n = 0
        with open(part, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(names)
            for row in iterator:
                w.writerow(["" if v is None else v for v in row])
                n += 1
        return _ReportCommit(part, n)

    def commit(self, messages) -> None:
        manifest = os.path.join(self.path, "_MANIFEST.txt")
        total = 0
        with open(manifest, "w") as fh:
            for m in messages:
                fh.write(f"{os.path.basename(m.path)}\t{m.n_rows}\n")
                total += m.n_rows
            fh.write(f"TOTAL\t{total}\n")
        open(os.path.join(self.path, "_SUCCESS"), "w").close()

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
