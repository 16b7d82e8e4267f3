"""NetCDF-style profile-file source (reference S2/S4 + P1/P2 + R1).

The reference reads ARGO NetCDF with xarray one file at a time
(load_data.py:201-224), resolves variables through an alias table with
case-variant fallback (:226-264), masks `_FillValue`/`missing_value` to
missing (:318-331), decodes CF "days since" times (:333-375), and expands
the 2-D (profile, level) matrices to long rows (preprocess.py:113-175).

Spark-first design: ``spark.read.format("binaryFile")`` lists and ships
whole files — one row per file, partitioned across executors — and
``mapInPandas`` decodes each file's bytes into long measurement rows
(the one true table-function in this engine, SURVEY.md §2.13). All
downstream cleaning stays in JVM expressions.

Decode backends, tried in order on the file bytes:
1. NumPy ``.npz`` container (zip magic) — the deterministic test format;
   carries variables + a JSON ``__attrs__`` entry for units/fill values.
2. xarray/h5netcdf, if importable — real NetCDF; NOT installed in this
   container, so the path is import-gated.
3. Otherwise: NotImplementedError naming the file (a real deployment adds
   the netCDF4 native libs to the executor image).

At 100 TB: binaryFile gives one task per file (files are the natural unit
— a profile file is self-contained); tiny-file skew is handled by the
post-decode rebalance in callers, and listing cost by running ingest
incrementally (streaming landing source) rather than re-listing history.
"""

from __future__ import annotations

import io
import json
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Alias fallback table (reference load_data.py:240-264): candidate source
# names per logical field; each candidate is also tried in upper/lower
# case variants.
FIELD_ALIASES: dict[str, tuple[str, ...]] = {
    "platform_number": ("PLATFORM_NUMBER", "platform_number", "FLOAT_ID"),
    "time": ("JULD", "TIME", "time"),
    "latitude": ("LATITUDE", "latitude", "LAT"),
    "longitude": ("LONGITUDE", "longitude", "LON"),
    "pressure": ("PRES", "pres", "PRESSURE"),
    "temperature": ("TEMP", "temp", "TEMPERATURE"),
    "salinity": ("PSAL", "psal", "SALINITY"),
}

ARGO_FILE_SCHEMA = StructType(
    [
        StructField("source_file", StringType()),
        StructField("float_id", StringType()),
        StructField("profile_index", IntegerType()),
        StructField("time", TimestampType()),
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
        StructField("level", IntegerType()),
        StructField("pressure", DoubleType()),
        StructField("temperature", DoubleType()),
        StructField("salinity", DoubleType()),
    ]
)


def _resolve(variables: dict[str, np.ndarray], field: str) -> np.ndarray | None:
    """Alias + case-variant lookup (reference load_data.py:252-264)."""
    for cand in FIELD_ALIASES[field]:
        for name in (cand, cand.upper(), cand.lower()):
            if name in variables:
                return variables[name]
    return None


def _mask_fill(arr: np.ndarray, attrs: dict, var: str) -> np.ndarray:
    """_FillValue/missing_value → NaN (reference load_data.py:318-331)."""
    out = arr.astype("float64", copy=True)
    for key in ("_FillValue", "missing_value"):
        fill = attrs.get(var, {}).get(key)
        if fill is not None:
            out[out == float(fill)] = np.nan
    return out


def decode_cf_time(values: np.ndarray, units: str) -> pd.Series:
    """CF "days/hours/seconds since <epoch>" → UTC timestamps (reference
    load_data.py:333-375). Invalid/missing → NaT."""
    unit_word, _, epoch = units.partition(" since ")
    step = {"days": "D", "hours": "h", "seconds": "s"}[unit_word.strip()]
    base = pd.Timestamp(epoch.strip())
    vals = pd.to_numeric(pd.Series(values.ravel()), errors="coerce")
    return base + pd.to_timedelta(vals, unit=step)


def decode_npz_bytes(content: bytes) -> tuple[dict[str, np.ndarray], dict]:
    """Deterministic test container: an .npz holding the variables plus a
    JSON ``__attrs__`` entry ({var: {units/_FillValue/...}})."""
    with np.load(io.BytesIO(content), allow_pickle=False) as z:
        variables = {k: z[k] for k in z.files if k != "__attrs__"}
        attrs = json.loads(str(z["__attrs__"][0])) if "__attrs__" in z.files else {}
    return variables, attrs


def _try_xarray(content: bytes) -> tuple[dict[str, np.ndarray], dict] | None:
    try:
        import xarray as xr  # noqa: PLC0415
    except ImportError:
        return None
    ds = xr.open_dataset(io.BytesIO(content))
    variables = {k: np.asarray(v.values) for k, v in ds.variables.items()}
    attrs = {k: dict(v.attrs) for k, v in ds.variables.items()}
    return variables, attrs


def decode_profile_file(path: str, content: bytes) -> pd.DataFrame:
    """One file's bytes → long measurement rows (vectorized expansion of
    the reference's per-row loop, preprocess.py:113-175)."""
    if content[:2] == b"PK":  # zip magic — the .npz test container
        variables, attrs = decode_npz_bytes(content)
    else:
        decoded = _try_xarray(content)
        if decoded is None:
            raise NotImplementedError(
                f"{path}: real NetCDF decode needs xarray/h5netcdf on the "
                "executors; this container ships the .npz test format only"
            )
        variables, attrs = decoded

    pres = _resolve(variables, "pressure")
    if pres is None:
        raise ValueError(f"{path}: no pressure variable among {list(variables)}")
    pres2d = np.atleast_2d(pres)
    n_prof, n_lev = pres2d.shape

    def per_profile(field: str) -> np.ndarray:
        arr = _resolve(variables, field)
        return (
            np.full(n_prof, np.nan) if arr is None else np.asarray(arr).ravel()
        )

    time_raw = _resolve(variables, "time")
    time_units = next(
        (
            a.get("units")
            for v, a in attrs.items()
            if v in FIELD_ALIASES["time"] and "units" in a
        ),
        "days since 1950-01-01",
    )
    times = (
        decode_cf_time(np.asarray(time_raw), time_units)
        if time_raw is not None
        else pd.Series([pd.NaT] * n_prof)
    )

    platform = _resolve(variables, "platform_number")
    float_ids = (
        np.array([str(x) for x in np.asarray(platform).ravel()])
        if platform is not None
        else np.array(["unknown"] * n_prof)
    )

    def meas(field: str) -> np.ndarray:
        arr = _resolve(variables, field)
        if arr is None:
            return np.full((n_prof, n_lev), np.nan)
        var_name = next(
            n
            for cand in FIELD_ALIASES[field]
            for n in (cand, cand.upper(), cand.lower())
            if n in variables
        )
        return _mask_fill(np.atleast_2d(arr), attrs, var_name)

    prof_idx = np.repeat(np.arange(n_prof, dtype="int32"), n_lev)
    level = np.tile(np.arange(n_lev, dtype="int32"), n_prof)
    return pd.DataFrame(
        {
            "source_file": path,
            "float_id": float_ids[prof_idx],
            "profile_index": prof_idx,
            "time": times.iloc[prof_idx].to_numpy(),
            "latitude": per_profile("latitude")[prof_idx],
            "longitude": per_profile("longitude")[prof_idx],
            "level": level,
            "pressure": meas("pressure").ravel(),
            "temperature": meas("temperature").ravel(),
            "salinity": meas("salinity").ravel(),
        }
    )


def read_argo(
    spark: SparkSession, path: str, glob: str = "*.nc"
) -> DataFrame:
    """Distributed profile-file reader: binaryFile listing → mapInPandas
    decode → long measurement DataFrame (ARGO_FILE_SCHEMA). The glob is
    the extension gate (reference F11)."""
    files = (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )

    def decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield decode_profile_file(row["path"], row["content"])

    return files.select("path", "content").mapInPandas(
        decode, schema=ARGO_FILE_SCHEMA
    )


def inspect_files(spark: SparkSession, path: str, glob: str = "*.nc") -> DataFrame:
    """S3 — per-file structure report (dims/vars/dtypes), the schema
    -discovery utility (reference load_data.py:158-199)."""
    report_schema = StructType(
        [
            StructField("source_file", StringType()),
            StructField("variable", StringType()),
            StructField("dtype", StringType()),
            StructField("shape", StringType()),
            StructField("attrs_json", StringType()),
        ]
    )
    files = (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )

    def report(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                variables, attrs = decode_npz_bytes(row["content"])
                yield pd.DataFrame(
                    {
                        "source_file": row["path"],
                        "variable": list(variables),
                        "dtype": [str(v.dtype) for v in variables.values()],
                        "shape": [str(v.shape) for v in variables.values()],
                        "attrs_json": [
                            json.dumps(attrs.get(k, {}), sort_keys=True)
                            for k in variables
                        ],
                    }
                )

    return files.select("path", "content").mapInPandas(report, report_schema)
