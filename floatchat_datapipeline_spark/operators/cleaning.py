"""Cleaning operators — the reference preprocessor's validation semantics.

Re-expresses reference ingest/preprocess.py:177-293 as composable, lazy
``DataFrame -> DataFrame`` functions. The semantics split matters and is
replicated exactly (SURVEY.md §2.4, §7.4):

- geographic / time validity and critical-null checks DROP the row
  (F1, F2, F4, F5 — preprocess.py:205-260);
- physical-bounds violations NULL OUT the value but KEEP the row
  (F3 — preprocess.py:262-293).

Everything here is a pure column expression — no UDFs — so Catalyst pushes
the drop-filters into the parquet scan and the whole chain stays inside one
WholeStageCodegen span. At 100 TB these filters are the first thing that
runs and cut the scan output before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.plans.argo_views import (
    DEPTH_BOUNDS,
    LAT_MAX,
    LAT_MIN,
    LON_MAX,
    LON_MIN,
    PRES_BOUNDS,
    SAL_BOUNDS,
    TEMP_BOUNDS,
    VALID_TIME_MAX,
    VALID_TIME_MIN,
)

# P3/P4 — float_id normalization (reference load_data.py:270-292 and
# update_chromadb_measurements.py:167-179): strip the b'...' byte-string
# wrapper and surrounding whitespace.
_BYTESTR_RE = r"^b'|'$"


def clean_float_id(col: Column | str) -> Column:
    """Normalize a float id: strip b'...' wrapper + whitespace.

    Mirrors reference update_chromadb_measurements.py:167-179 (P4) /
    load_data.py:270-292 (P3) as a single JVM-side expression.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, _BYTESTR_RE, ""))


def filter_bad_ids(df: DataFrame, id_col: str = "float_id") -> DataFrame:
    """F5 — drop rows whose id is the literal string 'nan'
    (reference preprocess.py:191-194)."""
    return df.filter(F.col(id_col) != "nan")


def filter_critical_nulls(
    df: DataFrame,
    subset: tuple[str, ...] = ("float_id", "time", "latitude", "longitude"),
) -> DataFrame:
    """F4 — drop rows missing any critical column
    (reference preprocess.py:205-208)."""
    return df.na.drop(subset=list(subset))


def filter_geographic(
    df: DataFrame, lat_col: str = "latitude", lon_col: str = "longitude"
) -> DataFrame:
    """F1 — drop rows outside [-90,90] lat / [-180,180] lon
    (reference preprocess.py:243-260)."""
    return df.filter(
        F.col(lat_col).between(LAT_MIN, LAT_MAX)
        & F.col(lon_col).between(LON_MIN, LON_MAX)
    )


def filter_time_range(df: DataFrame, time_col: str = "time") -> DataFrame:
    """F2 — drop rows with time outside [1999-01-01, upper bound]
    (reference preprocess.py:221-241; upper bound pinned, see argo_views)."""
    return df.filter(
        F.col(time_col).between(F.lit(VALID_TIME_MIN), F.lit(VALID_TIME_MAX))
    )


def _null_outside(col: Column, lo: float, hi: float) -> Column:
    # Exclusive bounds, matching the reference's `lo < v < hi` check
    # (preprocess.py:266-287): boundary values are nulled.
    return F.when((col > lo) & (col < hi), col)


def null_physical_bounds(df: DataFrame) -> DataFrame:
    """F3 — null-out (keep row) measurements outside physical bounds
    (reference preprocess.py:262-293, bounds :23-26).

    temp ∉ (-5, 40) °C · sal ∉ (0, 50) PSU · pressure/depth ∉ (0, 6000).
    """
    bounds = {
        "temperature": TEMP_BOUNDS,
        "salinity": SAL_BOUNDS,
        "pressure": PRES_BOUNDS,
        "depth": DEPTH_BOUNDS,
    }
    out = df
    for c, (lo, hi) in bounds.items():
        if c in df.columns:
            out = out.withColumn(c, _null_outside(F.col(c), lo, hi))
    return out


def drop_all_null_measurements(
    df: DataFrame,
    cols: tuple[str, ...] = ("temperature", "salinity", "pressure", "depth"),
) -> DataFrame:
    """F6 — drop levels where every measurement is null (the reference skips
    all-NaN levels during 2-D expansion, preprocess.py:156-166)."""
    present = [c for c in cols if c in df.columns]
    cond = None
    for c in present:
        piece = F.col(c).isNotNull()
        cond = piece if cond is None else (cond | piece)
    return df.filter(cond) if cond is not None else df


def clean_argo(df: DataFrame) -> DataFrame:
    """The full reference cleaning chain (preprocess.py:177-219 order):
    bad-id drop → critical-null drop → time window → geo window →
    physical-bounds null-out → all-null-level drop, with id normalization.

    One lazy plan; all row-drops collapse into a single Filter that Catalyst
    pushes to the scan.
    """
    df = filter_bad_ids(df)
    df = filter_critical_nulls(df)
    df = filter_time_range(df)
    df = filter_geographic(df)
    df = df.withColumn("float_id", clean_float_id("float_id"))
    df = null_physical_bounds(df)
    df = drop_all_null_measurements(df)
    return df
