"""Deterministic profile-file fixtures for the NetCDF-style reader.

Two files that between them exercise every reader behavior: uppercase vs
lowercase alias variants (reference load_data.py:252-264), `_FillValue`
and `missing_value` masking (:318-331), CF day- and hour-based time units
(:333-375), a missing measurement variable, and 2-D (profile, level)
expansion (preprocess.py:113-175). The same constants render the DuckDB
oracle (VALUES literal) for the `netcdf_ingest` driver query, so the
reader's full output is value-checked, not just row-counted.
"""

from __future__ import annotations

import io
import json
import os

import numpy as np

FILL = 99999.0
MISSING = -999.0

# file name -> (variables, attrs)
FIXTURE_FILES: dict[str, tuple[dict, dict]] = {
    "nodc_D1900975_001.nc": (
        {
            "PLATFORM_NUMBER": np.array(["1900975", "1900976"]),
            "JULD": np.array([25581.0, 25581.5]),
            "LATITUDE": np.array([-5.2, 10.0]),
            "LONGITUDE": np.array([72.5, 65.0]),
            "PRES": np.array([[5.0, 100.0, 200.0], [5.0, 150.0, FILL]]),
            "TEMP": np.array([[29.1, 20.0, 15.0], [28.0, 18.5, 12.0]]),
            "PSAL": np.array([[35.1, 35.0, 34.9], [34.8, 34.7, 34.6]]),
        },
        {
            "JULD": {"units": "days since 1950-01-01"},
            "PRES": {"_FillValue": FILL},
            "TEMP": {"_FillValue": FILL},
        },
    ),
    "nodc_R5904297_002.nc": (
        {
            "FLOAT_ID": np.array(["5904297"]),
            "time": np.array([175320.0]),
            "latitude": np.array([45.5]),
            "longitude": np.array([-30.25]),
            "pres": np.array([[10.0, 500.0]]),
            "temp": np.array([[8.5, MISSING]]),
            # no salinity variable at all
        },
        {
            "time": {"units": "hours since 2000-01-01"},
            "temp": {"missing_value": MISSING},
        },
    ),
}

# The reader's expected long output for the fixtures above:
# (float_id, profile_index, time-iso, lat, lon, level, pres, temp, psal)
EXPECTED_ROWS: tuple[tuple, ...] = (
    ("1900975", 0, "2020-01-15 00:00:00", -5.2, 72.5, 0, 5.0, 29.1, 35.1),
    ("1900975", 0, "2020-01-15 00:00:00", -5.2, 72.5, 1, 100.0, 20.0, 35.0),
    ("1900975", 0, "2020-01-15 00:00:00", -5.2, 72.5, 2, 200.0, 15.0, 34.9),
    ("1900976", 1, "2020-01-15 12:00:00", 10.0, 65.0, 0, 5.0, 28.0, 34.8),
    ("1900976", 1, "2020-01-15 12:00:00", 10.0, 65.0, 1, 150.0, 18.5, 34.7),
    ("1900976", 1, "2020-01-15 12:00:00", 10.0, 65.0, 2, None, 12.0, 34.6),
    ("5904297", 0, "2020-01-01 00:00:00", 45.5, -30.25, 0, 10.0, 8.5, None),
    ("5904297", 0, "2020-01-01 00:00:00", 45.5, -30.25, 1, 500.0, None, None),
)


def npz_bytes(variables: dict, attrs: dict) -> bytes:
    buf = io.BytesIO()
    np.savez(
        buf, __attrs__=np.array([json.dumps(attrs)]), **variables
    )
    return buf.getvalue()


def write_fixture_dir(target_dir: str) -> str:
    """Materialize the fixture files (plus one non-matching extension that
    the glob gate must skip). Idempotent."""
    os.makedirs(target_dir, exist_ok=True)
    for name, (variables, attrs) in FIXTURE_FILES.items():
        path = os.path.join(target_dir, name)
        if not os.path.exists(path):
            with open(path, "wb") as f:
                f.write(npz_bytes(variables, attrs))
    with open(os.path.join(target_dir, "ignore_me.txt"), "w") as f:
        f.write("not a profile file")
    return target_dir


def expected_rows_oracle_sql() -> str:
    """DuckDB VALUES literal of EXPECTED_ROWS with the reader's schema."""

    def lit(v, kind: str) -> str:
        if v is None:
            return f"CAST(NULL AS {kind})"
        if kind == "VARCHAR":
            return f"'{v}'"
        if kind == "TIMESTAMP":
            return f"TIMESTAMP '{v}'"
        if kind == "INT":
            return f"CAST({v} AS INT)"
        return f"CAST({v} AS DOUBLE)"

    kinds = (
        "VARCHAR", "INT", "TIMESTAMP", "DOUBLE", "DOUBLE",
        "INT", "DOUBLE", "DOUBLE", "DOUBLE",
    )
    rows = ",\n  ".join(
        "(" + ", ".join(lit(v, k) for v, k in zip(row, kinds)) + ")"
        for row in EXPECTED_ROWS
    )
    return (
        "SELECT * FROM (VALUES\n  "
        + rows
        + "\n) AS t(float_id, profile_index, time, latitude, longitude, "
        "level, pressure, temperature, salinity)"
    )
