"""Event-time epoch extraction, tolerant of timestamp flavor.

The catalog/stream choke points (catalog.normalize_event_time) already
normalize ``events.ts`` to TIMESTAMP, but operators that extract epochs
must not crash if handed a frame from some other source whose writer
produced TIMESTAMP_NTZ (Spark 4 default inference for no-tz parquet
``timestamp[us]``). ``cast(x AS TIMESTAMP)`` is a no-op on TIMESTAMP and a
pure metadata re-tag on NTZ under the pinned UTC session timezone
(session.py), so routing every epoch extraction through these helpers
makes the operators flavor-robust for free — the round-4 bench crash
(unix_micros on NTZ) cannot recur.

Long (raw nanos) columns are NOT accepted here: cast(long AS TIMESTAMP)
is seconds-interpreted and would silently corrupt them. Nanos are handled
exclusively at the scan choke point, where the DataFrame schema is
available to dispatch on (catalog.normalize_event_time).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_ts(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def epoch_micros(col: Column | str) -> Column:
    """Microseconds since epoch from TIMESTAMP or TIMESTAMP_NTZ."""
    return F.unix_micros(_as_ts(col))


def long_div(c: Column, divisor: int) -> Column:
    """Exact integer division for long columns (Column lacks a floordiv
    operator). Subtracting the remainder first makes the numerator exactly
    divisible, so the double division yields an exact integer — no
    float-rounding across bin boundaries even for 16-digit micros."""
    return ((c - c % divisor) / divisor).cast("long")


def epoch_seconds(col: Column | str) -> Column:
    """Whole seconds since epoch (floor) from TIMESTAMP or NTZ."""
    return long_div(epoch_micros(col), 1_000_000)
