"""Geographic / temporal classification expressions (C5-C8).

Pure column expressions (chained CASE) — the reference implements these as
Python if/elif ladders (embeddings/embed.py:118-174); here they compile
into codegen'd JVM branches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ocean_region(lat: Column | str, lon: Column | str) -> Column:
    """C5 — lat/lon → named ocean region (reference embeddings/embed.py:150-174,
    polar bands per test_advanced_chromadb_queries.py:494-515)."""
    lat, lon = _c(lat), _c(lon)
    return (
        F.when(lat < -60, F.lit("Southern Ocean"))
        .when(lat > 66, F.lit("Arctic Ocean"))
        .when((lon >= 20) & (lon < 120), F.lit("Indian Ocean"))
        .when((lon >= 120) | (lon < -70), F.lit("Pacific Ocean"))
        .otherwise(F.lit("Atlantic Ocean"))
    )


def hemisphere_zone(lat: Column | str) -> Column:
    """C6 — latitude band context (reference embeddings/embed.py:118-124)."""
    lat = _c(lat)
    return (
        F.when(lat < -30, F.lit("southern"))
        .when(lat > 30, F.lit("northern"))
        .otherwise(F.lit("tropical"))
    )


def season_from_month(ts: Column | str) -> Column:
    """C7 — month → season (reference embeddings/embed.py:127-139:
    3-5 spring, 6-8 summer, 9-11 autumn, else winter)."""
    m = F.month(_c(ts))
    return (
        F.when(m.between(3, 5), F.lit("spring"))
        .when(m.between(6, 8), F.lit("summer"))
        .when(m.between(9, 11), F.lit("autumn"))
        .otherwise(F.lit("winter"))
    )


def centroid(lo: Column | str, hi: Column | str) -> Column:
    """C8 — range centroid (min+max)/2 (reference embeddings/embed.py:80-81)."""
    return (_c(lo) + _c(hi)) / F.lit(2.0)


def lat_label(lat: Column | str) -> Column:
    """N/S suffix formatting used in summary text
    (reference preprocess_floats_to_chromadb.py:201-204)."""
    lat = _c(lat)
    return F.concat(
        F.abs(lat).cast("string"),
        F.lit("°"),
        F.when(lat >= 0, F.lit("N")).otherwise(F.lit("S")),
    )


def lon_label(lon: Column | str) -> Column:
    """E/W suffix formatting (reference preprocess_floats_to_chromadb.py:201-204)."""
    lon = _c(lon)
    return F.concat(
        F.abs(lon).cast("string"),
        F.lit("°"),
        F.when(lon >= 0, F.lit("E")).otherwise(F.lit("W")),
    )
