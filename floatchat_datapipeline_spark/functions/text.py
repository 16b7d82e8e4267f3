"""Natural-language summary templates (C1-C4) as column expressions.

The reference builds per-float NL summaries with Python f-strings over
row dicts (embeddings/embed.py:46-148, preprocess_floats_to_chromadb.py:
145-271, fastapi_app.py:524-555, sync_supabase_to_chromadb.py:121-177).
Here each template is one concat expression over the A1 aggregate row —
fully JVM-side, null-tolerant via coalesce.

Quirk replicated for golden-text parity (SURVEY.md §7.4.2): the reference's
date format is '%dth %b %Y' — the ordinal suffix is ALWAYS 'th'
(preprocess_floats_to_chromadb.py:171), so '01th Jan 2020' is correct
output, not a bug here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.functions.geo import (
    hemisphere_zone,
    lat_label,
    lon_label,
    ocean_region,
)


def quirky_date(ts: Column | str) -> Column:
    """'%dth %b %Y' with always-'th' ordinal
    (reference preprocess_floats_to_chromadb.py:163-172)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.concat(
        F.date_format(c, "dd"), F.lit("th "), F.date_format(c, "MMM yyyy")
    )


def _num(col: Column, nd: int = 1) -> Column:
    """Format a measurement for text: round + render; nulls → 'unknown'."""
    return F.coalesce(F.round(col, nd).cast("string"), F.lit("unknown"))


def float_summary_v1(df_cols: dict[str, Column]) -> Column:
    """C1 — float-level operational summary (reference embeddings/embed.py:
    46-148): "Argo float {id} operated from {d1} to {d2} in the {region}
    (latitude {a} to {b}, longitude {c} to {d}) with {n} profiles. ..."

    `df_cols` maps the A1 aggregate columns (float_id, deploy_date, end_date,
    lat_min/max, lon_min/max, total_profiles, temperature_min/max/mean, ...).
    """
    c = df_cols
    lat_c = (c["lat_min"] + c["lat_max"]) / F.lit(2.0)
    lon_c = (c["lon_min"] + c["lon_max"]) / F.lit(2.0)
    return F.concat(
        F.lit("Argo float "),
        c["float_id"],
        F.lit(" operated from "),
        F.coalesce(F.date_format(c["deploy_date"], "yyyy-MM-dd"), F.lit("unknown")),
        F.lit(" to "),
        F.coalesce(F.date_format(c["end_date"], "yyyy-MM-dd"), F.lit("unknown")),
        F.lit(" in the "),
        ocean_region(lat_c, lon_c),
        F.lit(" ("),
        hemisphere_zone(lat_c),
        F.lit(" waters, latitude "),
        _num(c["lat_min"], 3),
        F.lit(" to "),
        _num(c["lat_max"], 3),
        F.lit(", longitude "),
        _num(c["lon_min"], 3),
        F.lit(" to "),
        _num(c["lon_max"], 3),
        F.lit(") with "),
        c["total_profiles"].cast("string"),
        F.lit(" profiles, temperature "),
        _num(c["temperature_min"]),
        F.lit(" to "),
        _num(c["temperature_max"]),
        F.lit(" °C (mean "),
        _num(c["temperature_mean"], 2),
        F.lit("), salinity "),
        _num(c["salinity_min"]),
        F.lit(" to "),
        _num(c["salinity_max"]),
        F.lit(" PSU."),
    )


def float_summary_v2(df_cols: dict[str, Column]) -> Column:
    """C2 — the production summary shape (reference preprocess_floats_to_
    chromadb.py:189-267; real example chromadb_export_20250917_124841.txt:36):

    "On {quirky_date}, Argo float {id} (platform {p}) recorded {n} profile(s)
    near latitude {lat}°{N|S} and longitude {lon}°{E|W}. Pressure ranged from
    {a} to {b} dbar. Temperature ranged from {c} to {d}°C. Salinity ranged
    from {e} to {f} PSU. A total of {m} measurements were taken."
    """
    c = df_cols
    lat_c = (c["lat_min"] + c["lat_max"]) / F.lit(2.0)
    lon_c = (c["lon_min"] + c["lon_max"]) / F.lit(2.0)
    total_meas = (
        F.coalesce(c["temperature_count"], F.lit(0))
        + F.coalesce(c["salinity_count"], F.lit(0))
        + F.coalesce(c["pressure_count"], F.lit(0))
    )
    return F.concat(
        F.lit("On "),
        quirky_date(c["deploy_date"]),
        F.lit(", Argo float "),
        c["float_id"],
        F.lit(" (platform "),
        c["float_id"],
        F.lit(") recorded "),
        c["total_profiles"].cast("string"),
        F.lit(" profiles near latitude "),
        lat_label(F.round(lat_c, 3)),
        F.lit(" and longitude "),
        lon_label(F.round(lon_c, 3)),
        F.lit(". Pressure ranged from "),
        _num(c["pressure_min"]),
        F.lit(" to "),
        _num(c["pressure_max"]),
        F.lit(" dbar. Temperature ranged from "),
        _num(c["temperature_min"]),
        F.lit(" to "),
        _num(c["temperature_max"]),
        F.lit("°C. Salinity ranged from "),
        _num(c["salinity_min"]),
        F.lit(" to "),
        _num(c["salinity_max"]),
        F.lit(" PSU. A total of "),
        total_meas.cast("string"),
        F.lit(" measurements were taken."),
    )


def upload_description(df_cols: dict[str, Column]) -> Column:
    """C3 — API upload description (reference fastapi_app.py:524-555)."""
    c = df_cols
    return F.concat(
        F.lit("Data collected from "),
        F.coalesce(F.date_format(c["time_min"], "yyyy-MM-dd"), F.lit("unknown")),
        F.lit(" to "),
        F.coalesce(F.date_format(c["time_max"], "yyyy-MM-dd"), F.lit("unknown")),
        F.lit(". Location: latitude "),
        _num(c["lat_min"], 3),
        F.lit(" to "),
        _num(c["lat_max"], 3),
        F.lit(", longitude "),
        _num(c["lon_min"], 3),
        F.lit(" to "),
        _num(c["lon_max"], 3),
        F.lit(". Temperature: "),
        _num(c["temperature_min"]),
        F.lit(" to "),
        _num(c["temperature_max"]),
        F.lit(" (mean "),
        _num(c["temperature_mean"], 2),
        F.lit(", "),
        F.coalesce(c["temperature_count"], F.lit(0)).cast("string"),
        F.lit(" measurements)."),
    )


def sync_document_v4(df_cols: dict[str, Column]) -> Column:
    """C4 — full sync-job document (reference sync_supabase_to_chromadb.py:
    121-177): multi-line header + flattened stats + the raw properties
    JSON appended. The JSON payload is `to_json` over the properties
    struct — field order is struct declaration order, deterministic."""
    c = df_cols
    return F.concat(
        F.lit("Float Profile Data - ID: "),
        c["float_id"],
        F.lit("\nPlatform: "),
        F.coalesce(c["platform_number"], F.lit("unknown")),
        F.lit("\nProfiles: "),
        c["total_profiles"].cast("string"),
        F.lit("\nTemperature: "),
        _num(c["temperature_min"]),
        F.lit(" to "),
        _num(c["temperature_max"]),
        F.lit(" °C\nFull JSON Data: "),
        F.to_json(c["properties"]),
    )
