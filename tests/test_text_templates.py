"""Golden-text tests for the NL templates (C2 quirk, C4 JSON document)."""

from __future__ import annotations

from pyspark.sql import functions as F

from floatchat_datapipeline_spark.functions.text import (
    quirky_date,
    sync_document_v4,
)


def test_quirky_date_always_th(spark):
    """reference preprocess_floats_to_chromadb.py:171 — ordinal is ALWAYS
    'th': '01th Jan 2020' is the correct (quirky) output."""
    df = spark.createDataFrame(
        [("2020-01-01",), ("2020-01-02",), ("2020-01-03",), ("2020-01-21",)],
        "d string",
    ).select(quirky_date(F.col("d").cast("timestamp")).alias("q"))
    assert [r["q"] for r in df.collect()] == [
        "01th Jan 2020",
        "02th Jan 2020",
        "03th Jan 2020",
        "21th Jan 2020",
    ]


def test_sync_document_v4_golden(spark):
    df = spark.createDataFrame(
        [("5678", "5678", 3, 20.5, 29.1)],
        "float_id string, platform_number string, total_profiles int, "
        "tmin double, tmax double",
    ).select(
        "*",
        F.struct(
            F.col("total_profiles").alias("total_profiles"),
            F.struct(F.lit("2020-01-01").alias("start")).alias("date_range"),
        ).alias("properties"),
    )
    out = df.select(
        sync_document_v4(
            {
                "float_id": F.col("float_id"),
                "platform_number": F.col("platform_number"),
                "total_profiles": F.col("total_profiles"),
                "temperature_min": F.col("tmin"),
                "temperature_max": F.col("tmax"),
                "properties": F.col("properties"),
            }
        ).alias("doc")
    ).collect()[0]["doc"]
    assert out == (
        "Float Profile Data - ID: 5678\n"
        "Platform: 5678\n"
        "Profiles: 3\n"
        "Temperature: 20.5 to 29.1 °C\n"
        'Full JSON Data: {"total_profiles":3,"date_range":{"start":"2020-01-01"}}'
    )
