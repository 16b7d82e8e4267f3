"""User-facing query API — the reference's query surface, typed.

The reference's "query engine" is 79 natural-language strings run through
ChromaDB ANN (test_advanced_chromadb_queries.py, 8 suites; §3.3) plus
structured SQL pushed to Postgres. This facade rebuilds both halves over
the gold views:

- structured helpers (geo box / time range / measurement range / extremes
  / depth / multi-parameter / negation) — DataFrame plans over the
  per-float metadata aggregate;
- ``semantic_search`` — stub-encoder cosine top-k over the generated
  float summaries (V1-V3/O3), with optional metadata pre-filter (F10).

The gold views are built lazily once per engine instance and persisted —
the local stand-in for materialized silver/gold tables in a lakehouse.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.operators import cleaning
from floatchat_datapipeline_spark.operators.aggregate import float_metadata_agg
from floatchat_datapipeline_spark.plans.argo_views import argo_raw_df


class FloatChatEngine:
    """One engine per (session, data dir): query helpers over gold views."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._floats: DataFrame | None = None
        self._summaries: DataFrame | None = None

    # -- gold views --------------------------------------------------------

    @property
    def floats(self) -> DataFrame:
        """Per-float metadata aggregate (A1) over the cleaned silver."""
        if self._floats is None:
            cleaned = cleaning.clean_argo(argo_raw_df(self.spark, self.sf_dir))
            self._floats = float_metadata_agg(cleaned).persist()
        return self._floats

    @property
    def summaries(self) -> DataFrame:
        """(float_id, document) NL summaries (C2) for semantic search."""
        if self._summaries is None:
            from floatchat_datapipeline_spark.functions.text import (
                float_summary_v2,
            )

            flat = self.floats
            cols = {c: F.col(c) for c in flat.columns}
            self._summaries = flat.select(
                "float_id", float_summary_v2(cols).alias("document")
            ).persist()
        return self._summaries

    # -- structured queries (the reference's SQL-pushdown half) -----------

    def geo_box(
        self, lat: tuple[float, float], lon: tuple[float, float]
    ) -> DataFrame:
        """Floats whose bounding box intersects the given box."""
        (lat_lo, lat_hi), (lon_lo, lon_hi) = lat, lon
        return self.floats.filter(
            (F.col("lat_max") >= lat_lo)
            & (F.col("lat_min") <= lat_hi)
            & (F.col("lon_max") >= lon_lo)
            & (F.col("lon_min") <= lon_hi)
        )

    def time_range(self, start: str, end: str) -> DataFrame:
        """Floats active at any point inside [start, end]."""
        return self.floats.filter(
            (F.col("end_date") >= F.lit(start).cast("timestamp"))
            & (F.col("deploy_date") <= F.lit(end).cast("timestamp"))
        )

    def measurement_range(
        self, var: str, lo: float | None = None, hi: float | None = None
    ) -> DataFrame:
        """Floats whose observed [var_min, var_max] overlaps [lo, hi]."""
        df = self.floats
        if lo is not None:
            df = df.filter(F.col(f"{var}_max") >= lo)
        if hi is not None:
            df = df.filter(F.col(f"{var}_min") <= hi)
        return df

    def extremes(self, var: str, k: int = 5, coldest: bool = False) -> DataFrame:
        """Top-k floats by max (or min) of a variable."""
        order = (
            F.asc(f"{var}_min") if coldest else F.desc(f"{var}_max")
        )
        return self.floats.orderBy(order, "float_id").limit(k)

    def depth_query(self, min_pressure: float) -> DataFrame:
        """Floats profiling deeper than `min_pressure` dbar."""
        return self.floats.filter(F.col("pressure_max") >= min_pressure)

    def multi_param(self, **ranges: tuple[float | None, float | None]) -> DataFrame:
        """Conjunction of measurement_range constraints, e.g.
        multi_param(temperature=(20, None), salinity=(None, 35))."""
        df = self.floats
        for var, (lo, hi) in ranges.items():
            if lo is not None:
                df = df.filter(F.col(f"{var}_max") >= lo)
            if hi is not None:
                df = df.filter(F.col(f"{var}_min") <= hi)
        return df

    def exclude_region(
        self, lat: tuple[float, float], lon: tuple[float, float]
    ) -> DataFrame:
        """Negation queries: floats wholly OUTSIDE the box."""
        (lat_lo, lat_hi), (lon_lo, lon_hi) = lat, lon
        return self.floats.filter(
            ~(
                (F.col("lat_max") >= lat_lo)
                & (F.col("lat_min") <= lat_hi)
                & (F.col("lon_max") >= lon_lo)
                & (F.col("lon_min") <= lon_hi)
            )
        )

    # -- semantic search (the reference's ANN half) ------------------------

    def semantic_search(
        self, text: str, k: int = 5, where: Column | None = None
    ) -> DataFrame:
        """Top-k float summaries by stub-encoder cosine; `where` is the
        metadata pre-filter over the joined metadata columns (F10)."""
        from floatchat_datapipeline_spark.embeddings.search import (
            semantic_search,
        )

        docs = self.summaries.join(self.floats, "float_id")
        return semantic_search(
            docs, text, k=k, where=where, text_col="document", id_col="float_id"
        )


def sql(spark: SparkSession, sf_dir: str, query: str):
    """SQL passthrough over the registered test-table views plus the
    argo gold views (argo_clean / float_metadata) — the reference's
    raw-SQL escape hatch, against Spark SQL instead of Postgres."""
    from floatchat_datapipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    cleaned = cleaning.clean_argo(argo_raw_df(spark, sf_dir))
    cleaned.createOrReplaceTempView("argo_clean")
    float_metadata_agg(cleaned).createOrReplaceTempView("float_metadata")
    return spark.sql(query)
