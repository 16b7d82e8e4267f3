"""Aggregation operators — per-float metadata, global stats, profile rollups.

Re-expresses reference ingest/preprocess.py:295-357 (A1), fastapi_app.py:
279-372 (A3), embeddings/embed.py:305-361 (A4) and the counting/verification
aggs (A5-A8) as single groupBy().agg() plans.

Scale notes: every aggregate here is a Spark built-in, so partial (map-side)
aggregation applies — the shuffle carries one row per (group, agg) not one
row per input. `countDistinct(profile_id)` is the only shuffle-heavy
aggregate; for 100 TB rollups `approx_count_distinct` is the documented
escape hatch (exact form kept as default for reference parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEASUREMENT_COLS = ("temperature", "salinity", "pressure", "depth")


def float_metadata_agg(df: DataFrame, approx_distinct: bool = False) -> DataFrame:
    """A1 — per-float aggregate metadata (reference preprocess.py:295-357).

    One row per float_id with: deploy/end dates (min/max time), bounding box
    (min/max lat/lon), total_profiles (distinct profile_id), and per-variable
    count/min/max/mean. Nulls are skipped by Spark aggregates exactly as
    pandas skips NaN, so the null-out cleaning semantics (F3) compose
    correctly with this operator.
    """
    n_profiles = (
        F.approx_count_distinct("profile_id")
        if approx_distinct
        else F.countDistinct("profile_id")
    )
    aggs = [
        F.min("time").alias("deploy_date"),
        F.max("time").alias("end_date"),
        F.min("latitude").alias("lat_min"),
        F.max("latitude").alias("lat_max"),
        F.min("longitude").alias("lon_min"),
        F.max("longitude").alias("lon_max"),
        n_profiles.alias("total_profiles"),
    ]
    for c in MEASUREMENT_COLS:
        if c in df.columns:
            aggs += [
                F.count(c).alias(f"{c}_count"),
                F.min(c).alias(f"{c}_min"),
                F.max(c).alias(f"{c}_max"),
                F.avg(c).alias(f"{c}_mean"),
            ]
    return df.groupBy("float_id").agg(*aggs)


def float_properties(df: DataFrame) -> DataFrame:
    """A1+R4 — per-float nested `properties` document
    (reference preprocess.py:315-348, schema FIXTURES.md §3).

    Builds the struct from the flat aggregate in one pass; variables whose
    values are all-null for a float are omitted from `measurements`
    (reference preprocess.py:333) by map_filter on the count.
    """
    flat = float_metadata_agg(df)
    meas_entries = []
    for c in MEASUREMENT_COLS:
        if f"{c}_count" in flat.columns:
            meas_entries.append(
                F.struct(
                    F.lit(c).alias("key"),
                    F.struct(
                        F.col(f"{c}_count").alias("count"),
                        F.col(f"{c}_min").alias("min"),
                        F.col(f"{c}_max").alias("max"),
                        F.col(f"{c}_mean").alias("mean"),
                    ).alias("value"),
                )
            )
    measurements = F.map_filter(
        F.map_from_entries(F.array(*meas_entries)),
        lambda _, v: v["count"] > 0,
    )
    return flat.select(
        "float_id",
        F.col("float_id").alias("platform_number"),  # preprocess.py:343
        F.col("deploy_date"),
        F.struct(
            F.col("total_profiles"),
            F.struct(
                F.date_format("deploy_date", "yyyy-MM-dd'T'HH:mm:ss").alias("start"),
                F.date_format("end_date", "yyyy-MM-dd'T'HH:mm:ss").alias("end"),
            ).alias("date_range"),
            F.struct(
                F.col("lat_min"), F.col("lat_max"), F.col("lon_min"), F.col("lon_max")
            ).alias("location_range"),
            measurements.alias("measurements"),
        ).alias("properties"),
    )


def profile_grouping(df: DataFrame) -> DataFrame:
    """A2 — one row per (float_id, profile_id): first time/lat/lon plus
    level count (reference preprocess.py:373-385).

    `first` in Spark is partition-order-dependent; a min over ONE totally
    ordered struct picks a single consistent row deterministically (ties on
    level cannot split fields across rows).
    """
    picked = F.min(F.struct("level", "time", "latitude", "longitude"))
    return df.groupBy("float_id", "profile_id").agg(
        picked.getField("time").alias("profile_time"),
        picked.getField("latitude").alias("lat"),
        picked.getField("longitude").alias("lon"),
        F.count(F.lit(1)).alias("n_levels"),
    )


def global_stats(df: DataFrame) -> DataFrame:
    """A3 — whole-dataset measurement stats (reference fastapi_app.py:279-372):
    per variable min/max/mean/count + global time/space extent + profile count.
    A single partial-aggregable global agg — one reduce, no groupBy shuffle.
    """
    aggs = [
        F.min("time").alias("time_min"),
        F.max("time").alias("time_max"),
        F.min("latitude").alias("lat_min"),
        F.max("latitude").alias("lat_max"),
        F.min("longitude").alias("lon_min"),
        F.max("longitude").alias("lon_max"),
        F.countDistinct("float_id", "profile_id").alias("total_profiles"),
    ]
    for c in MEASUREMENT_COLS:
        if c in df.columns:
            aggs += [
                F.count(c).alias(f"{c}_count"),
                F.min(c).alias(f"{c}_min"),
                F.max(c).alias(f"{c}_max"),
                F.avg(c).alias(f"{c}_mean"),
            ]
    return df.agg(*aggs)


def profile_summary(df: DataFrame) -> DataFrame:
    """A4 — per-(float, profile_time) variable rollup over the EAV profiles
    table (reference embeddings/embed.py:305-361): pivot TEMP/PSAL to
    min/max columns plus max depth/pressure.

    Expects the R2 melt output (variable_name/variable_value columns).
    Implemented as ONE groupBy with conditional aggregates (the manual
    pivot): pivot() + a second agg + join would read the melt twice and
    shuffle three times; this is one pass, one shuffle, same columns.
    """

    def var_agg(fn, var: str, suffix: str):
        return fn(
            F.when(F.col("variable_name") == var, F.col("variable_value"))
        ).alias(f"{var}_{suffix}")

    return df.groupBy("float_id", "profile_time").agg(
        var_agg(F.min, "TEMP", "min"),
        var_agg(F.max, "TEMP", "max"),
        var_agg(F.min, "PSAL", "min"),
        var_agg(F.max, "PSAL", "max"),
        F.max("pressure").alias("max_pressure"),
        F.max("depth").alias("max_depth"),
    )


def table_counts(df: DataFrame, key: str = "float_id") -> DataFrame:
    """A6 — per-key row counts (reference db_handler.py:346-381)."""
    return df.groupBy(key).count()


def presence_counts(df: DataFrame, flag_cols: tuple[str, ...]) -> DataFrame:
    """A7/A8 — presence/verification counts (reference export_chromadb_to_
    text.py:195-245, update_chromadb_measurements.py:313-350): total rows
    plus how many rows have each flag/stat populated."""
    aggs = [F.count(F.lit(1)).alias("total")]
    for c in flag_cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNotNull(), 1).otherwise(0)).alias(f"has_{c}")
        )
    return df.agg(*aggs)


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Exact weighted median per group: the smallest value v whose
    cumulative weight reaches half the group's total (lower weighted
    median — 2·cumw(v) ≥ W). Shape: collapse to (group, value) weight
    totals FIRST (partial-aggregable — the only pass over the raw
    table), then one window cumsum over the collapsed domain and a min
    over qualifying values. Pre-collapsing makes the cumulative sum
    independent of row order within ties (each distinct value is one
    row), so the answer is deterministic under any shuffle — and the
    window partitions by group, so no global sort exists in the plan.

    All arithmetic is integer (weights cast to BIGINT, the half test
    cross-multiplies 2·cumw ≥ W) — bit-identical in any engine."""
    from pyspark.sql import Window

    byval = df.groupBy(*group_cols, value_col).agg(
        F.sum(F.col(weight_col).cast("bigint")).alias("_w")
    )
    win = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*group_cols)
    cum = byval.select(
        *group_cols,
        F.col(value_col),
        F.sum("_w").over(win).alias("_cumw"),
        F.sum("_w").over(tot).alias("_totw"),
    )
    return (
        cum.filter(2 * F.col("_cumw") >= F.col("_totw"))
        .groupBy(*group_cols)
        .agg(
            F.min(value_col).alias("w_median"),
            F.max("_totw").alias("total_weight"),
        )
    )
