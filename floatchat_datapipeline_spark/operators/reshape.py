"""Reshaping operators — matrix explode, wide→EAV melt, profile keying.

R1: the reference expands 2-D (profile, level) NetCDF matrices into a long
table with a Python double loop (reference ingest/preprocess.py:113-175).
Spark-first form: `posexplode(arrays_zip(...))` — one generator expression,
no Python, runs inside codegen.

R2: the wide→EAV melt (reference preprocess.py:359-431) built per-row dicts
with iterrows(); here it is the `stack` table generator plus content-derived
profile ids.

R3: profile keying when profile_id is absent — the reference uses
pandas ngroup() (positional, preprocess.py:373-378); positional ids are
nondeterministic under partition parallelism, so the engine derives keys
from content (float_id + timestamp), a documented divergence
(SURVEY.md §7.4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Measurement variables melted into the EAV fact table
# (reference preprocess.py:391-422: TEMP from temperature, PSAL from salinity).
MELT_VARS = (("TEMP", "temperature"), ("PSAL", "salinity"))


def explode_profile_matrix(
    df: DataFrame,
    array_cols: tuple[str, ...] = ("pres", "temp", "psal"),
    out_cols: tuple[str, ...] = ("pressure", "temperature", "salinity"),
) -> DataFrame:
    """R1 — explode equal-length measurement arrays into one row per level.

    Input: one row per profile with ARRAY<DOUBLE> columns (FIXTURES.md §2);
    output adds `level` (0-based position, reference preprocess.py:160) and
    scalar measurement columns; per-profile scalars (time/lat/lon/...) are
    carried to every level automatically.
    """
    carried = [c for c in df.columns if c not in array_cols]
    zipped = F.arrays_zip(*[F.col(c) for c in array_cols])
    exploded = df.select(*carried, F.posexplode(zipped).alias("level", "_m"))
    return exploded.select(
        *carried,
        F.col("level"),
        *[
            F.col("_m").getField(a).alias(o)
            for a, o in zip(array_cols, out_cols)
        ],
    )


def profile_key(df: DataFrame) -> DataFrame:
    """R3 — fill missing profile_id with a content-derived key.

    Reference fallback is groupby(float_id, time).ngroup() — a dense
    positional id (preprocess.py:373-378). A dense rank would force a global
    sort at scale; a deterministic content key ({float_id}_{yyyymmdd_HHmmss},
    the same shape the reference uses for synthesized profile ids at
    preprocess.py:388) shuffles nothing.
    """
    synthesized = F.concat_ws(
        "_", F.col("float_id"), F.date_format("time", "yyyyMMdd_HHmmss")
    )
    return df.withColumn(
        "profile_id", F.coalesce(F.col("profile_id"), synthesized)
    )


def melt_profiles_eav(df: DataFrame) -> DataFrame:
    """R2 — wide measurement rows → EAV `profiles` fact table
    (reference preprocess.py:359-431, target schema ingest/schema.sql:12-24).

    Emits one row per non-null variable per level with
    profile_id = {float_id}_{yyyymmdd_HHMMSS}_{VAR}_{level}
    (reference preprocess.py:388,394,411) — content-derived, so the melt is
    deterministic and idempotent under re-ingest. The stack generator is a
    zero-shuffle narrow transform; the null filter afterwards replicates the
    reference's per-variable dropna (F7, preprocess.py:391,408).
    """
    df = profile_key(df)
    stack_expr = "stack({n}, {args}) as (variable_name, variable_value)".format(
        n=len(MELT_VARS),
        args=", ".join(f"'{var}', {src}" for var, src in MELT_VARS),
    )
    ts_key = F.date_format("time", "yyyyMMdd_HHmmss")
    melted = df.select(
        F.col("float_id"),
        F.col("time").alias("profile_time"),
        F.col("latitude").alias("lat"),
        F.col("longitude").alias("lon"),
        F.col("pressure"),
        F.col("depth") if "depth" in df.columns else F.lit(None).cast("double").alias("depth"),
        F.col("level"),
        ts_key.alias("_ts_key"),
        F.expr(stack_expr),
    ).filter(F.col("variable_value").isNotNull())
    return melted.select(
        F.concat_ws(
            "_",
            F.col("float_id"),
            F.col("_ts_key"),
            F.col("variable_name"),
            F.col("level").cast("string"),
        ).alias("profile_id"),
        "float_id",
        "profile_time",
        "lat",
        "lon",
        "pressure",
        "depth",
        "variable_name",
        "variable_value",
        "level",
        F.lit(None).cast("string").alias("raw_profile"),  # always null, preprocess.py:404
    )


def pivot_profiles_wide(df: DataFrame) -> DataFrame:
    """R2⁻¹ — EAV fact table back to wide rows (inverse melt), one row per
    (float, time, level) with TEMP/PSAL columns. Explicit pivot values keep
    it a single-pass aggregate."""
    return (
        df.groupBy("float_id", "profile_time", "lat", "lon", "pressure", "level")
        .pivot("variable_name", [v for v, _ in MELT_VARS])
        .agg(F.first("variable_value"))
    )
