"""Deterministic ARGO-shaped view derived from the synthetic `lineitem` table.

The reference engine's core data model is a *measurement long table* — one
row per (float, profile, depth-level) with lat/lon/time/pressure/depth/
temperature/salinity (reference ingest/preprocess.py:63-111, FIXTURES.md §1).
The driver's test corpus has no ARGO parquet, so this module derives an
equivalent table deterministically from `lineitem`, injecting every entry of
the dirty-data matrix (FIXTURES.md §6): out-of-range lat/lon (row-drop),
pre-1999/null times (row-drop), out-of-physical-bounds measurements
(null-out, row kept), 'nan' and byte-string float_ids, and null
profile_ids (exercises the profile-keying fallback).

Parity contract: ``argo_raw_df`` (DataFrame API) and ``ARGO_RAW_SQL``
(ANSI SQL run by the DuckDB oracle) MUST express the identical function.
All numeric branches are written so both engines do the same IEEE-754
double operations:

- double literals use the ``e0`` suffix in SQL (both engines parse those
  as DOUBLE, avoiding DECIMAL intermediate types);
- measurement values are multiples of 2**-3 .. 2**-1 (exactly
  representable), so SUM/AVG over any row order is exact and
  order-independent — aggregate results compare bit-for-bit without
  rounding tolerances.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.catalog import load_table

# Validity bounds (reference ingest/preprocess.py:23-26 and :221-260).
VALID_TIME_MIN = "1999-01-01 00:00:00"
# The reference uses now() as the upper bound; we pin a fixed future date so
# the check is deterministic across engines/runs (documented divergence).
VALID_TIME_MAX = "2035-01-01 00:00:00"
LAT_MIN, LAT_MAX = -90.0, 90.0
LON_MIN, LON_MAX = -180.0, 180.0
TEMP_BOUNDS = (-5.0, 40.0)  # °C, exclusive → null-out
SAL_BOUNDS = (0.0, 50.0)  # PSU
PRES_BOUNDS = (0.0, 6000.0)  # dbar
DEPTH_BOUNDS = (0.0, 6000.0)  # m

ARGO_RAW_COLUMNS = (
    "float_id",
    "profile_id",
    "time",
    "latitude",
    "longitude",
    "pressure",
    "depth",
    "temperature",
    "salinity",
    "level",
)

# ---------------------------------------------------------------------------
# Oracle rendering (ANSI SQL, parses identically in DuckDB and Spark SQL).
# ---------------------------------------------------------------------------

ARGO_RAW_SQL = """
SELECT
  CASE WHEN l_orderkey % 97 = 0 THEN 'nan'
       WHEN l_orderkey % 89 = 0
         THEN concat('b''', CAST(l_suppkey AS STRING), ' ''')
       ELSE CAST(l_suppkey AS STRING) END AS float_id,
  CASE WHEN l_suppkey % 5 = 0 THEN NULL
       ELSE concat(CAST(l_suppkey AS STRING), '_',
                   CAST(l_orderkey % 50 AS STRING)) END AS profile_id,
  CASE WHEN l_orderkey % 101 = 0 THEN TIMESTAMP '1995-06-15 00:00:00'
       WHEN l_orderkey % 103 = 0 THEN NULL
       ELSE l_shipdate END AS time,
  CASE WHEN l_orderkey % 107 = 0 THEN 95e0
       WHEN l_orderkey % 151 = 0 THEN NULL
       ELSE (l_partkey % 1200) / 10e0 - 60e0 END AS latitude,
  CASE WHEN l_orderkey % 109 = 0 THEN 190e0
       WHEN l_orderkey % 149 = 0 THEN NULL
       ELSE (l_orderkey % 3600) / 10e0 - 180e0 END AS longitude,
  CASE WHEN l_orderkey % 113 = 0 THEN 7000e0
       ELSE l_linenumber * 250e0 + (l_partkey % 128) / 4e0 END AS pressure,
  CASE WHEN l_orderkey % 139 = 0 THEN NULL
       ELSE l_linenumber * 245e0 + (l_partkey % 128) / 4e0 END AS depth,
  CASE WHEN l_orderkey % 127 = 0 THEN 45e0
       WHEN l_orderkey % 131 = 0 THEN NULL
       ELSE 30e0 - l_quantity / 2e0 END AS temperature,
  CASE WHEN l_orderkey % 137 = 0 THEN 60e0
       ELSE 33e0 + (l_suppkey % 16) / 8e0 END AS salinity,
  CAST(l_linenumber - 1 AS INT) AS level
FROM lineitem
"""


def argo_raw_cte(body_sql: str) -> str:
    """Wrap an oracle query body with the argo_raw CTE."""
    return f"WITH argo_raw AS ({ARGO_RAW_SQL})\n{body_sql}"


# ---------------------------------------------------------------------------
# DataFrame rendering (the engine-side mirror of ARGO_RAW_SQL).
# ---------------------------------------------------------------------------


def _mod(colname: str, m: int) -> Column:
    return F.col(colname) % F.lit(m)


def argo_raw_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARGO measurement long table (dirty), derived from lineitem.

    Mirrors ARGO_RAW_SQL exactly — see module docstring for the parity
    contract.
    """
    from floatchat_datapipeline_spark.plans.scale import rebalance

    # Project to the 6 source columns, then widen: the test files are
    # single-row-group parquet (one split), and every argo query fans out
    # from this view — without the rebalance the whole clean+agg stage
    # chain runs in one task.
    li = rebalance(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_suppkey",
            "l_partkey",
            "l_linenumber",
            "l_quantity",
            "l_shipdate",
        )
    )
    suppkey_s = F.col("l_suppkey").cast("string")
    return li.select(
        F.when(_mod("l_orderkey", 97) == 0, F.lit("nan"))
        .when(
            _mod("l_orderkey", 89) == 0,
            F.concat(F.lit("b'"), suppkey_s, F.lit(" '")),
        )
        .otherwise(suppkey_s)
        .alias("float_id"),
        F.when(_mod("l_suppkey", 5) == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                suppkey_s, F.lit("_"), (_mod("l_orderkey", 50)).cast("string")
            )
        )
        .alias("profile_id"),
        F.when(
            _mod("l_orderkey", 101) == 0,
            F.lit("1995-06-15 00:00:00").cast("timestamp"),
        )
        .when(_mod("l_orderkey", 103) == 0, F.lit(None).cast("timestamp"))
        .otherwise(F.col("l_shipdate"))
        .alias("time"),
        F.when(_mod("l_orderkey", 107) == 0, F.lit(95.0))
        .when(_mod("l_orderkey", 151) == 0, F.lit(None).cast("double"))
        .otherwise(_mod("l_partkey", 1200) / F.lit(10.0) - F.lit(60.0))
        .alias("latitude"),
        F.when(_mod("l_orderkey", 109) == 0, F.lit(190.0))
        .when(_mod("l_orderkey", 149) == 0, F.lit(None).cast("double"))
        .otherwise(_mod("l_orderkey", 3600) / F.lit(10.0) - F.lit(180.0))
        .alias("longitude"),
        F.when(_mod("l_orderkey", 113) == 0, F.lit(7000.0))
        .otherwise(
            F.col("l_linenumber") * F.lit(250.0)
            + _mod("l_partkey", 128) / F.lit(4.0)
        )
        .alias("pressure"),
        F.when(_mod("l_orderkey", 139) == 0, F.lit(None).cast("double"))
        .otherwise(
            F.col("l_linenumber") * F.lit(245.0)
            + _mod("l_partkey", 128) / F.lit(4.0)
        )
        .alias("depth"),
        F.when(_mod("l_orderkey", 127) == 0, F.lit(45.0))
        .when(_mod("l_orderkey", 131) == 0, F.lit(None).cast("double"))
        .otherwise(F.lit(30.0) - F.col("l_quantity") / F.lit(2.0))
        .alias("temperature"),
        F.when(_mod("l_orderkey", 137) == 0, F.lit(60.0))
        .otherwise(F.lit(33.0) + _mod("l_suppkey", 16) / F.lit(8.0))
        .alias("salinity"),
        (F.col("l_linenumber") - F.lit(1)).cast("int").alias("level"),
    )
