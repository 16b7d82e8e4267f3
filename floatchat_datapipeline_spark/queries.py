"""Query registry — the engine's public query surface with DuckDB oracles.

Each entry pairs a Spark-side implementation (DataFrame API, built on the
operator modules) with an equivalent DuckDB SQL oracle, keyed by the
SURVEY.md §2 operator(s) it exercises. The driver's correctness gate runs
both at sf0.01 and hash-compares; tests/test_driver_parity.py runs the same
comparison locally at sf0.001.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.catalog import load_table
from floatchat_datapipeline_spark.operators import cleaning
from floatchat_datapipeline_spark.operators.aggregate import (
    float_metadata_agg,
    global_stats,
)
from floatchat_datapipeline_spark.operators.reshape import melt_profiles_eav
from floatchat_datapipeline_spark.functions.vector import cosine
from floatchat_datapipeline_spark.plans.argo_views import (
    VALID_TIME_MAX,
    VALID_TIME_MIN,
    argo_raw_cte,
    argo_raw_df,
)


@dataclass(frozen=True)
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL; None → driver does rows-only check
    survey_ops: tuple[str, ...] = ()  # SURVEY.md §2 operator ids covered


# ---------------------------------------------------------------------------
# Shared oracle SQL fragments (DuckDB dialect) mirroring operators/cleaning.py
# ---------------------------------------------------------------------------

_CLEAN_SQL = f"""
cleaned AS (
  SELECT * FROM argo_raw
  WHERE float_id <> 'nan'
    AND float_id IS NOT NULL AND time IS NOT NULL
    AND latitude IS NOT NULL AND longitude IS NOT NULL
    AND time BETWEEN TIMESTAMP '{VALID_TIME_MIN}' AND TIMESTAMP '{VALID_TIME_MAX}'
    AND latitude BETWEEN -90 AND 90
    AND longitude BETWEEN -180 AND 180
),
argo_clean AS (
  SELECT * FROM (
    SELECT
      trim(regexp_replace(float_id, '^b''|''$', '', 'g')) AS float_id,
      profile_id, time, latitude, longitude,
      CASE WHEN pressure > 0 AND pressure < 6000 THEN pressure END AS pressure,
      CASE WHEN depth > 0 AND depth < 6000 THEN depth END AS depth,
      CASE WHEN temperature > -5 AND temperature < 40 THEN temperature END AS temperature,
      CASE WHEN salinity > 0 AND salinity < 50 THEN salinity END AS salinity,
      level
    FROM cleaned
  )
  WHERE temperature IS NOT NULL OR salinity IS NOT NULL
     OR pressure IS NOT NULL OR depth IS NOT NULL
)
"""


def _argo_oracle(body: str) -> str:
    return argo_raw_cte(f", {_CLEAN_SQL} {body}")


def _argo_clean_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cleaning.clean_argo(argo_raw_df(spark, sf_dir))


# ---------------------------------------------------------------------------
# Query implementations
# ---------------------------------------------------------------------------


def q_argo_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F7 + P3/P4: full cleaning chain over the dirty measurement table."""
    return _argo_clean_df(spark, sf_dir)


_ARGO_CLEAN_ORACLE = _argo_oracle("SELECT * FROM argo_clean")


def q_argo_float_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-float metadata aggregate over the cleaned table."""
    return float_metadata_agg(_argo_clean_df(spark, sf_dir))


_ARGO_FLOAT_METADATA_ORACLE = _argo_oracle(
    """
SELECT
  float_id,
  min(time) AS deploy_date,
  max(time) AS end_date,
  min(latitude) AS lat_min,
  max(latitude) AS lat_max,
  min(longitude) AS lon_min,
  max(longitude) AS lon_max,
  count(DISTINCT profile_id) AS total_profiles,
  count(temperature) AS temperature_count,
  min(temperature) AS temperature_min,
  max(temperature) AS temperature_max,
  avg(temperature) AS temperature_mean,
  count(salinity) AS salinity_count,
  min(salinity) AS salinity_min,
  max(salinity) AS salinity_max,
  avg(salinity) AS salinity_mean,
  count(pressure) AS pressure_count,
  min(pressure) AS pressure_min,
  max(pressure) AS pressure_max,
  avg(pressure) AS pressure_mean,
  count(depth) AS depth_count,
  min(depth) AS depth_min,
  max(depth) AS depth_max,
  avg(depth) AS depth_mean
FROM argo_clean
GROUP BY float_id
"""
)


def q_argo_profiles_eav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2/R3 + C10: cleaned wide rows → EAV profiles fact table with
    content-derived profile ids."""
    return melt_profiles_eav(_argo_clean_df(spark, sf_dir))


_ARGO_PROFILES_EAV_ORACLE = _argo_oracle(
    """
, keyed AS (
  SELECT *,
    coalesce(profile_id,
             concat(float_id, '_', strftime(time, '%Y%m%d_%H%M%S'))) AS pid,
    strftime(time, '%Y%m%d_%H%M%S') AS ts_key
  FROM argo_clean
),
melted AS (
  SELECT float_id, time AS profile_time, latitude AS lat, longitude AS lon,
         pressure, depth, level, ts_key, 'TEMP' AS variable_name,
         temperature AS variable_value
  FROM keyed WHERE temperature IS NOT NULL
  UNION ALL
  SELECT float_id, time, latitude, longitude, pressure, depth, level, ts_key,
         'PSAL', salinity
  FROM keyed WHERE salinity IS NOT NULL
)
SELECT
  concat(float_id, '_', ts_key, '_', variable_name, '_',
         CAST(level AS STRING)) AS profile_id,
  float_id, profile_time, lat, lon, pressure, depth,
  variable_name, variable_value, level,
  CAST(NULL AS STRING) AS raw_profile
FROM melted
"""
)


def q_tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the canonical partial-agg scan (A-family).
    All measures aliased + rounded identically on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_TPCH_PRICING_ORACLE = """
SELECT
  l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 2) AS avg_qty,
  round(avg(l_extendedprice), 2) AS avg_price,
  round(avg(l_discount), 4) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — broadcast dim join + agg + deterministic top-k.
    The customer dim is broadcast (no shuffle of the fact side)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.col("o_orderkey"))
        .limit(10)
    )


_TOP_REVENUE_ORACLE = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/V3: exact brute-force cosine top-k; query vector = vec_id 0,
    joined in by broadcast so the plan has no driver-side collect."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("qvec")), 6).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.col("vec_id")).limit(10)


_COSINE_TOPK_ORACLE = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0
)
SELECT vec_id, label,
       round(
         list_dot_product(CAST(embedding AS DOUBLE[]), qvec)
         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[])))
            * sqrt(list_dot_product(qvec, qvec))), 6) AS score
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY score DESC, vec_id
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------


def registry() -> dict[str, QuerySpec]:
    return {
        "argo_clean": QuerySpec(
            q_argo_clean,
            _ARGO_CLEAN_ORACLE,
            ("F1", "F2", "F3", "F4", "F5", "F6", "P3", "P4", "P5"),
        ),
        "argo_float_metadata": QuerySpec(
            q_argo_float_metadata, _ARGO_FLOAT_METADATA_ORACLE, ("A1", "A6")
        ),
        "argo_profiles_eav": QuerySpec(
            q_argo_profiles_eav,
            _ARGO_PROFILES_EAV_ORACLE,
            ("R2", "R3", "C10", "F7"),
        ),
        "tpch_pricing_summary": QuerySpec(
            q_tpch_pricing_summary, _TPCH_PRICING_ORACLE, ("A1", "A3")
        ),
        "top_revenue_orders": QuerySpec(
            q_top_revenue_orders, _TOP_REVENUE_ORACLE, ("J4", "O2")
        ),
        "cosine_topk": QuerySpec(
            q_cosine_topk, _COSINE_TOPK_ORACLE, ("O3", "O4", "V3")
        ),
    }
