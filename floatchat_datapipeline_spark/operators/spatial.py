"""Spatial grid-bucket join — all-pairs-within-radius without O(n²).

The reference classifies Argo floats into named ocean regions by
point-in-box tests (`functions/geo.py`, its lat/lon bounding logic from
preprocess.py); this module adds the JOIN-shaped spatial operator a
fleet-scale pipeline needs: find every pair of entities within R km of
each other. The Spark-first shape is the grid-bucket equi-join — the
spatial analog of LSH banding (operators/dedup.py):

1. bucket every point into a (floor(lat/cell), floor(lon/cell)) grid
   cell, with `cell` sized so R km never spans more than one neighbor
   cell at the highest supported latitude;
2. explode each point to its 3×3 neighborhood (a bounded 9× map-side
   fan-out — the probe side);
3. equi-join probe cells against home cells (a plain shuffle hash join
   on the cell key — each unordered pair meets EXACTLY once, because
   point b's home cell appears exactly once in point a's neighborhood);
4. verify candidates with the exact haversine distance.

Scale notes (100 TB of points): the only shuffle is the cell-key
equi-join; fan-out is a constant 9×; per-cell population is bounded by
geography (and can be frequency-capped like LSH posting lists if a
degenerate dataset funnels into one cell). No cross join ever exists in
the plan — tests/test_plan_shapes.py-style check pins BroadcastNested ∉
plan.

Cross-engine determinism: coordinates here are derived from the shared
md5-long convention (functions/textstats.md5_long ≡ the DuckDB
`('0x' || substr(md5(x),1,15))::BIGINT` twin), distances are rounded to
integer METERS before any aggregation (exact BIGINT sums), and the
radius gate compares the ROUNDED distance, so both engines admit the
same pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.functions.textstats import md5_long

EARTH_RADIUS_KM = 6371.0


def hash_coords(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic pseudo-coordinates for an id column: lat ∈ [−60,60),
    lon ∈ [−180,180) in 1e-4° steps, derived from the cross-engine
    md5-long hash (two independent streams via a salt prefix). ±60°
    keeps 1° of longitude ≥ 55 km, so a 5° grid cell always covers a
    250 km radius (see grid_close_pairs)."""
    sid = F.col(id_col).cast("string")
    lat = (md5_long(sid) % F.lit(1_200_000)) / 10_000.0 - 60.0
    lon = (md5_long(F.concat(F.lit("lon|"), sid)) % F.lit(3_600_000)) / 10_000.0 - 180.0
    return df.select(F.col(id_col), lat.alias("lat"), lon.alias("lon"))


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km — the standard haversine, written with
    the same primitive call sequence the DuckDB oracle uses (radians →
    sin/cos → asin → sqrt) so both engines evaluate the same IEEE
    expression tree."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.pow(F.sin(dlon / 2), 2)
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def grid_close_pairs(
    points: DataFrame,
    id_col: str = "id",
    radius_km: float = 250.0,
    cell_deg: float = 5.0,
) -> DataFrame:
    """All unordered point pairs within `radius_km`, aggregated per home
    grid cell of the higher-id point: (cell_lat, cell_lon, n_pairs,
    sum_dist_m). `cell_deg` must satisfy cell_deg · 111.3 · cos(max_lat)
    ≥ radius_km (5° covers 250 km up to ±60° latitude) so the 3×3
    neighborhood is exhaustive — a pair outside it would be a
    correctness bug, not an approximation. The lon cell index wraps
    modulo 360/cell_deg, so pairs straddling the antimeridian (lon near
    -180 vs +180) land in adjacent cells like any others; haversine
    itself is wrap-safe (sin²(Δλ/2) is 360°-periodic), so no distance
    correction is needed."""
    n_x = int(round(360.0 / cell_deg))
    half_x = n_x // 2

    def wrap_cx(c):
        return (F.pmod(c + half_x, F.lit(n_x)) - half_x).cast("int")

    home = points.select(
        F.col(id_col).alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.floor(F.col("lat") / cell_deg).cast("int").alias("cy"),
        wrap_cx(F.floor(F.col("lon") / cell_deg)).alias("cx"),
    )
    off = F.explode(F.sequence(F.lit(-1), F.lit(1)))
    probe = (
        points.select(
            F.col(id_col).alias("id_a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            F.floor(F.col("lat") / cell_deg).cast("int").alias("py"),
            F.floor(F.col("lon") / cell_deg).cast("int").alias("px"),
        )
        .withColumn("dy", off)
        .withColumn("dx", off)
        .select(
            "id_a",
            "lat_a",
            "lon_a",
            (F.col("py") + F.col("dy")).alias("cy"),
            wrap_cx(F.col("px") + F.col("dx")).alias("cx"),
        )
    )
    cand = probe.join(home, ["cy", "cx"]).filter(F.col("id_a") < F.col("id_b"))
    dist_m = F.round(
        haversine_km(
            F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
        )
        * 1000.0,
        0,
    ).cast("bigint")
    close = cand.select("cy", "cx", dist_m.alias("dist_m")).filter(
        F.col("dist_m") <= int(radius_km * 1000)
    )
    return close.groupBy(
        F.col("cy").alias("cell_lat"), F.col("cx").alias("cell_lon")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("dist_m").alias("sum_dist_m"),
    )


def grid_hotspots(
    points: DataFrame, id_col: str = "id", cell_deg: float = 5.0
) -> DataFrame:
    """Local-density hotspot detection (a Getis-Ord-flavored gate in
    exact integers): bucket points into grid cells, smooth each cell
    against its 3×3 neighborhood, and flag cells whose own count exceeds
    2× the neighborhood MEAN — by cross-multiplication (9·n > 2·nb_sum,
    neighborhood sum includes self), so there is no float anywhere.

    Scale notes: the point rollup is the only fact shuffle
    (partial-aggregable); everything after runs on the CELL domain
    (≤ 72×36 cells at 5°), where the 9× neighbor explode and equi-join
    are negligible. Missing neighbor cells contribute zero (cells with
    no points never join), matching the 'empty ocean' intuition. The
    lon cell index wraps modulo 360/cell_deg so cells bordering the
    antimeridian smooth against their true neighbors across it."""
    n_x = int(round(360.0 / cell_deg))
    half_x = n_x // 2

    def wrap_cx(c):
        return (F.pmod(c + half_x, F.lit(n_x)) - half_x).cast("int")

    cells = points.groupBy(
        F.floor(F.col("lat") / cell_deg).cast("int").alias("cy"),
        wrap_cx(F.floor(F.col("lon") / cell_deg)).alias("cx"),
    ).agg(F.count(F.lit(1)).alias("n"))
    off = F.explode(F.sequence(F.lit(-1), F.lit(1)))
    probe = (
        cells.withColumn("dy", off)
        .withColumn("dx", off)
        .select(
            (F.col("cy") + F.col("dy")).alias("cy"),
            wrap_cx(F.col("cx") + F.col("dx")).alias("cx"),
            F.col("n").alias("_nn"),
        )
    )
    nb = probe.groupBy("cy", "cx").agg(F.sum("_nn").alias("nb_sum"))
    return (
        cells.join(nb, ["cy", "cx"])
        .select(
            F.col("cy").alias("cell_lat"),
            F.col("cx").alias("cell_lon"),
            "n",
            "nb_sum",
            (9 * F.col("n") > 2 * F.col("nb_sum")).alias("is_hotspot"),
        )
    )
