"""Count-min sketch — deterministic frequency estimation for heavy
hitters over unbounded token streams.

Completes the engine's sketch family: HLL (`approx_count_distinct`) for
distinct counts and t-digest (`approx_percentile`) for quantiles ride
Spark's built-in partial-aggregable implementations (tests/
test_sketches.py checks them against exact twins); those sketch layouts
are engine-internal, so they get exact-twin oracles only. Count-min is
different: the sketch is just d×w counters under d seeded hashes, so
with the repo's standard 60-bit md5 hash (`functions.textstats.
seeded_hash`) the ENTIRE sketch — and every estimate read from it — is
bit-reproducible in DuckDB, giving this sketch a full value-level
oracle (the only approximate operator in the engine with one).

Scale design:
- The counter build is ONE hash aggregation on (row, bucket): tokens
  explode map-side, each token emits its `depth` bucket coordinates
  from a literal seed array (no join, no per-seed pass), and the
  groupBy output is at most depth×width rows REGARDLESS of corpus
  size — this is the whole point: 100 TB of tokens compress to a
  ~16 K-cell table via partial aggregation, with no per-token state.
- Estimation joins candidates to the sketch on (row, bucket) with the
  sketch BROADCAST (it is bounded by depth×width, never by data), then
  takes min over rows — a map-side join + one small agg.
- Guarantee: est ≥ exact always (collisions only ADD); overestimate
  ≤ 2·N/width with probability 1−2^−depth. The heavy-hitter query
  surfaces est alongside exact so the bound is auditable at test scale;
  at 100 TB the exact twin is dropped and ONLY the sketch runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.functions.textstats import seeded_hash

CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_bucket(value: Column | str, row: Column | int, width: int = CMS_WIDTH) -> Column:
    """Bucket coordinate of `value` in sketch row `row`: the engine's
    seeded 60-bit hash mod width. Pure expression, identical in DuckDB as
    CAST('0x'||substr(md5(row||'|'||value),1,15) AS BIGINT) % width."""
    r = F.lit(row) if isinstance(row, int) else row
    return (seeded_hash(value, r) % width).cast("int")


def cms_build(
    values: DataFrame,
    value_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: one row per touched (row, bucket) with the
    summed count. Output schema (row int, bucket int, c long); absent
    cells are implicitly zero. `weight_col` lets pre-aggregated
    (value, count) inputs build the identical sketch as raw streams."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    coords = values.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda j: F.struct(
                    j.cast("int").alias("row"),
                    cms_bucket(F.col(value_col), j, width).alias("bucket"),
                ),
            )
        ).alias("_coord"),
        w.alias("_w"),
    )
    return (
        coords.select("_coord.row", "_coord.bucket", "_w")
        .groupBy("row", "bucket")
        .agg(F.sum("_w").cast("long").alias("c"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    value_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for every candidate value: est = min over
    sketch rows of the candidate's bucket counter. The sketch side is
    broadcast (≤ depth×width cells). Candidates whose every bucket is
    untouched estimate 0 (possible only for values absent from the
    build). Output: candidates' columns + (est long)."""
    probes = candidates.select(
        value_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda j: F.struct(
                    j.cast("int").alias("row"),
                    cms_bucket(F.col(value_col), j, width).alias("bucket"),
                ),
            )
        ).alias("_coord"),
    ).select(value_col, "_coord.row", "_coord.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("long").alias("est"))
    )
