"""Scale helpers — partition-shape fixes that Catalyst can't do alone.

``rebalance`` addresses the one planning gap AQE doesn't cover: AQE
re-plans *shuffle* boundaries, but the parallelism of stage 1 (scan →
first shuffle) is fixed by the input split count. A narrow scan — one
small parquet file, a single row group, a pre-AvailableNow stream batch —
runs every per-row expression, explode fan-out, and partial aggregation
in ONE task no matter how many cores the cluster has.

At 100 TB inputs arrive in thousands of splits and ``rebalance`` is a
no-op (it never *reduces* parallelism — AQE's coalescing handles that
side). It only inserts a round-robin repartition when the scan is
narrower than the session's parallelism, which is exactly the case where
one extra small shuffle buys cluster-wide parallelism for the expensive
stage that follows (shingle explode, minhash × seeds, simhash × bits,
vector cross-scoring).
"""

from __future__ import annotations

import math
import os
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SIZE_SUFFIXES = {
    "": 1,
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
}


def _bytes_conf(spark: SparkSession, key: str, default: int) -> int:
    """Parse a Spark byte-size conf value ('128MB', '134217728b', ...)."""
    try:
        raw = str(spark.conf.get(key)).strip().lower()
    except Exception:
        return default
    num = raw.rstrip("kmgb")
    suffix = raw[len(num):]
    try:
        return int(float(num) * _SIZE_SUFFIXES[suffix])
    except (ValueError, KeyError):
        return default


def _estimated_scan_partitions(df: DataFrame, spark: SparkSession) -> int | None:
    """Estimate the file scan's split count from file sizes and Spark's own
    split-sizing model (maxPartitionBytes / openCostInBytes /
    defaultParallelism) — pure driver metadata, no RDD lineage, no job.
    Returns None for non-file relations (range, local, post-shuffle)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        p = urllib.parse.urlparse(uri)
        if p.scheme not in ("file", ""):
            return None
        try:
            total += os.path.getsize(urllib.parse.unquote(p.path))
        except OSError:
            return None
    max_pb = _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _bytes_conf(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    padded = total + open_cost * len(files)
    bytes_per_core = max(1, padded // max(1, spark.sparkContext.defaultParallelism))
    split = min(max_pb, max(open_cost, bytes_per_core))
    return max(1, math.ceil(padded / split))


def rebalance(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition `df` to `target` partitions — only if it is
    currently narrower than that. Use immediately before fan-out operators
    (explode, seed joins, pair scoring), after projecting down to the
    columns the operator needs (so the shuffle moves minimal bytes).

    Width comes from the scan's file metadata (not ``df.rdd``, which would
    eagerly build an RDD lineage per call); non-file relations fall back
    to the RDD partition count — those are driver-local test inputs, never
    the 100 TB path. A frame whose lineage already contains a
    shuffle-introducing operator is left alone: its width is set by that
    shuffle (AQE-sized), not by the leaf scan the file estimate reflects —
    repartitioning it again would ADD a shuffle and could cut parallelism."""
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    plan = df._jdf.queryExecution().analyzed().toString()
    if any(
        marker in plan
        for marker in (
            "Repartition",
            "Join",
            "Aggregate",
            "Window",
            "Sort",
            "Deduplicate",
        )
    ):
        return df
    width = _estimated_scan_partitions(df, spark)
    if width is None:
        width = df.rdd.getNumPartitions()
    if width >= target:
        return df
    return df.repartition(target)


def _ranged_pid_frame(df: DataFrame, order_cols: list, n_partitions: int):
    """The pre-checkpoint stage of ranged_cumsum: range-repartition on
    the total order and tag rows with their partition id. Split out so
    plan-shape tests can pin the rangepartitioning exchange — the
    checkpoint in ranged_cumsum replaces downstream plan strings with
    an ExistingRDD scan, hiding the exchange from the composed query's
    explain output."""
    return df.repartitionByRange(n_partitions, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )


def ranged_cumsum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "cum",
    n_partitions: int = 32,
) -> DataFrame:
    """Two-phase RANGE-PARTITIONED cumulative sum — the 100 TB form of a
    global `sum() OVER (ORDER BY …)` window, which Spark otherwise plans
    as a SINGLE-partition sort (the `WindowExec: No Partition Defined`
    warning; fine on a dim, fatal on a fact).

    Phase 1: `repartitionByRange` on the total order, then a cumsum
    windowed WITHIN each range partition (parallel, spill-safe).
    Phase 2: per-partition totals (n_partitions rows) get their own
    exclusive prefix — a window over the tiny partition-id domain — and
    broadcast back; each row's global cumsum = local cumsum + its
    partition's prefix offset.

    Correctness requires `order_cols` to be a TOTAL order (unique key
    tuples): range boundaries then cannot split ties across partitions,
    and the result is identical to the single-partition window for ANY
    boundary placement — which also makes it independent of the range
    sampler, hence deterministic. The equivalence is pinned by
    tests/test_round7_ops.py::test_ranged_cumsum_equals_global_window.

    `value_col` should be integral (BIGINT cents in this repo's money
    convention) so partial sums merge exactly.

    The `_pid`-tagged frame is localCheckpointed: the per-partition
    offsets branch and the main join branch would otherwise EACH
    re-execute repartitionByRange, and two executions of the range
    sampler are not guaranteed the same boundaries when the upstream
    DAG's intra-partition row order varies (observed: chained
    ranged_cumsum calls in rfm_segments produced ranks whose offsets
    came from a different boundary set — nondeterministic results).
    One materialization pins a single boundary assignment for both
    consumers — the repo's standard rule for any lazy DAG consumed by
    two branches."""
    from pyspark.sql import Window

    local = _ranged_pid_frame(df, order_cols, n_partitions).localCheckpoint(
        eager=True
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = local.withColumn("_loc", F.sum(F.col(value_col)).over(w_local))
    totals = local.groupBy("_pid").agg(F.sum(value_col).alias("_tot"))
    w_prev = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_tot").over(w_prev), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_loc") + F.col("_off"))
        .drop("_pid", "_loc", "_off")
    )


def ranged_cummax_exclusive(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "cummax",
    n_partitions: int = 32,
) -> DataFrame:
    """Two-phase range-partitioned EXCLUSIVE running max — the 100 TB
    form of `max() OVER (ORDER BY … ROWS UNBOUNDED PRECEDING TO 1
    PRECEDING)`, the streaming-watermark recurrence ("the largest event
    time seen before this row arrived"). Same construction as
    ranged_cumsum (which see, including the determinism/total-order and
    checkpoint-pins-the-boundaries notes): a within-partition exclusive
    cummax in parallel, then each partition's carry-in = the exclusive
    prefix max of per-partition maxima over the tiny _pid domain,
    combined with `greatest` (which skips the NULL carry-in of the
    first partition and the NULL local prefix of each partition's first
    row — exactly the "no predecessor" semantics of the global window:
    the overall first row comes out NULL)."""
    from pyspark.sql import Window

    local = _ranged_pid_frame(df, order_cols, n_partitions).localCheckpoint(
        eager=True
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = local.withColumn("_loc", F.max(F.col(value_col)).over(w_local))
    totals = local.groupBy("_pid").agg(F.max(value_col).alias("_tot"))
    w_prev = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_pid", F.max("_tot").over(w_prev).alias("_carry")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.greatest(F.col("_loc"), F.col("_carry")))
        .drop("_pid", "_loc", "_carry")
    )
