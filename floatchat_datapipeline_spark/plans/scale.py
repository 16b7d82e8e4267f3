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

from pyspark.sql import DataFrame


def rebalance(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition `df` to `target` partitions — only if it is
    currently narrower than that. Use immediately before fan-out operators
    (explode, seed joins, pair scoring), after projecting down to the
    columns the operator needs (so the shuffle moves minimal bytes)."""
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
