"""Skew mitigation — salted two-phase aggregation.

AQE's skew-join splitting handles skewed JOINS, but a groupBy on a key
where one value dominates still funnels that key's entire partition
through one reducer. The classic fix is salting: phase 1 aggregates on
(key, salt) — spreading the hot key over `salt_buckets` reducers — and
phase 2 merges the partials on the key alone. Correct for any algebraic
aggregate (sum/count/min/max); averages are derived as sum/count at the
merge, never averaged-of-averages.

Cost model: one extra (small) shuffle of `salt_buckets × |keys|` partial
rows buys removal of the single-reducer bottleneck — worth it when the
hottest key exceeds a few partitions' worth of rows, which is exactly the
regime 100 TB event logs live in (power-law user/event keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 32

# (phase1_agg, phase2_merge) pairs per supported aggregate kind.
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-phase skew-proof groupBy.

    `aggs` maps output column → (kind, input column), kind ∈
    {sum, count, min, max}. Example::

        salted_agg(events, ["user_id"],
                   {"n": ("count", "event_id"), "total": ("sum", "value")})
    """
    for kind, _ in aggs.values():
        if kind not in _MERGEABLE:
            raise ValueError(f"unsupported aggregate kind {kind!r}")
    salt = (F.rand(seed=7) * salt_buckets).cast("int").alias("_salt")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            *[
                _MERGEABLE[kind][0](F.col(src)).alias(out)
                for out, (kind, src) in aggs.items()
            ]
        )
    )
    return phase1.groupBy(*keys).agg(
        *[
            _MERGEABLE[kind][1](F.col(out)).alias(out)
            for out, (kind, _) in aggs.items()
        ]
    )
