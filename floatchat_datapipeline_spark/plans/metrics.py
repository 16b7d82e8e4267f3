"""Pipeline observability — zero-cost in-flight metrics (A15).

The reference logs per-run processing stats from its driver loop
(main.py run summaries; fastapi_app.py's per-upload processing_time).
The Spark-native equivalent is `df.observe(Observation, ...aggs)`:
metrics accumulate ON THE EXECUTORS as the action runs — no second scan,
no collect, no extra job — and surface on the driver when the action
finishes. At 100 TB a separate "count the nulls" pass costs another full
scan; observed metrics cost nothing beyond the aggregation registers.

`observe_quality` instruments any DataFrame with the row/null/range
counters the cleaning pipeline reports; `ObservedRun.metrics()` blocks
until an action has materialized them (tests/test_metrics.py drives it
through a real noop write).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class ObservedRun:
    df: DataFrame
    observation: Observation

    def metrics(self) -> dict:
        """Metrics dict; valid after any action on `df` completes."""
        return dict(self.observation.get)


def observe_quality(
    df: DataFrame,
    numeric_cols: tuple[str, ...] = (),
    name: str = "quality",
) -> ObservedRun:
    """Attach row-count + per-column null/min/max observers. One
    Observation per call (Spark requires unique observation names per
    query); metrics ride the next action for free."""
    obs = Observation(name)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in numeric_cols:
        aggs.append(F.count(F.col(c)).alias(f"{c}_non_null"))
        aggs.append(F.min(F.col(c)).alias(f"{c}_min"))
        aggs.append(F.max(F.col(c)).alias(f"{c}_max"))
    return ObservedRun(df.observe(obs, *aggs), obs)
