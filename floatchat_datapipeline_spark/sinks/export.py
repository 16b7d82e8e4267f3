"""Report/export sinks (reference K8 — export_chromadb_to_text.py:78-192).

The reference dumps every document + metadata to a formatted text file and
appends per-collection stats. Here the export is a partitioned JSON-lines
write (scales: one file per partition, no driver collect) plus a stats
DataFrame computed as an ordinary aggregation — callers print or persist
it as they wish.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_jsonl(df: DataFrame, path: str) -> None:
    """Dump a table as JSON lines (the scalable form of the reference's
    per-doc text dump)."""
    df.write.mode("overwrite").json(path)


def collection_stats(
    df: DataFrame,
    group_col: str = "source",
    flag_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-group doc counts plus global presence counts for each boolean
    flag column (reference export_chromadb_to_text.py:195-245)."""
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    aggs += [
        F.sum(F.when(F.col(c), 1).otherwise(0)).cast("long").alias(f"n_{c}")
        for c in flag_cols
    ]
    return df.groupBy(group_col).agg(*aggs)
