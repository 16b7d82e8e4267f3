"""Column profiling — the Deequ/Great-Expectations "profile" op.

The reference eyeballs its tables ad hoc (`export_chromadb_to_text.py`
dumps per-collection stats); a pipeline at scale needs a first-class
profiler: one pass per table producing per-column null counts, distinct
cardinalities, and (for strings) total byte length — the inputs to
schema drift detection, join-key selection, and encoding choices.

Shape: ONE aggregate per table computes every column's metrics in a
single scan (count / conditional sums fuse into one partial-aggregable
hash agg; the multi-`count(distinct)` columns plan as one Expand with
k projections — k× the scan's rows into the shuffle, exact). At 100 TB
swap `exact=False` to route cardinalities through HLL++
(`approx_count_distinct`) — same single-Expand-free plan, fixed-size
sketch state; the exact form stays as the small-scale oracle twin (the
sketch-certificate pattern of queries.q_events_distinct_users_sketch
applies if a hashed gate is needed).

The wide 1-row aggregate then unpivots to long format
(table, column, n_rows, n_null, n_distinct, sum_len) driver-side-free
via an array-of-structs explode — no collect, no per-column jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def profile_columns(
    df: DataFrame, table_name: str, cols: list[str], exact: bool = True
) -> DataFrame:
    """Profile `cols` of `df` in one scan → long-format rows
    (table_name, column, n_rows, n_null, n_distinct, sum_len).
    sum_len is total string length for string columns, NULL otherwise
    (formatting non-string values would be engine-specific)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    str_cols = {
        f.name for f in df.schema.fields if isinstance(f.dataType, StringType)
    }
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}")
        )
        nd = (
            F.countDistinct(F.col(c))
            if exact
            else F.approx_count_distinct(F.col(c), 0.01)
        )
        aggs.append(nd.alias(f"_nd_{c}"))
        if c in str_cols:
            aggs.append(
                F.sum(F.length(F.col(c)).cast("long")).alias(f"_len_{c}")
            )
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_null"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                (
                    F.col(f"_len_{c}")
                    if c in str_cols
                    else F.lit(None).cast("long")
                ).alias("sum_len"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select(
        F.lit(table_name).alias("table_name"), "r.*"
    )


def profile_tables(
    named: list[tuple[str, DataFrame, list[str]]], exact: bool = True
) -> DataFrame:
    """Union of profile_columns over several tables — one scan each."""
    out = None
    for name, df, cols in named:
        p = profile_columns(df, name, cols, exact=exact)
        out = p if out is None else out.unionByName(p)
    return out


def distribution_drift(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    threshold_pct: int = 5,
) -> DataFrame:
    """Categorical distribution drift between the first and second half
    of a table's time range — the monitoring op that catches a source
    whose category mix shifts mid-backfill. The split point is the
    integer-microsecond midpoint of [min ts, max ts] (one tiny global
    agg, broadcast); per key the drift gate compares first-half vs
    second-half SHARES by cross-multiplication:

        |n1/T1 − n2/T2| > p/100  ⟺  100·|n1·T2 − n2·T1| > p·T1·T2

    so every comparison is exact BIGINT — no float shares, no rounding
    rules, bit-identical across engines. One partial-aggregable rollup
    over the fact (conditional sums), dim-sized everything after."""
    from floatchat_datapipeline_spark.functions.eventtime import epoch_micros

    us = epoch_micros(F.col(ts_col))
    bounds = df.agg(
        F.min(us).alias("_lo"), F.max(us).alias("_hi")
    ).select(F.expr("(_lo + _hi) div 2").alias("_mid"))
    per = (
        df.crossJoin(F.broadcast(bounds))
        .groupBy(key_col)
        .agg(
            F.sum((us <= F.col("_mid")).cast("bigint")).alias("n_first"),
            F.sum((us > F.col("_mid")).cast("bigint")).alias("n_second"),
        )
    )
    tot = per.agg(
        F.sum("n_first").alias("_t1"), F.sum("n_second").alias("_t2")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        key_col,
        "n_first",
        "n_second",
        (
            100 * F.abs(
                F.col("n_first") * F.col("_t2")
                - F.col("n_second") * F.col("_t1")
            )
            > F.lit(threshold_pct) * F.col("_t1") * F.col("_t2")
        ).alias("drifted"),
    )
