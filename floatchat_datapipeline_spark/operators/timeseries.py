"""Time-series joins over event streams — as-of join, binned range join,
conversion funnel.

Parity-plus operators (the reference has no time-series join capability;
its closest behavior is the per-upload "latest state" sync in
sync_supabase_to_chromadb.py:87-115, which is a point lookup). These are
the joins an event/feature pipeline needs and Spark lacks as builtins.

Scale design:
- **as-of join**: NOT a range self-join. Both sides are unioned, shuffled
  ONCE by the join key, sorted by (ts, side) within the key, and the
  right-side payload is carried forward with a cumulative
  `last(ignorenulls)` window. One shuffle + one sort — the merge-join
  shape kdb/QuestDB/Flink use for asof; a naive theta join is O(n·m) per
  key and a Catalyst BroadcastNestedLoop at worst.
- **binned range join**: time windows of width W are equi-joined on
  (key, floor(ts/W)) with the probe side exploded to the ≤2 bins its
  window overlaps, then exact-filtered. The shuffle is an equi-join
  shuffle (hash by key+bin), never a cross/BNLJ — the standard interval-
  join binning trick (Flink interval join, DuckDB IEJoin's hash fallback).
- **funnel**: per-stage conditional min-aggregates, one shuffle per stage
  (each stage's threshold depends on the previous stage's per-key result);
  all joins are on the small per-key aggregate, broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.functions.eventtime import epoch_micros, long_div


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    payload_cols: tuple[str, ...] = ("value",),
    right_order_col: str | None = None,
    payload_prefix: str = "asof_",
) -> DataFrame:
    """For every `left` row, attach the payload of the latest `right` row
    with the same `on` key and right.ts <= left.ts (at-or-before).

    Union-merge implementation: right rows sort BEFORE left rows at equal
    ts (side 0 < 1), so an exactly-simultaneous right row is visible.
    Ties among right rows at the same ts break to the highest
    `right_order_col` (deterministic, mirrors "last write wins").

    Output: all `left` columns + `{prefix}{ts_col}` + `{prefix}{payload}`
    for each payload column (NULL when no right row precedes).
    """
    lcols = left.columns
    payload = F.struct(
        F.col(ts_col).alias(ts_col),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    r = right.select(
        F.col(on),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        (
            F.col(right_order_col) if right_order_col else F.lit(0)
        ).alias("_ord"),
        payload.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c != on],
    )
    l = left.select(
        F.col(on),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(0).alias("_ord"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c) for c in lcols if c != on],
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side", "_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "_asof", F.last("_payload", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == 1).select(
        *lcols,
        F.col(f"_asof.{ts_col}").alias(f"{payload_prefix}{ts_col}"),
        *[
            F.col(f"_asof.{c}").alias(f"{payload_prefix}{c}")
            for c in payload_cols
        ],
    )


def binned_range_agg(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    window_seconds: int,
    probe_ts: str = "ts",
    build_ts: str = "ts",
    probe_id: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """For every `probe` row, aggregate `build` rows with the same key in
    [probe.ts, probe.ts + window_seconds): count + exact integer cents sum.

    Bin width == window width, so a probe window overlaps at most 2 bins;
    the probe side explodes ×2 and the join is a pure equi-join on
    (key, bin). Probe rows with an empty window survive with count 0 via
    the final left join back onto the probe set.

    Output: (probe_id, on, n_matches, value_cents).
    """
    us = window_seconds * 1_000_000
    p = probe.select(
        F.col(probe_id),
        F.col(on),
        F.col(probe_ts).alias("_pts"),
        (long_div(epoch_micros(probe_ts), us)).alias("_bin0"),
    )
    p_bins = p.withColumn(
        "_bin", F.explode(F.array(F.col("_bin0"), F.col("_bin0") + 1))
    )
    b = build.select(
        F.col(on),
        F.col(build_ts).alias("_bts"),
        (long_div(epoch_micros(build_ts), us)).alias("_bin"),
        # exact cents BEFORE the sum: double-sum order-dependence can't
        # bite, and the oracle's integer sum agrees bit-for-bit
        F.round(F.col(value_col) * 100, 0).cast("long").alias("_cents"),
    )
    matched = (
        p_bins.join(b, [on, "_bin"])
        .filter(
            (F.col("_bts") >= F.col("_pts"))
            & (F.col("_bts") < F.col("_pts") + F.expr(f"INTERVAL {window_seconds} SECONDS"))
        )
        .groupBy(probe_id)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_cents").alias("_sum_cents"),
        )
    )
    return (
        p.join(matched, probe_id, "left")
        .select(
            probe_id,
            on,
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_matches"),
            F.coalesce(F.col("_sum_cents"), F.lit(0)).cast("long").alias("value_cents"),
        )
    )


def event_funnel(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: a key reaches stage i when an event of
    stages[i] occurs AT OR AFTER its stage i-1 arrival time. Output one
    row per key: (key, stage1_ts, ..., stageN_ts) with NULLs where the
    funnel stalls — the per-user form; count non-nulls for the report.

    Each stage is one conditional min-aggregate over events joined
    (broadcast) to the previous stage's per-key result: N_stages shuffles
    of per-key aggregates, never a self-join of the event log.
    """
    ev = events.select(F.col(key), F.col(ts_col), F.col(type_col))
    result = None
    prev_ts = None
    for i, stage in enumerate(stages):
        stage_ts = f"{stage}_ts"
        if result is None:
            result = (
                ev.filter(F.col(type_col) == stage)
                .groupBy(key)
                .agg(F.min(ts_col).alias(stage_ts))
            )
        else:
            nxt = (
                ev.filter(F.col(type_col) == stage)
                .join(F.broadcast(result.select(key, prev_ts)), key)
                .filter(F.col(ts_col) >= F.col(prev_ts))
                .groupBy(key)
                .agg(F.min(ts_col).alias(stage_ts))
            )
            result = result.join(nxt, key, "left")
        prev_ts = stage_ts
    return result


def gapfill_locf(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hypertable-style gap-fill: bucket events per key into hours,
    regenerate every key's hourly grid from its first to last bucket,
    and carry the last observed value forward into empty buckets (LOCF
    interpolation).

    Values aggregate as exact integer cents (sum order can't bite) and
    the carried value is the cents sum — all-integer LOCF, no doubles.

    Plan: one groupBy (key, hour) rollup; a per-key min/max aggregate
    whose `sequence` generates the grid (explode is proportional to the
    key's time span, never the event count); one left join grid→rollup
    on (key, hour); one carry-forward window per key. Everything
    partitions by key — no global sort, no driver loops. Spans are
    bounded by the watermark/retention policy upstream at 100 TB (a
    key with a years-long span explodes to ~10⁴ rows, still tiny).

    Output: (key, hour, n_events, value_cents, filled_cents, is_gap) —
    value_cents NULL on gap rows, filled_cents the LOCF value.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    hourly = (
        events.select(
            F.col(key),
            hour.alias("_hour"),
            F.round(F.col(value_col) * 100, 0).cast("long").alias("_cents"),
        )
        .groupBy(key, "_hour")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_cents").alias("_sum_cents"),
        )
    )
    grid = (
        hourly.groupBy(key)
        .agg(F.min("_hour").alias("_lo"), F.max("_hour").alias("_hi"))
        .select(
            F.col(key),
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.expr("INTERVAL 1 HOUR"))
            ).alias("_hour"),
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, [key, "_hour"], "left")
        .withColumn("_filled", F.last("_sum_cents", ignorenulls=True).over(w))
        .select(
            key,
            F.col("_hour").alias("hour"),
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
            F.col("_sum_cents").alias("value_cents"),
            F.col("_filled").alias("filled_cents"),
            F.col("_sum_cents").isNull().alias("is_gap"),
        )
    )


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    payload_cols: tuple[str, ...] = ("value",),
    right_order_col: str | None = None,
    payload_prefix: str = "asof_",
    n_buckets: int = 64,
) -> DataFrame:
    """`asof_join` re-expressed as a cogrouped Pandas operator — the
    custom-operator escape hatch for per-key logic DataFrame expressions
    can't say: both sides hash-partition ONCE on the key, each key's two
    partitions meet in a single Python worker, and pandas.merge_asof does
    the per-key backward scan (Arrow-batched, never row-at-a-time).

    Semantics are identical to the union-merge asof_join (at-or-before;
    equal-ts right rows visible; ties break to the highest
    `right_order_col`), so the SAME DuckDB oracle value-checks both.
    The union-merge form is the default at scale — one shuffle and pure
    JVM — while this form is the template for per-key algorithms with no
    window-function equivalent (ODE integration, per-entity model
    scoring, trajectory resampling).

    The cogroup key is a HASH BUCKET of `on`, not `on` itself:
    cogrouping raw keys makes one pandas frame per key (10k tiny frames
    → Python call overhead dominates, measured 20× slower than the JVM
    twin at sf0.1), while `merge_asof(by=on)` does the per-key matching
    vectorized inside each of `n_buckets` Arrow-sized batches. Same
    partition-count discipline a 1000-executor job needs: task count set
    by a knob, not by key cardinality.
    """
    import pandas as pd  # noqa: PLC0415

    from pyspark.sql.types import StructField, StructType  # noqa: PLC0415

    out_ts = f"{payload_prefix}{ts_col}"
    # Fresh StructType — StructType.add MUTATES the receiver, and
    # df.schema is cached on the DataFrame, so building on it in place
    # would poison `left`'s own column list.
    out_schema = StructType(
        list(left.schema.fields)
        + [StructField(out_ts, left.schema[ts_col].dataType)]
        + [
            StructField(f"{payload_prefix}{c}", right.schema[c].dataType)
            for c in payload_cols
        ]
    )

    rsel = [on, ts_col, *payload_cols] + (
        [right_order_col] if right_order_col and right_order_col not in
        (on, ts_col, *payload_cols) else []
    )

    out_fields = [f.name for f in out_schema.fields]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.drop(columns=["_b"])
        rpdf = rpdf.drop(columns=["_b"])
        if lpdf.empty:
            return pd.DataFrame(columns=out_fields)
        if rpdf.empty:
            out = lpdf.copy()
            out[out_ts] = pd.NaT
            for c in payload_cols:
                out[f"{payload_prefix}{c}"] = None
            return out[out_fields]
        sort_keys = [ts_col] + (
            [right_order_col] if right_order_col else []
        )
        rpdf = rpdf.sort_values(sort_keys, kind="mergesort")
        # merge_asof keeps the LAST matching right row per (by, ts) — with
        # the stable secondary sort above that IS the highest
        # right_order_col.
        r = rpdf[[on, ts_col, *payload_cols]].rename(
            columns={ts_col: out_ts, **{c: f"{payload_prefix}{c}" for c in payload_cols}}
        )
        merged = pd.merge_asof(
            lpdf.sort_values(ts_col, kind="mergesort"),
            r,
            left_on=ts_col,
            right_on=out_ts,
            by=on,
            direction="backward",
            allow_exact_matches=True,
        )
        return merged[out_fields]

    bucket = F.pmod(F.hash(F.col(on)), F.lit(n_buckets)).alias("_b")
    l2 = left.withColumn("_b", bucket)
    r2 = right.select(*rsel).withColumn("_b", bucket)
    return (
        l2.groupBy("_b")
        .cogroup(r2.groupBy("_b"))
        .applyInPandas(merge, schema=out_schema)
    )


def ewma_anomalies(
    df: DataFrame,
    alpha: float = 0.5,
    threshold: float = 150.0,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """TS8 — EWMA control-chart anomaly detection: per key, track an
    exponentially weighted moving average of `value_col` in event order
    and flag every observation whose deviation from the PRE-observation
    EWMA exceeds `threshold` (the classic EWMA control chart, Roberts
    1959). The state updates on every row — anomalies included — so the
    tracker re-centers after level shifts instead of flagging forever.

    Like rate_limit (D7), the recurrence depends on continuously evolving
    per-key state (ewma_i = a*x_i + (1-a)*ewma_{i-1}), which no window
    function expresses: `applyInPandas` — sequential in each key's
    event count, embarrassingly parallel across keys, one shuffle.
    Grouped by hash bucket (64), not raw key: one Arrow batch per
    bucket instead of one per user, the in-worker pandas groupby runs
    the per-key loop (same pattern as rate_limit/asof_join_cogrouped —
    per-key Arrow batches are the dominant cost at scale).
    The DuckDB oracle replays the recurrence as a recursive CTE stepping
    rn -> rn+1, so the iterative operator is value-checked. With the
    default alpha=0.5 every multiply is exact in IEEE754 and both engines
    perform the identical single rounded addition per step, so
    `prev_ewma` is bit-identical cross-engine (see
    tests/test_parity_rules.py conventions).

    Reference analog: none (the reference has no time-series monitoring);
    closest behavior is its per-upload latest-state sync
    (sync_supabase_to_chromadb.py:87-115). Parity-plus operator.
    """
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    a = float(alpha)
    b = 1.0 - a
    out_schema = StructType(
        [
            StructField(key, LongType()),
            StructField("event_id", LongType()),
            StructField(ts_col, TimestampType()),
            StructField(value_col, DoubleType()),
            StructField("prev_ewma", DoubleType()),
        ]
    )

    out_cols = [key, "event_id", ts_col, value_col]

    def scan_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, "event_id"]).reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype="float64")
        keep: list[int] = []
        prevs: list[float] = []
        ewma = None
        for i, xv in enumerate(x):
            xv = float(xv)
            if ewma is not None:
                if abs(xv - ewma) > threshold:
                    keep.append(i)
                    prevs.append(ewma)
                ewma = a * xv + b * ewma
            else:
                ewma = xv
        out = pdf.iloc[keep][out_cols].copy()
        out["prev_ewma"] = prevs
        return out

    def scan_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=["_b"])
        parts = [scan_key(g) for _, g in pdf.groupby(key, sort=False)]
        if not parts:
            return pd.DataFrame(columns=[*out_cols, "prev_ewma"])
        return pd.concat(parts, ignore_index=True)

    return (
        df.select(key, "event_id", ts_col, value_col)
        .withColumn("_b", F.pmod(F.hash(F.col(key)), F.lit(64)))
        .groupBy("_b")
        .applyInPandas(scan_bucket, schema=out_schema)
    )


def gapfill_linterp(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """TS9 — hypertable-style gap-fill with LINEAR interpolation: like
    gapfill_locf (TS4) but empty buckets take the straight line between
    the surrounding observed buckets (TimescaleDB's `interpolate()`
    beside `locf()`). Fully declarative — the same grid build as TS4
    plus two windows (carry-back and carry-forward of the nearest
    observed bucket), zero UDFs, everything partitioned by key.

    The carry-forward columns deliberately do NOT use a
    `currentRow..unboundedFollowing` frame: Spark's WindowExec evaluates
    that shrinking frame by re-aggregating from the current row to the
    partition end for EVERY row — O(n²) per key (measured 16× slower
    than the LOCF twin at sf0.1). Instead "nearest following
    observation" is a running `last(ignorenulls)` over the same key
    partitioning sorted DESCENDING — a growing O(n) frame; the second
    in-partition sort is O(n log n) and reuses the single exchange.

    Parity discipline: bucket sums are exact integer cents; the hour
    index is an exact integer (epoch_us div 3.6e9 — every quotient
    representable). The interpolation itself is double math, but BOTH
    engines evaluate the identical expression tree
    ``(double)prev + (double)(next-prev) * ((double)k / (double)span)``
    — each step singly rounded in the same order, so `filled_value` is
    bit-identical cross-engine (same convention as
    ewma_anomalies/TS8). Interior gaps always have both neighbors
    because the grid spans exactly [first, last] observed bucket.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    hourly = (
        events.select(
            F.col(key),
            hour.alias("_hour"),
            F.round(F.col(value_col) * 100, 0).cast("long").alias("_cents"),
        )
        .groupBy(key, "_hour")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_cents").alias("_sum_cents"),
        )
    )
    grid = (
        hourly.groupBy(key)
        .agg(F.min("_hour").alias("_lo"), F.max("_hour").alias("_hi"))
        .select(
            F.col(key),
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.expr("INTERVAL 1 HOUR"))
            ).alias("_hour"),
        )
    )
    wb = (
        Window.partitionBy(key)
        .orderBy("_hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(F.desc("_hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hidx = (F.unix_micros(F.col("_hour")) / F.lit(3_600_000_000)).cast("long")
    obs_hidx = F.when(F.col("_sum_cents").isNotNull(), F.col("_hidx"))
    lerp = F.col("_prev_c").cast("double") + (
        F.col("_next_c") - F.col("_prev_c")
    ).cast("double") * (
        (F.col("_hidx") - F.col("_prev_h")).cast("double")
        / (F.col("_next_h") - F.col("_prev_h")).cast("double")
    )
    return (
        grid.join(hourly, [key, "_hour"], "left")
        .withColumn("_hidx", hidx)
        # each direction's pair in ONE projection → exactly two Window
        # nodes (asc + desc running frames) over one exchange; both
        # frames are growing (O(n)), never the shrinking
        # unboundedFollowing frame WindowExec re-aggregates per row
        .select(
            "*",
            F.last("_sum_cents", ignorenulls=True).over(wb).alias("_prev_c"),
            F.last(obs_hidx, ignorenulls=True).over(wb).alias("_prev_h"),
        )
        .select(
            "*",
            F.last("_sum_cents", ignorenulls=True).over(wf).alias("_next_c"),
            F.last(obs_hidx, ignorenulls=True).over(wf).alias("_next_h"),
        )
        .select(
            key,
            F.col("_hour").alias("hour"),
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
            F.col("_sum_cents").alias("value_cents"),
            F.when(
                F.col("_sum_cents").isNotNull(),
                F.col("_sum_cents").cast("double"),
            )
            .otherwise(lerp)
            .alias("filled_value"),
            F.col("_sum_cents").isNull().alias("is_gap"),
        )
    )


def peak_concurrency(
    df: DataFrame,
    hold_seconds: int = 300,
    key: str = "event_type",
) -> DataFrame:
    """Max-overlap sweep line: treating each event as an open interval
    [ts, ts + hold), the peak number of simultaneously open intervals per
    key — the "how many sessions were live at the worst moment" question
    capacity planning asks of any event log.

    Plan: one union of +1/−1 boundary points, ONE window (running sum
    over (t, delta) within the key partition — a growing ROWS frame,
    O(n)), one groupBy max. Ordering by (t, delta) puts closes before
    opens at the same instant, so touching intervals don't double-count;
    within a tied (t, delta) block the block-end prefix sum — the only
    one the max can land on — is permutation-invariant, so the result is
    deterministic under any shuffle order. All integer arithmetic.

    Scale: partitions by key; a single globally-hot key serializes its
    sweep — shard the key by time range first (each shard sweeps
    independently, seeded by the open-count carried over from the
    previous shard via one small join) — documented, not needed at the
    5-key test cardinality.
    """
    ev = df.select(key, "ts")
    pts = ev.select(
        key, F.col("ts").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        ev.select(
            key,
            (F.col("ts") + F.expr(f"INTERVAL {hold_seconds} SECONDS")).alias(
                "t"
            ),
            F.lit(-1).alias("delta"),
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pts.withColumn("open_now", F.sum("delta").over(w))
        .groupBy(key)
        .agg(
            F.max("open_now").alias("peak_concurrency"),
            (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
        )
        .orderBy(key)
    )


def interval_union(
    df: DataFrame,
    hold_seconds: int = 300,
    key: str = "user_id",
) -> DataFrame:
    """Interval-union coverage (gaps-and-islands merge): per key, merge
    the overlapping/touching intervals [ts, ts + hold) and report how
    many merged islands remain and the total covered microseconds — the
    "actual active time" metric that naive sum-of-durations double-counts
    whenever events overlap.

    Plan: one window partitioning — a running max of interval-end over
    strictly-preceding rows marks island starts (ts > max carries a gap),
    a running sum of those flags numbers the islands, then one groupBy
    per (key, island) and one per key. The running max and sum share the
    same (key · ts, event_id) sort, so Catalyst plans ONE exchange + sort
    for both Window nodes. End-of-island and coverage are exact integer
    microseconds (epoch_micros), so the DuckDB oracle hashes identically.
    """
    hold_us = hold_seconds * 1_000_000
    ev = df.select(
        key, "event_id", epoch_micros(F.col("ts")).alias("s_us")
    ).withColumn("e_us", F.col("s_us") + F.lit(hold_us))
    wp = (
        Window.partitionBy(key)
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wr = (
        Window.partitionBy(key)
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.withColumn(
        "new_island",
        F.when(
            F.col("s_us") > F.max("e_us").over(wp), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "island",
        F.sum(
            # first row per key has a NULL running max → new_island 0;
            # make row 1 open island 1 explicitly
            F.when(F.max("e_us").over(wp).isNull(), F.lit(1)).otherwise(
                F.col("new_island")
            )
        ).over(wr),
    )
    islands = flagged.groupBy(key, "island").agg(
        F.min("s_us").alias("i_start"),
        F.max("e_us").alias("i_end"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    return (
        islands.groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("n_ev").alias("n_intervals"),
            F.sum(F.col("i_end") - F.col("i_start")).alias("covered_us"),
        )
        .orderBy(key)
    )


def seasonal_baseline_spikes(df: DataFrame, factor: int = 2) -> DataFrame:
    """Hour-of-day seasonal anomaly detection: a (day, hour, event_type)
    cell is a spike when its value mass exceeds `factor`× the MEAN mass
    of the same (event_type, hour-of-day) slot across all days — the
    seasonality-aware twin of the global MAD detector (events_mad_
    outliers). Two aggregations: the cell rollup (one shuffle over the
    log, partial-aggregable) and the per-(type, hour-of-day) baseline
    (≤ types×24 rows — broadcast back, no second shuffle of the log).

    Exact integer arithmetic end-to-end: masses are summed in cents and
    the threshold test cross-multiplies (cents · n_days > factor ·
    total_cents) instead of dividing, so there is NO float anywhere and
    any engine agrees bit-for-bit. The baseline includes the cell under
    test (population mean, not leave-one-out) — deterministic and
    side-effect-free for backfills."""
    cents = F.round(F.col("value") * 100).cast("long")
    cell = df.groupBy(
        F.to_date("ts").alias("day"),
        F.hour("ts").alias("hod"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents).alias("cents"),
    )
    base = cell.groupBy("event_type", "hod").agg(
        F.sum("cents").alias("base_cents"),
        F.count(F.lit(1)).alias("n_days"),
    )
    j = cell.join(F.broadcast(base), ["event_type", "hod"])
    return j.select(
        F.col("day").cast("string").alias("day"),
        "hod",
        "event_type",
        "n_events",
        "cents",
        (
            F.col("cents") * F.col("n_days")
            > F.lit(factor) * F.col("base_cents")
        ).alias("is_spike"),
    )


def cusum_changepoints(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """TS12 — two-sided CUSUM changepoint detection (Page 1954) over the
    per-key HOURLY cents series, entirely in BIGINT: target = the key's
    integer-mean hourly cents, slack = target div 20 (the 5 % allowance
    k), alarm threshold h = target. State
    S⁺ₜ = max(0, S⁺ₜ₋₁ + (xₜ − target − slack)) accumulates sustained
    upward drift (S⁻ mirrors downward); crossing h emits an alarm row
    and RESETS both sides (restart-after-detection, the standard field
    form). Integer state means both engines replay the recurrence
    bit-identically — the oracle is a recursive CTE stepping rn→rn+1
    with the same greatest() arithmetic, no rounding rules at all
    (stronger than the EWMA chart, whose floats needed the alpha=0.5
    exactness argument).

    Like the other true recurrences (D7 rate limit, TS8 EWMA), no window
    function expresses the reset; applyInPandas grouped by 64-way hash
    bucket (one Arrow batch per bucket, per-key loop in-worker). The
    hourly pre-aggregation is the only pass over the raw log."""
    import pandas as pd

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from floatchat_datapipeline_spark.functions.eventtime import (
        epoch_micros,
        long_div,
    )

    hourly = df.groupBy(
        F.col(key),
        long_div(
            epoch_micros(F.date_trunc("hour", F.col(ts_col))), 3_600_000_000
        ).alias("hx"),
    ).agg(F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("cents"))
    tgt = hourly.groupBy(key).agg(
        F.expr("sum(cents) div count(*)").alias("_target")
    )
    h = hourly.join(F.broadcast(tgt), key)

    out_schema = StructType(
        [
            StructField(key, StringType()),
            StructField("hx", LongType()),
            StructField("s_pos", LongType()),
            StructField("s_neg", LongType()),
            StructField("direction", StringType()),
        ]
    )

    def scan_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("hx").reset_index(drop=True)
        target = int(pdf["_target"].iloc[0])
        # target comes from Spark `div` (truncates toward zero); the
        # slack division must truncate too — Python // floors, which
        # diverges from the DuckDB oracle's // when target < 0.
        slack = _trunc_div(target, 20)
        thresh = target
        sp = sn = 0
        rows = []
        for hx, c in zip(pdf["hx"], pdf["cents"]):
            c = int(c)
            sp_at = max(0, sp + (c - target - slack))
            sn_at = max(0, sn + (target - slack - c))
            if sp_at > thresh or sn_at > thresh:
                rows.append(
                    (
                        pdf[key].iloc[0],
                        int(hx),
                        sp_at,
                        sn_at,
                        "up" if sp_at > thresh else "down",
                    )
                )
                sp = sn = 0
            else:
                sp, sn = sp_at, sn_at
        return pd.DataFrame(
            rows, columns=[key, "hx", "s_pos", "s_neg", "direction"]
        )

    def scan_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=["_b"])
        parts = [scan_key(g) for _, g in pdf.groupby(key, sort=False)]
        if not parts:
            return pd.DataFrame(
                columns=[key, "hx", "s_pos", "s_neg", "direction"]
            )
        return pd.concat(parts, ignore_index=True)

    return (
        h.withColumn("_b", F.pmod(F.hash(F.col(key)), F.lit(64)))
        .groupBy("_b")
        .applyInPandas(scan_bucket, schema=out_schema)
    )


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero — Spark `div` and DuckDB
    `//` semantics. Python's `//` FLOORS, which diverges on negative
    numerators (-7 // 2 = -4 vs -3), so every in-worker replay of an
    engine-side recurrence must route division through this."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def holt_linear(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """TS14 — Holt double-exponential smoothing (level + trend) over the
    per-key HOURLY cents series, entirely in BIGINT fixed point with
    alpha = beta = 1/4 by truncating integer division:

        L_t = (x_t + 3*(L_{t-1} + B_{t-1})) div 4
        B_t = ((L_t - L_{t-1}) + 3*B_{t-1}) div 4      (L_1 = x_1, B_1 = 0)

    Integer state makes both engines replay the recurrence
    bit-identically (the TS12 CUSUM argument); the forecast is
    `level + trend`, no floats anywhere. The trend term CAN go negative,
    so the in-worker replay divides via _trunc_div to match DuckDB `//`
    / Spark `div` truncation, not Python floor.

    Same execution shape as the other true recurrences: hourly
    pre-aggregation is the only pass over the raw log, then
    applyInPandas grouped by 64-way hash bucket (one Arrow batch per
    bucket, per-key loop in-worker)."""
    import pandas as pd

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from floatchat_datapipeline_spark.functions.eventtime import (
        epoch_micros,
        long_div,
    )

    hourly = df.groupBy(
        F.col(key),
        long_div(
            epoch_micros(F.date_trunc("hour", F.col(ts_col))), 3_600_000_000
        ).alias("hx"),
    ).agg(F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("cents"))

    out_schema = StructType(
        [
            StructField(key, StringType()),
            StructField("hx", LongType()),
            StructField("level", LongType()),
            StructField("trend", LongType()),
            StructField("forecast_next", LongType()),
        ]
    )

    def scan_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("hx").reset_index(drop=True)
        lvl = trd = None
        rows = []
        for hx, c in zip(pdf["hx"], pdf["cents"]):
            c = int(c)
            if lvl is None:
                lvl, trd = c, 0
            else:
                new_lvl = _trunc_div(c + 3 * (lvl + trd), 4)
                trd = _trunc_div((new_lvl - lvl) + 3 * trd, 4)
                lvl = new_lvl
            rows.append((pdf[key].iloc[0], int(hx), lvl, trd, lvl + trd))
        return pd.DataFrame(
            rows, columns=[key, "hx", "level", "trend", "forecast_next"]
        )

    def scan_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=["_b"])
        parts = [scan_key(g) for _, g in pdf.groupby(key, sort=False)]
        if not parts:
            return pd.DataFrame(
                columns=[key, "hx", "level", "trend", "forecast_next"]
            )
        return pd.concat(parts, ignore_index=True)

    return (
        hourly.withColumn("_b", F.pmod(F.hash(F.col(key)), F.lit(64)))
        .groupBy("_b")
        .applyInPandas(scan_bucket, schema=out_schema)
    )


def capped_sessions(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    max_seconds: int = 1800,
) -> DataFrame:
    """TS15 — sessionization with BOTH an inactivity gap AND a maximum
    session duration: a new session starts when the gap from the
    previous event exceeds `gap_seconds` OR the span since the CURRENT
    session's first event would exceed `max_seconds` (default 30 min —
    chosen to actually BIND on this generator's traffic, whose longest
    gap-only session is ~57 min; an unbinding cap would make the
    operator vacuously equal to the windowed form). The duration cap
    makes this a true recurrence — the split decision depends on the
    session start chosen by earlier decisions — so no window-function
    rewrite exists (the gap-only form, operators/windows.sessionize, is
    the windowed special case max_seconds = infinity).

    All state is BIGINT epoch seconds; ordering totalizes ties by
    (ts, event_id). Execution is the recurrence shape shared with
    TS8/TS12/TS14: applyInPandas over 64 hash buckets, per-key loop
    in-worker; the oracle is a recursive CTE stepping rn -> rn+1."""
    import pandas as pd

    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    from floatchat_datapipeline_spark.functions.eventtime import (
        epoch_seconds,
    )

    ev = df.select(
        F.col(key),
        epoch_seconds(F.col(ts_col)).alias("ts_s"),
        F.col("event_id"),
    )

    out_schema = StructType(
        [
            StructField(key, LongType()),
            StructField("session_seq", LongType()),
            StructField("start_s", LongType()),
            StructField("end_s", LongType()),
            StructField("n_events", LongType()),
        ]
    )

    def scan_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_s", "event_id"]).reset_index(drop=True)
        uid = pdf[key].iloc[0]
        rows = []
        seq = 0
        start = prev = None
        n = 0
        for t in pdf["ts_s"]:
            t = int(t)
            if (
                seq == 0
                or t - prev > gap_seconds
                or t - start > max_seconds
            ):
                if seq:
                    rows.append((uid, seq, start, prev, n))
                seq += 1
                start = t
                n = 0
            n += 1
            prev = t
        rows.append((uid, seq, start, prev, n))
        return pd.DataFrame(
            rows,
            columns=[key, "session_seq", "start_s", "end_s", "n_events"],
        )

    def scan_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=["_b"])
        parts = [scan_key(g) for _, g in pdf.groupby(key, sort=False)]
        if not parts:
            return pd.DataFrame(
                columns=[key, "session_seq", "start_s", "end_s", "n_events"]
            )
        return pd.concat(parts, ignore_index=True)

    return (
        ev.withColumn("_b", F.pmod(F.hash(F.col(key)), F.lit(64)))
        .groupBy("_b")
        .applyInPandas(scan_bucket, schema=out_schema)
    )
