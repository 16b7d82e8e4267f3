"""Event-stream operators (batch form) — rollups, sessionization, dedup.

The reference has no streaming engine; its incremental surface is
event-at-a-time HTTP ingest (reference fastapi_app.py:614-778, SURVEY.md
§2.12). These operators give that surface proper set-at-a-time semantics on
the `events` table. Each has an identical streaming twin in
streaming/windows.py (same expressions over readStream + watermark);
keeping the batch form separate makes the logic oracle-checkable.

Scale notes: the tumbling rollup is a plain partial-aggregable groupBy.
Sessionization uses a window over (user_id, ts) — partitions by user, so
skew only if one user dominates; the session_window streaming twin handles
the unbounded case with state eviction by watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.functions.eventtime import (
    epoch_micros,
    epoch_seconds,
)

SESSION_GAP_MIN = 30


def hourly_rollup(df: DataFrame) -> DataFrame:
    """Tumbling 1-hour rollup per event_type: count, distinct users,
    sum/avg(value). date_trunc keys the window — identical semantics to
    window('1 hour') but with a plain column key (oracle-friendly and
    partition-prunable when the sink is date-partitioned)."""
    return (
        df.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            # avg = rounded_sum / count, with NO outer round: rounding the
            # sum makes the value partition-order independent, and the raw
            # IEEE quotient is then bit-identical in every engine. An
            # outer round(·, 4) is NOT parity-safe — quotients of a 2dp
            # sum by a small count routinely land exactly on a decimal
            # half boundary (1512.12/32 = 47.25375), where Spark HALF_UPs
            # the shortest repr but DuckDB rounds the binary value one ulp
            # below it (measured: 4 of 3600 groups flipped at sf0.1).
            (F.round(F.sum("value"), 2) / F.count(F.lit(1))).alias(
                "avg_value"
            ),
        )
    )


def _with_session_seq(df: DataFrame, gap_minutes: int) -> DataFrame:
    """Shared gaps-and-islands session-id assignment: boundary where the
    same-user gap exceeds `gap_minutes` (strict >; the streaming
    session_window twin uses >= — see streaming/windows.py), running sum
    of boundaries = session_seq. Single hash partitioning on user_id,
    shared by every downstream same-key window/groupBy. ONE definition so
    sessionize and session_paths can never disagree on session identity."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_sec = gap_minutes * 60
    return df.withColumn(
        "_new_session",
        F.when(
            epoch_seconds("ts") - F.lag(epoch_seconds("ts")).over(w)
            > gap_sec,
            1,
        )
        .otherwise(0)
        .cast("int"),
    ).withColumn("session_seq", F.sum("_new_session").over(w) + F.lit(1))


def sessionize(df: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap
    from the previous event of the same user exceeds `gap_minutes`.

    Output: one row per session with start/end, event count, total value.
    The cumulative-sum-of-boundaries pattern is the deterministic batch
    equivalent of Structured Streaming's session_window (streaming twin in
    streaming/windows.py).
    """
    return (
        _with_session_seq(df, gap_minutes)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def session_paths(
    df: DataFrame,
    gap_minutes: int = SESSION_GAP_MIN,
    max_events: int = 20,
    top_n: int = 15,
) -> DataFrame:
    """Session path mining: the most common event-type journeys.

    Reuses the sessionize boundary pattern to assign per-event session
    ids, builds each session's ordered path by sorting the collected
    (ts, event_id, event_type) structs — collect_list alone is
    partition-order dependent; array_sort makes it deterministic — and
    counts sessions per path. Paths are capped at ``max_events`` events
    (slice before join) so a pathological always-on key cannot build an
    unbounded string; at 100 TB the per-session collect is bounded by the
    session gap, the only full shuffle is the user_id window, and the
    final per-path count is partial-aggregable with a tiny result."""
    paths = (
        _with_session_seq(df, gap_minutes)
        .groupBy("user_id", "session_seq")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.array_join(
                F.slice(
                    F.transform(F.col("evs"), lambda e: e["event_type"]),
                    1,
                    max_events,
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(top_n)
    )


def session_cooccurrence(
    df: DataFrame,
    gap_minutes: int = SESSION_GAP_MIN,
    top_n: int = 20,
) -> DataFrame:
    """Market-basket association mining over session baskets: for every
    unordered event-type pair, the number of sessions containing both
    (support) and the lift n_ab·N / (n_a·n_b). Baskets come from the
    shared _with_session_seq assignment; items dedupe to (session, type)
    BEFORE pairing, so the pair join fans out per basket on distinct
    types (bounded by the type vocabulary), never per raw event. All
    counts are exact integers; lift is one division of exact products
    (n_ab·N ≤ 2^53 at any realistic basket count — past that, DECIMAL).

    Baskets are collected ONCE (sort_array(collect_set) per session) and
    localCheckpointed — the naive items-with-items self-join would
    re-execute the whole sessionize window for both branches (the LSH
    pair-generation rule in operators/dedup.py), and the three consumers
    (basket count, item counts, pair explode) would re-run it three
    times. Pair generation is an in-array double transform over each
    basket's distinct types, so fan-out is bounded by the type
    vocabulary per basket, never raw events — one window shuffle total."""
    baskets = (
        _with_session_seq(df, gap_minutes)
        .groupBy("user_id", "session_seq")
        .agg(F.sort_array(F.collect_set("event_type")).alias("types"))
        .select("types")
        .localCheckpoint(eager=True)
    )
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    singles = (
        baskets.select(F.explode("types").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("types"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("types"), i + 2, F.size(F.col("types"))
                ),
                lambda y: F.struct(x.alias("type_a"), y.alias("type_b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .select("p.type_a", "p.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    return (
        pairs.join(
            F.broadcast(singles.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(singles.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))),
            "type_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            (
                (F.col("n_ab") * F.col("n_baskets")).cast("double")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "type_a", "type_b")
        .limit(top_n)
    )


def rate_limit(
    df: DataFrame,
    cooldown_seconds: int = 1800,
    key: str = "user_id",
) -> DataFrame:
    """D7 — strict per-key rate limiting: keep an event only if it
    arrives > `cooldown_seconds` after the last KEPT event of the same
    key. Unlike the raw-gap debounce (D6), the reference point advances
    only on kept rows, so a long dense burst emits one event per
    cooldown interval instead of being swallowed whole. The recurrence
    (each decision depends on the previous DECISION, not the previous
    row) has no window-function form — this is the canonical per-key
    ``applyInPandas`` seam: sequential in each key's event count,
    embarrassingly parallel across keys, one shuffle on the key.

    Grouped by HASH BUCKET, not by raw key: applyInPandas invokes the
    Python function (and ships an Arrow batch) once per group, so
    per-user groups mean millions of tiny batches at scale — the
    dominant cost is serialization, not the scan (measured 5.4 s →
    ~1.5 s at sf0.1). 64 buckets keep full parallelism while the
    per-key loop runs over an in-worker pandas groupby (same
    n_buckets pattern as asof_join_cogrouped).

    The DuckDB oracle expresses the same recurrence as a recursive CTE
    (each kept row joins to the next qualifying rn), so even this
    iterative operator is value-checked, not rows-only."""
    import pandas as pd

    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    cooldown_us = cooldown_seconds * 1_000_000
    out_schema = StructType(
        [
            StructField(key, LongType()),
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
        ]
    )
    out_cols = [key, "event_id", "ts"]

    def scan_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        t = pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64") // 1000
        keep: list[int] = []
        last = None
        for i, tv in enumerate(t):
            if last is None or tv - last > cooldown_us:
                keep.append(i)
                last = tv
        return pdf.iloc[keep][out_cols]

    def scan_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=["_b"])
        parts = [
            scan_key(g) for _, g in pdf.groupby(key, sort=False)
        ]
        if not parts:
            return pd.DataFrame(columns=out_cols)
        return pd.concat(parts, ignore_index=True)

    return (
        df.select(key, "event_id", "ts")
        .withColumn("_b", F.pmod(F.hash(F.col(key)), F.lit(64)))
        .groupBy("_b")
        .applyInPandas(scan_bucket, schema=out_schema)
    )


def scd2_compact(
    df: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    value_col: str = "value",
    order_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """K11 — slowly-changing-dimension (type 2) history compaction: turn
    an append-only change log into validity intervals. Consecutive equal
    values collapse into one row with [valid_from, valid_to); the current
    value carries valid_to = NULL. The reference's ON CONFLICT upsert
    keeps only the latest row (latest_per_key); this keeps the full
    lineage a warehouse dimension table needs.

    Null-safe change detection (eqNullSafe — a NULL→NULL run is NOT a
    change, NULL→x and x→NULL are). Both windows and the final interval
    assembly share ONE hash partitioning on the key columns, so the
    whole operator costs a single shuffle; per-key state is a sort, no
    buffering beyond Spark's window frame."""
    w = Window.partitionBy(*keys).orderBy(order_col, tiebreak)
    changes = (
        df.withColumn("_prev", F.lag(value_col).over(w))
        .withColumn("_rn", F.row_number().over(w))
        .filter(
            (F.col("_rn") == 1)
            | ~F.col(value_col).eqNullSafe(F.col("_prev"))
        )
    )
    return changes.select(
        *keys,
        F.col(value_col),
        F.col(order_col).alias("valid_from"),
        F.lead(order_col).over(w).alias("valid_to"),
    )


def latest_per_key(
    df: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    order_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """D1-style dedup: keep the latest row per key (the reference's
    ON CONFLICT DO UPDATE upsert semantics, db_handler.py:180-187, as a
    set-at-a-time operator). row_number over (ts desc, tiebreak desc) —
    deterministic under ties, single shuffle on the key."""
    w = Window.partitionBy(*keys).orderBy(
        F.desc(order_col), F.desc(tiebreak)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def parse_props(df: DataFrame, field: str = "k") -> DataFrame:
    """P7 — JSON property extraction (reference json.loads of `properties`,
    db_handler.py:171-177) as a JVM-side path expression, no Python."""
    return df.withColumn(
        f"prop_{field}",
        F.get_json_object(F.col("props"), f"$.{field}").cast("int"),
    )


def rolling_window_agg(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int = 3600,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event trailing-window aggregate: for every row, count and
    exact-cents sum of the same key's rows in [ts - window, ts] — the
    rolling-rate feature a range frame expresses with ZERO joins (the
    binned range join covers the forward-window / cross-table case).

    The range frame is in unix microseconds, so the window arithmetic is
    pure integers; ties at equal ts are all included by RANGE semantics,
    identically in the DuckDB oracle.

    Scale: one shuffle by key, one in-partition sort — Spark evaluates a
    sliding range frame incrementally (two pointers over the sorted
    partition), not O(n·w). Skew only if one key dominates the stream.
    """
    us = window_seconds * 1_000_000
    w = (
        Window.partitionBy(key)
        .orderBy(epoch_micros(ts_col))
        .rangeBetween(-us, 0)
    )
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    return df.select(
        F.col(id_col),
        F.col(key),
        F.col(ts_col),
        cents.alias("_cents"),
    ).select(
        id_col,
        key,
        ts_col,
        F.count(F.lit(1)).over(w).alias("n_window"),
        F.sum("_cents").over(w).alias("cents_window"),
    )


def distinct_users_rollup(df: DataFrame, approx: bool = False) -> DataFrame:
    """Daily distinct-user rollup per event_type (reference analog: the
    dashboard's per-day unique-user counts, fastapi_app.py §stats).

    Exact form: `count(distinct user_id)` — Spark plans it as an Expand
    + two-phase hash aggregate, so the distinct set shuffles by
    (day, event_type, user_id); correct at any scale but the per-group
    distinct state is O(users). `approx=True` swaps in HLL++
    (`approx_count_distinct`, rsd 1%) — the 100 TB path: a fixed-size
    mergeable sketch per group, partial-aggregable, no per-user state.
    tests/test_sketches.py bounds the sketch's relative error against
    this exact twin."""
    n_users = (
        F.approx_count_distinct("user_id", 0.01)
        if approx
        else F.countDistinct("user_id")
    )
    return df.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        n_users.alias("n_users"),
    )


def retention_cohort(df: DataFrame) -> DataFrame:
    """Weekly cohort retention: bucket users by first-seen week, then
    count how many are active k weeks later — the classic retention
    triangle (one row per cohort_week × week_offset).

    Scale design: raw events collapse FIRST to distinct (user_id, week)
    activity — the only pass over the full table, a partial-aggregable
    distinct. First-seen derives from that activity by a groupBy(user_id)
    min; the activity⋈first join keys on user_id, reusing the
    aggregation's hash partitioning (no extra shuffle under AQE), and
    the final (cohort, offset) rollup is tiny regardless of corpus
    size. After the distinct, (user_id, week) is unique and each user
    has exactly one cohort, so the per-cell count(*) IS the distinct
    user count — no second distinct needed."""
    activity = df.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    first = activity.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        activity.join(first, "user_id")
        .groupBy(
            F.to_date("cohort").alias("cohort_week"),
            (F.datediff(F.to_date("wk"), F.to_date("cohort")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def sliding_distinct_users(df: DataFrame, window_hours: int = 24) -> DataFrame:
    """Trailing-`window_hours` DISTINCT users per hour — the sliding
    HAU/DAU counter. Distinct counts do NOT compose over overlapping
    window frames (Spark's window functions rightly refuse
    `count(distinct) OVER RANGE`), so the scalable form is
    bucket-contribution: dedupe to (hour, user) FIRST (the only pass
    over the raw log — partial-aggregable), then each membership
    contributes to the ≤W windows ending at hour..hour+W−1 via a
    `sequence` explode, and one hash-distinct per target hour finishes
    it. Fan-out is W× the DEDUPED memberships, never W× the raw events;
    at 100 TB the dedupe collapses the log ~events-per-user-hour-fold
    before any fan-out. Only hours that actually have activity are
    reported (left-semi against observed hours)."""
    hu = df.select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "user_id"
    ).distinct()
    hours = hu.select("h").distinct()
    contrib = hu.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("h"),
                F.col("h")
                + F.make_interval(hours=F.lit(window_hours - 1)),
                F.make_interval(hours=F.lit(1)),
            )
        ).alias("t"),
    )
    return (
        contrib.join(hours, contrib["t"] == hours["h"], "left_semi")
        .groupBy(F.col("t").alias("hour"))
        .agg(F.countDistinct("user_id").alias("n_users_trailing"))
    )


def new_vs_returning(df: DataFrame) -> DataFrame:
    """Daily growth accounting: active users split into first-ever-seen
    (new) vs returning, plus the cumulative distinct-user count to date.
    Shape: dedupe activity to (day, user) — the only pass over the log,
    partial-aggregable — derive first-seen by a user-keyed min, join the
    two BY USER (the aggregation's own hash partitioning; broadcast
    while small), roll up per day, and run the cumulative sum over the
    tiny day domain. The running cum_users equals Σ n_new because each
    user is 'new' exactly once — no sliding distinct needed."""
    daily = df.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    first = daily.groupBy("user_id").agg(F.min("day").alias("_first"))
    per_day = (
        daily.join(first, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum((F.col("day") == F.col("_first")).cast("bigint")).alias(
                "n_new"
            ),
        )
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        F.col("day").cast("string").alias("day"),
        "n_active",
        "n_new",
        (F.col("n_active") - F.col("n_new")).alias("n_returning"),
        F.sum("n_new").over(w).alias("cum_users"),
    )
