"""Property-based checks (hypothesis) for the round-7 exact-arithmetic
operators: Hamilton apportionment invariants, weighted-median vs a pure
reference, ranged cumsum vs prefix sums. Few examples (each runs Spark
jobs), wide value ranges — the goal is edge shapes (ties, zeros, single
strata), not volume."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

MASSES = st.lists(
    st.integers(min_value=0, max_value=10**9), min_size=1, max_size=8
).filter(lambda xs: sum(xs) > 0)


@settings(max_examples=10, deadline=None)
@given(MASSES, st.integers(min_value=1, max_value=10**6))
def test_mixing_allocation_hamilton_invariants(spark, masses, budget):
    from floatchat_datapipeline_spark.operators.sampling import (
        mixing_allocation,
    )

    rows = [(f"s{i:02d}", m) for i, m in enumerate(masses)]
    df = spark.createDataFrame(rows, "source: string, n_chars: bigint")
    got = {
        r["source"]: r["alloc"]
        for r in mixing_allocation(df, budget=budget).collect()
    }
    total = sum(masses)
    assert sum(got.values()) == budget  # exact apportionment, always
    for (src, m) in rows:
        base = budget * m // total
        assert got[src] in (base, base + 1), (src, m, got[src], base)


WEIGHTED = st.lists(
    st.tuples(
        st.integers(min_value=-100, max_value=100),  # value
        st.integers(min_value=1, max_value=50),  # weight
    ),
    min_size=1,
    max_size=12,
)


def _ref_weighted_median(pairs):
    agg: dict[int, int] = {}
    for v, w in pairs:
        agg[v] = agg.get(v, 0) + w
    tot = sum(agg.values())
    cum = 0
    for v in sorted(agg):
        cum += agg[v]
        if 2 * cum >= tot:
            return v, tot
    raise AssertionError


@settings(max_examples=10, deadline=None)
@given(WEIGHTED)
def test_weighted_median_matches_pure_reference(spark, pairs):
    from floatchat_datapipeline_spark.operators.aggregate import (
        weighted_median,
    )

    df = spark.createDataFrame(
        [("g", v, w) for v, w in pairs], "g: string, v: bigint, w: bigint"
    )
    r = weighted_median(df, ["g"], "v", "w").first()
    want_v, want_t = _ref_weighted_median(pairs)
    assert (r["w_median"], r["total_weight"]) == (want_v, want_t)


VALUES = st.lists(
    st.integers(min_value=-(10**6), max_value=10**6), min_size=1, max_size=40
)


@settings(max_examples=10, deadline=None)
@given(VALUES, st.integers(min_value=1, max_value=9))
def test_ranged_cumsum_matches_prefix_sums(spark, values, n_parts):
    from pyspark.sql import functions as F

    from floatchat_datapipeline_spark.plans.scale import ranged_cumsum

    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "id: bigint, v: bigint")
    got = {
        r["id"]: r["c"]
        for r in ranged_cumsum(
            df, [F.col("id")], "v", out_col="c", n_partitions=n_parts
        ).collect()
    }
    run = 0
    for i, v in rows:
        run += v
        assert got[i] == run
