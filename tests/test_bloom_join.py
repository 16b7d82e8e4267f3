"""Bloom semi-join (J16): exactness, prefilter effectiveness, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from floatchat_datapipeline_spark.catalog import load_table
from floatchat_datapipeline_spark.operators.joins import (
    BLOOM_JOIN_BITS,
    BLOOM_JOIN_HASHES,
    _bloom_join_positions,
    bloom_semi_join,
)
from floatchat_datapipeline_spark.plans.checks import plan_string


def test_bloom_semi_join_equals_plain_semi_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    auto = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "AUTOMOBILE"
    )
    got = bloom_semi_join(orders, auto, "o_custkey", "c_custkey")
    want = orders.join(
        auto.select("c_custkey").distinct(),
        orders["o_custkey"] == F.col("c_custkey"),
        "left_semi",
    )
    assert got.count() == want.count()
    assert got.select("o_orderkey").exceptAll(
        want.select("o_orderkey")
    ).count() == 0


def test_bloom_prefilter_cuts_fact_rows(spark, sf_dir):
    """The map-only probe must pass ≈ true-matches + fpr, not the whole
    fact. With k=5 over 2^17 bits and the dim-key cardinalities at test
    scale, fpr is well under 5%, so the prefiltered row count must stay
    below matches + 5% of the fact."""
    orders = load_table(spark, sf_dir, "orders")
    auto = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "AUTOMOBILE"
    )
    key_set = auto.select(F.col("c_custkey").alias("_k")).distinct()
    n_fact = orders.count()
    n_true = orders.join(key_set, orders["o_custkey"] == F.col("_k"), "left_semi").count()

    # replicate the probe stage alone
    kept = bloom_semi_join(orders, auto, "o_custkey", "c_custkey")
    # exactness already checked; here bound the probe's pass-through by
    # rebuilding it: count rows passing the bit tests pre-join
    from floatchat_datapipeline_spark.operators.joins import (  # noqa: PLC0415
        BLOOM_JOIN_BITS as m,
    )
    pos_rows = (
        key_set.select(
            F.explode(
                F.array(*_bloom_join_positions(F.col("_k")))
            ).alias("p")
        )
        .distinct()
        .groupBy(F.expr("CAST(p div 64 AS INT)").alias("w"))
        .agg(F.expr("bit_or(shiftleft(1L, CAST(p % 64 AS INT)))").alias("bits"))
        .collect()
    )
    words = [0] * (m // 64)
    for r in pos_rows:
        words[r["w"]] = r["bits"]
    blit = F.lit(words)
    probe = None
    for p in _bloom_join_positions(F.col("o_custkey")):
        t = (
            F.bit_get(
                F.element_at(blit, (p / 64).cast("int") + 1),
                (p % 64).cast("int"),
            )
            == 1
        )
        probe = t if probe is None else (probe & t)
    n_pre = orders.filter(probe).count()
    assert n_true <= n_pre <= n_true + max(1, int(0.05 * n_fact)), (
        n_true,
        n_pre,
        n_fact,
    )


def test_bloom_probe_is_map_side_filter(spark, sf_dir):
    """The k bit tests must sit in a Filter on the fact scan side BELOW
    the exact semi join — a plan where the only membership test is the
    join itself defeats the operator's purpose."""
    orders = load_table(spark, sf_dir, "orders")
    auto = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "AUTOMOBILE"
    )
    plan = plan_string(bloom_semi_join(orders, auto, "o_custkey", "c_custkey"))
    assert "bit_get" in plan, plan
    assert "LeftSemi" in plan or "left_semi" in plan.lower(), plan


def test_bloom_mixed_integral_types_no_false_negatives(spark):
    """xxhash64 is type-sensitive (int vs bigint hash differently), so
    mixed integral key types must be normalized to a common type before
    hashing — otherwise true-match rows silently drop (ADVICE r6)."""
    keys = spark.createDataFrame([(x,) for x in [1, 7, 123456]], "k: int")
    fact = spark.createDataFrame(
        [(x,) for x in [1, 7, 123456, 999]], "fk: bigint"
    )
    got = bloom_semi_join(fact, keys, "fk", "k")
    assert sorted(r["fk"] for r in got.collect()) == [1, 7, 123456]


def test_bloom_mismatched_nonintegral_types_rejected(spark):
    import pytest

    keys = spark.createDataFrame([("a",)], "k: string")
    fact = spark.createDataFrame([(1,)], "fk: bigint")
    with pytest.raises(ValueError, match="hash identically"):
        bloom_semi_join(fact, keys, "fk", "k")


def test_bloom_cache_rebuilds_on_changed_key_set(spark):
    """The memoized packed filter carries a key-set fingerprint: reusing
    a cache_key after the build side changed must REBUILD, not serve
    stale bits that false-negate the new keys (ADVICE r6)."""
    from floatchat_datapipeline_spark.operators.joins import (
        reset_bloom_join_cache,
    )

    reset_bloom_join_cache()
    a = spark.createDataFrame([(x,) for x in range(10)], "k: bigint")
    b = spark.createDataFrame([(x,) for x in range(1000, 1010)], "k: bigint")
    fact = a.unionByName(b).select(F.col("k").alias("fk"))
    assert bloom_semi_join(fact, a, "fk", "k", cache_key="t").count() == 10
    got = bloom_semi_join(fact, b, "fk", "k", cache_key="t")
    assert sorted(r["fk"] for r in got.collect()) == list(range(1000, 1010))
    reset_bloom_join_cache()


def test_bloom_no_false_negatives_on_adversarial_keys(spark):
    """Every true key must pass the probe (bloom guarantees no false
    negatives) including negative and extreme key values."""
    keys = spark.createDataFrame(
        [(x,) for x in [-(2**62), -1, 0, 1, 2**62, 123456789]], ["k"]
    )
    fact = keys.select(F.col("k").alias("fk"))
    got = bloom_semi_join(fact, keys, "fk", "k")
    assert got.count() == 6
