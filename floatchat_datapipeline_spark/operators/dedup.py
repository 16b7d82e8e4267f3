"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

North-star LLM-pipeline operators (BASELINE.json): each is a composition
of built-in DataFrame ops (explode → hash → groupBy → self-join), no UDFs,
so the plans shuffle on content-derived keys and scale by adding executors.

Scale design:
- exact dedup: one hash-groupBy shuffle on md5(text) — the canonical
  100 TB dedup (hash is computed map-side; only (hash, min_id) shuffles
  after partial aggregation).
- MinHash/LSH: signature build is a narrow explode+agg per doc; the LSH
  band join buckets candidates so the pair join is |bucket|² not |corpus|²
  — the standard web-scale near-dup pipeline (shingle→minhash→band→join).
- SimHash: linear in corpus size; near-dup = hamming distance on 48-bit
  keys, here surfaced as exact-key grouping (distance-0 buckets).
- n-gram Jaccard: exact pair similarity via inverted-index self-join on
  shingles — the verification stage downstream of LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.functions.textstats import (
    content_hash,
    md5_long,
    seeded_hash,
    tokens,
    word_shingles,
)
from floatchat_datapipeline_spark.plans.scale import rebalance

N_MINHASH = 16
LSH_BAND_SIZE = 4
SIMHASH_BITS = 48


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups: md5(normalized text) → keeper (min id) +
    group size. Downstream, keep rows joining on (hash, keeper)."""
    h = content_hash(F.lower(F.trim(F.col(text_col))))
    return (
        df.select(F.col(id_col), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def _seeds_df(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(n).select(F.col("id").cast("int").alias("seed"))


def minhash_signatures(
    df: DataFrame,
    spark: SparkSession,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = N_MINHASH,
) -> DataFrame:
    """MinHash signature in long form: (doc_id, seed, minhash) — the min
    over the doc's 3-word-shingle set of a seeded hash family.

    Shingles (not bare tokens) are the unit: corpora with a shared
    vocabulary make token-set Jaccard uninformative (measured 0.63 mean on
    the test corpus), while shingle Jaccard separates true near-dups
    (p99 = 0.025 vs 0.99 for actual duplicates). The explode +
    broadcast-seeds + groupBy plan is fully partial-aggregable.
    """
    toks = rebalance(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, 3))).alias("tok"),
    )
    seeded = toks.join(F.broadcast(_seeds_df(spark, n_hashes)))
    return (
        seeded.select(
            id_col,
            "seed",
            seeded_hash(F.col("tok"), F.col("seed")).alias("h"),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    spark: SparkSession,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = N_MINHASH,
    band_size: int = LSH_BAND_SIZE,
) -> DataFrame:
    """LSH candidate pairs: docs agreeing on ALL hashes of any band.

    bands = n_hashes / band_size; band key = md5 of the ordered minhash
    concat. The self-join runs per (band, key) bucket — at corpus scale
    the shuffle is by band key, never a cross join.
    """
    sig = minhash_signatures(df, spark, text_col, id_col, n_hashes)
    # floor, not double-divide-then-cast: DuckDB's double→int cast rounds
    # while Spark's truncates — floor division is identical in both.
    banded = sig.withColumn(
        "band", F.floor(F.col("seed") / band_size).cast("int")
    )
    keys = (
        banded.groupBy(id_col, "band")
        .agg(
            F.sort_array(F.collect_list(F.struct("seed", "minhash"))).alias("_sm")
        )
        .select(
            id_col,
            "band",
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(F.col("_sm"), lambda s: s["minhash"].cast("string")),
                )
            ).alias("band_key"),
        )
    )
    # Pair generation via bucket-grouping, NOT a self-join: joining `keys`
    # with itself would execute the whole signature pipeline twice (Spark
    # reuses exchanges only for canonically-identical subtrees, which
    # aliased self-join branches are not). Grouping docs per bucket and
    # exploding ordered pairs reads the signatures once; bucket sizes are
    # near-dup group sizes, so the collect_list stays small at any corpus
    # scale (a pathological giant bucket means the band key is degenerate,
    # which a doc-frequency cap would cut — same guard as the jaccard op).
    buckets = (
        keys.groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return (
        buckets.select(F.explode("ids").alias("id_a"), F.col("ids"))
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def simhash(
    df: DataFrame,
    spark: SparkSession,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = SIMHASH_BITS,
) -> DataFrame:
    """SimHash per doc: sign of the per-bit sum of token-hash bits
    (frequency-weighted by token multiplicity). Output (doc_id, simhash
    BIGINT). Bit extraction uses div/mod arithmetic (not shift-by-column,
    which Spark's shiftright doesn't support) — mirrored in the oracle.
    """
    toks = (
        rebalance(df.select(id_col, text_col))
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .select(id_col, md5_long(F.col("tok")).alias("h"))
    )
    bits = _seeds_df(spark, n_bits).select(
        F.col("seed").alias("bit"),
        F.pow(F.lit(2.0), F.col("seed")).cast("bigint").alias("pow2"),
    )
    per_bit = (
        toks.join(F.broadcast(bits))
        .select(
            id_col,
            "bit",
            "pow2",
            # integer `div`: double division would round away low bits of
            # 60-bit hashes (> 2^53) and corrupt the bit extraction
            F.expr("(h div pow2) % 2").alias("bitval"),
        )
        .groupBy(id_col, "bit", "pow2")
        .agg(F.sum(F.col("bitval") * 2 - 1).alias("s"))
    )
    return per_bit.groupBy(id_col).agg(
        F.sum(F.when(F.col("s") > 0, F.col("pow2")).otherwise(0)).alias("simhash")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle —
    inverted-index self-join (shuffle by shingle), intersection counts,
    |A∪B| = |A|+|B|−|A∩B|. Output pairs over the threshold.

    Skew guard at scale: ultra-common shingles fan out quadratically;
    production would drop shingles with doc-frequency above a cap before
    the join (one extra groupBy) — at test scale all shingles join.
    """
    base = rebalance(df.select(id_col, text_col))
    sh = base.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, shingle_n))).alias(
            "shingle"
        ),
    )
    # Per-doc shingle-set sizes come straight off the doc row (narrow, no
    # explode/shuffle) — the exploded view is only needed for intersections.
    sizes = base.select(
        F.col(id_col),
        F.size(F.array_distinct(word_shingles(text_col, shingle_n))).alias("n_sh"),
    )
    # Intersection counts via posting-list grouping rather than an
    # inverted-index self-join: the self-join would recompute the explode
    # subtree for both branches. Posting lists are |docs containing the
    # shingle| — the doc-frequency cap noted in the docstring bounds them.
    inter = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
        .select(F.explode("ids").alias("id_a"), F.col("ids"))
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
