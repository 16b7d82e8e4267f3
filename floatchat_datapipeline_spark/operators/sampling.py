"""Corpus selection operators — deterministic splits, stratified
sampling, sequence packing.

LLM-training-pipeline operators (north-star family, alongside
operators/dedup.py). All are pure column expressions or windowed plans —
no UDFs, no driver-side state — and every randomness source is a
content hash, so reruns and engine replays (the DuckDB oracle) are
bit-identical: at 100 TB "re-run the split" must mean "same split".

Scale design:
- hash split / stratified sample: map-only (one hash per row, no
  shuffle); the split is stable under corpus growth because membership
  depends only on the row's own id, never on position or order.
- sequence packing: one shuffle by shard key, one in-shard sort —
  windows never cross shards, so packing parallelizes by shard exactly
  like the downstream training-data writer that consumes it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.functions.textstats import (
    md5_long,
    token_count,
    tokens,
)


def hash_bucket(col: Column | str, n_buckets: int = 100, salt: str = "") -> Column:
    """Stable bucket in [0, n_buckets): 60-bit md5 hash of (salt + id)
    mod n_buckets. Salting derives INDEPENDENT splits from the same ids
    (split vs sample vs shard must not correlate)."""
    c = F.col(col) if isinstance(col, str) else col
    return (md5_long(F.concat(F.lit(salt), c.cast("string"))) % n_buckets).cast(
        "int"
    )


def train_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    valid_pct: int = 10,
    salt: str = "split:",
) -> DataFrame:
    """Deterministic train/valid/test assignment by id hash. Output: all
    input columns + (bucket, split)."""
    b = hash_bucket(id_col, 100, salt)
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < train_pct, F.lit("train"))
        .when(F.col("bucket") < train_pct + valid_pct, F.lit("valid"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    rates_pct: dict[str, int],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_pct: int = 0,
    salt: str = "sample:",
) -> DataFrame:
    """Keep a per-stratum deterministic percentage of rows — the corpus-
    mixing primitive (upsample curated sources, downsample crawl). A row
    survives iff hash(salt + stratum + id) mod 100 < rate[stratum]; the
    hash includes the stratum so per-stratum samples are independent.

    Map-only: the rate table is folded into a CASE expression (dim-sized
    model state), so no join at all."""
    rate = None
    for stratum, pct in sorted(rates_pct.items()):
        clause = F.when(F.col(stratum_col) == stratum, F.lit(pct))
        rate = clause if rate is None else rate.when(
            F.col(stratum_col) == stratum, F.lit(pct)
        )
    rate = (
        rate.otherwise(F.lit(default_pct))
        if rate is not None
        else F.lit(default_pct)
    )
    b = hash_bucket(
        F.concat(F.col(stratum_col), F.lit(":"), F.col(id_col).cast("string")),
        100,
        salt,
    )
    return (
        df.withColumn("sample_bucket", b)
        .filter(F.col("sample_bucket") < rate)
    )


def temperature_sample(
    df: DataFrame,
    alpha: float = 0.5,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "temp:",
) -> DataFrame:
    """Temperature-based multilingual rebalancing (the exponential-
    smoothing resample of mBERT/XLM-R, Conneau et al. 2020 §3.1,
    reduced to a deterministic downsample): stratum keep-fraction
    (n_min/n_l)^(1-α) — α=1 keeps everything, α=0 equalizes strata to
    the smallest, α=0.5 (default) is the sqrt compromise. sqrt is
    IEEE-correctly-rounded in every engine, so the default's
    keep-fractions replay bit-identically in the DuckDB oracle (a
    general pow may differ in the last ulp between libms).

    Output: every input row as (id_col, stratum, keep_frac, kept) —
    kept ⇔ hash(salt+id) mod 10^6 < keep_frac·10^6, so membership is
    content-addressed and stable under corpus growth within a stratum
    mix. One tiny per-stratum count agg broadcasts back; the decision
    itself is map-only."""
    if alpha != 0.5:
        raise NotImplementedError(
            "only alpha=0.5 (sqrt) has cross-engine bit parity; "
            "other temperatures need a pow-tolerance oracle"
        )
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        stratum_col,
        F.round(
            F.sqrt(F.col("_nmin").cast("double") / F.col("_n")), 6
        ).alias("keep_frac"),
    )
    b = md5_long(
        F.concat(F.lit(salt), F.col(id_col).cast("string"))
    ) % F.lit(1_000_000)
    return df.join(F.broadcast(rates), stratum_col).select(
        id_col,
        F.col(stratum_col).alias("stratum"),
        "keep_frac",
        (b.cast("double") < F.col("keep_frac") * F.lit(1_000_000.0)).alias(
            "kept"
        ),
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 2048,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign docs to fixed-budget training packs: docs are laid out
    end-to-end in id order within each shard, and a doc belongs to the
    pack where its first token lands (pack = floor(start_offset/budget)).
    Deterministic, order-stable, and windowed per shard — the global
    token stream never funnels through one partition.

    Output: (doc_id, shard, n_tokens, pack_id, pack_offset)."""
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = token_count(text_col)
    return (
        df.select(
            F.col(id_col),
            F.col(shard_col).alias("shard"),
            n_tok.alias("n_tokens"),
        )
        .withColumn("_end", F.sum("n_tokens").over(w))
        .select(
            id_col,
            "shard",
            "n_tokens",
            # integer div/mod on the exact running sum — no doubles anywhere
            F.expr(f"(_end - n_tokens) div {budget_tokens}").alias("pack_id"),
            ((F.col("_end") - F.col("n_tokens")) % budget_tokens).alias(
                "pack_offset"
            ),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split every document into overlapping token windows (the context-
    window chunking step before embedding/packing): chunk i starts at
    token 1 + i·stride and spans `chunk_tokens` tokens; a trailing chunk
    already fully covered by its predecessor is dropped, the final chunk
    may be short. Deterministic and map-only — the chunk grid is a
    per-row `sequence` + `explode`, so chunking 100 TB is one scan with
    NO shuffle; row count multiplies by ~n_tokens/stride.

    Output: (id_col, chunk_id, start_token, n_chunk_tokens, chunk_text).
    """
    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride)),
        # keep a non-first start only if its chunk reaches past the
        # previous chunk's end (start-stride+chunk_tokens-1 < start+...)
        lambda s: (s == 1)
        | (s - F.lit(stride) + F.lit(chunk_tokens) <= n),
    )
    return (
        df.select(
            F.col(id_col), toks.alias("_toks"), F.explode(starts).alias("_start")
        )
        .select(
            id_col,
            F.expr(f"(_start - 1) div {stride}").cast("int").alias("chunk_id"),
            F.col("_start").cast("int").alias("start_token"),
            F.size(F.slice("_toks", F.col("_start"), F.lit(chunk_tokens)))
            .cast("int")
            .alias("n_chunk_tokens"),
            F.concat_ws(
                " ", F.slice("_toks", F.col("_start"), F.lit(chunk_tokens))
            ).alias("chunk_text"),
        )
    )


def mixing_allocation(
    docs: DataFrame,
    budget: int = 1_000_000,
    mass_col: str = "n_chars",
    stratum_col: str = "source",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a training-data
    budget across strata — the corpus-mixing step that turns per-source
    masses into an INTEGER per-source quota summing to exactly `budget`
    (the temperature_sample twin for the case where the target is a hard
    global budget, not per-stratum keep-rates).

    base_s = ⌊B·m_s / M⌋ under-allocates by L = B − Σ base_s < n_strata
    units; the L strata with the largest remainders (B·m_s mod M,
    deterministic tie-break on the stratum key) each get one extra unit.
    ALL integer arithmetic — quotas replay bit-identically in any
    engine, and Σ alloc = B is an invariant, not a rounding accident.

    Scale notes: one partial-aggregable rollup over the corpus; the
    apportionment itself runs on the n_strata-row summary (window over
    strata — dim-sized). B·m_s must stay below 2^63: at corpus masses
    beyond ~2^63/B, pre-scale masses by a common divisor (the ratio is
    what matters), which keeps the method exact."""
    per = docs.groupBy(stratum_col).agg(
        F.sum(F.col(mass_col).cast("bigint")).alias("mass")
    )
    tot = per.agg(F.sum("mass").alias("_m"), F.sum(F.lit(1)).alias("_k"))
    j = per.crossJoin(F.broadcast(tot))
    j = j.select(
        stratum_col,
        "mass",
        F.expr(f"CAST({budget} AS BIGINT) * mass div _m").alias("base"),
        F.expr(f"(CAST({budget} AS BIGINT) * mass) % _m").alias("rem"),
        "_m",
    )
    leftover = j.groupBy().agg(
        (F.lit(int(budget)) - F.sum("base")).alias("_l")
    )
    w = Window.orderBy(F.desc("rem"), stratum_col)
    return (
        j.withColumn("_rk", F.row_number().over(w))
        .crossJoin(F.broadcast(leftover))
        .select(
            stratum_col,
            "mass",
            (
                F.col("base")
                + (F.col("_rk") <= F.col("_l")).cast("bigint")
            ).alias("alloc"),
        )
    )


def bottomk_sample(
    docs: DataFrame,
    k: int = 10,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "bk1",
) -> DataFrame:
    """Exact-k deterministic uniform sample per stratum — bottom-k by
    salted content hash. The distributed replacement for reservoir
    sampling when the contract is "exactly k per group, stable across
    reruns and engines": rank rows by md5_long(salt|id) inside each
    stratum and keep rank ≤ k. The hash IS the randomness (uniform over
    ids, decorrelated from any data order), the salt versions the
    sample, and membership is a pure function of (salt, id) — so
    incremental reruns, backfills, and the DuckDB oracle all select the
    SAME rows. One shuffle (rank window per stratum); at strata too
    large to sort fully, pre-filter with a hash-threshold guess
    (keep hash < c·k/n quantile estimate) before the exact rank —
    the classic bottom-k sketch refinement."""
    from floatchat_datapipeline_spark.functions.textstats import md5_long

    h = md5_long(
        F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col))
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
