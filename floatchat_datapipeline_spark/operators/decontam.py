"""Benchmark decontamination and repetition hygiene — training-corpus
operators (parity-plus; the reference pipeline has no training-set
hygiene, its nearest behavior is the duplicate-summary guard in
sync_supabase_to_chromadb.py:87-115).

- `ngram_decontaminate`: flag every training document that shares at
  least one word n-gram with a held-out benchmark/eval set — the
  standard "n-gram overlap" decontamination step (GPT-3 appendix C,
  PaLM §6.1) every LLM data pipeline runs before training.
- `repetition_stats`: per-document repetition ratios (top-word and
  top-bigram mass), the Gopher/MassiveText-style quality signal that
  catches boilerplate and generator loops which plain length/stopword
  scores (functions/textstats.quality_score) miss.

Scale design:
- decontaminate: the eval side collapses to a DISTINCT hashed-shingle
  set before any join. Eval suites are tiny next to a 100 TB corpus
  (≤10⁷ shingles ≈ 80 MB of longs), so the probe is a broadcast
  semi-join — the train side is never shuffled at all; with
  `broadcast_eval=False` the same plan degrades to a shuffle join for
  pathologically large holdouts. Shingles travel as 60-bit hashes
  (8 B), never strings.
- repetition: map-only — the top-gram mass is a run-length fold over
  the sorted per-doc gram array (no explode, no shuffle, no windows);
  per-doc cost O(tokens log tokens), cluster cost exactly one scan.
- bloom decontaminate: the SCALE path for holdouts too big to ship as
  an exact hash set. The filter is m bits regardless of holdout size
  (vs 8 B per distinct shingle for the semi-join set), the build is one
  bounded aggregation (≤ m/64 packed words collected — model state
  sized by a hyperparameter, never by data), and the probe is MAP-ONLY:
  zero joins, zero shuffles on the 100 TB train side. The trade is
  one-sided error — no false negatives (bloom flags ⊇ exact flags,
  pinned in tests/test_bloom_decontam.py), a bounded false-positive
  rate from filter saturation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.functions.textstats import (
    md5_long,
    word_shingles,
)

DECONTAM_NGRAM = 5


def ngram_decontaminate(
    train: DataFrame,
    holdout: DataFrame,
    n: int = DECONTAM_NGRAM,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Mark training docs that share any word n-gram with the holdout.

    Output: one row per `train` row — (id_col, n_shared, contaminated)
    where n_shared counts DISTINCT shared n-grams and contaminated is
    true iff n_shared > 0. Docs shorter than n words share nothing by
    construction.
    """
    eval_sh = (
        holdout.select(
            F.explode(word_shingles(text_col, n)).alias("_s")
        )
        .select(md5_long("_s").alias("_h"))
        .distinct()
    )
    if broadcast_eval:
        eval_sh = F.broadcast(eval_sh)
    train_sh = train.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("_s")
    ).select(id_col, md5_long("_s").alias("_h"))
    hits = (
        train_sh.join(eval_sh, "_h")
        .groupBy(id_col)
        .agg(F.countDistinct("_h").alias("_n_shared"))
    )
    return train.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce(F.col("_n_shared"), F.lit(0)).cast("long").alias("n_shared"),
        F.col("_n_shared").isNotNull().alias("contaminated"),
    )


BLOOM_BITS = 1 << 16  # 65,536 bits = 1,024 packed longs (~8 KB broadcast)
BLOOM_HASHES = 4


def _bloom_positions(s, k: int = BLOOM_HASHES, m: int = BLOOM_BITS) -> list:
    """k bit positions for shingle `s` via Kirsch–Mitzenmacher double
    hashing: pos_i = (h1 + i*h2) mod m. Both base hashes are the 60-bit
    md5 long every cross-engine operator here uses, so the DuckDB oracle
    replays the EXACT filter — bloom membership is deterministic, not a
    tolerance check. i*h2 ≤ 3·2^60 < 2^62, so the sum never overflows
    a bigint even under ANSI mode."""
    h1 = md5_long(s)
    h2 = md5_long(F.concat(F.lit("bloom:"), s))
    return [(h1 + F.lit(i) * h2) % F.lit(m) for i in range(k)]


def bloom_build(
    holdout: DataFrame,
    n: int = DECONTAM_NGRAM,
    text_col: str = "text",
) -> list[int]:
    """Build the packed bloom filter (m/64 longs) over the holdout's
    distinct word n-grams. One explode + two distincts + one bounded
    aggregation; the collect is ≤ BLOOM_BITS/64 rows — fixed-size model
    state like k-means centroids, independent of holdout row count."""
    pos = (
        holdout.select(F.explode(word_shingles(text_col, n)).alias("_s"))
        .distinct()
        .select(F.explode(F.array(*_bloom_positions(F.col("_s")))).alias("p"))
        .distinct()
    )
    rows = (
        pos.groupBy(F.expr("CAST(p div 64 AS INT)").alias("w"))
        .agg(F.expr("bit_or(shiftleft(1L, CAST(p % 64 AS INT)))").alias("bits"))
        .collect()
    )
    words = [0] * (BLOOM_BITS // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_decontaminate(
    train: DataFrame,
    bloom_words: list[int],
    n: int = DECONTAM_NGRAM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Probe-side of bloom decontamination: flag training docs with any
    n-gram whose k filter bits are ALL set. Same output shape as
    `ngram_decontaminate` — (id_col, n_flagged, contaminated), n_flagged
    counting DISTINCT flagged n-grams.

    Plan shape: MAP-ONLY. The filter rides along as one 1,024-element
    long-array literal; each distinct per-doc shingle evaluates k
    element_at + bit_get tests inside an array `filter` lambda — no
    explode, no join, no shuffle anywhere on the train side (pinned in
    tests/test_bloom_decontam.py).

    The two base md5 hashes are materialized ONCE per shingle via a
    `transform` into (h1, h2) structs BEFORE the bit tests: lambda-body
    subexpression copies get no CSE (see functions/textstats.
    word_shingles), so inlining the hashes into every positional test
    re-evaluated each md5 up to 12× — measured ~6× slower on the probe
    at sf0.1 (4.8 s → <1 s). The remaining per-copy duplication is
    integer arithmetic on the struct fields, which is noise."""
    blit = F.lit(bloom_words)

    def is_hit(h):
        cond = None
        for i in range(BLOOM_HASHES):
            p = (h["h1"] + F.lit(i) * h["h2"]) % F.lit(BLOOM_BITS)
            widx = (p - (p % F.lit(64))) / F.lit(64)
            t = (
                F.bit_get(
                    F.element_at(blit, widx.cast("int") + F.lit(1)),
                    (p % F.lit(64)).cast("int"),
                )
                == F.lit(1)
            )
            cond = t if cond is None else cond & t
        return cond

    hashed = F.transform(
        F.array_distinct(word_shingles(text_col, n)),
        lambda s: F.struct(
            md5_long(s).alias("h1"),
            md5_long(F.concat(F.lit("bloom:"), s)).alias("h2"),
        ),
    )
    out = train.select(
        F.col(id_col),
        F.size(F.filter(hashed, is_hit)).cast("long").alias("n_flagged"),
    )
    return out.select(
        id_col, "n_flagged", (F.col("n_flagged") > 0).alias("contaminated")
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_word_max: float = 0.1,
    top_bigram_max: float = 0.05,
) -> DataFrame:
    """Per-document repetition ratios: the fraction of tokens covered by
    the single most frequent word, and of bigrams by the most frequent
    bigram. Output: (id_col, n_tokens, top_word_frac, top_bigram_frac,
    is_repetitive) — fractions rounded to 6, flag true when either
    exceeds its threshold (compared on the ROUNDED value, so the oracle
    agrees at the boundary).

    Plan shape: MAP-ONLY. The top-gram count is a run-length fold over
    the SORTED gram array (`aggregate()` carrying (prev, run, best)),
    so the mode frequency never leaves the row — the former shape
    shuffled (doc, n, gram) count state through three chained hash
    aggregations. Per-doc cost is O(tokens log tokens) for the sort;
    shuffle cost is zero."""

    def _mode_count(arr):
        zero = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        )

        def step(acc, x):
            run = (
                F.when(x == acc["prev"], acc["run"] + F.lit(1))
                .otherwise(F.lit(1))
                .cast("long")
            )
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
            )

        return F.aggregate(F.sort_array(arr), zero, step, lambda a: a["best"])

    per_doc = (
        docs.select(
            F.col(id_col),
            word_shingles(text_col, 1).alias("_w"),
            word_shingles(text_col, 2).alias("_b"),
        )
        # zero-token docs emitted no exploded rows in the old shape —
        # keep them absent
        .filter(F.size("_w") > 0)
        .select(
            F.col(id_col),
            F.size("_w").cast("long").alias("_toks"),
            _mode_count(F.col("_w")).alias("_top_w"),
            F.size("_b").cast("long").alias("_nb"),
            _mode_count(F.col("_b")).alias("_top_b"),
        )
    )
    top_word = F.round(F.col("_top_w") / F.col("_toks"), 6)
    # single-word docs have no bigrams — 0.0, not NULL (old: no bigram row)
    top_bigram = F.when(
        F.col("_nb") > 0, F.round(F.col("_top_b") / F.col("_nb"), 6)
    ).otherwise(F.lit(0.0))
    return per_doc.select(
        id_col,
        F.col("_toks").alias("n_tokens"),
        top_word.alias("top_word_frac"),
        top_bigram.alias("top_bigram_frac"),
        ((top_word > top_word_max) | (top_bigram > top_bigram_max)).alias(
            "is_repetitive"
        ),
    )
