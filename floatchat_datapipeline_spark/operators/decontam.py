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
