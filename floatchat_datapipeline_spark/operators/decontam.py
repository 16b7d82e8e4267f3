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
- repetition: one explode of (doc, gram) for both gram sizes in the
  same pass, partial-aggregated count, then a per-doc max/sum — two
  hash aggregations on (doc_id, n, gram) then (doc_id, n); no joins at
  gram cardinality, no windows. Skew-safe: the hot key space is
  (doc_id × gram), which is as fine-grained as the data itself.
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
    agrees at the boundary)."""
    grams = docs.select(
        F.col(id_col),
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("n"),
                    word_shingles(text_col, 1).alias("grams"),
                ),
                F.struct(
                    F.lit(2).alias("n"),
                    word_shingles(text_col, 2).alias("grams"),
                ),
            )
        ).alias("g"),
    ).select(
        id_col, F.col("g.n").alias("_n"), F.explode("g.grams").alias("_gram")
    )
    per_doc = (
        grams.groupBy(id_col, "_n", "_gram")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy(id_col, "_n")
        .agg(
            F.max("_cnt").alias("_top"),
            F.sum("_cnt").alias("_total"),
        )
        .groupBy(id_col)
        .agg(
            F.max(F.when(F.col("_n") == 1, F.col("_total"))).alias("_toks"),
            F.round(
                F.max(
                    F.when(F.col("_n") == 1, F.col("_top") / F.col("_total"))
                ),
                6,
            ).alias("top_word_frac"),
            F.round(
                F.max(
                    F.when(F.col("_n") == 2, F.col("_top") / F.col("_total"))
                ),
                6,
            ).alias("top_bigram_frac"),
        )
    )
    return per_doc.select(
        id_col,
        F.col("_toks").cast("long").alias("n_tokens"),
        "top_word_frac",
        # single-word docs have no bigram row — 0.0, not NULL
        F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)).alias(
            "top_bigram_frac"
        ),
        (
            (F.col("top_word_frac") > top_word_max)
            | (F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)) > top_bigram_max)
        ).alias("is_repetitive"),
    )
