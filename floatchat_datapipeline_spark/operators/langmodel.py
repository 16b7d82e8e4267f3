"""Unigram language-model scoring — corpus-frequency log-probabilities
as a document quality signal.

The KenLM-perplexity filter every LLM data pipeline runs (CCNet,
Wenzek et al. 2020) reduced to its distributable core: train a unigram
LM over the corpus itself (token → count, add-one smoothed), then score
each document by its mean token log-probability. Low scores surface
gibberish, boilerplate, and wrong-language docs that per-doc heuristics
(functions/textstats.quality_score) miss because they never see corpus
frequencies. Reference analog: none — the reference pipeline
(preprocess.py) has no corpus-level text statistics; parity-plus
alongside the L-family corpus operators.

Scale design: the vocab is one hash aggregation (token cardinality ≪
corpus cardinality — Heaps' law); the score pass joins tokens to vocab
on the token key — broadcast while the vocab fits (default), a plain
co-partitioned shuffle-hash join beyond that. The (N, |V|) normalizer
is a 1-row aggregate crossed in via broadcast. Everything else is
map-side; no driver-side state at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.functions.textstats import tokens


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    add-one-smoothed unigram LM: p(t) = (c(t)+1)/(N+|V|).

    Output: (id_col, n_tokens, sum_logprob, avg_logprob) — the sum is
    rounded to 4 places BEFORE the division (cross-engine quotient
    parity; see the hourly_rollup note in operators/windows.py)."""
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_c"))
    stats = vocab.agg(F.sum("_c").alias("_n"), F.count(F.lit(1)).alias("_v"))
    v = F.broadcast(vocab) if broadcast_vocab else vocab
    lp = (
        toks.join(v, "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            F.log(
                (F.col("_c") + F.lit(1)).cast("double")
                / (F.col("_n") + F.col("_v")).cast("double")
            ).alias("_lp"),
        )
    )
    return (
        lp.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.sum("_lp"), 4).alias("sum_logprob"),
        )
        .select(
            id_col,
            "n_tokens",
            "sum_logprob",
            (F.col("sum_logprob") / F.col("n_tokens")).alias("avg_logprob"),
        )
    )


def perplexity_filter(
    docs: DataFrame,
    cut_quantile: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus quality gate: drop the lowest-scoring `cut_quantile` tail
    of the unigram-LM distribution (the CCNet recipe — score with a LM,
    keep the head/middle of the perplexity distribution). The threshold
    is the EXACT R-7 percentile of avg_logprob (bit-identical to DuckDB
    quantile_cont, same rule as the A9 quantile family); at 100 TB the
    same plan swaps in approx_percentile exactly as A9 does.

    Output: (id_col, n_tokens, avg_logprob, kept) for every scored doc;
    kept ⇔ avg_logprob >= threshold. The threshold is a 1-row aggregate
    crossed in via broadcast — the scored frame is evaluated twice (once
    for the percentile, once for the comparison); a production run
    persists the scored frame first, exactly like the warm ANN indexes
    (embeddings/search.py) persist their assignment tables."""
    scored = unigram_logprob(docs, text_col=text_col, id_col=id_col)
    thr = scored.agg(
        F.expr(f"percentile(avg_logprob, {cut_quantile}e0)").alias("_thr")
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        id_col,
        "n_tokens",
        "avg_logprob",
        (F.col("avg_logprob") >= F.col("_thr")).alias("kept"),
    )


def char_entropy(docs: DataFrame, threshold: float = 2.0) -> DataFrame:
    """Per-document character-level Shannon entropy (nats) — the
    Gopher-family gibberish/boilerplate signal orthogonal to the
    stopword/length heuristics of doc_quality: natural prose sits near
    ~3 nats, runs of one character or base64-ish noise fall outside.

    H = ln(n) − (Σ_c k_c·ln k_c)/n over per-doc char counts k_c. The
    counts are exact integers from one explode + two partial-aggregable
    hash aggs keyed by doc_id (the shuffle carries (doc, char) partials,
    never raw text). The only floats are ≤ ~95 ln() terms per doc; H is
    rounded to 1e-6 (the repo-wide float-parity convention) and the
    low-entropy flag tests the ROUNDED value, so both engines flag the
    same docs."""
    chars = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).filter(F.length("ch") > 0)
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).alias("k")
    )
    ent = counts.groupBy("doc_id").agg(
        F.sum("k").alias("n"),
        F.sum(F.col("k").cast("double") * F.log(F.col("k").cast("double"))).alias("_s"),
    )
    h = F.round(
        F.log(F.col("n").cast("double")) - F.col("_s") / F.col("n").cast("double"), 6
    )
    return ent.select(
        "doc_id",
        F.col("n").alias("n_chars_counted"),
        h.alias("entropy"),
        (h < F.lit(threshold)).alias("low_entropy"),
    )
