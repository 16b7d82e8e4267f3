"""Text-analysis expressions for LLM training-data pipelines.

North-star operators beyond the reference surface (BASELINE.json): token
counting, quality scoring, language-ID heuristics, content hashing /
fingerprinting. All pure JVM expressions — at 100 TB these run inside the
scan's codegen stage with zero Python.

Cross-engine determinism notes (these functions are oracle-checked):
- token counts use replace-arithmetic (`len(s) - len(replace(s,' ',''))`),
  which is engine-agnostic, instead of split() whose edge semantics differ;
- hashes are md5-based: `bigint(hex15(md5(x)))` is bit-identical in Spark
  (`conv(substr(md5,1,15),16,10)`) and DuckDB (`('0x'||substr)::BIGINT`),
  staying under 2^60 so bigint arithmetic never overflows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def md5_long(col: Column | str) -> Column:
    """Deterministic 60-bit positive hash of a string (first 15 hex chars
    of md5). The engine's standard content hash — identical in DuckDB via
    CAST('0x' || substr(md5(x),1,15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("bigint")


def seeded_hash(col: Column | str, seed: Column | str) -> Column:
    """Seeded variant for MinHash families: hash(seed ⊕ value)."""
    return md5_long(F.concat(_c(seed).cast("string"), F.lit("|"), _c(col)))


def token_count(text: Column | str, sep: str = " ") -> Column:
    """Number of separator-delimited tokens via replace-arithmetic
    (occurrences of sep + 1) — identical semantics in every engine."""
    t = _c(text)
    return (
        F.length(t) - F.length(F.replace(t, F.lit(sep), F.lit(""))) + F.lit(1)
    ).cast("int")


def tokens(text: Column | str, sep: str = " ") -> Column:
    """Token array (single-separator split)."""
    return F.split(_c(text), sep)


def word_shingles(text: Column | str, n: int = 3, sep: str = " ") -> Column:
    """Array of n-word shingles: element i = tokens[i..i+n-1] joined by
    sep. Built with sequence+transform — a codegen'd generator, no UDF.

    The token array is bound to a lambda variable (transform over a
    1-element wrapper array) so `split(text)` evaluates ONCE per row.
    Referencing the split subtree directly inside the position lambda
    re-evaluates it per element_at — n splits × n_positions per row,
    which measured >10× slower on shingle-heavy plans (there is no CSE
    across lambda-body subexpression copies)."""

    def body(toks: Column) -> Column:
        k = F.size(toks) - F.lit(n - 1)
        # sequence(1, 0) would produce a DESCENDING [1, 0] in Spark —
        # guard short documents with an explicit empty array.
        idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                sep, *[F.element_at(toks, i + F.lit(j)) for j in range(n)]
            ),
        )

    return F.element_at(F.transform(F.array(tokens(text, sep)), body), 1)


def distinct_token_count(text: Column | str, sep: str = " ") -> Column:
    """Vocabulary size of a document."""
    return F.size(F.array_distinct(tokens(text, sep)))


def avg_token_len(text: Column | str, sep: str = " ") -> Column:
    """Mean token length in characters, exact-integer derived then rounded:
    (chars excluding separators) / n_tokens."""
    t = _c(text)
    n = token_count(text, sep)
    non_sep_chars = F.length(F.replace(t, F.lit(sep), F.lit("")))
    return F.round(non_sep_chars.cast("double") / n, 4)


def type_token_ratio(text: Column | str, sep: str = " ") -> Column:
    """Lexical diversity: distinct / total tokens (0..1]."""
    return F.round(
        distinct_token_count(text, sep).cast("double") / token_count(text, sep),
        4,
    )


def stopword_ratio(
    text: Column | str,
    stopwords: tuple[str, ...] = ("a", "the", "of", "and", "is"),
    sep: str = " ",
) -> Column:
    """Share of tokens that are stopwords — a classic quality signal.
    Exact counting via filtered token array."""
    toks = tokens(text, sep)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.round(hits.cast("double") / token_count(text, sep), 4)


def quality_score(text: Column | str, sep: str = " ") -> Column:
    """Composite document quality in [0,1]: rewards mid-length docs,
    lexical diversity, and a sane (non-zero, non-dominant) stopword share.
    Mirrors the length/stopword/diversity heuristics used by public
    web-corpus cleaning pipelines (C4/Gopher-style rules), expressed as
    one arithmetic column."""
    n = token_count(text, sep).cast("double")
    ttr = type_token_ratio(text, sep)
    sw = stopword_ratio(text, sep=sep)
    length_score = F.least(n / F.lit(50.0), F.lit(1.0))
    sw_score = F.when((sw > 0.01) & (sw < 0.5), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        (length_score + ttr + sw_score) / F.lit(3.0),
        4,
    )


# Marker stopwords per language for the heuristic language-ID — ordered,
# first-match-wins on ties (deterministic). Real deployments would use
# char-ngram profiles; the operator shape (argmax over per-language
# scores) is the same.
LANG_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "a", "of", "and", "is")),
    ("es", ("la", "el", "de", "que", "y")),
    ("de", ("der", "die", "das", "und", "ist")),
    ("fr", ("le", "la", "les", "et", "est")),
    ("zh", ("de", "le", "shi", "he", "zai")),
)


def lang_scores(text: Column | str, sep: str = " ") -> dict[str, Column]:
    """Per-language marker-hit counts."""
    toks = tokens(text, sep)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS
    }


def lang_id(text: Column | str, sep: str = " ") -> Column:
    """Heuristic language ID: argmax of marker scores, first language wins
    ties (declaration order above)."""
    scores = lang_scores(text, sep)
    langs = [lang for lang, _ in LANG_MARKERS]
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("unknown")
    for lang in reversed(langs):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("unknown"))


def content_hash(text: Column | str) -> Column:
    """Full-document md5 (exact-dedup key)."""
    return F.md5(_c(text))


def fingerprint(text: Column | str, shingle_n: int = 5, sep: str = " ") -> Column:
    """Winnowing-style document fingerprint: min hash over n-token rolling
    shingles. Near-identical docs share fingerprints with high probability;
    used for fast candidate grouping before exact comparison."""
    sh = word_shingles(text, shingle_n, sep)
    hashed = F.transform(sh, lambda s: md5_long(s))
    return F.array_min(hashed)


def winnow(
    text: Column | str, k: int = 5, w: int = 4, sep: str = " "
) -> Column:
    """True winnowing fingerprint selection (Schleimer, Wilkerson &
    Aiken, SIGMOD 2003 — the MOSS algorithm): hash every k-token shingle,
    then keep the MINIMUM hash of each window of w consecutive shingles.
    Guarantees every match of length ≥ k + w − 1 tokens shares a selected
    fingerprint while storing only ~2/(w+1) of the hashes — the
    local-sampling property a single global ``fingerprint`` min lacks.

    Entirely array-domain (sequence + transform + slice + array_min):
    map-only, zero shuffles, no explode — per-document work is linear in
    token count, so at 100 TB this runs inside the parquet scan stage.
    Documents shorter than k + w − 1 tokens yield an empty set (the
    window sequence guard), never an error."""
    hs = F.transform(word_shingles(text, k, sep), lambda s: md5_long(s))

    def body(hashes: Column) -> Column:
        n_win = F.size(hashes) - F.lit(w - 1)
        starts = F.when(n_win >= 1, F.sequence(F.lit(1), n_win)).otherwise(
            F.array().cast("array<int>")
        )
        return F.array_distinct(
            F.transform(starts, lambda i: F.array_min(F.slice(hashes, i, w)))
        )

    # bind hs once via a 1-element wrapper (see word_shingles: lambda-body
    # subtree copies defeat CSE, re-hashing every shingle per window)
    return F.element_at(F.transform(F.array(F.struct(hs.alias("h"))), lambda s: body(s["h"])), 1)


# BPE-ish pre-tokenization: letter runs | digit runs | single other
# non-space symbol — the regex split GPT-style tokenizers apply before
# merges. Identical match semantics verified in Spark (Java regex) and
# DuckDB (RE2) for this pattern class.
BPE_PRETOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_tokens(text: Column | str) -> Column:
    """Array of BPE-style pre-tokens."""
    return F.regexp_extract_all(
        _c(text), F.lit(BPE_PRETOKEN_PATTERN), 0
    )


def bpe_token_count(text: Column | str) -> Column:
    return F.size(bpe_tokens(text))
