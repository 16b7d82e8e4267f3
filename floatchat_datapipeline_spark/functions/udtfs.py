"""Python UDTFs — the table-function surface of SURVEY §2.13 (U2).

The reference's row→rows expansions (profile matrix → level rows,
document → chunks) are all expressible as JVM `split`/`posexplode`
pipelines, and those stay the engine's hot paths (operators/reshape.py,
operators/sampling.py). The UDTF below exists for the shapes that are
NOT expression-friendly: per-row Python logic that emits a variable
number of rows with its own schema — Spark 4's `@udtf` makes that a
first-class lateral table function instead of an explode over a
collected array.

The sentence splitter's rule is a LITERAL '. ' split, chosen because it
replays identically in DuckDB (`string_split`) — regex sentence
boundaries with lookbehind would not (DuckDB's RE2 has no lookbehind),
and cross-engine value-parity beats linguistic nuance here. The JVM twin
(`split` + `posexplode`) is the scale path; the UDTF is the template and
is value-checked against the same oracle (query `doc_sentences`).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sent_id int, sentence string, n_chars int")
class SplitSentences:
    """One output row per '. '-delimited sentence; 1-based sent_id,
    sentences re-trimmed only of the split delimiter (content preserved
    byte-for-byte so n_chars is exactly DuckDB's length())."""

    def eval(self, text: str):  # noqa: D102 — UDTF protocol method
        if text is None:
            return
        for i, sent in enumerate(text.split(". "), start=1):
            yield i, sent, len(sent)


def register_udtfs(spark) -> None:
    """Register every engine UDTF on the session (idempotent)."""
    spark.udtf.register("split_sentences", SplitSentences)
