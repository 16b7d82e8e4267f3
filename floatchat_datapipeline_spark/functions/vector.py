"""Vector expressions — dot product, norms, cosine — as JVM-side builtins.

The reference computes cosine similarity in NumPy on the driver
(embeddings/embed.py:386-397) and delegates ANN to ChromaDB's HNSW. Here
similarity is a column expression (`aggregate(zip_with(...))`) so it runs
distributed, inside codegen, with no Python in the loop.

Determinism note: the fold is sequential over array positions, which makes
the floating-point sum order-identical across engines (the DuckDB oracle's
list_dot_product also folds left-to-right) — similarity scores compare
exactly, not approximately.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Σ a_i·b_i in double precision (V3).

    With `dim` given, the sum is expanded to `dim` element_at products —
    a plain codegen-able expression tree, bit-identical to the HOF fold
    (same left-assoc sum starting at 0.0). Measured trade-off: the wide
    tree costs plan-compilation seconds, and the per-row win only shows on
    large materialized pair sets (~2× at 10⁵+ rows); at small row counts
    the lambda-HOF default is faster end-to-end."""
    if dim is None:
        return F.aggregate(
            F.zip_with(
                _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    s = F.lit(0.0)
    for i in range(1, dim + 1):
        s = s + F.element_at(_c(a), i).cast("double") * F.element_at(
            _c(b), i
        ).cast("double")
    return s


def norm(a: Column | str, dim: int | None = None) -> Column:
    """L2 norm in double precision (see `dot` for the `dim` fast path)."""
    if dim is None:
        return F.sqrt(
            F.aggregate(
                _c(a),
                F.lit(0.0),
                lambda acc, v: acc + v.cast("double") * v.cast("double"),
            )
        )
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """V3 — dot(a,b) / (‖a‖·‖b‖) (reference embeddings/embed.py:386-397).

    Zero-norm guard: cosine is undefined when either vector has zero
    norm, and under ANSI mode a bare division ABORTS the whole job on
    the first zeroed embedding row — the wrong failure mode at 100 TB,
    where dead rows are routine. `try_divide` yields NULL on a zero
    divisor instead (mirrored as CASE WHEN / nullif in every DuckDB
    oracle that replays cosine) and — unlike the round-12 CaseWhen
    form — evaluates each norm fold exactly ONCE: HOF folds don't
    enter whole-stage codegen, so a guard that repeats the denominator
    in its predicate really does pay the folds twice per row (measured
    +53-64% on emb_mmr_rerank/emb_semdedup, PLANS.md round 13)."""
    return F.try_divide(dot(a, b, dim), norm(a, dim) * norm(b, dim))


def l2_normalize(a: Column | str) -> Column:
    """Pre-normalize vectors at write time so search-time similarity is a
    bare dot product (halves the flops of every query scan). A zero-norm
    vector normalizes to itself (all zeros) — the sklearn convention —
    rather than aborting the write job under ANSI mode."""
    n = norm(a)
    return F.when(
        n == F.lit(0.0), _c(a).cast("array<double>")
    ).otherwise(F.transform(_c(a), lambda v: (v.cast("double") / n)))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """O3/O4 — exact brute-force cosine top-k against a literal query vector.

    The query vector is a literal array (broadcast by value into the plan);
    ORDER BY + LIMIT compiles to TakeOrderedAndProject — per-partition
    top-k heaps + a k-row driver merge, NO global sort shuffle. This is the
    exact-parity baseline; the LSH variant (operators/similarity.py) is the
    100 TB path.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.withColumn("score", F.round(cosine(F.col(vec_col), q), 6))
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def quantize(
    vec: Column | str, bits_scale: int = 127
) -> tuple[Column, Column]:
    """Symmetric per-vector int8 scalar quantization (V9 parity-plus):
    scale = max|v|/127, q_i = round(v_i/scale) ∈ [-127, 127]. Returns
    (scale, qvec). Zero vectors quantize to scale 0 and all-zero codes.

    The point at 100 TB: int8 codes are 4× smaller than float32 (16×
    smaller than the float64 compare path), so the candidate-generation
    scan of an ANN index reads a quarter of the bytes; exact re-ranking
    on the float column touches only the top candidates. All arithmetic
    is round/clamp/divide — engine-parity-exact, no RNG."""
    v = _c(vec)
    mx = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = mx / F.lit(float(bits_scale))
    q = F.when(mx == 0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(
            v,
            lambda x: F.round(x.cast("double") / scale, 0).cast("int"),
        )
    )
    return scale, q


def dequantize(qvec: Column | str, scale: Column | str) -> Column:
    """Reconstruct doubles from int8 codes: v̂_i = q_i · scale."""
    s = _c(scale)
    return F.transform(_c(qvec), lambda q: q.cast("double") * s)
