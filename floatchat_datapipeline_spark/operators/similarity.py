"""Similarity-search operators over embedding columns.

V4/O3 north-star: brute-force exact cosine is the baseline (correct at any
recall); sign-bucket LSH is the scale path — random-hyperplane LSH where
the hyperplanes are the coordinate axes of the leading dimensions. Both
are pure DataFrame plans (no UDFs); the scored-pairs shape feeds the
embedding near-dup stage of an LLM data pipeline.

Scale design: bucketing by an 8-bit sign pattern cuts candidate pairs
~256× for centered embeddings; real deployments raise bits / add rotations
as the corpus grows, trading recall for shuffle volume. The bucket join
shuffles by bucket key — never a cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from floatchat_datapipeline_spark.functions.vector import dot, norm

SIGN_BITS = 8


def sign_bucket(vec: Column | str, bits: int = SIGN_BITS) -> Column:
    """Random-hyperplane LSH key: sign pattern of the first `bits` dims."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.concat(
        *[
            F.when(F.element_at(v, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(bits)
        ]
    )


def bucketed_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.3,
    bits: int = SIGN_BITS,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup candidates: same sign-bucket, cosine ≥ threshold.
    Output (id_a, id_b, score) with id_a < id_b."""
    # Norms are hoisted to member cardinality and carried as scalars so
    # the pair stage runs ONE interpreted fold (the dot), not three —
    # dot/(na·nb) is fold-for-fold the same arithmetic as cosine(), so
    # scores are bit-identical (see operators/clusters.py semdedup).
    keyed = df.select(
        F.col(id_col),
        F.col(vec_col),
        sign_bucket(vec_col, bits).alias("bucket"),
        norm(F.col(vec_col), dim).alias("_n"),
    )
    a = keyed.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        "bucket",
        F.col("_n").alias("_na"),
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        "bucket",
        F.col("_n").alias("_nb"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            # zero-norm guard (try_divide, cosine() convention): a
            # NULL score fails the >= threshold filter, so zero-norm
            # rows drop out instead of aborting the job under ANSI mode
            F.round(
                F.try_divide(
                    dot(F.col("vec_a"), F.col("vec_b"), dim),
                    F.col("_na") * F.col("_nb"),
                ),
                6,
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def knn_within_label(
    df: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    dim: int | None = None,
) -> DataFrame:
    """Per-vector k nearest neighbors within its label partition —
    the grouped form of similarity join (metadata pre-filter F10 composed
    with top-k O4). Window row_number over (score desc, neighbor id) keeps
    ties deterministic."""
    from pyspark.sql import Window

    from floatchat_datapipeline_spark.plans.scale import rebalance

    # Same norm-hoisting as bucketed_near_dup_pairs: one fold per pair.
    a = rebalance(df.select(id_col, vec_col, label_col)).select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        F.col(label_col).alias("label"),
        norm(F.col(vec_col), dim).alias("_na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        F.col(label_col).alias("label"),
        norm(F.col(vec_col), dim).alias("_nb"),
    )
    # Broadcast the neighbor side: a shuffle join on `label` caps
    # parallelism at the label cardinality (10 here); broadcasting keeps
    # the probe side's partitioning so every core scores pairs. At corpus
    # sizes past broadcast range, bucket BOTH sides by (label, block) —
    # the standard blocked self-join — instead.
    scored = (
        a.join(F.broadcast(b), "label")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "label",
            "id_a",
            "id_b",
            # zero-norm guard — try_divide's NULL score ranks last under
            # desc (both engines default NULLS LAST on DESC), never aborts
            F.round(
                F.try_divide(
                    dot(F.col("vec_a"), F.col("vec_b"), dim),
                    F.col("_na") * F.col("_nb"),
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("score"), F.col("id_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("label", "id_a", "id_b", "score", "rank")
    )


def embedding_audit(df: DataFrame, vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """V6 — embedding presence/dimension/norm audit: one row with corpus
    counts and norm stats (the reference audits sample-by-sample,
    test_chromadb_embeddings.py:81-159; this is the set-at-a-time form)."""
    from floatchat_datapipeline_spark.functions.vector import norm

    n = F.round(norm(F.col(vec_col)), 6)
    return df.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col(vec_col).isNotNull(), 1).otherwise(0)).alias(
            "with_embedding"
        ),
        F.sum(F.when(F.size(F.col(vec_col)) == dim, 1).otherwise(0)).alias(
            "with_expected_dim"
        ),
        F.round(F.min(n), 6).alias("norm_min"),
        F.round(F.max(n), 6).alias("norm_max"),
    )


def mmr_rerank(
    df: DataFrame,
    n_queries: int = 5,
    candidates: int = 25,
    k: int = 10,
    lam: float = 0.7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """V12 — Maximal Marginal Relevance rerank (Carbonell & Goldstein,
    SIGIR 1998): diversify each query's top-k so near-duplicate hits
    don't crowd the result. Greedy: pick argmax of
    ``lam * rel(d) - (1 - lam) * max sim(d, selected)``, ties broken by
    ascending id.

    Two-stage plan, the shape batch rerank runs at 100 TB:

    1. CANDIDATE GENERATION is the cheap, scalable retrieval path — here
       the brute-force cosine window (swap in the IVF/LSH/PQ operators at
       scale); the candidate set per query is a constant (25), so stage-2
       input is |queries| x 25 rows regardless of corpus size.
    2. RERANK runs per query group via ``applyInPandas`` — the greedy
       argmax is inherently sequential IN k but embarrassingly parallel
       ACROSS queries, and each group is tiny, so the Arrow batch is the
       entire group and the numpy pairwise-sim matrix is 25x25.
       Iterative selection cannot be a window function; this is the
       documented custom-operator seam (cogrouped as-of join rule).

    Query vectors are the first ``n_queries`` embeddings by id —
    deterministic, like emb_knn_label's probe choice. Greedy selection
    runs on 1e-6-ROUNDED rel and pairwise sims (the repo-wide cosine
    parity convention, functions/vector.cosine_topk): decisions are then
    pure IEEE products/compares of cross-engine-identical doubles + id
    tiebreak, which is what lets the DuckDB recursive-CTE oracle
    (queries._EMB_MMR_RERANK_ORACLE) replay the greedy argmax
    value-exactly instead of a rows-only check.
    """
    import pandas as pd

    from pyspark.sql import Window
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    # Norms are computed ONCE PER ROW on each side of the broadcast
    # cross join, not per (candidate, query) pair: the HOF fold doesn't
    # codegen, so every textual occurrence inside the pair expression
    # is a real re-evaluation — the round-12 guard's repeated product
    # cost +64% on this query (PLANS.md round 13).
    emb = df.select(id_col, vec_col).withColumn(
        "_nv", norm(F.col(vec_col))
    )
    queries = (
        emb.orderBy(id_col)
        .limit(n_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("query_vec"),
            F.col("_nv").alias("_nq"),
        )
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "rel",
            # zero-norm guard: relevance is undefined against/for a
            # zero-norm vector — try_divide yields NULL, dropped from
            # the candidate pool below (mirrored WHERE rel IS NOT NULL
            # in the oracle)
            F.round(
                F.try_divide(
                    dot(F.col(vec_col), F.col("query_vec")),
                    F.col("_nv") * F.col("_nq"),
                ),
                6,
            ),
        )
        .filter(F.col("rel").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), id_col)
    cand = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= candidates)
        .select("query_id", F.col(id_col).alias("doc_id"), "rel", vec_col)
    )

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("rank", IntegerType()),
            StructField("doc_id", LongType()),
            StructField("rel", DoubleType()),
        ]
    )

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["rel", "doc_id"], ascending=[False, True])
        pdf = pdf.reset_index(drop=True)
        vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        # Same ALGEBRAIC FORM as the oracle — dot(a,b) / (sqrt(dot(a,a))
        # * sqrt(dot(b,b))), NOT normalize-then-dot: a different operation
        # order can land an ulp across a .5e-6 rounding boundary and flip
        # the greedy argmax. diag(dots) is dot(v,v) from the SAME matmul
        # reduction as the off-diagonal pair dots.
        dots = vecs @ vecs.T
        nrm = np.sqrt(np.maximum(np.diag(dots), 0.0))
        nrm[nrm == 0] = 1.0
        # 1e-6 rounding = the repo-wide cosine parity convention; raw
        # matmul sums differ from a sequential fold in the last ulp, and
        # the greedy argmax must compare the SAME numbers as the oracle.
        # np.round is HALF-EVEN while Spark round / DuckDB round() are
        # half-away-from-zero — use the explicit half-away form (the
        # streaming _cents_half_up rule) so an exact .5e-6 boundary
        # rounds the same way in all three engines.
        raw = dots / np.outer(nrm, nrm) * 1e6
        sims = np.where(raw >= 0, np.floor(raw + 0.5), np.ceil(raw - 0.5)) / 1e6
        rel = pdf["rel"].to_numpy()
        ids = pdf["doc_id"].to_numpy()
        n = len(pdf)
        selected: list[int] = []
        remaining = list(range(n))
        while remaining and len(selected) < k:
            if not selected:
                # ties already broken by the sort order
                best = remaining[0]
            else:
                best, best_score = None, None
                for i in remaining:
                    penalty = max(sims[i][j] for j in selected)
                    score = lam * rel[i] - (1.0 - lam) * penalty
                    if (
                        best is None
                        or score > best_score
                        or (score == best_score and ids[i] < ids[best])
                    ):
                        best, best_score = i, score
            selected.append(best)
            remaining.remove(best)
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "rank": list(range(1, len(selected) + 1)),
                "doc_id": [int(ids[i]) for i in selected],
                "rel": [float(rel[i]) for i in selected],
            }
        )

    return (
        cand.groupBy("query_id")
        .applyInPandas(_mmr, schema=out_schema)
        .orderBy("query_id", "rank")
    )
