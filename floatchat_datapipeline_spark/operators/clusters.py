"""Graph/cluster dedup operators — near-dup components, SemDedup.

The pair generators (operators/dedup.py, operators/similarity.py) emit
EDGES; turning candidate pairs into duplicate GROUPS needs connectivity:
a↔b and b↔c must collapse into one cluster with one keeper even when a↔c
was never emitted. That closure is `connected_components`; `semdedup`
is the embedding-space variant (cluster with the trained IVF quantizer,
drop near-identical vectors within each cluster — the SemDedup recipe
of Abbas et al. 2023, arXiv:2303.09540).

Scale design:
- components: iterative min-label propagation (Pregel-style). Each round
  is one equi-join + one groupBy-min, both shuffling by node id; rounds
  needed = graph diameter (near-dup graphs are shallow — dup clusters
  are cliques or short chains, so a handful of rounds). Each round's
  label table is localCheckpoint'd: it is derived state a few % the size
  of the edge set, and cutting lineage keeps round i from replaying
  rounds 1..i-1 (the same O(iters·E) vs O(iters²·E) argument as k-means
  training). Production-hardening step at extreme scale: alternating
  large-star/small-star (Kiveris et al. 2014) cuts rounds to
  O(log log n); the per-round plan is identical.
- semdedup: cluster assignment is the cached IVF quantizer's map-only
  expression (no shuffle); in-cluster pairs come from the same
  collect_list + ordered-pair explode used by every pair generator here
  (never a self-join, bounded by cluster size); the keep-set is one
  anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CC_MAX_ITERS = 20


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = CC_MAX_ITERS,
) -> DataFrame:
    """Undirected connected components over an edge list. Output one row
    per node appearing in any edge: (node, component) where component =
    the minimum node id reachable from it.

    Min-label propagation: every node starts labeled with itself; each
    round every node takes the min of its own and its neighbors' labels;
    stop when a round changes nothing (checked with a 1-row aggregate per
    round — driver-side control flow over per-round DataFrame jobs, the
    same pattern as k-means training)."""
    # Checkpoint the edge set ONCE: every round joins against it, and
    # without the cut each round would replay the (possibly expensive)
    # pair-generation lineage that produced the edges.
    und = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(
            edges.select(
                F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
            )
        )
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # Min-label propagation only ever DECREASES labels, so the label sum
    # strictly decreases iff any node changed — convergence is one scan
    # of the just-materialized round, never a labels-vs-labels join.
    prev_sum = labels.agg(F.sum("label")).first()[0]
    converged = False
    for _ in range(max_iters):
        neighbor = und.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "label")
        labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("label")).first()[0]
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # Propagation moves the min label one hop per round, so a chain
        # longer than max_iters would exit here with INTERMEDIATE labels —
        # silently wrong groups (and a parity break vs the recursive-CTE
        # oracle). Dup graphs are shallow; hitting this means the graph
        # isn't the expected shape, so fail loudly.
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(graph diameter exceeds max_iters); raise max_iters or use "
            "large-star/small-star for deep graphs"
        )
    return labels.select(
        F.col("node"), F.col("label").alias("component")
    )


def semdedup(
    emb: DataFrame,
    threshold: float = 0.93,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cache_key: str | None = None,
    dim: int | None = None,
) -> DataFrame:
    """SemDedup: IVF-cluster the embedding space, then inside each
    cluster mark every vector whose cosine to a LOWER-id cluster-mate is
    ≥ threshold as a duplicate (the lowest id of each near-identical
    group survives). Output: (vec_id, cluster, is_kept) for every vector.

    Pairs are generated only within a cluster — the quantizer bounds the
    candidate set exactly like the LSH band key does for text, so the
    pair stage is |cluster|² not |corpus|², and clusters are sized by
    n_centroids. Cross-cluster near-dups are missed by construction —
    the recall/cost trade SemDedup explicitly makes."""
    from floatchat_datapipeline_spark.embeddings.search import (
        kmeans_centroids,
        nearest_centroid,
    )
    from floatchat_datapipeline_spark.functions.vector import dot, norm

    cents = kmeans_centroids(
        emb, n_centroids, vec_col=vec_col, id_col=id_col, cache_key=cache_key
    )
    base = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    assigned = base.withColumn(
        "cluster", nearest_centroid(F.col(vec_col), cents)
    )
    # Pair generation collects IDS only (vectors stay out of the lists —
    # an id list is ~8 B/member, a vector list ~100×that), explodes once,
    # respreads the per-cluster fan-out across the cluster (parallelism
    # would otherwise be capped at n_centroids), attaches the a-side
    # vector BEFORE the pair explode (a member-count join, not a
    # pair-count join), then explodes to ordered pairs — so only ONE join
    # runs at pair cardinality (broadcast-able: the build side is the
    # corpus' (id, vec) projection).
    # Norms are computed ONCE per vector (member cardinality) and carried
    # as scalars into the pair stage, so each pair evaluates a single
    # interpreted HOF fold (the dot) instead of three (dot + both norms).
    # cosine(a,b) ≡ dot(a,b)/(norm(a)·norm(b)) with the identical fold
    # arithmetic, so scores stay bit-identical — measured ~3× on the pair
    # stage (the fold is the whole cost; see functions/vector.py).
    withn = assigned.withColumn("_n", norm(F.col(vec_col), dim))
    va = withn.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        F.col("_n").alias("_na"),
    )
    vb = withn.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    cand = (
        assigned.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .select(F.explode("ids").alias("id_a"), "ids")
        .repartition(F.col("id_a"))
        .join(va, "id_a")
    )
    # `dim` selects the fixed-dim cosine expansion — bit-identical
    # arithmetic, worth it only when pair cardinality is large enough to
    # amortize the wide tree's plan-compilation cost (see functions.vector
    # .dot); the default HOF form wins at test scale.
    pairs = (
        cand.select("id_a", "_va", "_na", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .join(vb, "id_b")
        .select(
            F.col("id_b").alias("dup_id"),
            F.round(
                dot(F.col("_va"), F.col("_vb"), dim)
                / (F.col("_na") * F.col("_nb")),
                6,
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .select("dup_id")
        .distinct()
    )
    return assigned.join(
        pairs, assigned[id_col] == pairs["dup_id"], "left"
    ).select(
        id_col,
        "cluster",
        F.col("dup_id").isNull().alias("is_kept"),
    )
