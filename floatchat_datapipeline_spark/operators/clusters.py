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
    und = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionByName(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        neighbor = und.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "label")
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("label", "_old"), "node"
            )
            .filter(F.col("label") != F.col("_old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
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
    from floatchat_datapipeline_spark.functions.vector import cosine

    cents = kmeans_centroids(
        emb, n_centroids, vec_col=vec_col, id_col=id_col, cache_key=cache_key
    )
    base = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    assigned = base.withColumn(
        "cluster", nearest_centroid(F.col(vec_col), cents)
    )
    pairs = (
        assigned.groupBy("cluster")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col).alias("id"), F.col(vec_col).alias("v")))
            ).alias("ms")
        )
        .select(F.explode("ms").alias("a"), F.col("ms"))
        .select(F.col("a"), F.explode("ms").alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("b.id").alias("dup_id"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("sim"),
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
