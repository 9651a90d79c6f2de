"""Connected components over near-duplicate candidate pairs.

Completes the dedup story: LSH produces PAIRS (minhash_lsh_pairs,
simhash_near_pairs, cosine_near_pairs_lsh); real dedup needs CLUSTERS —
transitive closure of the pair graph — and then one survivor per
cluster. This is iterative min-label propagation expressed entirely in
DataFrame joins/aggregations:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated to fixpoint. Each iteration is one groupBy-min over the edge
list joined to current labels — shuffle-partitioned by vertex id, no
driver-side graph. Convergence is bounded by the cluster diameter;
near-dup clusters are dense and shallow (LSH links most member pairs
directly), so a handful of iterations closes them — max_iter is a
safety bound, and hitting it raises rather than returning a partially
contracted labeling. localCheckpoint truncates the iteration lineage so
plans stay constant-size (the standard iterative-algorithm idiom; on a
production cluster use reliable checkpointing instead).

At 10^12-row scale the edge list is the small side (near-dup pairs ≪
corpus); labels stay partitioned by id throughout, and AQE reuses the
exchange across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every vertex in the edge list; component =
    min vertex id of the connected component."""
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iter):
        # min label among each vertex's neighbors
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        # carry the previous label through the projection so convergence
        # is a filter on the SAME materialized frame, not another join
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                F.col("component").alias("_prev"),
            )
            .localCheckpoint()
        )
        changed = (
            updated.where(F.col("component") != F.col("_prev")).limit(1).count()
        )
        labels = updated.drop("_prev")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        "(pathological chain-shaped component? raise max_iter)"
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Every doc with its duplicate-cluster id and survivor flag.

    Docs that appear in no pair form singleton clusters of themselves.
    The survivor is the min id per cluster (deterministic).
    """
    comp = connected_components(pairs, a_col, b_col)
    out = docs.select(id_col).join(
        comp.withColumnRenamed("id", id_col), id_col, "left"
    )
    cluster = F.coalesce("component", F.col(id_col))
    return out.select(
        id_col,
        cluster.alias("cluster_id"),
        (F.col(id_col) == cluster).alias("is_survivor"),
    )
