"""Connected components over near-duplicate pair graphs — turning
pairwise similarity hits into dedup *clusters* with one canonical
survivor each (what a training-data pipeline actually deletes by).

Algorithm: iterative min-label propagation (a DataFrame-native variant
of large/small-star; see Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14). Each round every node adopts the
smallest id reachable in one hop; rounds double the propagation radius,
so convergence takes O(log(diameter)) joins. Near-dup graphs have tiny
diameters (clusters are near-cliques), so 2-4 rounds is typical.

Scale notes: state per round is one (node, label) relation — a shuffle
keyed by node; no driver-side structures grow with the data. Each round
is checkpointed (localCheckpoint) to cut the exponentially growing
lineage — on a cluster you would checkpoint to reliable storage
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Label every node of the undirected pair graph with the smallest
    node id in its component. Returns (node, component).

    Nodes appearing only as isolated ids are the caller's concern —
    feed the full id set through ``assign_components`` to also label
    singletons."""
    edges = (
        pairs.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .union(pairs.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")))
        .distinct()
        .persist()  # every round joins edges; don't recompute the
        # (possibly expensive) pair-generation subtree per iteration
    )
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iterations):
        # candidate labels: own label plus every neighbor's label
        neighbor_labels = (
            edges.join(labels, edges.d == labels.node)
            .select(F.col("s").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    # labels is checkpointed (lineage truncated), so the edge cache can
    # be dropped instead of living for the rest of the session
    edges.unpersist()
    return labels


def assign_components(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """Component id for EVERY id (singletons get themselves)."""
    comp = connected_components(pairs, src_col, dst_col)
    return (
        ids.select(F.col(id_col).alias("node"))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", F.col("node")).alias("component"),
        )
    )


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """Keep one row per near-dup cluster: the row whose id equals the
    component label (the smallest id in the cluster) — deterministic
    canonical-survivor dedup."""
    comp = assign_components(df.select(id_col), pairs, id_col, src_col, dst_col)
    keep = comp.filter(F.col(id_col) == F.col("component")).select(id_col)
    return df.join(keep, id_col, "left_semi")
