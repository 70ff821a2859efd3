"""Canonicalization: connected components / pointer-chasing over alias
edges (SURVEY.md §7.2-8; reference analog: owl:sameAs redirects,
RevisionFileConverter.java:110-116, and the PropertyPathOptimizer
transitive-path note at SURVEY.md §4).

Alias edges form chains/trees (a→b→c). We resolve every node to its
terminal representative with iterative **path-halving** joins:
repeatedly rewrite dst := canonical(dst) until fixpoint. Convergence
is O(log longest-chain) iterations; each iteration is one self-join.
Lineage is cut with `localCheckpoint()` every iteration so the plan
doesn't grow exponentially at scale (the north rule's "checkpointed
frontiers").

For undirected connected components (hash-min over arbitrary graphs)
see `connected_components` — the general loop used when alias edges
aren't a forest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERS = 50

# alias tables at or below this row count resolve driver-side (one
# collect, pure-python pointer chase, one createDataFrame) instead of
# paying several serial Spark jobs; above it, the distributed
# path-halving loop runs. The loop is the general/scale path — the
# fast path only applies when the whole alias dimension would have
# been broadcast anyway.
DRIVER_THRESHOLD = 100_000


def _canonical_map_driver(alias_edges: DataFrame) -> DataFrame:
    rows = alias_edges.select("src", "dst").collect()
    parent = {r["src"]: r["dst"] for r in rows}
    out = []
    for src in parent:
        cur, hops = src, 0
        while cur in parent and hops <= len(parent):
            cur = parent[cur]
            hops += 1
        out.append((src, cur))
    return alias_edges.sparkSession.createDataFrame(
        out, "src string, canon string"
    )


def canonical_map(
    alias_edges: DataFrame,
    max_iters: int = MAX_ITERS,
    driver_threshold: int = DRIVER_THRESHOLD,
) -> DataFrame:
    """(src, canon): terminal representative for every aliased node.

    Pointer-chasing with path halving: map = src→dst; join map with
    itself (dst→dst') and set dst := dst' where present. Each round
    doubles resolved path length.
    """
    if driver_threshold and alias_edges.count() <= driver_threshold:
        return _canonical_map_driver(alias_edges)
    m = alias_edges.select("src", "dst").dropDuplicates(["src"])
    for _ in range(max_iters):
        nxt = m.selectExpr("src as j_src", "dst as j_dst")
        m2 = (
            m.join(F.broadcast(nxt), F.col("dst") == F.col("j_src"), "left")
            .select("src", F.coalesce("j_dst", "dst").alias("dst"))
        )
        m2 = m2.localCheckpoint()  # cut lineage each round
        changed = (
            m2.selectExpr("src", "dst as new_dst")
            .join(m.selectExpr("src", "dst as old_dst"), "src")
            .filter(F.col("new_dst") != F.col("old_dst"))
        )
        if changed.isEmpty():
            return m2.withColumnRenamed("dst", "canon")
        m = m2
    return m.withColumnRenamed("dst", "canon")


def connected_components(edges: DataFrame, max_iters: int = MAX_ITERS) -> DataFrame:
    """General undirected CC via hash-min label propagation.

    Returns (node, component) where component = min node id of the
    component (string min). Iterative join + groupBy-min with
    checkpointed frontier; converges in O(diameter) rounds.
    """
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node"))
    for _ in range(max_iters):
        # neighbor's current label, propagated
        prop = (
            sym.join(labels, sym["dst"] == labels["node"])
            .select(sym["src"].alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
        )
        if changed.isEmpty():
            return new_labels
        labels = new_labels
    return labels


def canonicalize_triples(triples: DataFrame, alias_edges: DataFrame) -> DataFrame:
    """Rewrite subj/obj through the canonical map (broadcast join —
    the alias universe is tiny relative to the fact table)."""
    cmap = F.broadcast(canonical_map(alias_edges))
    out = (
        triples.join(cmap.withColumnRenamed("src", "subj"), "subj", "left")
        .withColumn("subj_c", F.coalesce("canon", "subj"))
        .drop("canon")
        .join(cmap.withColumnRenamed("src", "obj"), "obj", "left")
        .withColumn("obj_c", F.coalesce("canon", "obj"))
        .drop("canon")
    )
    return out.select(
        "conv_id", "turn_idx",
        F.col("subj_c").alias("subj"),
        "pred",
        F.col("obj_c").alias("obj"),
    )
