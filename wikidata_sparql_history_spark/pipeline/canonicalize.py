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
    parent: dict[str, str] = {}
    for r in rows:
        if r["src"] in parent and parent[r["src"]] != r["dst"]:
            raise ValueError(
                f"alias edges are not functional: src {r['src']!r} has "
                f"multiple dsts ({parent[r['src']]!r}, {r['dst']!r}); "
                "route through connected_components() for general graphs"
            )
        parent[r["src"]] = r["dst"]
    out = []
    for src in parent:
        cur, hops = src, 0
        while cur in parent:
            if hops > len(parent):
                raise ValueError(
                    f"cycle in alias edges reachable from {src!r}; "
                    "route through connected_components() for general graphs"
                )
            cur = parent[cur]
            hops += 1
        out.append((src, cur))
    return alias_edges.sparkSession.createDataFrame(
        out, "src string, canon string"
    )


# resolved maps cached per (session-token, analyzed-plan semanticHash):
# every snapshot query re-evaluates the construction pipeline, and
# without the cache each evaluation re-runs the collect/loop actions
_MAP_CACHE: dict[tuple, DataFrame] = {}


def _evict_dead_sessions(token: tuple) -> None:
    """Drop cached maps belonging to other (dead) session tokens so
    restarts within one driver process don't accumulate references."""
    for k in list(_MAP_CACHE):
        if k[: len(token)] != token:
            _MAP_CACHE.pop(k)


def session_token(spark) -> tuple:
    """Stable identity for a live session: applicationId + context start
    time. id(session) is unsafe — CPython reuses ids after GC, so a new
    session could silently inherit a dead session's cached DataFrames."""
    try:
        sc = spark.sparkContext
        return (sc.applicationId, sc.startTime)
    except Exception:  # Spark Connect — no sparkContext
        return (id(spark),)


def _cache_key(alias_edges: DataFrame) -> tuple | None:
    try:
        h = alias_edges._jdf.queryExecution().analyzed().semanticHash()
        return (*session_token(alias_edges.sparkSession), int(h))
    except Exception:  # Spark Connect or API drift — just skip caching
        return None


def canonical_map(
    alias_edges: DataFrame,
    max_iters: int = MAX_ITERS,
    driver_threshold: int = DRIVER_THRESHOLD,
) -> DataFrame:
    """(src, canon): terminal representative for every aliased node.

    PRECONDITION (validated): edges form a functional forest — each src
    has exactly one dst and no cycles exist. Non-forest inputs raise;
    use `connected_components` for arbitrary graphs. (The reference has
    the same assumption: a wiki redirect page has one target,
    RevisionFileConverter.java:110-116.)

    Pointer-chasing with path halving: map = src→dst; join map with
    itself (dst→dst') and set dst := dst' where present. Each round
    doubles resolved path length.
    """
    key = _cache_key(alias_edges)
    if key is not None:
        # the threshold changes WHICH implementation runs — a cached
        # driver-path map must not satisfy a forced-loop request
        key = (*key, driver_threshold)
        if key in _MAP_CACHE:
            return _MAP_CACHE[key]
        _evict_dead_sessions(session_token(alias_edges.sparkSession))
    # exact duplicate (src, dst) rows are functionally valid — only a
    # src with two DIFFERENT dsts violates the forest precondition, so
    # the gate compares distinct edges against distinct srcs
    edges = alias_edges.select("src", "dst").dropDuplicates()
    n, n_src = edges.agg(F.count("*"), F.countDistinct("src")).first()
    if n != n_src:
        raise ValueError(
            f"alias edges are not functional ({n} distinct edges, {n_src} "
            "distinct srcs); route through connected_components() for "
            "general graphs"
        )
    if driver_threshold and n <= driver_threshold:
        result = _canonical_map_driver(edges)
        if key is not None:
            _MAP_CACHE[key] = result
        return result
    m = edges
    converged = False
    for _ in range(max_iters):
        nxt = m.selectExpr("src as j_src", "dst as j_dst")
        # plain shuffle join: the map is the BIG side here (the loop
        # only runs above driver_threshold), so forcing a broadcast of
        # nxt would ship the whole map to every executor each round and
        # OOM at scale; AQE still picks broadcast when it actually fits
        m2 = (
            m.join(nxt, F.col("dst") == F.col("j_src"), "left")
            .select("src", F.coalesce("j_dst", "dst").alias("dst"))
        )
        m2 = m2.localCheckpoint()  # cut lineage each round
        changed = (
            m2.selectExpr("src", "dst as new_dst")
            .join(m.selectExpr("src", "dst as old_dst"), "src")
            .filter(F.col("new_dst") != F.col("old_dst"))
        )
        if changed.isEmpty():
            m = m2
            converged = True
            break
        m = m2
    if not converged:
        raise ValueError(
            f"canonical_map did not converge in {max_iters} path-halving "
            "rounds — alias edges likely contain a cycle; route through "
            "connected_components() for general graphs"
        )
    result = m.withColumnRenamed("dst", "canon")
    if key is not None:
        _MAP_CACHE[key] = result
    return result


def connected_components(edges: DataFrame, max_iters: int = MAX_ITERS) -> DataFrame:
    """General undirected CC via hash-min label propagation.

    Returns (node, component) where component = min node id of the
    component (string min). Iterative join + groupBy-min with
    checkpointed frontier; converges in O(diameter) rounds.
    """
    # r7: materialize the symmetrized edge table once — it is joined in
    # EVERY label-propagation round, and `edges` can be an arbitrarily
    # expensive upstream plan (dedup_clusters feeds the whole n-gram
    # Jaccard pipeline in here); without the checkpoint each round
    # re-evaluated it from scratch (guide §2.4/§5).
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
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


def canonicalize_triples(
    triples: DataFrame,
    alias_edges: DataFrame,
    driver_threshold: int = DRIVER_THRESHOLD,
) -> DataFrame:
    """Rewrite subj/obj through the canonical map (broadcast join —
    the alias universe is tiny relative to the fact table).

    `driver_threshold=0` forces the distributed path-halving loop in
    `canonical_map` (the scale path) regardless of alias-table size —
    used by the ★kg_linked_distributed contract query so the loop
    itself is oracle-exercised, not just the driver fast path."""
    cmap = F.broadcast(canonical_map(alias_edges, driver_threshold=driver_threshold))
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
