"""Distributed connected components over an edge list.

The missing piece between near-duplicate PAIRS and a dedup decision:
pairs form a graph; each connected component is one duplicate cluster,
and the keeper is the minimum id in the component. The reference has no
graph operator at all — this follows the standard large-graph
min-label-propagation scheme (alternating small-star/large-star style
iteration) expressed purely in DataFrame ops.

Scale shape: each iteration is one groupBy shuffle on node id over the
(bounded) edge set plus a broadcast-size convergence count. Iterations
= graph diameter, which for near-dup clusters is tiny (clusters are
cliques-ish, diameter 1-3). No collect of nodes or edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
                         max_iter: int = 25,
                         driver_threshold: int = 100_000) -> DataFrame:
    """(node, component) for every node in `edges`; component = min node
    id reachable through any path. Deterministic for any edge order.

    Adaptive execution: the edge set here is the OUTPUT of a dedup
    pass — tiny relative to the corpus it came from (near-dup pairs,
    not documents). When it fits comfortably on the driver
    (``driver_threshold`` edges) union-find runs locally in one pass —
    the same bounded-output collection a BroadcastExchange does — and
    saves ~2 jobs x diameter of distributed iteration. The default
    threshold (100k edge rows) is sized like a broadcast threshold:
    wide node ids (long strings) make Python dict entries hundreds of
    bytes each, so 100k stays tens-of-MB driver-side worst case; opt
    IN to a higher bound (e.g. 1M) only for narrow integer ids. Above
    the threshold: min-label propagation, every node starts labeled
    with itself; each round one groupBy shuffle adopts the minimum
    label among self and neighbors; stop when no label changed.
    Convergence in <= diameter rounds; `max_iter` guards pathological
    chains (at 25 the partial labels are still valid upper bounds, but
    components longer than 25 hops would stay split — raise for
    path-shaped graphs).
    """
    # The union below references `edges` twice (forward + swapped), so
    # an unpersisted input would execute its full upstream plan — for
    # dedup, the whole band-join + Jaccard pipeline — twice. Persist
    # only if the CALLER hasn't (and only unpersist what we persisted:
    # dropping a caller's cache out from under them breaks their reuse).
    we_persisted = not edges.is_cached
    if we_persisted:
        edges = edges.persist()
    # undirected: both directions once, then per-node min over neighbors
    both = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    if both.count() <= driver_threshold:
        try:
            parent: dict = {}

            def find(x):
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:          # path compression
                    parent[x], x = root, parent[x]
                return root

            for r in both.collect():
                u, v = r["u"], r["v"]
                parent.setdefault(u, u)
                parent.setdefault(v, v)
                ru, rv = find(u), find(v)
                if ru != rv:                       # min id becomes the root
                    if rv < ru:
                        ru, rv = rv, ru
                    parent[rv] = ru
            rows = [(n, find(n)) for n in parent]
            schema = both.select(F.col("u").alias("node"),
                                 F.col("u").alias("comp")).schema
            return edges.sparkSession.createDataFrame(rows, schema)
        finally:
            both.unpersist()
            if we_persisted:
                edges.unpersist()
    # Each round's labels are localCheckpoint'ed (eager): iterative
    # DataFrames MUST truncate lineage every round or the plan doubles
    # per iteration and re-executes from scratch. On a cluster prefer
    # reliable checkpointing (sc.setCheckpointDir + .checkpoint()) so
    # labels survive executor loss.
    labels = (
        both.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    try:
        for _ in range(max_iter):
            neighbor_min = (
                both.join(labels, both.v == labels.node)
                .groupBy("u").agg(F.min("comp").alias("n_comp"))
            )
            new_labels = (
                labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
                .select(
                    "node",
                    F.least(F.col("comp"), F.coalesce(F.col("n_comp"), F.col("comp")))
                    .alias("comp"),
                    (F.col("n_comp") < F.col("comp")).alias("_changed"),
                )
                .localCheckpoint()
            )
            changed = new_labels.filter(F.col("_changed")).limit(1).count()
            labels = new_labels.drop("_changed")
            if changed == 0:
                break
        return labels.select("node", "comp")
    finally:
        both.unpersist()
        if we_persisted:
            edges.unpersist()


def pagerank(edges: DataFrame, iters: int = 2, damping: float = 0.85,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """Distributed PageRank (power iteration), deterministic and
    oracle-replayable: per-edge mass contributions are cast to
    DECIMAL(18,12) before the per-node SUM, so accumulation is exact
    and order-independent — a plain double sum would hash-diverge
    across partitionings/engines.

    Each iteration is the classic join-agg: ranks ⋈ out-degrees on the
    source node, shuffle on the destination, one aggregation. Edges are
    computed once and reused; at scale you'd co-partition edges and
    ranks on node id so the per-iteration shuffle moves only rank
    tuples. Callers must pass a graph with no dangling nodes (e.g. a
    symmetrized one) — every node then both emits and receives mass.
    """
    # the edge list feeds out-degrees, the node set, and every
    # iteration's join — persist it once or each reuse re-derives the
    # full upstream lineage (measured 12s -> ~5s at sf0.01)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    try:
        nodes = e.select(F.col("src").alias("node")).distinct()
        n = nodes.count()
        base = (1.0 - damping) / n
        ranks = nodes.withColumn("r", F.lit(1.0 / n))
        for _ in range(iters):
            contrib = (
                e.join(ranks, e.src == ranks.node)
                .join(out_deg, "src")
                .select(F.col("dst"),
                        (F.col("r") / F.col("outdeg"))
                        .cast("decimal(18,12)").alias("c"))
            )
            ranks = contrib.groupBy(F.col("dst").alias("node")).agg(
                (F.lit(base)
                 + F.lit(damping) * F.sum("c").cast("double")).alias("r"))
        # materialize before releasing the persisted inputs the plan
        # still references — otherwise blocks leak for the session life
        return ranks.localCheckpoint()
    finally:
        e.unpersist()
        out_deg.unpersist()
