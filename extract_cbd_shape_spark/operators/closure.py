"""Graph fixpoint operators: transitive closure and connected components.

* transitive_closure — the bulk form of the reference's MultiPath BFS
  (lib/Path.ts:227-287) over an arbitrary edge DataFrame: iterative
  frontier join with a visited anti-join, persist/localCheckpoint per
  wave to cut lineage.
* connected_components — alternating large-star/small-star (Kiveris et
  al.), the canonicalization step of the KG pipeline (owl:sameAs /
  same-URL clusters). Converges in O(log n) rounds; each round is two
  groupBy/join passes, AQE handles skewed hubs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(edges: DataFrame, seeds: DataFrame,
                       max_iters: int = 50,
                       include_seeds: bool = True) -> DataFrame:
    """All nodes reachable from seeds. edges: (src, dst); seeds: (node).
    Returns (seed, node) pairs — ``seed`` is the originating seed."""
    # Edges partitioned by the join key ONCE — localCheckpoint keeps
    # the partitioning, so each round's join shuffles only the (small)
    # frontier side instead of re-shuffling the edge set per round.
    e = edges.select("src", "dst").repartition(F.col("src")).localCheckpoint()
    frontier = seeds.select(
        F.col("node").alias("seed"), F.col("node")
    ).localCheckpoint()
    # reached = LAZY union of per-round checkpointed parts (each part
    # materialized once) — re-checkpointing the whole reached set per
    # round copied O(rounds * reached) to executor storage.
    parts = [frontier]
    for _ in range(max_iters):
        reached = parts[0]
        for p in parts[1:]:
            reached = reached.unionByName(p)
        nxt = (
            frontier.join(e, frontier.node == e.src)
            .select("seed", F.col("dst").alias("node"))
            .distinct()
            .join(reached, ["seed", "node"], "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        parts.append(nxt)
        frontier = nxt
    if not include_seeds:
        parts = parts[1:] if len(parts) > 1 else [parts[0].limit(0)]
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res


def connected_components(edges: DataFrame, max_iters: int = 30) -> DataFrame:
    """(node, component) with component = min node id of the cluster.
    edges: (src, dst), undirected interpretation; node ids orderable."""
    # Neighbor pairs both directions + self to keep isolated endpoints.
    nbrs = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    # parent(u) = min(neighborhood incl. self)
    parent = (
        nbrs.unionByName(nbrs.select(F.col("u"), F.col("u").alias("v")))
        .groupBy("u")
        .agg(F.min("v").alias("p"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        # path halving: p2(u) = parent(parent(u))
        g = parent.select(F.col("u").alias("pu"), F.col("p").alias("pp"))
        hopped = (
            parent.join(g, parent.p == g.pu, "left")
            .select("u", F.coalesce("pp", "p").alias("p_new"), "p")
        )
        # min over (own parent-of-parent, neighbors' parents)
        nbr_min = (
            nbrs.join(
                parent.select(F.col("u").alias("v"), F.col("p").alias("np")), "v"
            )
            .groupBy("u")
            .agg(F.min("np").alias("nmin"))
        )
        new_parent = (
            hopped.join(nbr_min, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("p_new"), F.coalesce(F.col("nmin"), F.col("p_new"))
                ).alias("p"),
                F.col("p").alias("_old"),
            )
            .localCheckpoint()
        )
        changed = new_parent.filter(F.col("p") != F.col("_old")).isEmpty()
        parent = new_parent.drop("_old")
        if changed:
            break
    return parent.select(F.col("u").alias("node"), F.col("p").alias("component"))
