"""Distributed connected components — the cluster-assignment step that
turns near-duplicate PAIRS (MinHash/SimHash/embedding) into dedup
CLUSTERS: every document gets the minimum doc id of its component as a
canonical cluster id, so "keep one per cluster" is a single filter.

Algorithm: iterative min-label propagation over the (symmetrized) edge
set. Each round every node takes the minimum of its own label and its
neighbors' labels; the fixpoint assigns each node the component-minimum
id, reached in at most diameter(G) rounds. Dedup graphs are unions of
near-clique clusters (diameter 2-3 in practice), so the loop converges
in a handful of rounds; each round is one shuffle join + one map-side-
combinable min aggregation, and `localCheckpoint` truncates the lineage
so the plan stays flat across iterations.

Scale notes: label state is 2 longs per node — orders of magnitude
smaller than the documents. For adversarial long-path graphs,
production systems switch to alternating star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14) for
O(log n) rounds; dedup clusters never need it, and the row-shape here
(node, lbl) is identical, so that variant can slot in behind the same
signature. The convergence check is a driver-side count of changed
labels — an O(1) scalar per round, the same pattern MLlib's iterative
algorithms use (not a data collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import (
    multisets_equal,
    register_checkpoint_release,
    release_local_checkpoint,
)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Assign each node in ``edges`` the minimum node id reachable from
    it: returns (node, cluster_id). Only nodes with at least one edge
    appear (singletons have no dedup decision to make).

    Deterministic under any partitioning/parallelism: the converged
    min-label fixpoint is unique.
    """
    # Symmetrize in ONE pass over the input (explode of the two
    # orientations) — a fwd/rev self-union would execute the possibly
    # expensive upstream pair-generation plan twice. Then materialize:
    # the edge list is re-joined every round, and without the checkpoint
    # the upstream plan would re-execute per iteration as well.
    both = F.explode_outer(
        F.array(
            F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
            F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
        )
    )
    sym = (
        edges.select(both.alias("e"))
        .select("e.u", "e.v")
        .distinct()
        .localCheckpoint()
    )

    labels = (
        sym.select("u")
        .distinct()
        .select(F.col("u").alias("node"), F.col("u").alias("lbl"))
        .localCheckpoint()
    )

    changed = -1
    prev_ckpt = labels
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        stepped = (
            labels.join(nbr_min, labels["node"] == nbr_min["u"], "left")
            .select(
                "node",
                F.col("lbl").alias("old_lbl"),
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint()
        )
        # the changed-count action materialized `stepped`; the previous
        # round's checkpointed blocks are now dead. NOTE they must be
        # released through the checkpointed RDD handle — a plain
        # Dataset.unpersist() only clears CacheManager entries and is a
        # silent no-op for localCheckpoint blocks (r3 advice; verified
        # against getPersistentRDDs) — or executor storage grows
        # linearly with rounds on long chains.
        changed = stepped.filter(F.col("lbl") != F.col("old_lbl")).count()
        release_local_checkpoint(prev_ckpt)
        prev_ckpt = stepped
        labels = stepped.select("node", "lbl")
        if changed == 0:
            break
    release_local_checkpoint(sym)
    if changed != 0:
        # exiting via max_iter would return labels mid-propagation —
        # one component reported as several clusters, silently
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); the graph has a path "
            f"longer than max_iter — raise max_iter or switch to star "
            f"contraction for long-chain graphs"
        )

    # the final round's checkpoint blocks back the returned frame —
    # register them for caller-owned release (util.release_barriers)
    register_checkpoint_release(prev_ckpt)
    return labels.select("node", F.col("lbl").alias("cluster_id"))


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 40,
) -> tuple[DataFrame, int]:
    """Connected components by ALTERNATING STAR CONTRACTION (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14):
    large-star hooks every strictly-larger neighbor of a node to its
    neighborhood minimum, small-star hooks the smaller neighbors, and
    the alternation contracts any graph to per-component stars rooted
    at the component minimum in O(log² n) rounds (O(log n) observed) —
    the scale path for adversarial long-chain graphs where min-label
    propagation (:func:`connected_components`) needs O(diameter)
    rounds.

    Both stars are expressed as one groupBy-min plus one join over the
    slim (u, v) edge list — no collect_list, no neighborhood
    materialization, so a skewed high-degree node costs a map-side
    combinable min, not a reducer-side array.  Returns
    ``(components, rounds)`` where components is (node, cluster_id)
    for every node with at least one edge (same contract as
    :func:`connected_components`) and rounds counts the executed
    large+small alternations — callers assert it against their
    O(log n) expectation.  The converged star set is the unique
    component-minimum fixpoint, so results are deterministic under any
    partitioning.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # the hook joins stay ordinary shuffled joins: the per-node mins
    # frame is as large as the node set, so at real scale it is never
    # broadcastable, and measured at bench scale a broadcast build per
    # round is no faster than AQE-coalesced shuffles while stacking
    # broadcast relations against the driver heap

    def _large_star(cur: DataFrame) -> DataFrame:
        # symmetrize, then attach every strictly larger neighbor of u
        # to m = min(Γ(u) ∪ {u}).  No distinct here: duplicate edges
        # are idempotent under the mins and the small-star pass that
        # consumes this output deduplicates once.
        sym = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )

    def _small_star(cur: DataFrame) -> DataFrame:
        # orient each edge toward its larger endpoint, then hook the
        # smaller neighbors AND u itself to m = min(Γ⁻(u))
        ori = cur.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = ori.groupBy("u").agg(F.min("v").alias("m"))
        hooked = ori.join(mins, "u")
        return (
            hooked.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(hooked.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    rounds = 0
    converged = False
    prev = e
    # scalar (count, Σu, Σv) fingerprint: a cheap single-stage probe
    # per round; the exact one-job set diff runs only when the
    # fingerprint repeats (a candidate fixpoint), so the steady cost
    # per alternation is the contraction plan itself plus one scalar
    # aggregate — not two exceptAll shuffles
    prev_sig = tuple(
        e.agg(F.count(F.lit(1)), F.sum("u"), F.sum("v")).collect()[0]
    )
    for _ in range(max_rounds):
        stepped = _small_star(_large_star(prev)).localCheckpoint()
        rounds += 1
        sig = tuple(
            stepped.agg(F.count(F.lit(1)), F.sum("u"), F.sum("v")).collect()[0]
        )
        if sig == prev_sig and multisets_equal(stepped, prev):
            if prev is not e:
                release_local_checkpoint(prev)
            prev = stepped
            converged = True
            break
        if prev is not e:
            release_local_checkpoint(prev)
        prev, prev_sig = stepped, sig
    release_local_checkpoint(e)
    if not converged:
        release_local_checkpoint(prev)
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} "
            "rounds; alternation should contract any graph in O(log² n)"
        )
    # converged star edges point child → component root; roots map to
    # themselves (take min over parents defensively — at fixpoint each
    # child has exactly one)
    assign = prev.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("cluster_id")
    )
    comp = (
        nodes.join(assign, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("cluster_id"), F.col("node")).alias("cluster_id"),
        )
    )
    register_checkpoint_release(prev)
    register_checkpoint_release(nodes)
    return comp, rounds


def cluster_summary(components: DataFrame) -> DataFrame:
    """Per-cluster rollup of a (node, cluster_id) assignment:
    (cluster_id, n_docs, min_doc, max_doc), ordered."""
    return (
        components.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("node").alias("min_doc"),
            F.max("node").alias("max_doc"),
        )
        .orderBy("cluster_id")
    )
