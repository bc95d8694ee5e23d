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

from pyspark.sql import DataFrame, Window
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
        .localCheckpoint(eager=False)
    )

    # the eager label checkpoint is the action that also materializes
    # sym's lazy one — the two frames cost a single Spark job
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
            .localCheckpoint(eager=False)
        )
        # the changed-count action materializes `stepped` (the lazy
        # checkpoint persists during that first evaluation — one job
        # per round instead of checkpoint + count); the previous
        # round's checkpointed blocks are then dead. NOTE they must be
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

    Both stars are expressed as a single partition-by-node window min
    over the slim (u, v) edge list — ONE exchange per star pass (the
    r8 groupBy-min + join shape paid two, and at toy/bench scale the
    fixed per-exchange latency dominates the build).  No collect_list,
    no neighborhood materialization: the window co-locates Γ(u) in one
    task, which is exactly the co-location the former shuffled hash
    join required, and per-node degree is bounded upstream by the
    dedup family's pair-bucket caps, so there is no new skew exposure
    the join shape didn't have.  Returns
    ``(components, rounds)`` where components is (node, cluster_id)
    for every node with at least one edge (same contract as
    :func:`connected_components`) and rounds counts the executed
    large+small alternations — callers assert it against their
    O(log n) expectation.  Convergence is probed every SECOND
    alternation (rounds is therefore always even; detection needs the
    first even probe at which both compared states are PAST the
    fixpoint, which for a minimal alternation count c is c+2 when c is
    even but c+3 when c is odd — so the reported count may exceed the
    minimal count by up to THREE; budget that slack in any asserted
    bound, as the catalog entry's +4 does), with each probe's
    scalar-fingerprint collect
    doubling as the action that materializes the pending lazy
    checkpoint: one Spark job per two alternations in the steady
    state.  The converged star set is the unique component-minimum
    fixpoint, so results are deterministic under any partitioning.
    """
    # LAZY checkpoint: the initial fingerprint collect below is the
    # materializing action, so the checkpoint costs no job of its own.
    # (The node frame is derived from e only AFTER convergence — it is
    # not needed during the loop, and building it up front would both
    # spend an extra job and leak its blocks on the raise path.)
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # per-node mins come from a window over the edge partition, never
    # a broadcast: the mins relation is node-set-sized, so at real
    # scale it is not broadcastable, and a window needs only the one
    # exchange a shuffled hash join would pay for its probe side
    _by_u = Window.partitionBy("u")

    def _large_star(cur: DataFrame) -> DataFrame:
        # symmetrize, then attach every strictly larger neighbor of u
        # to m = min(Γ(u) ∪ {u}).  No distinct here: duplicate edges
        # are idempotent under the min and the probed small-star pass
        # downstream deduplicates once.
        sym = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = F.least(F.min("v").over(_by_u), F.col("u"))
        return (
            sym.select("u", "v", m.alias("m"))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )

    def _small_star(cur: DataFrame, dedup: bool = True) -> DataFrame:
        # orient each edge toward its larger endpoint, then hook the
        # smaller neighbors AND u itself to m = min(Γ⁻(u)).  dedup
        # may be skipped on the unprobed alternation of a pair: every
        # downstream op is per-row or duplicate-insensitive (mins),
        # so the NEXT probed pass's distinct yields the identical edge
        # set — duplicates only thicken one intermediate.
        ori = cur.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        withm = ori.select("u", "v", F.min("v").over(_by_u).alias("m"))
        out = (
            withm.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(withm.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
        )
        return out.distinct() if dedup else out

    # scalar (count, Σu, Σv) fingerprint: a cheap single-stage probe
    # whose collect is ALSO the action that materializes the pending
    # lazy checkpoint — one Spark job per probe, nothing else.  The
    # exact one-job multiset diff runs only when the fingerprint
    # repeats (a candidate fixpoint).
    def _sig(df: DataFrame) -> tuple:
        return tuple(
            df.agg(F.count(F.lit(1)), F.sum("u"), F.sum("v")).collect()[0]
        )

    rounds = 0
    converged = False
    prev = e
    prev_sig = _sig(e)
    # Size-aware loop execution (measured, not guessed: the initial
    # fingerprint already counted the edges).  A fixpoint loop over
    # KB/MB-scale state pays a fixed per-stage latency ~50 times over;
    # adaptive replanning and default-sized shuffles are pure overhead
    # there (measured ~2× on the whole build), while at real scale —
    # above the threshold — the session's AQE/skew machinery is
    # exactly what we want, so the micro overrides never engage.
    # Saved/restored around the loop; everything the loop materializes
    # happens inside it (lazy checkpoints resolve at the probe), so no
    # downstream plan leaks the micro settings.
    # SINGLE-QUERY ASSUMPTION: these are session-global confs (Spark
    # has no per-query scope for them), so any query PLANNED on this
    # SparkSession concurrently — a streaming micro-batch, a parallel
    # caller thread — would silently inherit AQE-off and the micro
    # shuffle sizing while the loop runs.  The repo's bench/test
    # harness executes entries sequentially; callers embedding this
    # operator in a multi-threaded driver should gate it or accept
    # micro-planned concurrent queries for the loop's duration.
    conf = edges.sparkSession.conf
    saved_conf: dict[str, str] = {}
    if (prev_sig[0] or 0) < 5_000_000:
        parts = max(2, -(-int(prev_sig[0] or 0) // 250_000))
        for k, v in (
            ("spark.sql.adaptive.enabled", "false"),
            ("spark.sql.shuffle.partitions", str(parts)),
        ):
            saved_conf[k] = conf.get(k)
            conf.set(k, v)
    try:
        while rounds < max_rounds:
            # TWO alternations per probe: the contraction sequence
            # from a fixed input is deterministic, so multiset
            # equality two alternations apart would mean the sequence
            # is periodic — and a non-fixpoint period contradicts the
            # algorithm's proven finite convergence (Kiveris et al.
            # Thm 1).  Equality ⇒ fixpoint, and probing half as often
            # halves the per-build job count.  Each alternation still
            # gets its own (lazy) checkpoint: every star pass
            # references its input two or three times, so an
            # unmaterialized alternation boundary would recompute the
            # whole inner subtree per reference (measured 1.5× SLOWER
            # than the eager-per-alternation baseline).
            mid = _small_star(
                _large_star(prev), dedup=False
            ).localCheckpoint(eager=False)
            stepped = _small_star(_large_star(mid)).localCheckpoint(
                eager=False
            )
            rounds += 2
            sig = _sig(stepped)
            release_local_checkpoint(mid)
            if sig == prev_sig and multisets_equal(stepped, prev):
                if prev is not e:
                    release_local_checkpoint(prev)
                prev = stepped
                converged = True
                break
            if prev is not e:
                release_local_checkpoint(prev)
            prev, prev_sig = stepped, sig
    finally:
        for k, v in saved_conf.items():
            conf.set(k, v)
    if not converged:
        if prev is not e:
            release_local_checkpoint(prev)
        release_local_checkpoint(e)
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} "
            "rounds; alternation should contract any graph in O(log² n)"
        )
    release_local_checkpoint(e)
    # Converged star edges point child → component root, so the full
    # node set is children ∪ roots and needs no separate scan of the
    # edge list.  The union is DISJOINT: if a node x were both a child
    # (edge x→r, r<x) and a root (edge y→x, x<y), the next large-star
    # pass would rehook y to min(Γ(x)) ≤ r < x and the edge (y, x)
    # could not reappear — contradicting the certified fixpoint.
    # Roots map to themselves (take min over parents defensively — at
    # fixpoint each child has exactly one), and every root has at
    # least one child because every node here carries an edge.
    assign = prev.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("cluster_id")
    )
    comp = assign.unionByName(
        assign.select(F.col("cluster_id").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("cluster_id"))
    )
    register_checkpoint_release(prev)
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
