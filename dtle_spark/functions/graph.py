"""Iterative graph operators: connected components for dedup clustering.

Near-duplicate PAIRS (functions/dedup.py) become duplicate GROUPS via
connected components: every doc in a component keeps one canonical
representative (the minimum id). Implemented as distributed min-label
propagation — a driver loop of DataFrame joins, converging in
O(diameter) rounds (near-dup components are tiny cliques, so 2-3
rounds in practice).

Scale notes: each round is one join edges⋈labels + one min-agg — all
shuffles on node id. For web-scale graphs swap in the large-star/
small-star algorithm (same DataFrame skeleton, fewer rounds on skewed
degree distributions). The loop's only driver-side value is the
convergence count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, src: str = "id_1", dst: str = "id_2", max_iter: int = 20
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    component = min node id reachable."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # size-aware parallelism WITHOUT a count job (r15): the
        # near-dup edge set is orders smaller than the corpus (it
        # exists only where LSH found candidates), so a corpus-sized
        # partition count turns each round into pure task-scheduling
        # overhead (~32 near-empty tasks x 2 jobs x rounds). A keyed
        # repartition participates in AQE partition coalescing, which
        # sizes the edge partitions from the OBSERVED shuffle bytes —
        # 1 partition at test scale, fully parallel at 100 TB — where
        # the r14 shape paid a second materialization plus a count()
        # job to pick the number itself.
        .repartition("b")
        # materialize once: every round joins edges twice, and without
        # this the whole upstream pair-finding pipeline re-executes per
        # round (observed 13s -> ~4s on the LSH-pairs input)
        .localCheckpoint()
    )
    # seed labels with each node's min DIRECT neighbor (one aggregation
    # over the checkpointed edges) — exactly what round 1 of the loop
    # would compute from the identity labelling, so the loop starts one
    # propagation step ahead and tiny-diameter graphs (near-dup cliques)
    # converge a full join-round earlier.
    labels = (
        edges.groupBy("a")
        .agg(F.least(F.min("b"), F.col("a")).alias("component"))
        .select(F.col("a").alias("node"), "component")
    )
    for _ in range(max_iter):
        # neighbor labels
        neighbor = (
            edges.join(labels, edges.b == labels.node)
            .select(F.col("a").alias("node"), F.col("component"))
        )
        # min-label + change flag in ONE pass: the old label rides along
        # as max(is_old * component), so convergence detection needs no
        # extra join against the previous round (one job per round, not
        # two — the loop is fixed-overhead-bound at small scales)
        merged = labels.select(
            "node", "component", F.lit(1).alias("is_old")
        ).unionByName(neighbor.withColumn("is_old", F.lit(0)))
        new_labels = (
            merged.groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.max(F.when(F.col("is_old") == 1, F.col("component"))).alias("old"),
            )
            # lazy checkpoint: the convergence count right below is the
            # materializing action, so each round runs ONE job (eager
            # checkpointing ran a separate persist job per round)
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("component") != F.col("old")).count()
        labels = new_labels.select("node", "component")
        if changed == 0:
            return labels
    # a silent partial result would mis-cluster (labels stop mid-graph
    # on diameter > max_iter); fail loudly — raise max_iter or use
    # connected_components_star (O(log^2 n) rounds) for deep graphs
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "increase max_iter or use connected_components_star"
    )


def connected_components_star(
    pairs: DataFrame, src: str = "id_1", dst: str = "id_2", max_iter: int = 30
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris
    et al., "Connected Components in MapReduce and Beyond") — the scale
    path for SKEWED degree distributions. Min-label propagation
    (connected_components above) needs O(diameter) rounds and keeps the
    full edge set live every round; star rounds contract edges toward
    component minima, converging in O(log^2 n) rounds on adversarial
    graphs and shrinking the live edge set as stars form. Use it when
    the dedup graph has boilerplate hubs (one template matching 10^6
    docs); for tiny near-dup cliques min-label's fixed cost per round
    is lower.

    Same contract as connected_components: (node, component) for every
    node appearing in ``pairs``, component = min reachable id (verified
    equivalent on cliques/chains/hubs and the LSH pair graph in
    tests/test_custom_ops.py).
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def large_star(e: DataFrame) -> DataFrame:
        # per node u over BOTH directions: m = min(N(u) ∪ {u});
        # emit (v, m) for strictly larger neighbors v
        both = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = both.groupBy("u").agg(F.min("v").alias("mn"))
        m = m.select("u", F.least("mn", F.col("u")).alias("m"))
        out = (
            both.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        return _orient(out)

    def small_star(e: DataFrame) -> DataFrame:
        # edges already oriented u >= v: m = min neighborhood; relink
        # every smaller neighbor (and u itself) to m
        m = e.groupBy("u").agg(F.min("v").alias("m"))
        nbrs = e.join(m, "u").filter(F.col("v") != F.col("m")).select(
            F.col("v").alias("a"), F.col("m").alias("b")
        )
        self_link = m.select(F.col("u").alias("a"), F.col("m").alias("b"))
        return _orient(nbrs.unionByName(self_link))

    def _orient(e: DataFrame) -> DataFrame:
        return (
            e.filter(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
            .distinct()
        )

    def labels_of(e: DataFrame) -> DataFrame:
        lab = e.groupBy("u").agg(F.min("v").alias("component"))
        return nodes.join(
            lab, nodes.node == lab.u, "left"
        ).select("node", F.coalesce("component", F.col("node")).alias("component"))

    for _ in range(max_iter):
        # fixpoint is over the EDGE set (Kiveris et al. Thm 1: stable
        # iff the graph is a union of min-centered stars) — label
        # stability alone could pause mid-contraction for a round
        nxt = small_star(large_star(edges)).localCheckpoint()
        changed = (
            nxt.join(edges, ["u", "v"], "left_anti").count()
            + edges.join(nxt, ["u", "v"], "left_anti").count()
        )
        edges = nxt
        if changed == 0:
            break
    return labels_of(edges)


# Above this edge count the dedup entry points dispatch to the
# large/small-star variant: web-scale dedup graphs have boilerplate
# hubs (one template matching 10^6 docs) where min-label's O(diameter)
# rounds each drag the full live edge set; star rounds contract it.
# Below it, min-label's lower fixed cost per round wins (near-dup
# components are tiny cliques, 2-3 rounds).
STAR_EDGE_THRESHOLD = 2_000_000


def connected_components_auto(
    pairs: DataFrame,
    src: str = "id_1",
    dst: str = "id_2",
    star_threshold: int = STAR_EDGE_THRESHOLD,
) -> DataFrame:
    """Size-dispatched connected components: min-label below
    ``star_threshold`` edges, large/small-star at or above it (proven
    equivalent in tests/test_custom_ops.py). The pair set is
    checkpointed once, so the dispatch count does not re-run the
    upstream candidate generation and both impls start from the
    materialized edges."""
    pairs = pairs.localCheckpoint()
    if pairs.count() >= star_threshold:
        return connected_components_star(pairs, src, dst)
    return connected_components(pairs, src, dst)
