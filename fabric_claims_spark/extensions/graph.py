"""Distributed connected components over an edge list — the cluster
step of a dedup pipeline (near-dup PAIRS are only evidence; acting on
them needs components: every doc in a duplicate group mapped to one
cluster id, one canonical survivor per cluster).

Algorithm: iterative min-label propagation. Each round every node
adopts the smallest label among itself and its neighbors; a round is
one shuffle join + one aggregate, and the loop stops when no label
changed. Rounds needed = component diameter — for dedup graphs
components are near-cliques of copies of the same content (diameter
1-3), so the loop converges in 2-4 rounds. For adversarial
long-chain graphs the upgrade path is the alternating large-star /
small-star contraction of Kiveris et al. (Connected Components in
MapReduce, SoCC'14), which converges in O(log n) rounds with the
same join primitive; propagation is kept here because dedup graphs
never exhibit those chains and the constant factor per round is
lower.

Scale notes: the labels frame is localCheckpoint'd every round —
without truncation the lineage doubles per iteration and the plan
itself becomes the bottleneck (classic iterative-Spark pitfall). The
convergence probe reads the already-materialized checkpoint, so it
costs one cheap aggregate, not a recompute.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fabric_claims_spark.localframe import local_frame
from fabric_claims_spark.caching import tracked_cache


class ConvergenceError(RuntimeError):
    """Raised when label propagation exhausts max_iter with labels
    still changing — returning the partial labels would silently
    split >max_iter-diameter components into multiple clusters."""


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    on_exhaustion: str = "raise",
    algorithm: str = "propagation",
) -> DataFrame:
    """(node, cluster) for every node appearing in ``edges``; cluster
    is the minimum node id reachable from the node (deterministic
    canonical label). Edges are treated as undirected.

    ``checkpoint_dir``: when set, per-round lineage truncation uses
    reliable ``checkpoint()`` into that directory (survives executor
    loss — the cluster-production mode) instead of ``localCheckpoint``
    (executor-memory blocks; an executor loss mid-loop kills the job,
    acceptable only single-node or for interactive runs).

    ``on_exhaustion``: ``"raise"`` (default) raises ConvergenceError
    if labels are still changing after ``max_iter`` rounds; ``"warn"``
    emits a RuntimeWarning and returns the partial labels. Dedup
    graphs (near-clique components, diameter 1-3) converge in 2-4
    rounds, so exhaustion signals an adversarial graph that needs the
    O(log n) large-star/small-star contraction instead — never a
    condition to paper over.

    ``algorithm``: ``"propagation"`` (default — min-label rounds,
    O(diameter), lowest constant factor on the near-clique components
    dedup graphs produce) or ``"star"`` — the alternating large-star /
    small-star contraction of Kiveris et al. (Connected Components in
    MapReduce and Beyond, SoCC'14), O(log n) rounds on ANY graph with
    the same join-shaped primitive, for long-chain / high-diameter
    graphs where propagation would exhaust max_iter. Both return the
    identical (node, cluster=min reachable id) frame."""
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)

    else:

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if algorithm == "star":
        return _star_components(e, _ckpt, max_iter, on_exhaustion)
    if algorithm != "propagation":
        raise ValueError(
            f"unknown algorithm {algorithm!r}: use 'propagation' or 'star'"
        )
    sym = _ckpt(  # reused every round — never re-derive
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    )
    # Seeded init: label = min(node, min neighbor). This IS round 1 of
    # propagation, folded into the init aggregate — one groupBy
    # instead of a full join + checkpoint + convergence probe, so
    # diameter-d components converge in d-1 loop rounds (dedup
    # near-cliques: usually 1-2).
    labels = _ckpt(
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.min("v").alias("nbr"))
        .select("node", F.least(F.col("node"), F.col("nbr")).alias("cluster"))
    )
    changed = 0
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["u"] == labels["node"])
            .groupBy("v")
            .agg(F.min("cluster").alias("nbr_cluster"))
        )
        stepped = _ckpt(
            labels.join(nbr_min, labels["node"] == nbr_min["v"], "left").select(
                "node",
                F.col("cluster").alias("_old"),
                F.least(
                    F.col("cluster"), F.coalesce("nbr_cluster", "cluster")
                ).alias("cluster"),
            )
        )
        changed = stepped.where(F.col("cluster") < F.col("_old")).limit(1).count()
        labels = stepped.drop("_old")
        if changed == 0:
            break
    if changed != 0:
        msg = (
            f"connected_components did not converge in {max_iter} rounds; "
            "component diameter exceeds max_iter — raise max_iter or use "
            "star-contraction for long-chain graphs"
        )
        if on_exhaustion == "warn":
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        else:
            raise ConvergenceError(msg)
    return labels


def _star_components(e, _ckpt, max_iter: int, on_exhaustion: str) -> DataFrame:
    """Alternating large-star / small-star contraction (Kiveris et
    al., SoCC'14). State is an undirected edge set stored once per
    unordered pair (lo < hi); each round is:

    * large-star — per node u with full neighborhood Γ(u) and
      m(u) = min(Γ(u) ∪ {u}): emit (v, m(u)) for every strictly
      LARGER neighbor v. Hooks big-id nodes directly onto their
      neighborhood minimum, halving long chains.
    * small-star — orient every pair toward its larger endpoint
      (key u, smaller neighbors Γ⁻(u)), m(u) = min(Γ⁻(u)): emit
      (v, m(u)) for v ∈ Γ⁻(u) ∪ {u}. Flattens the small side into
      a star.

    Each is one groupBy + one join on the node key — the same
    shuffle shape as a propagation round — and the composition
    provably converges in O(log n) rounds on any graph (vs
    O(diameter) for propagation). Fixpoint = the edge set is a star
    forest: every edge (v, root) with root the component minimum, so
    labels read directly off the final pairs. Convergence is checked
    by set equality against the previous round's pairs (count match
    + empty one-way subtract — exact, not a fingerprint); both
    frames are already checkpoint-materialized so the probe is
    cheap.

    Nodes whose ONLY edges are self-loops vanish from the pair set
    (which keeps lo < hi); they are singleton components and are
    unioned back in as (node, node) at the end, so the output covers
    every node appearing in ``edges`` — identical to propagation,
    which labels them through its symmetric-closure groupBy."""
    pairs = _ckpt(
        e.where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("lo"), F.greatest("u", "v").alias("hi")
        )
        .distinct()
    )
    # singleton components the pair set cannot represent: nodes seen
    # only in self-loop edges. Both sides are checkpointed/small.
    selfloop_only = (
        e.where(F.col("u") == F.col("v"))
        .select(F.col("u").alias("node"))
        .distinct()
        .join(
            pairs.select(F.col("lo").alias("node"))
            .union(pairs.select(F.col("hi").alias("node")))
            .distinct(),
            "node",
            "left_anti",
        )
        .select("node", F.col("node").alias("cluster"))
    )
    converged = False
    for _ in range(max_iter):
        # ---- large-star ----
        nbrs = pairs.select(
            F.col("lo").alias("u"), F.col("hi").alias("v")
        ).unionByName(
            pairs.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )
        m = nbrs.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        ls = (
            nbrs.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("m").alias("lo"), F.col("v").alias("hi"))
            .where(F.col("lo") != F.col("hi"))
            .distinct()
        )
        # ---- small-star (input already oriented: key = hi) ----
        sm = ls.groupBy("hi").agg(F.min("lo").alias("m"))
        stepped = _ckpt(
            ls.join(sm, "hi")
            .select(F.col("m").alias("lo"), F.col("lo").alias("hi"))
            .where(F.col("lo") != F.col("hi"))
            .unionByName(
                sm.select(F.col("m").alias("lo"), F.col("hi").alias("hi"))
            )
            .distinct()
        )
        same_count = stepped.count() == pairs.count()
        if same_count and stepped.subtract(pairs).limit(1).count() == 0:
            pairs = stepped
            converged = True
            break
        pairs = stepped
    if not converged:
        msg = (
            f"star contraction did not converge in {max_iter} rounds "
            "(needs O(log n)); raise max_iter"
        )
        if on_exhaustion != "warn":
            raise ConvergenceError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=3)
        # Non-converged pairs are NOT a star forest: a node can appear
        # under conflicting partial labels (member of one pair, root of
        # another). Collapse to one row per node with the minimum label
        # seen — the same one-partial-row-per-node contract
        # propagation's warn mode gives.
        partial = (
            pairs.select(F.col("hi").alias("node"), F.col("lo").alias("c"))
            .unionByName(
                pairs.select(F.col("lo").alias("node"), F.col("lo").alias("c"))
            )
            .groupBy("node")
            .agg(F.min("c").alias("cluster"))
        )
        return partial.unionByName(selfloop_only)
    # fixpoint pairs are (root, member): labels read directly off them
    roots = pairs.select(F.col("lo").alias("node")).distinct().select(
        "node", F.col("node").alias("cluster")
    )
    return (
        pairs.select(F.col("hi").alias("node"), F.col("lo").alias("cluster"))
        .unionByName(roots)
        .unionByName(selfloop_only)
    )


def triangles(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list:
    (node, triangles) for every node in the graph, zeros included.

    Algorithm: degree-ordered orientation ("compact-forward", Latapy,
    TCS 2008; the same orientation MapReduce triangle counters use —
    Suri & Vassilvitskii, WWW'11). Each edge is oriented from its
    lower-(degree, id) endpoint to the higher one, making the graph a
    DAG in which every triangle {x, y, z} has exactly one source node
    with two out-edges — so the wedge self-join enumerates each
    triangle once, no post-dedup. Scale shape: the wedge join fans out
    per node as C(out_degree, 2), and orientation bounds out-degree by
    O(sqrt(m)) (a node of degree d only keeps out-edges to
    higher-degree nodes, and there are at most 2m/d of those) — total
    work O(m^1.5) worst case versus O(sum deg^2) for the naive wedge
    count, which is the difference between a skewed hub exploding the
    join (C(n,2) wedges at a celebrity node) and it contributing its
    sqrt share. Three shuffles: degree agg, wedge self-join on the
    source key, closing-edge semi-join."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    withdeg = e.join(
        deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u"
    ).join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    ori = withdeg.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("t_deg"),
    )
    o1 = ori.select("s", F.col("t").alias("a"), F.col("t_deg").alias("a_deg"))
    o2 = ori.select("s", F.col("t").alias("b"), F.col("t_deg").alias("b_deg"))
    wedges = o1.join(o2, "s").where(
        (F.col("a_deg") < F.col("b_deg"))
        | ((F.col("a_deg") == F.col("b_deg")) & (F.col("a") < F.col("b")))
    )
    closing = ori.select(F.col("s").alias("a"), F.col("t").alias("b"))
    tri = wedges.join(closing, ["a", "b"]).select("s", "a", "b")
    per_node = (
        tri.select(
            F.explode(F.array(F.col("s"), F.col("a"), F.col("b"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 5,
    damping: float = 0.85,
    teleport: float = 0.15,
    redistribute_dangling: bool = False,
    hot_degree_cap: int | None = None,
) -> DataFrame:
    """Weighted PageRank over an edge list: (node, pr) after ``iters``
    synchronous rounds. Each round is one co-partitioned equi-join of
    the edge list with the rank frame plus one hash aggregate on the
    destination key — the same shuffle shape as connected_components,
    so it scales the same way (no adjacency matrices, no driver state).

    Cross-engine determinism (so a SQL oracle can unroll the loop):
    the out-degree ratio is a single IEEE division rounded to 9 dp;
    per-edge contributions are ``round(pr * r, 12)`` summed as exact
    ``decimal(20,12)``; each round's rank is one deterministic
    double chain rounded to 12 dp. ``damping`` and ``teleport`` are
    independent constants (never derived from each other — ``1 - 0.85``
    is not ``0.15`` in IEEE doubles).

    Dangling nodes (no out-edges): with the default
    ``redistribute_dangling=False`` their mass leaks — acceptable for
    the symmetric co-occurrence graphs this engine builds, where every
    node with an in-edge has the reverse out-edge (and bit-compatible
    with the unrolled SQL oracle). For general DIRECTED graphs pass
    ``redistribute_dangling=True``: each round the summed rank of
    dangling nodes is split uniformly across all nodes before damping
    (the standard power-iteration correction), at the cost of one
    extra tiny aggregate + broadcast per round over the loop-invariant
    dangling-node set. Lineage grows linearly in ``iters``; for long
    runs wrap with the checkpointing used by connected_components.

    ``hot_degree_cap`` — skew guard for Zipfian-degree graphs (token
    co-occurrence graphs on natural text: stopword hubs own a huge
    fraction of all edges, so the per-round rank join's shuffle puts a
    hub's ENTIRE adjacency in one reducer task). Nodes whose
    out-degree exceeds the cap form a loop-invariant hot set (tiny —
    the head of the Zipf curve); each round their rank rows are
    BROADCAST into the contribution join while the long tail
    shuffle-joins exactly as before — the classic hot-key split.
    Per-edge contribution rows are identical and the per-dst sums fold
    as exact decimals, so results are bit-identical with the guard on
    or off (pinned by tests). The rank frame is localCheckpoint'd per
    round in this mode so the broadcast subtree reads a materialized
    frame instead of re-deriving the whole iteration chain.
    ``None`` disables (the default — keeps single-exchange plans for
    the near-uniform-degree graphs the fixture corpora produce).
    """
    w = F.col(weight) if weight else F.lit(1)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # loop-invariant frames, re-read every round: cache them or each
    # iteration recomputes the whole upstream edge build. tracked:
    # released by a caller's caching.scoped_caches() block.
    er = tracked_cache(
        e.join(out_w, "src").select(
            "src",
            "dst",
            F.round(F.col("w").cast("double") / F.col("out_w"), 9).alias("r"),
        )
    )
    nodes = tracked_cache(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    pr = nodes.crossJoin(F.broadcast(n)).select(
        "node",
        "n_nodes",
        F.round(F.lit(1.0) / F.col("n_nodes"), 12).alias("pr"),
    )
    zero = F.lit(0).cast("decimal(20,12)")
    # loop-invariant: the set of dangling nodes (no out-edges); only
    # their MASS changes per round. Bounded by |nodes|.
    dangling = (
        nodes.join(out_w.select(F.col("src").alias("node")), "node", "left_anti")
        if redistribute_dangling
        else None
    )
    hot_keys = er_hot = er_cold = None
    if hot_degree_cap is not None:
        # loop-invariant hot-key split: the hot set is the Zipf head
        # (tiny), so both it and its per-round rank rows broadcast
        deg = er.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
        hot_keys = (
            deg.where(F.col("_d") > F.lit(int(hot_degree_cap)))
            .select("src")
            .localCheckpoint(eager=True)
        )
        er_hot = tracked_cache(er.join(F.broadcast(hot_keys), "src"))
        er_cold = tracked_cache(
            er.join(F.broadcast(hot_keys), "src", "left_anti")
        )
        pr = pr.localCheckpoint(eager=True)
    for _ in range(iters):
        pr_src = pr.select(F.col("node").alias("src"), "pr")
        if hot_keys is None:
            joined = er.join(pr_src, "src")
        else:
            pr_hot = pr_src.join(F.broadcast(hot_keys), "src")
            joined = er_cold.join(pr_src, "src").unionByName(
                er_hot.join(F.broadcast(pr_hot), "src")
            )
        contrib = joined.select(
            "dst",
            F.round(F.col("pr") * F.col("r"), 12)
            .cast("decimal(20,12)")
            .alias("c"),
        )
        s = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        nxt = pr.select("node", "n_nodes").join(
            s, pr["node"] == s["dst"], "left"
        )
        recv = F.coalesce(F.col("s"), zero).cast("double")
        if dangling is not None:
            # one scalar per round: total rank sitting on dangling
            # nodes, split uniformly — the standard power-iteration
            # correction. Broadcast (single row), never a shuffle of
            # the rank frame.
            dm = pr.join(dangling, "node").agg(
                F.coalesce(
                    F.sum(F.col("pr").cast("decimal(20,12)")), zero
                ).alias("dm")
            )
            nxt = nxt.crossJoin(F.broadcast(dm))
            recv = recv + F.col("dm").cast("double") / F.col("n_nodes")
        pr = nxt.select(
            "node",
            "n_nodes",
            F.round(
                F.lit(teleport) / F.col("n_nodes") + F.lit(damping) * recv,
                12,
            ).alias("pr"),
        )
        if hot_keys is not None:
            # materialize per round: the NEXT round's broadcast rank
            # subtree must read a checkpointed frame, not re-derive
            # the whole iteration chain (which the cold join would
            # also re-derive — O(iters^2) recompute otherwise)
            pr = pr.localCheckpoint(eager=True)
    return pr.select("node", "pr")


def bfs_distances(
    edges: DataFrame,
    source,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 6,
) -> DataFrame:
    """Unweighted shortest-path distances from ``source`` over
    undirected ``edges``: (node, dist) for every node within
    ``max_depth`` hops (the source at dist 0).

    Level-synchronous frontier BFS: each round joins the CURRENT
    frontier (nodes first reached last round) against the edge list
    and anti-joins the visited set — per-round work is
    O(frontier-adjacent edges), the distributed BFS shape (Pregel
    superstep without the framework). Rounds are bounded by
    ``max_depth``; per-round lineage truncates via localCheckpoint so
    the plan stays flat (same policy as connected_components — pass
    pre-checkpointed edges for reliable-mode loops).
    """
    spark = edges.sparkSession
    # materialize the symmetric edge list ONCE: it probes every round,
    # and without this each round re-runs the caller's entire
    # edge-construction pipeline (measured 6.2s -> ~1s on the brand
    # graph, whose edges come from a fact join + top-k window)
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    node_type = sym.schema["u"].dataType
    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("node", node_type), T.StructField("dist", T.LongType())]
    )
    visited = local_frame(spark, [(source, 0)], schema).localCheckpoint()
    frontier = visited.select("node")
    for depth in range(1, max_depth + 1):
        reached = (
            frontier.join(sym, frontier["node"] == sym["u"])
            .select(F.col("v").alias("node"))
            .distinct()
        )
        fresh = reached.join(
            visited.select("node"), "node", "left_anti"
        ).select("node", F.lit(depth).cast("long").alias("dist"))
        fresh = fresh.localCheckpoint()
        if fresh.rdd.isEmpty():
            break
        visited = visited.unionByName(fresh).localCheckpoint()
        frontier = fresh.select("node")
    return visited
