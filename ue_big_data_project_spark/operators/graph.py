"""Iterative graph operators: connected components for dedup clustering.

The canonical corpus-dedup closer: near-dup PAIRS (minhash/simhash/
jaccard output) become CLUSTERS, and one canonical document survives per
cluster. Components are computed by distributed min-label propagation:

    label(v) ← min(label(v), min over neighbors' labels)

iterated to fixpoint. The driver loop is CONTROL FLOW only — each
iteration is a join + grouped min over distributed data; convergence is
checked with a 1-row aggregate, never by collecting labels. Iteration
count is bounded by the component diameter (tiny for near-dup clusters,
which are dense); ``max_iters`` caps pathological chains.

Scale: every iteration shuffles on node id and the iteration count of
plain label propagation is bounded by the component DIAMETER — fine for
near-dup clusters (dense, diameter ~2), ruinous for chain-shaped graphs.
:func:`connected_components_star` implements the alternating
large-star/small-star contraction (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14), which converges in O(log² n) rounds
independent of diameter — the planet-scale path. Both share the output
contract; ``connected_components(algorithm="star")`` dispatches.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as SparkTypes

from ue_big_data_project_spark.session import local_relation


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 25,
    algorithm: str = "label",
    driver_cc_max: int = 200_000,
) -> DataFrame:
    """(node, component) where component = min node id reachable.

    ``nodes`` must contain every vertex (isolated vertices become their
    own singleton components); ``edges`` is undirected (each pair listed
    once, either direction).

    ``algorithm="label"`` (default) is min-label propagation — rounds ≈
    component diameter, cheapest per round, right for dense near-dup
    clusters. ``algorithm="star"`` is large-star/small-star contraction —
    O(log² n) rounds regardless of diameter, right for unknown or
    chain-heavy graph shapes at scale.

    ``driver_cc_max`` (round-12 optimization, guide §2.4/§5): near-dup
    pair graphs are SPARSE by construction — every upstream generator
    (banding, prefix-filtered Jaccard, winnowing, Hamming banding) emits
    a pair list that is orders of magnitude smaller than the corpus, and
    the iterative loop costs ~3 scheduled jobs per round (join + grouped
    min + checkpoint + convergence collect) regardless of how tiny the
    edge set is. When the materialized edge list fits under this bound,
    the labels are computed with driver-side union-find instead — ONE
    bounded collect replaces the whole loop, bit-identical labels (the
    ``append_components_detail`` / IVF driver-Lloyd precedent: bounded
    input ⇒ driver compute, distributed past the bound). The node set is
    never collected: edge-endpoint membership is resolved with one
    map-side semi-join (output ≤ 2·|edges| rows), and the final label
    attach streams ``nodes`` against the broadcast label map exactly
    like the distributed path's tail join. Set 0 to force the iterative
    path (the convergence tests do). Only the ``label`` algorithm
    shortcuts: the star path's phantom-endpoint semantics differ
    (documented there), and callers choosing it are asking for the
    planet-scale contraction.
    """
    if algorithm == "star":
        return connected_components_star(
            nodes, edges, node_col, src_col, dst_col, max_rounds=max_iters
        )
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    # MATERIALIZE the edge set BEFORE symmetrizing: the edge DataFrame
    # is typically the tail of an expensive pair pipeline (shingling,
    # prefix joins, verification), and a union of two references to it
    # would execute that lineage once per branch. Checkpoint the forward
    # direction, then build the reversal from the checkpointed data.
    fwd = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).localCheckpoint(eager=True)
    if driver_cc_max > 0:
        # Size with count() FIRST (a scalar job over the checkpoint
        # blocks), and only then collect: a limit(n+1).collect() probe
        # would serialize up to n rows to Python just to discover an
        # over-bound edge set (the image near-dup graph at sf0.1 is
        # ~480k edges — 200k wasted row fetches per call).
        if fwd.count() <= driver_cc_max:
            return _driver_cc_label_join(nodes, node_col, fwd.collect())
    sym = fwd.union(
        fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    # Iterate ONLY over nodes that appear in an edge: isolated vertices
    # can never change label, so carrying them through every join,
    # checkpoint, and convergence sum is pure overhead — and at corpus
    # scale they are the overwhelming majority (a 1%-near-dup corpus
    # shrinks every iteration's shuffle ~100×). They rejoin as their own
    # singleton components at the end. `sym` is symmetric, so the `a`
    # column alone covers every edge endpoint — semi-joined back to
    # `nodes` so an edge endpoint absent from the node set can never
    # become a component label (the contract: components are labeled by
    # node ids, and phantom endpoints are ignored as before).
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .join(
            nodes.select(F.col(node_col).alias("node")), "node", "left_semi"
        )
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # Convergence via the label-sum: labels only ever decrease, so the
    # sum strictly decreases until the fixpoint — one cheap scalar per
    # iteration instead of a join-and-compare pass.
    prev_sum: int | None = None
    converged = False
    # One extra pass beyond max_iters: a fixpoint reached ON iteration
    # max_iters is only observable (sum unchanged) one iteration later,
    # so "max_iters = diameter" guidance would otherwise spuriously
    # raise on exactly-sized budgets. The extra pass is a no-op update.
    for _ in range(max_iters + 1):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            # Materialize so lineage doesn't snowball across iterations.
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # Unconverged labels are silently WRONG clusters (a long chain
        # still propagating); downstream dedup would drop the wrong
        # documents. Fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge within {max_iters} "
            "iterations; raise max_iters (iterations needed ≈ component "
            "diameter) or pre-contract the graph (large-star/small-star)"
        )
    return nodes.select(F.col(node_col)).join(
        labels.select(
            F.col("node").alias(node_col), F.col("label").alias("component")
        ),
        node_col,
        "left",
    ).select(
        node_col,
        F.coalesce("component", F.col(node_col)).alias("component"),
    )


def _driver_cc_label_join(
    nodes: DataFrame, node_col: str, edge_rows: list
) -> DataFrame:
    """Driver-side tail of :func:`connected_components` for a BOUNDED
    collected edge list: union-find over the edges whose endpoints are
    both real nodes, then the same nodes-streamed label attach the
    distributed path ends with.

    Phantom-endpoint parity with the iterative path: an edge endpoint
    absent from ``nodes`` never relays connectivity and never becomes a
    label (the distributed loop's semi-joined label set drops it), so
    edges touching one are filtered out here before the union-find.
    Membership is resolved distributedly — ``nodes`` is unbounded at
    corpus scale, so it streams map-side against the broadcast endpoint
    set and only the ≤ 2·|edges| matches are collected.
    """
    spark = nodes.sparkSession
    vt = nodes.select(node_col).schema[0].dataType
    ends = sorted(
        {r["a"] for r in edge_rows if r["a"] is not None}
        | {r["b"] for r in edge_rows if r["b"] is not None}
    )
    if not ends:
        return nodes.select(
            F.col(node_col), F.col(node_col).alias("component")
        )
    ends_df = local_relation(
        spark,
        [(x,) for x in ends],
        SparkTypes.StructType([SparkTypes.StructField("_x", vt)]),
    )
    known = {
        r["_x"]
        for r in nodes.select(F.col(node_col).alias("_x"))
        .join(F.broadcast(ends_df), "_x", "left_semi")
        .collect()
    }
    labels = _driver_components(
        [],
        [
            (r["a"], r["b"])
            for r in edge_rows
            if r["a"] in known and r["b"] in known
        ],
    )
    lbl_df = local_relation(
        spark,
        sorted(labels.items()),
        SparkTypes.StructType(
            [
                SparkTypes.StructField(node_col, vt),
                SparkTypes.StructField("component", vt),
            ]
        ),
    )
    return nodes.select(F.col(node_col)).join(
        F.broadcast(lbl_df), node_col, "left"
    ).select(
        node_col,
        F.coalesce("component", F.col(node_col)).alias("component"),
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: every neighbor v > u re-attaches to m = min(N(u)∪{u}).

    Output edges are already directed big→small (v > u ≥ m), so no
    normalization is needed before the small-star step.
    """
    sym = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    nbr_min = sym.groupBy("a").agg(F.min("b").alias("nm"))
    return (
        sym.join(nbr_min, "a")
        .where(F.col("b") > F.col("a"))
        .select(
            F.col("b").alias("a"),
            F.least(F.col("a"), F.col("nm")).alias("b"),
        )
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: for each u over its smaller neighbors N(u), attach
    every v ∈ N(u)∪{u} except the minimum m directly to m."""
    directed = edges.select(
        F.greatest(F.col("a"), F.col("b")).alias("a"),
        F.least(F.col("a"), F.col("b")).alias("b"),
    )
    nbr_min = directed.groupBy("a").agg(F.min("b").alias("m"))
    moved = (
        directed.join(nbr_min, "a")
        .where(F.col("b") != F.col("m"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )
    kept = nbr_min.select("a", F.col("m").alias("b"))
    return moved.union(kept).distinct()


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 25,
) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.,
    SoCC'14): same (node, component=min reachable id) contract as
    :func:`connected_components`, but rounds grow O(log² n) with
    component SIZE, not linearly with diameter — a 10⁶-node chain
    finishes in ~20 rounds where label propagation needs 10⁶.

    Each round is two grouped-min shuffles plus a distinct; lineage is
    truncated per round with an eager localCheckpoint. Convergence =
    stable (count, xxhash64-sum) checksum of the edge set — edges move
    monotonically toward the star form, so a stable checksum is the
    fixpoint, at which every edge is (v, component_min).
    """
    cur = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .where(F.col(src_col) != F.col(dst_col))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_chk: tuple | None = None
    converged = cur.isEmpty()
    for _ in range(max_rounds):
        if converged:
            break
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        row = cur.agg(
            F.count(F.lit(1)).alias("n"),
            # Decimal sum: exact and overflow-free under ANSI mode (a
            # long sum of 64-bit hashes overflows by design).
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        chk = (row["n"], row["h"])
        if chk == prev_chk:
            converged = True
        prev_chk = chk
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge within "
            f"{max_rounds} rounds; raise max_rounds (needed ≈ log² of the "
            "largest component size)"
        )
    # At the fixpoint every edge points v → its component min; the min
    # itself and isolated vertices label themselves.
    stars = cur.groupBy(F.col("a").alias("node")).agg(
        F.min("b").alias("label")
    )
    return (
        nodes.select(F.col(node_col).alias("node"))
        .join(stars, "node", "left")
        .select(
            F.col("node").alias(node_col),
            F.coalesce("label", F.col("node")).alias("component"),
        )
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """``(id, pr)`` after a FIXED number of weighted PageRank rounds.

    Beyond-reference iterative-graph sibling of connected components:
    rank flows along out-edges proportionally to edge weight,

        pr'(v) = (1-d)/N + d · Σ_{u→v} pr(u) · w(u,v) / outw(u)

    with no dangling-mass redistribution (sinks leak mass; standard in
    edge-list implementations, and mirrored exactly by the oracle).

    The driver loop is control flow only — each round is one join of the
    (edge, out-weight) table with the current ranks plus one grouped sum
    on ``dst``; ranks are truncated with an eager localCheckpoint per
    round so the plan stays O(1) deep regardless of ``iters``. A fixed
    iteration count (not a convergence test) keeps the operator
    oracle-expressible as unrolled SQL.

    Determinism: per-edge contributions and the post-teleport rank are
    rounded at 12 dp (``pround``) and contribution sums go through
    DECIMAL(32,12), so partition order cannot perturb any round.
    """
    from ue_big_data_project_spark.functions import pround

    # Zero/negative-weight edges are dropped up front: they carry no
    # rank, but would poison outw with 0 (NaN contributions) for a node
    # whose every out-edge is weightless. The node itself stays a
    # vertex only if some positive edge touches it — matching the
    # "edges define the graph" contract of the other graph operators.
    # Weights are carried as DOUBLE (a long cast would truncate
    # fractional weights — and silently drop any 0 < w < 1 edge at the
    # filter); out-weight sums go through DECIMAL so partition order
    # cannot perturb outw.
    # The cleaned edge set feeds THREE consumers before iteration
    # starts (verts, outw, and ew's probe side); for a derived edge
    # list (e.g. a 4-table trade-graph join) each consumer would
    # otherwise re-run the whole build. Lazily persist, then unpersist
    # as soon as ew's eager checkpoint has materialized — the cache
    # lives only for the two checkpoint jobs, so loops don't
    # accumulate entries (round-6 advice; isolated median 2.86 ->
    # 2.33 s at sf0.1 for graph_pagerank_nations, 5-sample A/B).
    e = (
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            (F.col(weight_col) if weight_col else F.lit(1))
            .cast("double")
            .alias("w"),
        )
        .filter(F.col("w") > 0)
        .persist()
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # The per-row decimal(32,12) cast truncates to 12 dp (documented)
    # but OVERFLOWS to NULL for |w| >= 1e20 under non-ANSI semantics —
    # and sum() would then silently skip the row, understating outw and
    # skewing every downstream rank. Guard each row so pathological
    # weights fail loudly instead (round-5 advice).
    wdec = F.col("w").cast("decimal(32,12)")
    outw = e.groupBy("src").agg(
        F.sum(
            F.when(
                wdec.isNull(),
                F.raise_error(
                    F.format_string(
                        "pagerank: edge weight %s overflows decimal(32,12)",
                        F.col("w"),
                    )
                ).cast("decimal(32,12)"),
            ).otherwise(wdec)
        )
        .cast("double")
        .alias("outw")
    )
    # Reused every round: materialize once instead of re-running the
    # (possibly expensive) edge-building plan per iteration. Once this
    # checkpoint exists the cached edge set has served all three of
    # its consumers — verts was MATERIALIZED by its own eager
    # localCheckpoint job above (so nv/ranks/the iteration read that
    # checkpoint, never e's lineage), and outw + e's probe side are
    # materialized inside this checkpoint job — so e releases here.
    # tests/test_graph.py::test_pagerank_edge_build_runs_exactly_once
    # pins it with an accumulator: one pass over the edge input total,
    # zero re-runs when the returned ranks are collected (round-7
    # advice suspected a re-run; measured: none).
    ew = e.join(outw, "src").localCheckpoint(eager=True)
    e.unpersist()
    nv = verts.agg(F.count(F.lit(1)).alias("n_v"))
    ranks = verts.crossJoin(F.broadcast(nv)).select(
        "id", pround(F.lit(1.0) / F.col("n_v"), 12).alias("pr")
    )
    for _ in range(iters):
        contribs = (
            ew.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(
                "dst",
                pround(F.col("pr") * F.col("w") / F.col("outw"), 12).alias("c"),
            )
            .groupBy("dst")
            .agg(
                F.sum(F.col("c").cast("decimal(32,12)"))
                .cast("double")
                .alias("csum")
            )
        )
        ranks = (
            verts.join(contribs.withColumnRenamed("dst", "id"), "id", "left")
            .crossJoin(F.broadcast(nv))
            .select(
                "id",
                pround(
                    (F.lit(1.0) - F.lit(damping)) / F.col("n_v")
                    + F.lit(damping) * F.coalesce(F.col("csum"), F.lit(0.0)),
                    12,
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle participation counts: ``(id, triangles)``.

    Node-iterator with DEGREE ORIENTATION (Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW'11):
    every undirected edge is directed from its lower-(degree, id)
    endpoint to the higher, so wedges are only enumerated at their
    lowest-degree corner. That bounds per-node wedge fanout by
    O(sqrt(|E|)) even on power-law graphs — the difference between a
    plan that finishes at 100 TB and one whose hottest reducer gets a
    celebrity node's full neighborhood squared.

    Shuffles: degree count (1), wedge self-join on the pivot (1), the
    closing-edge join on (v, w) (1), and the final per-node count (1).
    Each triangle is found exactly once; every corner then gets +1.
    Input edges may list pairs in either direction and may repeat;
    self-loops are dropped.

    The multi-consumer intermediates — the distinct edge set ``e``
    (feeds the degree count twice and the degree joins), the degree
    table ``deg`` (joined on both endpoints), the oriented edge list
    ``e_or`` (adjacency build + both probe sides of the closing join),
    and the adjacency table ``adj`` (both closing-join sides) — are
    LAZILY persisted (memory-and-disk, so spill-safe at scale: ``e``,
    ``e_or``, ``adj`` are O(|E|), ``deg`` O(|V|) — the algorithm's
    working set). Without the persists each consumer re-plans its
    whole upstream from the raw edge input, which for a derived edge
    set (e.g. a lineitem self-join) re-runs the most expensive stage
    of the query 4× (the round-5 plan paid 32 exchanges this way; the
    persisted plan pays 12). Lazy ``persist`` (not eager
    ``localCheckpoint``, which was measured SLOWER at sf0.1, 7.1 s →
    8.9 s median, because eager materialization serializes stages the
    scheduler otherwise overlaps) lets the first job populate the
    cache in-line.

    Cache lifecycle (round-7 verdict task 2 — the pagerank treatment):
    the per-node result is BOUNDED (O(|V|), integers), so it is
    materialized with one eager localCheckpoint at the end of the call
    and every persisted intermediate is released before returning —
    repeated calls in a long-lived session (notebooks, test loops)
    leave the CacheManager empty
    (``tests/test_graph.py::test_triangles_release_their_cache``).
    The checkpoint adds no serialization: it is the same single job
    the caller's collect would have run (the lazy persists populate
    in-line within it, stages still overlap), just triggered inside
    the call; isolated bench medians were unchanged — 4.68 s before
    vs 4.67 s after for graph_triangle_parts at sf0.1 (pooled
    post-warmup samples of 2–3 interleaved 5-sample runs per side;
    single-run medians swing 4.4–6.7 s under box contention).
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    withdeg = (
        e.join(deg.select(F.col("n").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("deg").alias("deg_b")), "b")
    )
    lower_is_a = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    e_or = withdeg.select(
        F.when(lower_is_a, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_is_a, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_is_a, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_v"),
    ).persist()
    # Edge-iterator with adjacency intersection, NOT a wedge self-join:
    # materializing every wedge shuffles O(Σ d_or(u)²) rows (41M at
    # sf0.1, measured 22 s) while the per-edge ``array_intersect`` of
    # the two oriented neighbor LISTS does the same pruned enumeration
    # inside codegen and only materializes actual triangles. Orientation
    # keeps every list O(√E) long, so each intersect is tiny.
    adj = e_or.groupBy("u").agg(
        F.sort_array(F.collect_list("v")).alias("nbrs")
    ).persist()
    tri = (
        e_or.select("u", "v")
        .join(
            adj.select(F.col("u").alias("u"), F.col("nbrs").alias("nbrs_u")),
            "u",
        )
        .join(
            adj.select(F.col("u").alias("v"), F.col("nbrs").alias("nbrs_v")),
            "v",
        )
        .select(
            "u", "v", F.explode(F.array_intersect("nbrs_u", "nbrs_v")).alias("w")
        )
    )
    corners = tri.select(F.explode(F.array("u", "v", "w")).alias("id"))
    out = (
        corners.groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
        .localCheckpoint(eager=True)
    )
    for cached in (e, deg, e_or, adj):
        cached.unpersist()
    return out


class AppendParts(NamedTuple):
    """:func:`append_components_detail` results. ``assignment`` is the
    full updated map (lazy — consuming it streams the base exactly
    once); ``relabel`` and ``fresh`` are the BOUNDED increment-derived
    pieces, exposed so incremental consumers (the persisted cluster
    map, the streaming sink) never have to re-derive them by joining
    the full assignment back against the base — which is exactly the
    O(corpus)-shuffle-per-append this operator exists to avoid."""

    assignment: DataFrame  # (node_col, comp_col), full updated map
    relabel: DataFrame  # (_old, _new) component relabels, ≤ |increment|
    fresh: DataFrame  # (node_col, comp_col) for genuinely-new nodes


def append_components(
    base: DataFrame,
    new_nodes: DataFrame,
    new_edges: DataFrame,
    node_col: str = "id",
    comp_col: str = "component",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 25,
    driver_cc_max: int = 200_000,
) -> DataFrame:
    """INCREMENTAL connected components (round-8 verdict task 4): fold a
    batch of new nodes and their incident edges into an existing
    ``(node, component=min reachable id)`` assignment WITHOUT re-running
    CC over the full pair graph — the ``append_text_index`` /
    ``ivf_index_append`` pattern applied to clustering, because at crawl
    scale re-clustering the corpus per increment is the dedup pipeline's
    largest repeated cost.

    The standard union-find-by-contraction argument: every existing
    component is already collapsed to its representative (its min node
    id), so new edges can only merge REPRESENTATIVES. Each new edge
    endpoint maps to its base component if known, else to itself (a new
    node); CC then runs on that CONTRACTED graph — O(increment) nodes
    and edges, never O(corpus). The contracted labels are exact global
    labels: a base rep IS the min of its old cluster, so the min over a
    merged set of reps and new ids equals the min over the merged
    cluster's full membership. Base rows relabel through the bounded
    rep→label map (broadcast); rows of untouched components stream
    through unchanged.

    Base-map cost contract (round-10 tightening, plan-pinned by
    tests/test_plan_scale.py): base rows are NEVER shuffled and never
    broadcast raw — every pass over the base is map-side (streamed
    against a broadcast increment-derived set), and everything that IS
    broadcast or shuffled is bounded by the increment: the endpoint-
    label pass, the new-node overlap pass (each a single scan emitting
    ≤ O(increment) rows), and the final relabel stream. The previous
    formulation re-derived ``fresh`` via an anti join whose right side
    was the full base — a full base shuffle per append that this
    version eliminates.

    Equivalence contract (test-pinned): ``append_components(cc(G₀), ΔV,
    ΔE) == cc(G₀ ∪ ΔV, E₀ ∪ ΔE)`` row-for-row, for any split — layouts
    and increments must not change semantics.

    ``new_edges`` endpoints must each be in ``base`` or ``new_nodes``;
    edges touching a PHANTOM endpoint (in neither) are IGNORED, exactly
    like :func:`connected_components` ignores edges to vertices outside
    its node set — otherwise a phantom id could become a component
    label that names no real node. ``new_nodes`` lists the increment's
    vertices (isolated ones become singletons).
    ``new_nodes`` MAY overlap ``base`` — an at-least-once replay
    re-presents an already-applied increment — in which case the
    overlapping nodes keep their existing assignment (relabeled if the
    edges still merge anything): re-applying an applied increment is a
    no-op, the property the streaming sink's crash story rests on.
    """
    return append_components_detail(
        base,
        new_nodes,
        new_edges,
        node_col=node_col,
        comp_col=comp_col,
        src_col=src_col,
        dst_col=dst_col,
        max_iters=max_iters,
        driver_cc_max=driver_cc_max,
    ).assignment


def _driver_components(
    node_ids: list, edge_pairs: list[tuple]
) -> dict:
    """Union-find over a collected (bounded) graph: the same
    ``component = min reachable node id`` labels
    :func:`connected_components` converges to, computed driver-side.
    Arbitrary-root union with path compression, then a min-id pass per
    root — exact for any comparable numeric ids."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for v in node_ids:
        parent.setdefault(v, v)
    for a, b in edge_pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict = {}
    for v in parent:
        r = find(v)
        m = comp_min.get(r)
        if m is None or v < m:
            comp_min[r] = v
    return {v: comp_min[find(v)] for v in parent}


def _append_components_driver(
    b: DataFrame,
    e_rows: list,
    nn_rows: list,
    node_col: str,
    comp_col: str,
    vt,
) -> AppendParts:
    """Driver-side tail of :func:`append_components_detail` for a
    bounded increment — semantics identical to the distributed
    formulation (same union-find labels, same phantom/replay/null
    handling), with ONE map-side scan of the base serving both the
    endpoint-label pass and the new-node overlap pass:

    - an edge endpoint is KNOWN iff it is in the base or in the
      increment's node set; edges with an unknown (phantom) endpoint
      are dropped before contraction (a phantom must never become a
      label);
    - base labels that can merge all appear among edge endpoints, so
      the relabel map derives from the collected endpoint hits alone;
    - a "new" node already in the base (at-least-once replay) keeps its
      base-row assignment and is excluded from ``fresh``.
    """
    spark = b.sparkSession
    nn_list = [r["_v"] for r in nn_rows]
    nn_set = set(nn_list)
    ends = {r["_s"] for r in e_rows if r["_s"] is not None} | {
        r["_d"] for r in e_rows if r["_d"] is not None
    }
    keys = sorted(ends | (nn_set - {None}))
    base_hits: dict = {}
    if keys:
        keys_df = local_relation(
            spark,
            [(k,) for k in keys],
            SparkTypes.StructType([SparkTypes.StructField("_n", vt)]),
        )
        base_hits = {
            r["_n"]: r["_c"]
            for r in b.join(F.broadcast(keys_df), "_n").collect()
        }
    base_labels = set()
    contracted = []
    for r in e_rows:
        s, d = r["_s"], r["_d"]
        if s in base_hits:
            base_labels.add(base_hits[s])
        if d in base_hits:
            base_labels.add(base_hits[d])
        ks = s is not None and (s in base_hits or s in nn_set)
        kd = d is not None and (d in base_hits or d in nn_set)
        if not (ks and kd):
            continue
        la = base_hits.get(s, s)
        lb = base_hits.get(d, d)
        if la != lb:
            contracted.append((la, lb))
    labels = _driver_components(
        [v for v in nn_list if v is not None], contracted
    )
    relabel_df = local_relation(
        spark,
        sorted(
            (v, c)
            for v, c in labels.items()
            if v in base_labels and v != c
        ),
        SparkTypes.StructType(
            [
                SparkTypes.StructField("_old", vt),
                SparkTypes.StructField("_new", vt),
            ]
        ),
    )
    fresh_df = local_relation(
        spark,
        [(v, labels.get(v, v)) for v in nn_list if v not in base_hits],
        SparkTypes.StructType(
            [
                SparkTypes.StructField(node_col, vt),
                SparkTypes.StructField(comp_col, vt),
            ]
        ),
    )
    updated = b.join(
        F.broadcast(relabel_df), b["_c"] == F.col("_old"), "left"
    ).select(
        F.col("_n").alias(node_col),
        F.coalesce("_new", F.col("_c")).alias(comp_col),
    )
    return AppendParts(
        assignment=updated.unionByName(fresh_df),
        relabel=relabel_df,
        fresh=fresh_df,
    )


def append_components_detail(
    base: DataFrame,
    new_nodes: DataFrame,
    new_edges: DataFrame,
    node_col: str = "id",
    comp_col: str = "component",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 25,
    driver_cc_max: int = 200_000,
) -> AppendParts:
    """:func:`append_components` plus its bounded intermediates — see
    that docstring for the contraction math and the base-map cost
    contract. Incremental consumers use ``relabel``/``fresh`` directly
    instead of joining ``assignment`` back against the base.

    ``driver_cc_max`` (round-12 job diet): the contracted graph is
    O(increment) BY CONSTRUCTION — the whole point of the append — so
    when increment nodes and contracted edges each fit under the bound
    the contracted CC runs as driver-side union-find instead of the
    iterative distributed loop, replacing ~20 tiny per-round
    checkpoint/convergence jobs with 2 bounded collects (the IVF
    driver-Lloyd precedent: bounded input ⇒ driver compute, distributed
    past the bound, bit-identical labels either way — union-find's
    min-id-per-component IS the label-propagation fixpoint). Measured
    at sf0.1: append_cluster_map 53 → ~36 jobs. Set 0 to force the
    distributed path (the equivalence test does)."""
    b = base.select(
        F.col(node_col).alias("_n"), F.col(comp_col).alias("_c")
    )
    e = new_edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    )
    # Round-12 job diet: when the increment's NODES and RAW EDGES both
    # fit under ``driver_cc_max``, the entire contraction — endpoint
    # labeling, phantom filtering, union-find, relabel map, fresh set —
    # runs driver-side off THREE bounded collects (nodes, edges, and
    # ONE map-side base scan against the broadcast key set that serves
    # both the endpoint-label pass and the new-node overlap pass).
    # That replaces the distributed formulation's per-append job train
    # (endpoint-label checkpoint + contracted-edge collect + relabel/
    # fresh checkpoints + touched-set collect in the cluster-map
    # consumer ≈ 0.4-0.5 s of scheduling each on this box) and one of
    # its two base scans. Labels are bit-identical (same union-find the
    # distributed path's driver-CC shortcut runs); the base is still
    # never shuffled, never broadcast, and the returned relabel/fresh
    # are local relations (audit-clean by construction). Raw |edges| ≥
    # |contracted edges|, so this bound is STRICTER than the old
    # contracted-graph probe — an increment that exceeds it falls
    # through to the unchanged distributed path below, which keeps its
    # own contracted-graph driver shortcut.
    nn_rows = None
    if driver_cc_max > 0:
        nn_rows = (
            new_nodes.select(F.col(node_col).alias("_v"))
            .limit(driver_cc_max + 1)
            .collect()
        )
        if len(nn_rows) > driver_cc_max:
            nn_rows = None
    if nn_rows is not None:
        e_rows = e.limit(driver_cc_max + 1).collect()
        if len(e_rows) <= driver_cc_max:
            return _append_components_driver(
                b, e_rows, nn_rows, node_col, comp_col,
                new_nodes.select(node_col).schema[0].dataType,
            )
    # Contract endpoints to their current labels. The increment is the
    # small side: broadcast IT against the base map, never the reverse
    # (the base map is unbounded).
    ends = (
        e.select(F.col("_s").alias("_x"))
        .union(e.select(F.col("_d").alias("_x")))
        .distinct()
    )
    nn = new_nodes.select(F.col(node_col).alias("_x")).withColumn(
        "_isnew", F.lit(True)
    )
    lbl = (
        b.join(F.broadcast(ends), b["_n"] == F.col("_x"), "right")
        .join(F.broadcast(nn), "_x", "left")
        .select(
            F.col("_x"),
            F.coalesce("_c", F.col("_x")).alias("_lbl"),
            # Known = in the base or in the increment; an edge touching
            # a PHANTOM endpoint is dropped below (connected_components
            # parity — a phantom must never become a label).
            (F.col("_c").isNotNull() | F.col("_isnew").isNotNull()).alias(
                "_known"
            ),
            # A label that came FROM the base is a base-component rep —
            # recorded here so the relabel map can be restricted to real
            # base labels without a second pass over the base (a
            # distinct over the full base's comp column was a
            # base-wide shuffle).
            F.col("_c").isNotNull().alias("_from_base"),
        )
        # Bounded (≤ |endpoint set| rows, replay duplicates included) —
        # eager so the two contraction broadcasts below and the
        # base-label derivation scan the base exactly ONCE between them.
        .localCheckpoint(eager=True)
    )
    ce = (
        e.join(
            F.broadcast(
                lbl.select(
                    F.col("_x").alias("_s"),
                    F.col("_lbl").alias("_la"),
                    F.col("_known").alias("_ka"),
                )
            ),
            "_s",
        )
        .join(
            F.broadcast(
                lbl.select(
                    F.col("_x").alias("_d"),
                    F.col("_lbl").alias("_lb"),
                    F.col("_known").alias("_kb"),
                )
            ),
            "_d",
        )
        .where(F.col("_ka") & F.col("_kb"))
        .select("_la", "_lb")
        .where(F.col("_la") != F.col("_lb"))
        .distinct()
    )
    sub = None
    if nn_rows is not None:
        # The increment's nodes fit (collected above) but its raw edge
        # list did not; the CONTRACTED edge set can still be small —
        # probe it with the same one-job limit(n+1).collect().
        ce_rows = ce.limit(driver_cc_max + 1).collect()
        if len(ce_rows) <= driver_cc_max:
            labels = _driver_components(
                [r["_v"] for r in nn_rows],
                [(r["_la"], r["_lb"]) for r in ce_rows],
            )
            vt = new_nodes.select(node_col).schema[0].dataType
            sub = local_relation(
                base.sparkSession,
                sorted(labels.items()),
                SparkTypes.StructType(
                    [
                        SparkTypes.StructField("_v", vt),
                        SparkTypes.StructField("component", vt),
                    ]
                ),
            )
    if sub is None:
        cc_nodes = (
            new_nodes.select(F.col(node_col).alias("_v"))
            .union(ce.select(F.col("_la").alias("_v")))
            .union(ce.select(F.col("_lb").alias("_v")))
            .distinct()
        )
        sub = connected_components(
            cc_nodes,
            ce,
            node_col="_v",
            src_col="_la",
            dst_col="_lb",
            max_iters=max_iters,
        ).localCheckpoint(eager=True)  # consumed by 3 branches below
    # Bounded relabel map for EXISTING components: contracted nodes
    # that are base labels and whose label changed. Base-label-ness
    # comes from the checkpointed endpoint-label pass — every base
    # label that can merge appears there (it reached the contracted
    # graph through some edge endpoint), so no pass over the base is
    # needed; a new-node self-label can never collide with a base
    # label (labels are base node ids) and an un-merged label is
    # excluded by the inequality, so the restriction is exact.
    base_labels = (
        lbl.where("_from_base").select(F.col("_lbl").alias("_v")).distinct()
    )
    relabel = (
        sub.join(F.broadcast(base_labels), "_v", "left_semi")
        .where(F.col("_v") != F.col("component"))
        .select(F.col("_v").alias("_old"), F.col("component").alias("_new"))
    )
    updated = (
        b.join(F.broadcast(relabel), b["_c"] == F.col("_old"), "left")
        .select(
            F.col("_n").alias(node_col),
            F.coalesce("_new", F.col("_c")).alias(comp_col),
        )
    )
    # Replay tolerance: a "new" node already present in the base (an
    # at-least-once redelivery) must NOT gain a second row with a
    # self-label — its assignment lives in `updated`. The overlap is
    # found by streaming the base against the BROADCAST new-node set
    # (map-side, output ≤ |new_nodes|), then subtracting it from the
    # new nodes with bounded sides only — an anti join whose right
    # side is the full base would shuffle the whole base per append.
    overlap = b.select(F.col("_n").alias("_v")).join(
        F.broadcast(new_nodes.select(F.col(node_col).alias("_v"))),
        "_v",
        "left_semi",
    )
    fresh = (
        new_nodes.select(F.col(node_col).alias("_v"))
        .join(F.broadcast(overlap), "_v", "left_anti")
        # sub is the bounded contracted-CC output — broadcasting it
        # keeps the fresh branch exchange-free (every shuffle in the
        # append graph is over bounded increment-derived rows).
        .join(F.broadcast(sub), "_v", "left")
        .select(
            F.col("_v").alias(node_col),
            F.coalesce("component", F.col("_v")).alias(comp_col),
        )
    )
    return AppendParts(
        assignment=updated.unionByName(fresh),
        relabel=relabel,
        fresh=fresh,
    )
