"""Connected components over a pair/edge frame — the clustering step a
dedup pipeline needs AFTER candidate pairs: MinHash/LSH emits near-dup
PAIRS, but deleting duplicates requires grouping pairs into components
and electing one canonical document per component.

Algorithm: alternating **large-star / small-star contraction** (Kiveris
et al., "Connected Components in MapReduce and Beyond", SoCC'14).  Each
round every node hooks its neighbors onto the minimum id in its
neighborhood, which contracts chains aggressively: the number of rounds
is O(log n) in the worst case and 2-4 in practice, **independent of the
graph diameter** — unlike min-label propagation, whose round count
equals the diameter and whose fixed per-round checkpoint cost made it
the worst scaler in the 5x probe (4.7x time at 5x data, SCALE_r03.md).

Per-round shape: two groupBy-min shuffles + two joins over the *current*
edge list, which shrinks toward one edge per non-root node.  Lineage is
truncated with ``localCheckpoint`` each round (on a real cluster,
``checkpoint`` to reliable storage); the only driver actions are the
bounded convergence counts.

At the fixed point the edge set is a disjoint union of stars whose
centers are the component minima — exactly the ``(node, component)``
labeling a dedup pipeline needs, and identical to what label
propagation produced (component = min reachable id), so results are
bit-for-bit unchanged.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round over canonically-oriented edges ``(u > v)``.

    For every node n, hook each *strictly larger* neighbor onto the
    minimum of n's closed neighborhood.  Output edges keep the big→small
    orientation (first col > second col) and carry no self-loops.

    One window shuffle (partition by the grouping node) + one distinct —
    the min-over-neighborhood rides the window instead of a
    groupBy+join, saving a shuffle per round.
    """
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # m(u) = min(N(u) ∪ {u}); some neighbor may exceed u, so least()
    # against u itself.
    m = F.least(F.col("u"), F.min("v").over(Window.partitionBy("u")))
    return (
        sym.select(F.col("v").alias("n"), m.alias("m"), F.col("u"))
        .where(F.col("n") > F.col("u"))
        # n > u >= m, so the output is oriented and self-loop-free
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round over oriented edges ``(u > v)``.

    Group by the larger endpoint u (all its listed neighbors are
    smaller); hook every smaller neighbor AND u itself onto the minimum
    neighbor.  Output stays oriented big→small.
    """
    ann = e.withColumn("m", F.min("v").over(Window.partitionBy("u")))
    return (
        ann.select(F.col("v").alias("n"), F.col("m"))
        .union(ann.select(F.col("u").alias("n"), F.col("m")))
        .where(F.col("n") != F.col("m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``.

    Returns ``(node, component)`` for every node that appears in an edge,
    where ``component`` is the minimum node id reachable from ``node``
    (a canonical, engine-independent representative).  Isolated nodes
    never enter the edge list, so they are their own implicit singleton
    components — union them in downstream if needed.

    Raises if ``max_iter`` alternating rounds don't reach the star fixed
    point; star contraction needs O(log n) rounds, so 20 covers graphs
    far beyond any real corpus.
    """
    # Materialize the RAW pair list first so a potentially expensive
    # upstream (e.g. an LSH candidate join) runs exactly once; the
    # canonical edge list and the node universe both read these
    # materialized rows.
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    # Canonical orientation (bigger id first) + dedup; self-loops carry
    # no information — drop them.
    e = (
        raw.where(F.col("u") != F.col("v"))
        .select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        raw.select(F.col("u").alias("node"))
        .union(raw.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    n_edges = e.count()
    if n_edges == 0:
        # no edges → every mentioned node is its own singleton (covers
        # the self-loop-only case); skip the contraction loop entirely
        return nodes.select("node", F.col("node").alias("component"))
    for rounds in range(1, max_iter + 1):
        # checkpoint FIRST so the two-star round runs once; the
        # convergence probes then read materialized rows
        nxt = _small_star(_large_star(e)).localCheckpoint()
        # Fixed point = edge set unchanged.  Both frames are deduped, so
        # equal counts + empty one-way set difference ⇒ set equality.
        # The count is nearly free (checkpointed rows); the subtract
        # shuffle only runs once counts stop moving — usually the final
        # round.
        n_next = nxt.count()
        if n_next == n_edges and nxt.subtract(e).limit(1).count() == 0:
            e = nxt
            log.info("connected_components converged in %d rounds", rounds)
            break
        e, n_edges = nxt, n_next
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(star contraction needs O(log n) rounds; this graph is "
            "pathological or max_iter is far too small)"
        )

    # Fixed point is a union of min-centered stars: every edge is
    # (member, center).  Centers (and the degenerate no-edge case) label
    # themselves.
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    centers = nodes.join(
        e.select(F.col("u").alias("node")), "node", "left_anti"
    ).select("node", F.col("node").alias("component"))
    return members.union(centers)


def dedup_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """End-to-end near-dup removal: group ``pairs`` into components and
    keep, per component, only the row of ``df`` with the minimum id (the
    component label itself).  Rows never mentioned in a pair pass through
    untouched — singletons are implicitly canonical."""
    comps = connected_components(pairs, src=src, dst=dst)
    losers = comps.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def pagerank(
    edges: DataFrame,
    n_nodes: int,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint: str = "none",
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list — the standard
    importance measure for link/co-occurrence graphs (seed selection,
    crawl prioritization, source weighting in a training-data mix).

    Deterministic cross-engine contract (the ``kmeans_step`` policy):
    every transcendental-free per-edge contribution ``rank/out_degree``
    is rounded to 12 dp and summed as DECIMAL(28,12) — decimal addition
    is exact and order-independent, so the per-node sum does not depend
    on shuffle/merge order; the per-iteration rank is rounded to 12 dp
    again.  An ANSI-SQL oracle that unrolls the same ``iters`` steps
    reproduces the result bit-for-bit.

    ``n_nodes`` is passed by the caller (a bounded scalar from one
    count) so this function builds a pure plan.  Dangling nodes (no
    out-edges) are supported: their mass is NOT redistributed (the
    "remove dangling mass" simplification), matching the unrolled SQL
    exactly.  Nodes with no in-edges settle at ``(1-d)/n``.

    ``checkpoint='local'`` pins the two frames the unrolled chain
    re-evaluates — ``nodes`` (union+distinct, read once per iteration
    plus the init) and the degree-joined edge list ``e`` (read once per
    iteration) — so each is computed once instead of ``iters+1`` /
    ``iters`` times (guide §2.4/§5; values bit-identical, measured
    4.41 → 3.64 s median on ``part_pagerank`` at sf0.1).  Default
    ``'none'`` keeps the pure-plan contract for callers that persist
    or re-key the chain themselves.

    Scale: the loop shuffles only ``(node, contribution)`` pairs — 16
    bytes/row — and the rank frame, partitioned by node, is reused as
    the join probe each round; ``iters`` is fixed (3-5 captures the bulk
    of the ordering signal), so this is a bounded chain of joins, not a
    convergence loop with driver actions inside.
    """
    if checkpoint not in ("none", "local"):
        raise ValueError(
            f"checkpoint must be 'none' or 'local', got {checkpoint!r}"
        )
    _maybe_pin = (
        (lambda df: df.localCheckpoint()) if checkpoint == "local"
        else (lambda df: df)
    )
    nodes = _maybe_pin(
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # decimal-point literals parse as DECIMAL in both Spark and DuckDB,
    # but their decimal-division rules differ — every constant is cast
    # to DOUBLE explicitly so both engines run the identical IEEE ops
    dmp = f"CAST({damping!r} AS DOUBLE)"
    base = f"(CAST(1 AS DOUBLE) - {dmp}) / {n_nodes}"
    ranks = nodes.withColumn(
        "r", F.expr(f"ROUND(CAST(1 AS DOUBLE) / {n_nodes}, 12)")
    )
    # deg is a per-source constant across iterations — join it into the
    # edge list ONCE instead of once per iteration (saves an exchange +
    # sort per round; r/deg values, and thus the oracle hash, unchanged)
    e = _maybe_pin(
        edges.select(F.col(src).alias("node"), F.col(dst).alias("dst_node")).join(
            deg, "node"
        )
    )
    for _ in range(iters):
        contrib = (
            e.join(ranks, "node")
            .select(
                F.col("dst_node").alias("node"),
                F.expr("CAST(ROUND(r / deg, 12) AS DECIMAL(28,12))").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            F.expr(
                f"ROUND({base} + {dmp} * COALESCE(CAST(s AS DOUBLE), "
                "CAST(0 AS DOUBLE)), 12)"
            ).alias("r"),
        )
    return ranks.select("node", F.round(F.col("r"), 8).alias("rank"))


def _undirected_with_degrees(
    edges: DataFrame, src: str, dst: str
) -> tuple[DataFrame, DataFrame]:
    """Canonical deduped undirected edge frame ``(a < b)`` plus the node
    degree table — the shared first stage of the triangle family
    (``triangle_count`` / ``triangle_list`` /
    ``local_clustering_coefficient``), built ONCE so a consumer that
    needs both (lcc) carries a single distinct + degree-agg subtree."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return und, deg


def _orient_by_degree(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Orient each undirected edge low-(deg, id) → high-(deg, id): the
    total order that bounds per-vertex wedge blowup to O(sqrt(|E|))
    out-degree (Suri & Vassilvitskii, WWW'11)."""
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )


def _triangles_from(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Triangle enumeration ``(p, x, y)`` from a prebuilt undirected
    frame + degree table (see ``triangle_count`` for the scale
    argument)."""
    oriented = _orient_by_degree(und, deg)
    w1 = oriented.select(F.col("u").alias("p"), F.col("v").alias("x"))
    w2 = oriented.select(F.col("u").alias("p"), F.col("v").alias("y"))
    wedges = w1.join(w2, "p").where(F.col("x") < F.col("y"))
    closing = oriented.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
    )
    return wedges.join(closing, ["x", "y"], "left_semi").select("p", "x", "y")


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle count over an undirected edge list — the
    clustering-coefficient numerator, and the classic MapReduce graph
    benchmark (Suri & Vassilvitskii, WWW'11).  ``n_wedges`` is the
    ORIENTED candidate count (each triangle closes exactly one oriented
    wedge here, NOT the undirected open-wedge count, which is
    sum-over-nodes deg·(deg-1)/2).

    Scale shape: edges are first ORIENTED from the lower-(degree, id)
    endpoint to the higher one.  Orientation is what makes the wedge
    join safe at scale — every wedge is generated at its lowest-degree
    vertex, so a degree-d hub produces O(d) oriented out-edges only when
    d is globally small, and the per-vertex wedge blowup is bounded by
    O(sqrt(|E|)) out-degree instead of a hub's full degree.  Then:
    wedges = oriented ⋈ oriented on the middle vertex; triangles = wedges
    semi-joined against the oriented closing edge.  Three key-only
    shuffles, integer counts — exactly reproducible by a SQL oracle that
    replays the same orientation rule.

    Input may list an undirected edge in either or both directions;
    it is canonicalized internally."""
    und, deg = _undirected_with_degrees(edges, src, dst)
    oriented = _orient_by_degree(und, deg)
    w1 = oriented.select(F.col("u").alias("pivot"), F.col("v").alias("x"))
    w2 = oriented.select(F.col("u").alias("pivot"), F.col("v").alias("y"))
    wedges = w1.join(w2, "pivot").where(F.col("x") < F.col("y"))
    # the closing edge of a wedge may be oriented either way relative to
    # (x, y) id-order — probe on the undirected canonical (min, max) form
    closing = oriented.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
    )
    tris = wedges.join(closing, ["x", "y"], "left_semi")
    return wedges.agg(F.count(F.lit(1)).alias("n_wedges")).crossJoin(
        tris.agg(F.count(F.lit(1)).alias("n_triangles"))
    ).select(
        F.col("n_triangles").cast("bigint").alias("n_triangles"),
        F.col("n_wedges").cast("bigint").alias("n_wedges"),
    )


def triangle_list(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Enumerate every triangle once as ``(p, x, y)`` — the same
    degree-ordered orientation and wedge-closing join as
    ``triangle_count`` (see there for the scale argument), but keeping
    the rows instead of aggregating, for per-node statistics."""
    und, deg = _undirected_with_degrees(edges, src, dst)
    return _triangles_from(und, deg)


def kcore(
    edges: DataFrame,
    k: int,
    iters: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded k-core peeling (Seidman 1983; the Matula-Beck peeling
    order, truncated): repeatedly delete nodes of degree < ``k`` from
    the undirected graph, ``iters`` rounds, then return every surviving
    node with its degree inside the surviving subgraph.

    The operator runs a FIXED number of peels, not peel-to-fixpoint:
    that keeps the plan a deterministic bounded chain an SQL oracle can
    replay step for step (the same contract as the unrolled-iteration
    ``pagerank``).  When the graph converges within ``iters`` rounds —
    assert with one extra cheap round if needed — the result IS the
    exact k-core; otherwise it is the ``iters``-step peel, still
    deterministic.

    Scale shape: each round is one degree aggregation plus two keyed
    left-semi joins (endpoint ∈ survivors), all shuffles keyed on node
    id — nothing global, no driver-sized state.  The edge frame is
    ``localCheckpoint``-ed every round: peeling is genuinely iterative,
    so lineage would otherwise grow O(iters) joins deep and re-run every
    prior round per consumer (on a cluster this is the
    checkpoint-to-storage between supersteps).  Real deployments size
    ``iters`` ~ O(log n) — degeneracy peeling converges fast on
    power-law graphs — and verify the fixpoint with one extra round."""
    if k < 1 or iters < 1:
        raise ValueError("kcore needs k >= 1 and iters >= 1")
    und, _ = _undirected_with_degrees(edges, src, dst)
    und = und.localCheckpoint()
    for _ in range(int(iters)):
        deg = (
            und.select(F.col("a").alias("node"))
            .union(und.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= int(k)).select("node")
        und = (
            und.join(
                keep.select(F.col("node").alias("a")), "a", "left_semi"
            )
            .join(keep.select(F.col("node").alias("b")), "b", "left_semi")
            .localCheckpoint()
        )
    return (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_deg"))
    )


def local_clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node local clustering coefficient
    ``lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1))`` (Watts & Strogatz 1998):
    how close each node's neighborhood is to a clique — the standard
    community-tightness signal next to the global triangle count.

    Plan: one triangle enumeration (degree-ordered, wedge-bounded — see
    ``triangle_count``), explode each triangle's three corners, ONE
    count per node, left join back to the degree table (nodes in no
    triangle get 0).  All shuffles are keyed on node id; the division
    is one double expression over exact counts, ROUND(6); deg<2 nodes
    define lcc = 0.  The undirected frame and degree table are built
    once and shared with the triangle enumeration (one distinct + one
    degree agg in the plan, not two of each)."""
    und, deg = _undirected_with_degrees(edges, src, dst)
    tris = _triangles_from(und, deg)
    tri_nodes = (
        tris.select(
            F.explode(F.array(F.col("p"), F.col("x"), F.col("y"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return (
        deg.join(tri_nodes, "node", "left")
        .select(
            "node",
            F.col("deg").cast("bigint").alias("deg"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint").alias("n_tri"),
        )
        .withColumn(
            "lcc",
            F.expr(
                "CASE WHEN deg >= 2 THEN"
                " ROUND(CAST(2 AS DOUBLE) * CAST(n_tri AS DOUBLE)"
                " / (CAST(deg AS DOUBLE) * CAST(deg - 1 AS DOUBLE)), 6)"
                " ELSE CAST(0 AS DOUBLE) END"
            ),
        )
    )


def label_propagation(
    edges: DataFrame,
    iters: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007), the
    deterministic min-tie variant: every node starts labeled with its
    own id; each round it adopts the most frequent label among its
    in-neighbors, ties broken toward the SMALLEST label (plain LPA
    breaks ties randomly — irreproducible, so no oracle could replay
    it).  Fixed ``iters`` rounds — the bounded-chain contract shared
    with ``pagerank``/``kcore``; pass a symmetric edge frame for the
    undirected semantics.

    Scale shape: per round one keyed join (edges × labels), one
    (node, label) count with map-side combine, and a per-node argmax;
    state is one label per node.  For NUMERIC node ids the argmax is
    a single pass (``max_by(label, (cnt, −label))``); non-numeric ids
    (strings, etc.) cannot be negated, so the tie-break falls back to
    a portable two-aggregation form — per-node max count, then
    ``min(label)`` among the labels attaining it — one extra keyed
    join per round, same deterministic result.  The label frame is
    ``localCheckpoint``-ed every round: the algorithm is genuinely
    iterative, so lineage would otherwise deepen O(iters) (on a cluster
    this is the checkpoint between supersteps).  Nodes with no
    in-neighbors keep their current label.

    Returns ``(node, label)``."""
    if iters < 1:
        raise ValueError("label_propagation needs iters >= 1")
    from pyspark.sql.types import NumericType

    numeric_ids = isinstance(edges.schema[src].dataType, NumericType)
    labels = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(int(iters)):
        msgs = edges.join(
            labels.select(F.col("node").alias(src), "label"), src
        ).select(F.col(dst).alias("node"), "label")
        counts = msgs.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        if numeric_ids:
            new = counts.groupBy("node").agg(
                F.expr(
                    "max_by(label, named_struct('c', cnt, 'nl', -label))"
                ).alias("new_label")
            )
        else:
            mx = counts.groupBy("node").agg(F.max("cnt").alias("__mx"))
            new = (
                counts.join(mx, "node")
                .where(F.col("cnt") == F.col("__mx"))
                .groupBy("node")
                .agg(F.min("label").alias("new_label"))
            )
        labels = (
            labels.join(new, "node", "left")
            .select("node", F.coalesce("new_label", "label").alias("label"))
            .localCheckpoint()
        )
    return labels
