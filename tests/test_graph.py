"""Connected-components semantics: large-star/small-star contraction
against known graphs, and the end-to-end canonical-dedup contract."""

from __future__ import annotations

import pytest

from df_to_azure_spark.functions.graph import connected_components, dedup_canonical


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r.node: r.component for r in connected_components(df).collect()
    }


def test_two_components_and_chain(spark):
    # component {1,2,3} as a chain, component {10,11} as an edge
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_path_converges(spark):
    # path graph 0-1-2-...-49: diameter 49 — label propagation would need
    # 49 rounds; star contraction must finish well inside max_iter=20
    edges = [(i, i + 1) for i in range(49)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 50


def test_direction_does_not_matter(spark):
    # edges given "backwards" — the graph is undirected
    got = _cc(spark, [(5, 1), (9, 5)])
    assert got == {1: 1, 5: 1, 9: 1}


def test_self_loops_and_duplicate_edges_ignored(spark):
    got = _cc(spark, [(1, 1), (1, 2), (2, 1), (2, 3), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_max_iter_raises_when_too_small(spark):
    # a 50-node path cannot contract to a star in a single round
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(49)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)


def test_dedup_canonical_keeps_min_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in [1, 2, 3, 10, 11, 99]], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    kept = sorted(r.doc_id for r in dedup_canonical(docs, pairs).collect())
    # 1 survives its cluster, 10 survives its pair, 99 untouched singleton
    assert kept == [1, 10, 99]


def test_triangle_count_known_graphs(spark):
    from df_to_azure_spark.functions.graph import triangle_count

    def run(pairs):
        e = spark.createDataFrame(pairs, "src long, dst long")
        r = triangle_count(e).collect()[0]
        return r.n_triangles, r.n_wedges

    # triangle: 1 triangle, 1 oriented wedge
    assert run([(1, 2), (2, 3), (1, 3)]) == (1, 1)
    # 4-cycle: no triangles
    tris, _ = run([(1, 2), (2, 3), (3, 4), (4, 1)])
    assert tris == 0
    # K4: 4 triangles
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    assert run(k4)[0] == 4
    # direction/duplicate robustness: both directions listed, same answer
    assert run([(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)]) == (1, 1)


def test_local_clustering_coefficient_known_graphs(spark):
    from df_to_azure_spark.functions.graph import (
        local_clustering_coefficient,
        triangle_list,
    )

    # triangle with a pendant node 4 hanging off node 1
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4)], "src long, dst long"
    )
    tris = {tuple(sorted((r.p, r.x, r.y))) for r in triangle_list(e).collect()}
    assert tris == {(1, 2, 3)}
    lcc = {r.node: (r.deg, r.n_tri, r.lcc) for r in
           local_clustering_coefficient(e).collect()}
    assert lcc[2] == (2, 1, 1.0) and lcc[3] == (2, 1, 1.0)
    # node 1: deg 3, 1 triangle -> 2*1/(3*2) = 1/3
    assert lcc[1] == (3, 1, 0.333333)
    # pendant: deg 1 -> lcc defined as 0, no triangles
    assert lcc[4] == (1, 0, 0.0)

    # K4: every node deg 3, 3 incident triangles -> lcc 1.0
    k4 = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
        "src long, dst long",
    )
    for r in local_clustering_coefficient(k4).collect():
        assert (r.deg, r.n_tri, r.lcc) == (3, 3, 1.0)


def test_kcore_known_graphs(spark):
    from df_to_azure_spark.functions.graph import kcore

    # triangle (1,2,3) with a chain 3-4-5 hanging off: the 2-core is the
    # triangle alone; peeling needs TWO rounds (5 falls first, then 4)
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    got = {r.node: r.core_deg for r in kcore(e, k=2, iters=3).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    # one round is not enough: only 5 fell, node 4 still hangs off 3
    partial = {r.node: r.core_deg for r in kcore(e, k=2, iters=1).collect()}
    assert partial == {1: 2, 2: 2, 3: 3, 4: 1}
    # 3-core of that graph is empty
    assert kcore(e, k=3, iters=3).count() == 0
    # K4 is its own 3-core
    k4 = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
        "src long, dst long",
    )
    assert {r.core_deg for r in kcore(k4, k=3, iters=2).collect()} == {3}


def test_kcore_guards_and_direction(spark):
    import pytest

    from df_to_azure_spark.functions.graph import kcore

    with pytest.raises(ValueError, match="k >= 1"):
        kcore(spark.createDataFrame([(1, 2)], "src long, dst long"), k=0, iters=1)
    # duplicate + reversed edges canonicalize to one undirected edge
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1)], "src long, dst long"
    )
    got = {r.node: r.core_deg for r in kcore(e, k=2, iters=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_part_kcore_converged_at_registry_depth(spark, sf_smoke):
    """The registry's 6-round peel must BE the fixpoint on testdata —
    one extra round changes nothing (the oracle replays the same 6
    rounds either way; this pins the stronger claim)."""
    from df_to_azure_spark.functions.graph import kcore
    from df_to_azure_spark.plans.pipeline2 import _part_edges
    from df_to_azure_spark.plans.pipeline3 import _KCORE_ITERS, _KCORE_K

    edges = _part_edges(spark, sf_smoke).localCheckpoint()
    at_depth = {
        (r.node, r.core_deg)
        for r in kcore(edges, k=_KCORE_K, iters=_KCORE_ITERS).collect()
    }
    one_more = {
        (r.node, r.core_deg)
        for r in kcore(edges, k=_KCORE_K, iters=_KCORE_ITERS + 1).collect()
    }
    assert at_depth == one_more and len(at_depth) > 0
