"""Unit tests for plans/pipeline2 operators: SemDeDup, PageRank, DSIR,
classifier scoring, Z-order keys.  Hermetic (synthetic frames) except
the smoke checks, which run on the sf0.001 parquet tables.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from df_to_azure_spark.functions.graph import pagerank
from df_to_azure_spark.functions.similarity import semdedup
from df_to_azure_spark.plans import pipeline2 as PL2


# --------------------------------------------------------------- pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_mass_conserved_on_symmetric_graph(spark):
    # triangle, symmetric: no dangling mass, so ranks sum to ~1
    pairs = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)]
    out = pagerank(_edges(spark, pairs), n_nodes=3, iters=3).collect()
    total = sum(r.rank for r in out)
    assert abs(total - 1.0) < 1e-6
    # fully symmetric triangle -> uniform ranks
    assert len({r.rank for r in out}) == 1


def test_pagerank_star_center_dominates(spark):
    # 4 leaves all pointing at node 0, node 0 points back at each
    pairs = [(i, 0) for i in range(1, 5)] + [(0, i) for i in range(1, 5)]
    out = {r.node: r.rank for r in pagerank(_edges(spark, pairs), n_nodes=5, iters=3).collect()}
    assert out[0] > max(out[i] for i in range(1, 5))
    leaf_ranks = {out[i] for i in range(1, 5)}
    assert len(leaf_ranks) == 1  # leaves are symmetric


def test_pagerank_dangling_node_keeps_base_rank(spark):
    # 1 -> 2 only: node 2 is dangling (its mass evaporates, by contract);
    # node 1 has no in-edges so it settles at (1-d)/n
    out = {r.node: r.rank for r in pagerank(_edges(spark, [(1, 2)]), n_nodes=2, iters=3).collect()}
    assert out[1] == round((1 - 0.85) / 2, 8)
    assert out[2] > out[1]


def test_pagerank_partitioning_invariant(spark):
    pairs = [(i, (i * 7) % 23) for i in range(200) if i != (i * 7) % 23]
    e = _edges(spark, pairs)
    a = sorted(map(tuple, pagerank(e, n_nodes=23, iters=3).collect()))
    b = sorted(map(tuple, pagerank(e.repartition(7), n_nodes=23, iters=3).collect()))
    assert a == b


def test_pagerank_checkpoint_local_identical(spark):
    """checkpoint='local' pins the nodes/degree-edge frames (a pure
    evaluation-strategy knob) — ranks must be bit-identical to the
    default pure-plan path, and bad modes must raise."""
    import pytest

    pairs = [(i, (i * 7) % 23) for i in range(200) if i != (i * 7) % 23]
    e = _edges(spark, pairs)
    a = sorted(map(tuple, pagerank(e, n_nodes=23, iters=3).collect()))
    b = sorted(
        map(tuple, pagerank(e, n_nodes=23, iters=3, checkpoint="local").collect())
    )
    assert a == b
    with pytest.raises(ValueError, match="checkpoint"):
        pagerank(e, n_nodes=23, iters=3, checkpoint="persist")


# --------------------------------------------------------------- semdedup


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_prunes_higher_id_duplicate(spark):
    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (1, [0.9, 0.1]),
        (2, [0.9, 0.1]),     # exact dup of 1 -> pruned
        (3, [0.05, 1.0]),    # other cluster, unique -> kept
    ]
    out = {r.id: (r.cid, r.kept) for r in semdedup(_vecs(spark, rows), cents, threshold=0.95).collect()}
    assert out[1] == (0, True)
    assert out[2] == (0, False)
    assert out[3] == (1, True)


def test_semdedup_cross_cluster_dups_survive(spark):
    # identical vectors equidistant-ish from both centroids still land in
    # ONE cluster (deterministic argmin tie to lowest cid) — but a pair
    # split across clusters is never compared: that is the recall trade
    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    out = {r.id: r.kept for r in semdedup(_vecs(spark, rows), cents, threshold=0.0).collect()}
    assert out == {1: True, 2: True}  # different clusters, no comparison


def test_semdedup_hot_cluster_cap_skips_comparison(spark):
    cents = [[1.0, 0.0]]
    rows = [(i, [1.0, 0.0]) for i in range(1, 5)]
    # cap=1: only the lowest id enters the candidate join -> nothing has
    # a partner, everything is kept (capped rows are kept UN-compared)
    out = semdedup(_vecs(spark, rows), cents, threshold=0.9, hot_cluster_cap=1).collect()
    assert all(r.kept for r in out)
    # sanity: without the cap the three higher ids are pruned
    out2 = {r.id: r.kept for r in semdedup(_vecs(spark, rows), cents, threshold=0.9).collect()}
    assert out2 == {1: True, 2: False, 3: False, 4: False}


# ------------------------------------------------------- smoke on sf0.001


def test_dsir_weights_smoke(spark, sf_smoke):
    out = PL2.dsir_importance_weights(spark, sf_smoke)
    rows = out.collect()
    assert rows and set(out.columns) == {
        "doc_id", "n_tokens", "dsir_logratio", "target_like"
    }
    # weights must be finite and the flag consistent with the sign
    for r in rows:
        assert math.isfinite(r.dsir_logratio)
        assert r.target_like == (r.dsir_logratio >= 0.0)


def test_classifier_scores_smoke(spark, sf_smoke):
    rows = PL2.doc_classifier_scores(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert -0.5 <= r.logit <= 0.5
        assert 0.0 < r.quality_prob < 1.0
        assert r.quality_pass == (r.quality_prob >= 0.5)


def test_zorder_keys_smoke(spark, sf_smoke):
    out = PL2.zorder_keys(spark, sf_smoke)
    rows = out.collect()
    n_orders = out.sparkSession.read.parquet(f"{sf_smoke}/orders.parquet").count()
    assert len(rows) == n_orders
    assert all(0 <= r.zkey < (1 << 16) for r in rows)


def test_part_pagerank_smoke(spark, sf_smoke):
    rows = PL2.part_pagerank(spark, sf_smoke).collect()
    # sf0.001 may have few qualifying edges; ranks are positive if any
    assert all(r.rank > 0 for r in rows)


def test_semdedup_between_judges_only_new_side(spark):
    from df_to_azure_spark.functions.similarity import semdedup_between

    cents = [[1.0, 0.0], [0.0, 1.0]]
    corpus = _vecs(spark, [(1, [0.9, 0.1]), (2, [0.1, 0.9])])
    new = _vecs(spark, [
        (10, [0.9, 0.1]),   # dup of corpus 1 -> pruned
        (11, [-1.0, 0.05]), # same cluster? no — far from both corpus vecs
    ])
    out = {r.id: r.kept for r in semdedup_between(new, corpus, cents, threshold=0.95).collect()}
    assert out[10] is False
    assert out[11] is True
    # corpus rows are never judged/emitted
    assert set(out) == {10, 11}


def test_semdedup_between_new_new_dups_survive(spark):
    # two identical NEW vectors with no corpus match: both kept — the
    # between-variant only judges new-vs-corpus (within-batch dups are the
    # full semdedup's job on the merged corpus later)
    from df_to_azure_spark.functions.similarity import semdedup_between

    cents = [[1.0, 0.0]]
    corpus = _vecs(spark, [(1, [0.0, 1.0])])
    new = _vecs(spark, [(10, [1.0, 0.0]), (11, [1.0, 0.0])])
    out = {r.id: r.kept for r in semdedup_between(new, corpus, cents, threshold=0.9).collect()}
    assert out == {10: True, 11: True}


def test_semdedup_partitioning_invariant(spark):
    import random

    rng = random.Random(5)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)
    ] + [(100 + i, [float(i % 3), 1.0] + [0.0] * 6) for i in range(12)]
    cents = [rows[i][1] for i in range(4)]
    df = _vecs(spark, rows)
    a = sorted(map(tuple, semdedup(df, cents, threshold=0.95).collect()))
    b = sorted(map(tuple, semdedup(df.repartition(13), cents, threshold=0.95).collect()))
    assert a == b
    # the planted duplicate families (same vector values) actually prune
    kept = {r[0]: r[2] for r in a}
    assert sum(1 for i, k in kept.items() if i >= 100 and not k) > 0


def test_corr_matrix_matches_numpy(spark):
    import numpy as np

    from df_to_azure_spark.functions.profile import corr_matrix

    rng = np.random.RandomState(9)
    a = rng.randint(0, 1000, 400)
    b = 2 * a + rng.randint(0, 200, 400)     # strongly correlated with a
    c = rng.randint(0, 1000, 400)            # independent
    df = spark.createDataFrame(
        [(int(x), int(y), int(z)) for x, y, z in zip(a, b, c)],
        "a long, b long, c long",
    ).repartition(6)
    got = {(r.col_a, r.col_b): r.corr for r in corr_matrix(df, ["a", "b", "c"], scale=0).collect()}
    ref = np.corrcoef(np.vstack([a, b, c]))
    assert got[("a", "a")] == 1.0 and got[("b", "b")] == 1.0
    for (i, x), (j, y) in [((0, "a"), (1, "b")), ((0, "a"), (2, "c")), ((1, "b"), (2, "c"))]:
        assert abs(got[(x, y)] - ref[i, j]) < 1e-6


def test_corr_matrix_constant_column_is_null(spark):
    from df_to_azure_spark.functions.profile import corr_matrix

    # column k is constant -> zero variance -> every cell involving it
    # (diagonal included) must be NULL, not a 0/0 NaN sentinel
    df = spark.createDataFrame(
        [(i, 7, 2 * i) for i in range(10)], "a long, k long, b long"
    )
    got = {
        (r.col_a, r.col_b): r.corr
        for r in corr_matrix(df, ["a", "k", "b"], scale=0).collect()
    }
    assert got[("a", "a")] == 1.0 and got[("b", "b")] == 1.0
    assert got[("a", "b")] == 1.0
    assert got[("k", "k")] is None
    assert got[("a", "k")] is None and got[("k", "b")] is None


def test_corr_matrix_guard(spark):
    import pytest

    from df_to_azure_spark.functions.profile import corr_matrix

    df = spark.range(3)
    with pytest.raises(ValueError, match="at least one column"):
        corr_matrix(df, [])


def test_rfm_segment_migration_conserves_customers(spark, sf_smoke):
    from df_to_azure_spark.sources import load_table

    mig = PL2.rfm_segment_migration(spark, sf_smoke)
    rows = mig.collect()
    # codes are valid 3-digit quartile triples
    for r in rows:
        for c in (r.rfm_p1, r.rfm_p2):
            assert all(1 <= int(d) <= 4 for d in str(c)), c
    # matrix mass == customers with orders in BOTH periods
    orders = load_table(spark, sf_smoke, "orders")
    split = F.lit(PL2._RFM_SPLIT_DATE).cast("date")
    both = (
        orders.select(
            "o_custkey", (F.col("o_orderdate") < split).alias("in_p1")
        )
        .groupBy("o_custkey")
        .agg(F.max("in_p1").alias("p1"), F.min("in_p1").alias("all_p1"))
        .where(F.col("p1") & ~F.col("all_p1"))
        .count()
    )
    assert sum(r.n_customers for r in rows) == both
