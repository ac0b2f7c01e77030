"""Similarity-search semantics: exact brute force as ground truth, LSH
recall against it."""

from __future__ import annotations

import math
import random

from df_to_azure_spark.functions import similarity as S


def _emb(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/embeddings.parquet")


def test_cosine_topk_shape_and_ranges(spark, sf_smoke):
    emb = _emb(spark, sf_smoke)
    q = emb.where("vec_id < 3")
    out = S.cosine_topk(q, emb, k=5).collect()
    assert len(out) == 15  # 3 queries x 5 neighbors
    for r in out:
        assert -1.0001 <= r.cos_sim <= 1.0001
        assert r.neighbor_id != r.query_id
    ranks = sorted(r.rank for r in out if r.query_id == out[0].query_id)
    assert ranks == [1, 2, 3, 4, 5]


def test_cosine_matches_python(spark, sf_smoke):
    emb = _emb(spark, sf_smoke)
    rows = {r.vec_id: list(r.embedding) for r in emb.where("vec_id < 2").collect()}
    a, b = rows[0], rows[1]
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    expected = dot / (na * nb)
    got = [
        r.cos_sim
        for r in S.cosine_topk(emb.where("vec_id = 0"), emb.where("vec_id <= 1"), k=1).collect()
    ][0]
    assert abs(got - expected) < 1e-6


def test_lsh_topk_recall_against_exact(spark, sf_smoke):
    emb = _emb(spark, sf_smoke)
    dim = len(emb.limit(1).collect()[0].embedding)
    rng = random.Random(7)
    planes = [[rng.gauss(0, 1) for _ in range(dim)]]  # 2 buckets → ~half scanned
    q = emb.where("vec_id < 5")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(q, emb, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.lsh_topk(q, emb, planes, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall > 0.3  # 2 planes ≈ quarter of corpus scanned per query


def test_neardup_pairs_symmetric_free(spark, sf_smoke):
    emb = _emb(spark, sf_smoke)
    pairs = S.embedding_neardup_pairs(emb.where("vec_id < 50"), threshold=-1.0).collect()
    # lower triangle only: 50*49/2 pairs
    assert len(pairs) == 50 * 49 // 2
    assert all(r.id_a < r.id_b for r in pairs)


def test_neardup_lsh_subset_and_recall(spark, sf_smoke):
    """The bucketed near-dup pairs are a SUBSET of the exact pairs (no
    false positives — cosine is exact within buckets) with useful recall."""
    from df_to_azure_spark.plans.training_data import _neardup_planes

    emb = _emb(spark, sf_smoke)
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in S.embedding_neardup_pairs(emb, threshold=0.6).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cos_sim
        for r in S.embedding_neardup_pairs_lsh(
            emb, _neardup_planes(), threshold=0.6
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]  # identical scoring, not an approximation
    if exact:
        recall = len(lsh) / len(exact)
        # near-dup pairs are highly correlated vectors → rarely split by a
        # hyperplane; 3 planes keeps most of them in one bucket
        assert recall >= 0.5, recall


def test_ivf_topk_recall_and_subset(spark, sf_smoke):
    """IVF probe results are drawn from the exact scoring function (any
    returned pair matches the exact cosine) with useful recall at
    nprobe=2 of 8 lists (~1/4 of the corpus scanned)."""
    from df_to_azure_spark.plans.training_data import _ivf_centroids

    emb = _emb(spark, sf_smoke)
    q = emb.where("vec_id < 5")
    exact = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in S.cosine_topk(q, emb, k=10).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in S.ivf_topk(q, emb, _ivf_centroids(), k=10, nprobe=2).collect()
    }
    # scores are never invented: every IVF hit that is also an exact hit
    # carries the identical similarity
    for pair, sim in ivf.items():
        if pair in exact:
            assert sim == exact[pair]
    recall = len(set(ivf) & set(exact)) / len(exact)
    assert recall >= 0.15, recall


def test_multiprobe_improves_recall_over_single_probe(spark, sf_smoke):
    from df_to_azure_spark.plans.training_data import _lsh_knn_planes

    emb = _emb(spark, sf_smoke)
    q = emb.where("vec_id < 5")
    planes = _lsh_knn_planes()
    exact = {
        (r.query_id, r.neighbor_id) for r in S.cosine_topk(q, emb, k=10).collect()
    }
    single = {
        (r.query_id, r.neighbor_id)
        for r in S.lsh_topk(q, emb, planes, k=10).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in S.lsh_topk_multiprobe(q, emb, planes, k=10).collect()
    }
    r_single = len(exact & single) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    assert r_multi >= r_single  # probing more buckets can only help
    assert r_multi >= 0.5, (r_single, r_multi)
