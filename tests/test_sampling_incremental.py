"""Hash-split determinism and incremental-aggregate equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from df_to_azure_spark.functions.sampling import sample_by_hash, with_split
from df_to_azure_spark.operators.incremental import incremental_agg, partial_agg


def test_split_is_deterministic_and_partitions(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id: r.split for r in with_split(df, "doc_id").collect()}
    s2 = {r.doc_id: r.split for r in with_split(df, "doc_id").collect()}
    assert s1 == s2  # stable across runs
    counts = {k: list(s1.values()).count(k) for k in ("train", "val", "test")}
    assert 0.7 < counts["train"] / 2000 < 0.9  # ~80%
    assert counts["train"] + counts["val"] + counts["test"] == 2000


def test_sample_by_hash_is_subset_and_stable(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    s = sample_by_hash(df, "doc_id", 10)
    ids1 = {r.doc_id for r in s.collect()}
    ids2 = {r.doc_id for r in sample_by_hash(df, "doc_id", 10).collect()}
    assert ids1 == ids2
    assert 50 < len(ids1) < 200  # ~10%
    # nested property: a 5% sample is a subset of the 10% sample
    ids5 = {r.doc_id for r in sample_by_hash(df, "doc_id", 5).collect()}
    assert ids5 <= ids1


def test_stratified_sample_respects_per_stratum_rates(spark):
    from pyspark.sql import functions as F

    from df_to_azure_spark.functions.sampling import sample_by_hash, stratified_sample

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    kept = stratified_sample(df, "doc_id", "lang", {"en": 10}, default_pct=50)
    counts = {r.lang: r.cnt for r in kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert 40 < counts["en"] < 200       # ~10% of 1000
    assert 350 < counts["de"] < 650      # ~50% of 1000
    # per-stratum rows are exactly the flat-sample rows of that stratum —
    # the stratified form changes the rate, never the hash decision
    en_flat = {r.doc_id for r in sample_by_hash(
        df.where("lang = 'en'"), "doc_id", 10).collect()}
    en_strat = {r.doc_id for r in kept.where("lang = 'en'").collect()}
    assert en_strat == en_flat
    # a stratum with rate 0 (the default for unmapped strata) drops out
    none_kept = stratified_sample(df, "doc_id", "lang", {"en": 10})
    assert none_kept.where("lang = 'de'").count() == 0


def test_incremental_equals_full_recompute(spark):
    df = spark.range(500).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 3).cast("long").alias("v"),
    )
    base = df.where("id % 2 = 0")
    delta = df.where("id % 2 = 1")
    inc = {
        (r.k): (r.n, r.s)
        for r in incremental_agg(base, delta, ["k"], {"s": "v"}).collect()
    }
    full = {(r.k): (r.n, r.s) for r in partial_agg(df, ["k"], {"s": "v"}).collect()}
    assert inc == full

def test_pack_id_greedy_semantics(spark):
    """Packing: rows join the pack their running total STARTS in; a pack
    overflows by at most one row; assignment is deterministic."""
    from pyspark.sql import functions as F

    from df_to_azure_spark.functions.sampling import with_pack_id

    df = spark.createDataFrame(
        [(i, 400) for i in range(10)], "doc_id long, n_chars long"
    )
    # single bucket → one global greedy sequence ordered by doc_id
    packed = with_pack_id(df, "doc_id", "n_chars", target=1000, buckets=1)
    rows = {r.doc_id: r.pack_id for r in packed.collect()}
    # starts: 0,400,800,1200,... → packs 0,0,0,1,1,2,2,(2800)2,3,3
    assert rows == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 2, 8: 3, 9: 3}
    sizes = packed.groupBy("pack_id").agg(F.sum("n_chars").alias("s")).collect()
    assert all(r.s <= 1000 + 400 for r in sizes)  # ≤ target + one row
    again = {r.doc_id: r.pack_id for r in
             with_pack_id(df, "doc_id", "n_chars", 1000, buckets=1).collect()}
    assert again == rows


def test_token_budget_sample_reaches_budget_deterministically(spark):
    from df_to_azure_spark.functions.sampling import token_budget_sample

    docs = spark.createDataFrame(
        [(i, "tok " * 10, "s1") for i in range(10)]
        + [(100 + i, "tok " * 10, "s2") for i in range(3)],
        "doc_id long, text string, source string",
    )
    out = token_budget_sample(docs, budget_tokens=35, group_col="source")
    by_src = {}
    for r in out.collect():
        by_src.setdefault(r.source, []).append(r)
    # s1: 10-token docs, budget 35 -> 4 docs kept (the 4th crosses it)
    assert len(by_src["s1"]) == 4
    assert max(r.cum_tokens for r in by_src["s1"]) == 40
    # s2 has only 30 tokens total: everything kept, budget not reachable
    assert len(by_src["s2"]) == 3
    # deterministic: same selection on a re-run over reshuffled input
    again = token_budget_sample(
        docs.repartition(7), budget_tokens=35, group_col="source"
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_weighted_sample_topk_bias_and_determinism(spark):
    from df_to_azure_spark.functions.sampling import weighted_sample_topk

    # 200 light rows (w=1) + 20 heavy rows (w=100): heavy rows are 100x
    # likelier per E-S, so they must dominate a k=20 draw
    rows = [(i, 1.0) for i in range(200)] + [(1000 + i, 100.0) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id: long, w: double")
    out = weighted_sample_topk(df, "w", k=20, id_col="doc_id").collect()
    assert len(out) == 20
    heavy = sum(1 for r in out if r.doc_id >= 1000)
    assert heavy >= 14  # deterministic draw; heavily biased to weight
    # deterministic: second run identical
    out2 = weighted_sample_topk(df, "w", k=20, id_col="doc_id").collect()
    assert [(r.doc_id, r.samp_rank) for r in out] == [
        (r.doc_id, r.samp_rank) for r in out2
    ]
    # zero/negative weights never sampled
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -5.0), (3, 1.0)], "doc_id: long, w: double"
    )
    picked = weighted_sample_topk(df2, "w", k=3, id_col="doc_id").collect()
    assert [r.doc_id for r in picked] == [3]


def test_weighted_sample_topk_grouped_quota_and_keys(spark):
    from df_to_azure_spark.functions.sampling import (
        weighted_sample_topk,
        weighted_sample_topk_grouped,
    )

    rows = [(i, "g%d" % (i % 3), float(1 + i % 7)) for i in range(60)]
    rows.append((99, "g0", 0.0))  # zero weight: must never be sampled
    df = spark.createDataFrame(rows, "doc_id: long, grp: string, w: double")
    out = weighted_sample_topk_grouped(
        df, "grp", "w", k_per_group=4, id_col="doc_id"
    ).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r)
        assert r.doc_id != 99
    assert set(by_grp) == {"g0", "g1", "g2"}
    for g, rs in by_grp.items():
        assert sorted(r.samp_rank for r in rs) == [1, 2, 3, 4]
        # ranks follow the key ordering within the group
        rs = sorted(rs, key=lambda r: r.samp_rank)
        keys = [r.samp_key for r in rs]
        assert keys == sorted(keys, reverse=True)
    # the per-row exponential key is the SAME as the global sampler's
    # (one shared sampling design, just ranked within groups)
    gkeys = {
        r.doc_id: r.samp_key
        for r in weighted_sample_topk(df, "w", k=60, id_col="doc_id").collect()
    }
    for r in out:
        assert gkeys[r.doc_id] == r.samp_key
    # partitioning invariance
    out2 = weighted_sample_topk_grouped(
        df.repartition(11), "grp", "w", k_per_group=4, id_col="doc_id"
    ).collect()
    assert {tuple(r) for r in out2} == {tuple(r) for r in out}
