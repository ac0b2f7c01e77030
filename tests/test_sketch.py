import pytest
from pyspark.sql import functions as F

from df_to_azure_spark.functions.sketch import heavy_hitters_exact


def _stream(spark, counts: dict[str, int], partitions: int = 1):
    rows = [(item,) for item, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "item string").repartition(partitions)


def test_exact_counts_and_threshold(spark):
    # 100 rows: 'a' 40, 'b' 25, 'c' 20, tail 15 singletons.  phi=1/5 →
    # strictly-above-20 wins: a and b, NOT c (cnt*5 > n is strict).
    counts = {"a": 40, "b": 25, "c": 20, **{f"t{i}": 1 for i in range(15)}}
    got = {
        r.item: (r.cnt, r.share)
        for r in heavy_hitters_exact(
            _stream(spark, counts, 4), "item", 1, 5
        ).collect()
    }
    assert got == {"a": (40, 0.4), "b": (25, 0.25)}


def test_partitioning_invariance(spark):
    # the candidate SET depends on partitioning, the exact-verified
    # output must not — superset guarantee + exact second pass
    counts = {f"k{i}": (50 if i < 3 else 2) for i in range(200)}
    outs = []
    for parts in (1, 7, 32):
        df = _stream(spark, counts, parts)
        rows = heavy_hitters_exact(df, "item", 1, 20, counters=64).collect()
        outs.append(sorted((r.item, r.cnt, r.share) for r in rows))
    assert outs[0] == outs[1] == outs[2]
    assert {i for i, _, _ in outs[0]} == {"k0", "k1", "k2"}


def test_superset_guarantee_with_tight_counters(spark):
    # counters at the guarantee floor (2/phi) over a wide tail: heavy
    # items must still survive the per-partition summaries
    counts = {"hot1": 300, "hot2": 250, **{f"z{i}": 1 for i in range(1000)}}
    got = {
        r.item
        for r in heavy_hitters_exact(
            _stream(spark, counts, 8), "item", 1, 10
        ).collect()
    }
    assert got == {"hot1", "hot2"}


def test_non_string_items(spark):
    df = spark.createDataFrame(
        [(i % 3,) for i in range(90)] + [(99,)], "item bigint"
    ).repartition(5)
    got = {r.item: r.cnt for r in
           heavy_hitters_exact(df, "item", 1, 4).collect()}
    assert got == {0: 30, 1: 30, 2: 30}


def test_guards(spark):
    df = spark.createDataFrame([("x",)], "item string")
    with pytest.raises(ValueError, match="positive fraction"):
        heavy_hitters_exact(df, "item", 0, 10)
    with pytest.raises(ValueError, match="counters"):
        heavy_hitters_exact(df, "item", 1, 100, counters=50)


def test_null_items_excluded_by_contract(spark):
    # 30 NULLs + 30 'a' + 5 'b': NULL is dropped up front, so the
    # total is the 35 non-NULL rows — 'a' is 30/35 (reported), 'b' is
    # 5/35 = 14% (reported at phi=1/10), and NULL itself never appears.
    rows = [(None,)] * 30 + [("a",)] * 30 + [("b",)] * 5
    df = spark.createDataFrame(rows, "item string").repartition(4)
    got = {
        r.item: (r.cnt, r.share)
        for r in heavy_hitters_exact(df, "item", 1, 10, counters=16).collect()
    }
    assert None not in got
    assert got["a"] == (30, round(30 / 35, 6))
    assert got["b"] == (5, round(5 / 35, 6))


def test_no_items_above_threshold(spark):
    df = _stream(spark, {f"u{i}": 1 for i in range(50)}, 4)
    assert heavy_hitters_exact(df, "item", 1, 10).count() == 0


def test_kmv_set_jaccard_small_sets_exact(spark):
    from df_to_azure_spark.functions.sketch import kmv_set_jaccard

    rows = [("A", f"x{i}") for i in range(10)] + [("B", f"x{i}") for i in range(5, 20)]
    df = spark.createDataFrame(rows, "s string, it string")
    out = kmv_set_jaccard(df, "s", "it", k=64).collect()
    assert len(out) == 1
    r = out[0]
    # union < k -> sketch degrades to exact: 5 shared of 20 union
    assert (r.n_union, r.n_inter) == (20, 5)
    assert r.jaccard_exact == 0.25 and r.jaccard_kmv == 0.25


def test_kmv_set_jaccard_partitioning_invariance(spark):
    from df_to_azure_spark.functions.sketch import kmv_set_jaccard

    rows = (
        [("A", f"i{i}") for i in range(300)]
        + [("B", f"i{i}") for i in range(150, 450)]
        + [("C", f"j{i}") for i in range(100)]
    )
    outs = []
    for parts in (1, 5, 32):
        df = spark.createDataFrame(rows, "s string, it string").repartition(parts)
        outs.append(sorted(
            (r.set_a, r.set_b, r.n_union, r.n_inter, r.jaccard_exact, r.jaccard_kmv)
            for r in kmv_set_jaccard(df, "s", "it", k=32).collect()
        ))
    assert outs[0] == outs[1] == outs[2]
    by_pair = {(a, b): (je, jk) for a, b, _, _, je, jk in outs[0]}
    # A/B overlap is real (150 of 450); the 32-hash estimate should land
    # in the right neighborhood, and disjoint pairs estimate exactly 0
    je, jk = by_pair[("A", "B")]
    assert abs(je - 150 / 450) < 1e-6
    assert 0.05 < jk < 0.75
    assert by_pair[("A", "C")] == (0.0, 0.0)
    assert by_pair[("B", "C")] == (0.0, 0.0)


def test_approx_event_stats_deterministic_sketch_bounds(spark, sf_smoke):
    """The deterministic KMV/bottom-k-sample surface must (a) estimate
    distinct users within the KMV variance band (k=128 -> ~9% sigma;
    assert a generous 5x band), (b) keep both quantile estimates inside
    the observed per-group value range with p50 <= p95, and (c) degrade
    to exact counts for groups below k."""
    from pyspark.sql import functions as F

    from df_to_azure_spark.plans.analytics2 import approx_event_stats

    got = {r.event_type: r for r in approx_event_stats(spark, sf_smoke).collect()}
    events = spark.read.parquet(f"{sf_smoke}/events.parquet")
    truth = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("nd"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }
    assert set(got) == set(truth)
    for et, r in got.items():
        t = truth[et]
        if t.nd < 128:
            assert r.approx_users == float(t.nd)
        else:
            assert abs(r.approx_users - t.nd) / t.nd < 5 * 0.0883 * 5
        assert t.vmin <= r.p50_approx <= r.p95_approx <= t.vmax


def test_bottom_k_by_hash_matches_single_window(spark):
    """Two-phase salted bottom-k must equal the single-window bottom-k
    exactly (the invariant that lets the SQL oracle use one window)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from df_to_azure_spark.plans.analytics2 import _bottom_k_by_hash

    df = (
        spark.range(2000)
        .select(
            F.lit("g").alias("event_type"),
            F.col("id"),
            F.expr(
                "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 12), 16, 10)"
                " AS BIGINT) AS hi"
            ),
            F.expr(
                "CAST(conv(substring(md5(CAST(id AS STRING)), 13, 2), 16, 10)"
                " AS INT) % 32 AS salt"
            ),
        )
    )
    two = sorted(
        r.id
        for r in _bottom_k_by_hash(
            df, 100, [F.asc("hi"), F.asc("id")], "salt"
        ).collect()
    )
    w = W.partitionBy("event_type").orderBy(F.asc("hi"), F.asc("id"))
    one = sorted(
        r.id
        for r in df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 100)
        .collect()
    )
    assert two == one
