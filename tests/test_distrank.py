"""Two-phase distributed rank (functions.distrank) vs real global windows.

The helper's contract is bit-identical results to ``Window.orderBy`` with
no partition spec — but computed via range repartition + per-partition
offsets, so WindowExec stays partitioned.  These tests compare against
Spark's own global windows on a frame large enough to span many range
partitions, including ties in the weak key, skewed groups, desc order,
decimal running sums, and the n < buckets ntile edge.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from df_to_azure_spark.functions.distrank import (
    ntile_from_rank,
    two_phase_rank,
    with_rank_family,
)


def _base(spark, n=1500):
    return spark.range(n).select(
        "id",
        (F.col("id") % 5).alias("g"),
        ((F.col("id") * 37) % 97).alias("v"),  # heavy ties in the weak key
        F.expr("CAST((id * 13 % 997) / 100.0 AS DECIMAL(18,2))").alias("amt"),
    )


def test_rank_ntile_cumsum_match_global_window(spark):
    df = _base(spark)
    got = two_phase_rank(df, [("v", "asc"), ("id", "asc")], sum_col="amt")
    w = W.orderBy(F.asc("v"), F.asc("id"))
    exp = df.select(
        "id",
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("nt"),
        F.sum("amt").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
    )
    cmp = got.select(
        "id",
        F.col("__rn").alias("rn"),
        ntile_from_rank("__rn", "__grp_n", 4).cast("int").alias("nt"),
        F.col("__cum").alias("cum"),
    )
    bad = (
        cmp.alias("a")
        .join(exp.alias("e"), "id")
        .where("a.rn != e.rn OR a.nt != e.nt OR a.cum != e.cum")
        .count()
    )
    assert bad == 0
    # the grand total exposed by the offset pass equals the full sum
    tot = got.select("__grp_sum").distinct().collect()
    assert len(tot) == 1
    assert tot[0][0] == df.agg(F.sum("amt")).collect()[0][0]


def test_grouped_desc_rank_matches_partitioned_window(spark):
    df = _base(spark)
    got = two_phase_rank(df, [("v", "desc"), ("id", "asc")], group_cols=["g"])
    w = W.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    exp = df.select(
        "id",
        F.row_number().over(w).alias("rn"),
        F.ntile(7).over(w).alias("nt"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )
    pct = F.when(F.col("__grp_n") == 1, F.lit(0.0)).otherwise(
        (F.col("__rn") - 1).cast("double") / (F.col("__grp_n") - 1).cast("double")
    )
    cmp = got.select(
        "id",
        F.col("__rn").alias("rn"),
        ntile_from_rank("__rn", "__grp_n", 7).cast("int").alias("nt"),
        F.round(pct, 6).alias("pr"),
    )
    bad = (
        cmp.alias("a")
        .join(exp.alias("e"), "id")
        .where("a.rn != e.rn OR a.nt != e.nt OR a.pr != e.pr")
        .count()
    )
    assert bad == 0


def test_ntile_small_n_edge(spark):
    # n < buckets: ntile degenerates to rank itself
    df = _base(spark, n=3)
    got = two_phase_rank(df, [("v", "asc"), ("id", "asc")])
    cmp = got.select(
        "id", ntile_from_rank("__rn", "__grp_n", 4).cast("int").alias("nt")
    )
    exp = df.select(
        "id", F.ntile(4).over(W.orderBy(F.asc("v"), F.asc("id"))).alias("nt")
    )
    bad = cmp.alias("a").join(exp.alias("e"), "id").where("a.nt != e.nt").count()
    assert bad == 0


def test_plan_has_no_unpartitioned_window(spark):
    df = _base(spark)
    got = two_phase_rank(df, [("v", "asc"), ("id", "asc")], sum_col="amt")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    for line in plan.splitlines():
        if "Window [" in line:
            assert line.count("], [") >= 2, line


def test_integral_sum_col_widens_to_decimal_no_wrap(spark):
    # int64-near-max values: a naive SUM(bigint) over even two such rows
    # wraps silently (non-ANSI).  The widened DECIMAL(38,0) path must
    # return the true running sums.
    big = 4_000_000_000_000_000_000  # ~0.43 * int64 max; 3+ rows overflow
    df = spark.createDataFrame(
        [(i, big) for i in range(6)], "id: long, v: long"
    )
    got = two_phase_rank(
        df, [("id", "asc")], sum_col="v", num_partitions=4
    ).orderBy("id")
    rows = got.select("id", "__cum", "__grp_sum").collect()
    from decimal import Decimal
    for i, r in enumerate(rows):
        assert r["__cum"] == Decimal(big) * (i + 1), r
        assert r["__grp_sum"] == Decimal(big) * 6
    # output type is the widened decimal, not wrapped int64
    t = dict((f.name, f.dataType.simpleString()) for f in got.schema.fields)
    assert t["__cum"] == "decimal(38,0)"


def test_non_exact_sum_col_rejected(spark):
    import pytest

    df = spark.createDataFrame([(1, 1.5)], "id: long, v: double")
    with pytest.raises(ValueError, match="exact-typed"):
        two_phase_rank(df, [("id", "asc")], sum_col="v")


def test_rank_family_matches_spark_window_functions(spark):
    # heavy ties in the weak key v (97 distinct over 1500 rows) — peer
    # groups genuinely span range partitions
    df = _base(spark)
    ranked = two_phase_rank(df, [("v", "asc"), ("id", "asc")])
    fam = with_rank_family(ranked, ["v"])
    w = W.orderBy(F.asc("v"))
    exp = df.select(
        "id",
        F.rank().over(w).cast("bigint").alias("rk"),
        F.round(F.percent_rank().over(w), 10).alias("pr"),
        F.round(F.cume_dist().over(w), 10).alias("cd"),
    )
    cmp = fam.select(
        "id",
        F.col("__rank").alias("rk"),
        F.round("__pct_rank", 10).alias("pr"),
        F.round("__cume_dist", 10).alias("cd"),
    )
    bad = (
        cmp.alias("a")
        .join(exp.alias("e"), "id")
        .where("a.rk != e.rk OR a.pr != e.pr OR a.cd != e.cd")
        .count()
    )
    assert bad == 0


def test_rank_family_grouped_and_single_row_group(spark):
    df = _base(spark).unionByName(
        _base(spark, n=1).select(
            "id", F.lit(99).alias("g"), "v", "amt"
        )
    )
    ranked = two_phase_rank(df, [("v", "asc"), ("id", "asc")], group_cols=["g"])
    fam = with_rank_family(ranked, ["v"], group_cols=["g"])
    w = W.partitionBy("g").orderBy(F.asc("v"))
    exp = df.select(
        "id", "g",
        F.rank().over(w).cast("bigint").alias("rk"),
        F.round(F.percent_rank().over(w), 10).alias("pr"),
        F.round(F.cume_dist().over(w), 10).alias("cd"),
    )
    cmp = fam.select(
        "id", "g",
        F.col("__rank").alias("rk"),
        F.round("__pct_rank", 10).alias("pr"),
        F.round("__cume_dist", 10).alias("cd"),
    )
    joined = cmp.alias("a").join(exp.alias("e"), ["id", "g"])
    assert joined.where("a.rk != e.rk OR a.pr != e.pr OR a.cd != e.cd").count() == 0
    # the 1-row group: percent_rank pinned to 0.0, cume_dist to 1.0
    solo = fam.where("g = 99").collect()[0]
    assert solo["__pct_rank"] == 0.0 and solo["__cume_dist"] == 1.0


def test_dense_rank_matches_spark_window(spark):
    df = _base(spark)
    ranked = two_phase_rank(df, [("v", "desc"), ("id", "asc")])
    fam = with_rank_family(ranked, ["v"], dense=True, asc=[False])
    w = W.orderBy(F.desc("v"))
    exp = df.select("id", F.dense_rank().over(w).cast("bigint").alias("dr"))
    cmp = fam.select("id", F.col("__dense_rank").alias("dr"))
    bad = cmp.alias("a").join(exp.alias("e"), "id").where("a.dr != e.dr").count()
    assert bad == 0
    # __n_peers = number of distinct weak keys
    n_peers = fam.select("__n_peers").distinct().collect()
    assert len(n_peers) == 1
    assert n_peers[0][0] == df.select("v").distinct().count()


def test_two_phase_rank_partition_count_invariance(spark):
    # the machinery's core contract: results are a pure function of the
    # data + order spec, NOT of how many range partitions executed it
    df = _base(spark)
    outs = []
    for n_part in (1, 4, 64):
        got = two_phase_rank(
            df, [("v", "asc"), ("id", "asc")], sum_col="amt",
            num_partitions=n_part,
        )
        outs.append({
            r["id"]: (r["__rn"], r["__grp_n"], r["__cum"], r["__grp_sum"])
            for r in got.collect()
        })
    assert outs[0] == outs[1] == outs[2]


def test_two_phase_rank_empty_input(spark):
    df = spark.createDataFrame([], "id: long, v: long, amt: decimal(18,2)")
    got = two_phase_rank(df, [("v", "asc"), ("id", "asc")], sum_col="amt")
    assert got.count() == 0
    fam = with_rank_family(got, ["v"])
    assert fam.count() == 0


# --------------------------------------------------------------------------
# bracketed_middle_rows: histogram-bracketed exact median selection
# --------------------------------------------------------------------------


def _middle_via_full_rank(df):
    ranked = two_phase_rank(df, [("v", "asc"), ("id", "asc")])
    sel = ranked.where(
        (F.col("__rn") == F.expr("(__grp_n + 1) DIV 2"))
        | (F.col("__rn") == F.expr("__grp_n DIV 2 + 1"))
    )
    return sorted(
        (r["id"], r["v"], r["__rn"], r["__grp_n"]) for r in sel.collect()
    )


def test_bracketed_middle_rows_matches_full_rank(spark):
    from df_to_azure_spark.functions.distrank import bracketed_middle_rows

    import random

    rnd = random.Random(7)
    for n, tag in ((101, "odd"), (100, "even"), (1, "single"), (2, "pair")):
        rows = [(i, rnd.uniform(-50.0, 50.0)) for i in range(n)]
        df = spark.createDataFrame(rows, "id: long, v: double")
        got = sorted(
            (r["id"], r["v"], r["__rn"], r["__grp_n"])
            for r in bracketed_middle_rows(df, "v", ["id"]).collect()
        )
        assert got == _middle_via_full_rank(df), tag


def test_bracketed_middle_rows_tie_heavy_and_degenerate(spark):
    from df_to_azure_spark.functions.distrank import bracketed_middle_rows

    # 90% of the mass on ONE value (the median lands inside the tie run)
    rows = [(i, 3.25) for i in range(90)] + [
        (90 + i, float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "id: long, v: double")
    got = sorted(
        (r["v"], r["__rn"], r["__grp_n"])
        for r in bracketed_middle_rows(df, "v", ["id"]).collect()
    )
    want = sorted(
        (v, rn, g) for (_i, v, rn, g) in _middle_via_full_rank(df)
    )
    assert got == want
    # all-equal input: min == max, the degenerate full-rank fallback
    df2 = spark.createDataFrame([(i, 1.5) for i in range(33)], "id: long, v: double")
    out2 = bracketed_middle_rows(df2, "v", ["id"]).collect()
    assert [(r["__rn"], r["__grp_n"]) for r in out2] == [(17, 33)]
    assert out2[0]["v"] == 1.5


def test_bracketed_middle_rows_empty(spark):
    from df_to_azure_spark.functions.distrank import bracketed_middle_rows

    df = spark.createDataFrame([], "id: long, v: double")
    assert bracketed_middle_rows(df, "v", ["id"]).count() == 0
