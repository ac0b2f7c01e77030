"""Incremental rollup maintenance: N deltas must reproduce the direct
full-scan aggregate bit-for-bit."""

from __future__ import annotations

import pytest

from df_to_azure_spark.operators.lake import ParquetLake
from df_to_azure_spark.operators.rollup import IncrementalRollup


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


def test_rollup_matches_full_rebuild(spark, tmp_path):
    lake = ParquetLake(spark, str(tmp_path))
    roll = IncrementalRollup(lake, "agg", ["k"], ["v"])
    b0 = [("a", 1.5), ("a", 2.5), ("b", -1.0)]
    b1 = [("a", 10.0), ("c", 0.25)]
    b2 = [("b", -5.0), ("c", 7.0), ("c", 1.0)]
    roll.init(_batch(spark, b0))
    roll.apply_delta(_batch(spark, b1))
    roll.apply_delta(_batch(spark, b2))
    got = {r.k: r for r in roll.read().collect()}

    roll2 = IncrementalRollup(lake, "agg_full", ["k"], ["v"])
    roll2.init(_batch(spark, b0 + b1 + b2))
    want = {r.k: r for r in roll2.read().collect()}
    assert set(got) == set(want) == {"a", "b", "c"}
    for k in want:
        assert got[k].n_rows == want[k].n_rows
        assert got[k].sum_v == want[k].sum_v  # exact decimal compare
        assert got[k].min_v == want[k].min_v
        assert got[k].max_v == want[k].max_v
    assert got["a"].n_rows == 3
    assert float(got["a"].sum_v) == pytest.approx(14.0)
    assert got["c"].min_v == 0.25 and got["c"].max_v == 7.0


def test_rollup_new_key_only_delta(spark, tmp_path):
    lake = ParquetLake(spark, str(tmp_path))
    roll = IncrementalRollup(lake, "agg", ["k"], ["v"])
    roll.init(_batch(spark, [("a", 1.0)]))
    roll.apply_delta(_batch(spark, [("z", 9.0)]))
    got = {r.k: r for r in roll.read().collect()}
    assert got["z"].n_rows == 1 and got["z"].min_v == 9.0
    assert got["a"].n_rows == 1  # untouched key preserved


def test_rollup_guard(spark, tmp_path):
    lake = ParquetLake(spark, str(tmp_path))
    with pytest.raises(ValueError):
        IncrementalRollup(lake, "t", [], ["v"])


def test_rollup_maintained_by_stream_foreachBatch(spark, tmp_path):
    """Streaming twin: the rollup folded per micro-batch through
    foreachBatch equals the direct full aggregate — the materialized-
    view-maintenance contract under real Structured Streaming."""
    src = f"{tmp_path}/src"
    batches = [
        [("a", 1.0), ("b", 2.0)],
        [("a", 3.0), ("c", -4.0)],
        [("c", 10.0), ("b", 0.5)],
    ]
    for i, rows in enumerate(batches):
        _batch(spark, rows).coalesce(1).write.parquet(f"{src}/b{i}.parquet")

    lake = ParquetLake(spark, str(tmp_path / "lake"))
    roll = IncrementalRollup(lake, "agg", ["k"], ["v"])
    roll.init(_batch(spark, []).limit(0))

    stream = (
        spark.readStream.format("parquet")
        .schema("k string, v double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .load(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _bid: roll.apply_delta(df)
        )
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    all_rows = [r for b in batches for r in b]
    ref = IncrementalRollup(lake, "agg_ref", ["k"], ["v"])
    ref.init(_batch(spark, all_rows))
    got = {r.k: r for r in roll.read().collect()}
    want = {r.k: r for r in ref.read().collect()}
    assert set(got) == set(want)
    for k in want:
        assert (got[k].n_rows, got[k].sum_v, got[k].min_v, got[k].max_v) == (
            want[k].n_rows, want[k].sum_v, want[k].min_v, want[k].max_v,
        )
