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
