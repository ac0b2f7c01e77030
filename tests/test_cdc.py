"""Unit tests for operators.cdc apply_changes / latest_changes."""

from __future__ import annotations

import pytest

from df_to_azure_spark.operators.cdc import apply_changes, latest_changes


def _base(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, val string"
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, "id long, val string, seq long, op string")


def test_latest_seq_wins_and_tombstone_deletes(spark):
    base = _base(spark)
    ch = _changes(spark, [
        (1, "a1", 1, "U"),
        (1, "a2", 2, "U"),   # latest update for key 1
        (2, "x", 1, "U"),
        (2, "x", 2, "D"),    # delete overrides earlier update
        (4, "new", 1, "U"),  # insert of unseen key
    ])
    out = {r.id: r.val for r in apply_changes(base, ch, ["id"]).collect()}
    assert out == {1: "a2", 3: "c", 4: "new"}


def test_same_seq_tie_breaks_to_delete(spark):
    ch = _changes(spark, [(1, "u", 5, "U"), (1, "u", 5, "D")])
    survivor = latest_changes(ch, ["id"]).collect()
    assert len(survivor) == 1 and survivor[0].op == "D"
    out = apply_changes(_base(spark), ch, ["id"]).collect()
    assert {r.id for r in out} == {2, 3}


def test_untouched_rows_pass_through_unchanged(spark):
    base = _base(spark)
    ch = _changes(spark, [(2, "b2", 1, "U")])
    out = sorted(map(tuple, apply_changes(base, ch, ["id"]).collect()))
    assert out == [(1, "a"), (2, "b2"), (3, "c")]


def test_missing_feed_columns_raise(spark):
    bad = _base(spark)  # no seq/op
    with pytest.raises(ValueError, match="lacks columns"):
        apply_changes(_base(spark), bad, ["id"])


def test_partitioning_invariant(spark):
    base = _base(spark)
    rows = [(i % 5, f"v{i}", i, "U" if i % 4 else "D") for i in range(40)]
    ch = _changes(spark, rows)
    a = sorted(map(tuple, apply_changes(base, ch, ["id"]).collect()))
    b = sorted(map(tuple, apply_changes(base, ch.repartition(7), ["id"]).collect()))
    assert a == b
