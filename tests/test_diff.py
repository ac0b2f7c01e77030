"""Tests for the keyed table-diff operator."""

from __future__ import annotations

from df_to_azure_spark.operators.diff import diff_rows, diff_summary


def _frames(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "id int, s string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, "c", 30), (5, "e", 50)],
        "id int, s string, v int",
    )
    return old, new


def test_diff_rows_classifies_changes(spark):
    old, new = _frames(spark)
    rows = {r.id: r for r in diff_rows(old, new, ["id"]).collect()}
    # 1 unchanged -> absent; 2 changed (s); 3 changed (v NULL->30);
    # 4 removed; 5 added
    assert set(rows) == {2, 3, 4, 5}
    assert rows[2].change_type == "changed"
    assert rows[2].changed_columns == ["s"]
    assert rows[3].change_type == "changed"
    assert rows[3].changed_columns == ["v"]
    assert rows[4].change_type == "removed"
    assert rows[4].changed_columns == []
    assert rows[5].change_type == "added"


def test_diff_summary_counts_in_one_pass(spark):
    old, new = _frames(spark)
    row = diff_summary(old, new, ["id"]).collect()[0]
    assert (row.n_added, row.n_removed, row.n_changed, row.n_unchanged) == (
        1, 1, 2, 1,
    )
    assert row.changed_by_column == {"s": 1, "v": 1}


def test_diff_null_to_null_is_unchanged(spark):
    old = spark.createDataFrame([(1, None)], "id int, v int")
    new = spark.createDataFrame([(1, None)], "id int, v int")
    assert diff_rows(old, new, ["id"]).count() == 0
    row = diff_summary(old, new, ["id"]).collect()[0]
    assert row.n_unchanged == 1 and row.n_changed == 0
