"""SCD2 apply semantics."""

from __future__ import annotations

import datetime as dt

import pytest

from df_to_azure_spark.exceptions import DuplicateKeysError
from df_to_azure_spark.operators.scd import scd2_apply

T0 = dt.datetime(2020, 1, 1)
T1 = dt.datetime(2022, 1, 1)
T2 = dt.datetime(2024, 6, 1)


def _current(spark):
    return spark.createDataFrame(
        [
            (1, "alice_v1", T0, T1),    # closed history row
            (1, "alice_v2", T1, None),  # open
            (2, "bob_v1", T0, None),    # open, not in delta
        ],
        "k long, name string, valid_from timestamp, valid_to timestamp",
    )


def test_scd2_apply_closes_and_appends(spark):
    delta = spark.createDataFrame([(1, "alice_v3"), (3, "carol_v1")], "k long, name string")
    out = scd2_apply(_current(spark), delta, ["k"], T2).collect()
    rows = {(r.k, r.name): (r.valid_from, r.valid_to) for r in out}
    assert len(rows) == 5
    assert rows[(1, "alice_v1")] == (T0, T1)     # history untouched
    assert rows[(1, "alice_v2")] == (T1, T2)     # open row closed at T2
    assert rows[(2, "bob_v1")] == (T0, None)     # unmatched open unchanged
    assert rows[(1, "alice_v3")] == (T2, None)   # new open version
    assert rows[(3, "carol_v1")] == (T2, None)   # brand-new key


def test_scd2_duplicate_delta_keys_rejected(spark):
    delta = spark.createDataFrame([(1, "a"), (1, "b")], "k long, name string")
    with pytest.raises(DuplicateKeysError):
        scd2_apply(_current(spark), delta, ["k"], T2)


def test_profile_counts(spark):
    from df_to_azure_spark.functions.profile import profile

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y")], "a long, b string"
    )
    out = {r.column_name: (r.n_rows, r.n_nulls, r.n_distinct) for r in profile(df).collect()}
    assert out == {"a": (3, 0, 2), "b": (3, 1, 2)}
