"""Validation semantics (reference ``tests/test_checks.py`` +
``test_upsert.py:113-134`` + ``test_general.py:223-232``)."""

from __future__ import annotations

import pytest

from df_to_azure_spark import checks
from df_to_azure_spark.exceptions import (
    DoubleColumnNamesError,
    DuplicateKeysError,
    MissingIdFieldError,
    WrongMethodError,
)


def test_method_whitelist():
    for m in ("create", "append", "upsert"):
        checks.validate_method(m)
    with pytest.raises(WrongMethodError):
        checks.validate_method("merge")


def test_upsert_requires_id_field():
    with pytest.raises(MissingIdFieldError):
        checks.validate_id_field("upsert", None)
    assert checks.validate_id_field("upsert", "k") == ["k"]
    assert checks.validate_id_field("upsert", ["a", "b"]) == ["a", "b"]
    assert checks.validate_id_field("create", None) == []


def test_unique_column_names(spark):
    ok = spark.createDataFrame([(1, 2)], ["a", "b"])
    checks.ensure_unique_column_names(ok)
    bad = spark.createDataFrame([(1, 2)], ["a", "a"])
    with pytest.raises(DoubleColumnNamesError):
        checks.ensure_unique_column_names(bad)


def test_unique_keys_single_and_composite(spark):
    df = spark.createDataFrame([(1, 1, "x"), (1, 2, "y"), (2, 1, "z")], ["a", "b", "v"])
    checks.ensure_unique_keys(df, ["a", "b"])  # composite OK
    with pytest.raises(DuplicateKeysError):
        checks.ensure_unique_keys(df, ["a"])  # a=1 twice


def test_is_empty(spark):
    assert checks.is_empty(spark.createDataFrame([], "a int"))
    assert not checks.is_empty(spark.createDataFrame([(1,)], "a int"))
