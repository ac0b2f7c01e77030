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


def test_validate_required_options():
    from df_to_azure_spark.exceptions import EngineConfigError

    checks.validate_required_options({"url": "jdbc:x", "user": "u"}, ["url", "user"])
    with pytest.raises(EngineConfigError):
        checks.validate_required_options({"url": ""}, ["url", "password"])


def test_csv_source_reads_header_and_types(spark, tmp_path):
    # S2: reference fixture-loader semantics (header + inferred types)
    from df_to_azure_spark.sources import read_csv

    p = tmp_path / "f.csv"
    p.write_text("col_a,col_b\n1,x\n2,y\n")
    df = read_csv(spark, str(p))
    assert df.columns == ["col_a", "col_b"]
    assert dict(df.dtypes)["col_a"] == "int"
    assert df.count() == 2


def test_is_empty(spark):
    assert checks.is_empty(spark.createDataFrame([], "a int"))
    assert not checks.is_empty(spark.createDataFrame([(1,)], "a int"))

def test_register_star_schema_sql_passthrough(spark, sf_smoke):
    """Plain ANSI SQL over the registered views, Catalyst-optimized —
    the user-facing SQL surface."""
    from df_to_azure_spark.sources import register_star_schema

    names = register_star_schema(spark, sf_smoke)
    assert "lineitem" in names and len(names) == 10
    out = spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY o_orderstatus
        """
    ).collect()
    assert sum(r.n for r in out) == spark.table("orders").count()
    # nano-ts normalization applies through the view too
    assert dict(spark.table("events").dtypes)["ts"] == "timestamp"


def test_json_source_reads_lines_and_schema(spark, tmp_path):
    from df_to_azure_spark.sources import read_json

    p = tmp_path / "f.jsonl"
    p.write_text('{"col_a": 1, "col_b": "x"}\n{"col_a": 2, "col_b": "y"}\n')
    df = read_json(spark, str(p))
    assert sorted(df.columns) == ["col_a", "col_b"]
    assert df.count() == 2
    # pinned schema skips the inference pass and wins on type control
    typed = read_json(spark, str(p), "col_a INT, col_b STRING")
    assert dict(typed.dtypes) == {"col_a": "int", "col_b": "string"}
    assert {r.col_a for r in typed.collect()} == {1, 2}
