"""Type-map and widening semantics, ported from the reference's
INFORMATION_SCHEMA oracle tests (``tests/test_general.py:41-133,201-220``)
as hermetic unit tests (no live database)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from df_to_azure_spark import schema as S
from df_to_azure_spark.exceptions import WrongDtypeError


def _df(spark, data, schema):
    return spark.createDataFrame(data, schema=schema)


def test_static_type_map_matrix(spark):
    # the full dtype matrix of reference test_general.py:41-133
    df = _df(
        spark,
        [
            ("a", True, 1, 10**5, 1.5, Decimal("1.23"), dt.datetime(2021, 1, 1), dt.date(2021, 1, 1)),
        ],
        T.StructType(
            [
                T.StructField("s", T.StringType()),
                T.StructField("b", T.BooleanType()),
                T.StructField("i", T.IntegerType()),
                T.StructField("l", T.LongType()),
                T.StructField("f", T.DoubleType()),
                T.StructField("d", T.DecimalType(10, 2)),
                T.StructField("ts", T.TimestampType()),
                T.StructField("dt", T.DateType()),
            ]
        ),
    )
    m = S.infer_sql_schema(df)
    assert m["s"] == "VARCHAR(255)"
    assert m["b"] == "BIT"
    assert m["i"] == "INT"
    assert m["l"] == "INT"  # in int32 bounds → INT, like the reference
    assert m["f"] == "NUMERIC(18, 2)"
    assert m["d"] == "NUMERIC(10, 2)"
    assert m["ts"] == "DATETIME"
    assert m["dt"] == "DATE"


def test_bigint_promotion(spark):
    # reference test_general.py:201-220 — any value out of int32 bounds
    df = _df(
        spark,
        [(1, 2**40, -(2**40)), (2, 5, 7)],
        T.StructType(
            [
                T.StructField("ok", T.LongType()),
                T.StructField("big", T.LongType()),
                T.StructField("neg", T.LongType()),
            ]
        ),
    )
    m = S.infer_sql_schema(df)
    assert m["ok"] == "INT"
    assert m["big"] == "BIGINT"
    assert m["neg"] == "BIGINT"


def test_string_widening(spark):
    # reference export.py:252-267 + test_general.py:136-147 (10k-char value)
    rows = [("x" * 10, "y" * 300, "z" * 10_000)]
    df = _df(
        spark,
        rows,
        T.StructType(
            [
                T.StructField("short", T.StringType()),
                T.StructField("mid", T.StringType()),
                T.StructField("huge", T.StringType()),
            ]
        ),
    )
    m = S.infer_sql_schema(df)
    assert m["short"] == "VARCHAR(255)"
    assert m["mid"] == "VARCHAR(300)"
    assert m["huge"] == "VARCHAR(MAX)"


def test_len_8000_is_max_not_default(spark):
    # deliberate fix of the reference's ==8000 fall-through quirk
    df = _df(spark, [("x" * 8000,)], T.StructType([T.StructField("c", T.StringType())]))
    assert S.infer_sql_schema(df)["c"] == "VARCHAR(MAX)"


def test_all_null_string_keeps_default(spark):
    df = _df(spark, [(None,), (None,)], T.StructType([T.StructField("c", T.StringType())]))
    assert S.infer_sql_schema(df)["c"] == "VARCHAR(255)"


def test_user_dtypes_override_and_validation(spark):
    # reference test_create.py:48-85 (Date override) + broken-V5 fixed
    df = _df(spark, [("2021-01-01",)], T.StructType([T.StructField("d", T.StringType())]))
    m = S.infer_sql_schema(df, dtypes={"d": "DATE"})
    assert m["d"] == "DATE"
    with pytest.raises(WrongDtypeError):
        S.infer_sql_schema(df, dtypes={"nope": "DATE"})
    with pytest.raises(WrongDtypeError):
        S.infer_sql_schema(df, dtypes={"d": 42})  # type: ignore[dict-item]


def test_unknown_dtype_raises(spark):
    df = spark.createDataFrame([([1, 2],)], T.StructType([T.StructField("a", T.ArrayType(T.IntegerType()))]))
    with pytest.raises(WrongDtypeError):
        S.infer_sql_schema(df)


def test_decimal_precision_param(spark):
    df = _df(spark, [(1.5,)], T.StructType([T.StructField("f", T.DoubleType())]))
    assert S.infer_sql_schema(df, decimal_precision=4)["f"] == "NUMERIC(18, 4)"


def test_normalize_interval_to_seconds(spark):
    # reference T1 (export.py:202-216): timedelta → float seconds
    df = spark.sql(
        "SELECT id, make_dt_interval(0, 1, 30, 0) AS dur FROM VALUES (1) AS t(id)"
    )
    out = S.normalize_for_sink(df)
    assert dict(out.dtypes)["dur"] == "double"
    assert out.collect()[0].dur == pytest.approx(5400.0)


def test_normalize_floats_to_decimal(spark):
    df = spark.createDataFrame([(1.555,)], "f double")
    out = S.normalize_for_sink(df, decimal_precision=2, cast_floats_to_decimal=True)
    assert out.schema["f"].dataType == T.DecimalType(18, 2)
    assert out.collect()[0].f == Decimal("1.56")


def test_create_table_column_types_rendering(spark):
    ddl = S.create_table_column_types(
        {"a": "VARCHAR(300)", "b": "VARCHAR(MAX)", "c": "BIT", "d": "DATETIME"}
    )
    assert ddl == "`a` VARCHAR(300), `b` STRING, `c` BOOLEAN, `d` TIMESTAMP"


def test_schema_diff_reports_all_drift_kinds(spark):
    from df_to_azure_spark.schema import schema_diff

    before = spark.createDataFrame([(1, "a", 1.0)], "id long, name string, v double")
    after = spark.sql("SELECT CAST(1 AS INT) AS id, 'x' AS extra, 'a' AS name")
    changes = {(c["column"], c["change"]) for c in schema_diff(before, after)}
    assert ("v", "removed") in changes
    assert ("extra", "added") in changes
    assert ("id", "type_changed") in changes
    assert ("*", "reordered") not in changes  # shared cols id,name keep order


def test_schema_diff_detects_reorder_and_no_false_positives(spark):
    from df_to_azure_spark.schema import schema_diff

    a = spark.createDataFrame([(1, "x")], "id long, name string")
    b = spark.createDataFrame([("x", 1)], "name string, id long")
    changes = schema_diff(a, b)
    assert [c["change"] for c in changes] == ["reordered"]
    assert schema_diff(a, a) == []
