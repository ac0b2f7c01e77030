"""The reference's own golden fixtures, ported 1:1.

CSV fixtures mirror the reference ``data/*.csv`` byte-for-byte (values,
not code); expected frames come from the reference's tests:

- upsert goldens      — ``tests/test_upsert.py:17-110``
- create round-trip   — ``tests/test_create.py:14-45``
- 10,000-char string  — ``tests/test_general.py:136-147`` → VARCHAR(MAX)
- newline+quote text  — ``tests/test_general.py:150-169``
- NaN/NaT round-trip  — ``tests/test_general.py:173-185``
- bigint promotion    — ``tests/test_general.py:201-220``
- dtype → DDL map     — ``tests/test_general.py:42-133``
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
import pytest

from df_to_azure_spark.api import df_to_spark
from df_to_azure_spark.exceptions import DuplicateKeysError
from df_to_azure_spark.operators.lake import ParquetLake
from df_to_azure_spark.schema import infer_sql_schema
from df_to_azure_spark.sources.tables import read_csv

DATA = Path(__file__).parent / "data"


def _fixture(spark, name):
    return read_csv(spark, str(DATA / f"{name}.csv"))


def _rows(df, order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


def test_create_sample_round_trip(spark, tmp_path):
    df = _fixture(spark, "sample_1")
    df_to_spark(df, "sample", parquet=True, lake_root=str(tmp_path), method="create")
    back = ParquetLake(spark, str(tmp_path)).read("sample")
    assert _rows(back, ["col_a"]) == _rows(df, ["col_a"])


def test_upsert_sample_golden(spark, tmp_path):
    root = str(tmp_path)
    df_to_spark(_fixture(spark, "sample_1"), "sample", parquet=True, lake_root=root)
    df_to_spark(
        _fixture(spark, "sample_2"),
        "sample",
        parquet=True,
        lake_root=root,
        method="upsert",
        id_field="col_a",
    )
    got = _rows(ParquetLake(spark, root).read("sample"), ["col_a"])
    # reference golden: tests/test_upsert.py:36-43
    assert got == [
        (1, "updated value", "E"),
        (3, "test", "Z"),
        (4, "test", "A"),
        (5, "new value", "F"),
        (6, "also new", "H"),
    ]


def test_upsert_category_golden(spark, tmp_path):
    root = str(tmp_path)
    df_to_spark(_fixture(spark, "category_1"), "category", parquet=True, lake_root=root)
    df_to_spark(
        _fixture(spark, "category_2"),
        "category",
        parquet=True,
        lake_root=root,
        method="upsert",
        id_field="category_id",
    )
    got = _rows(ParquetLake(spark, root).read("category"), ["category_id"])
    # reference golden: tests/test_upsert.py:61-75
    assert got == [
        (1, "Children Bicycles", 15000.0),
        (2, "Comfort Bicycles", 25000.0),
        (3, "Cruisers Bicycles", 13000.0),
        (4, "Cyclocross Bicycles", 20000.0),
        (5, "Electric Bikes", 10000.0),
        (6, "Mountain Bikes", 10000.0),
    ]


def test_upsert_composite_keys_golden(spark, tmp_path):
    root = str(tmp_path)
    df_to_spark(_fixture(spark, "employee_1"), "employee", parquet=True, lake_root=root)
    df2 = _fixture(spark, "employee_2")
    df_to_spark(
        df2,
        "employee",
        parquet=True,
        lake_root=root,
        method="upsert",
        id_field=["employee_id", "week_nr"],
    )
    back = ParquetLake(spark, root).read("employee")
    # reference golden: result equals the delta frame (every key updated,
    # no inserts) — tests/test_upsert.py:83-110
    assert _rows(back, ["employee_id", "week_nr"]) == _rows(
        df2, ["employee_id", "week_nr"]
    )


def test_upsert_duplicate_keys_rejected(spark, tmp_path):
    root = str(tmp_path)
    df_to_spark(
        _fixture(spark, "employee_duplicate_keys_1"),
        "employee_dup",
        parquet=True,
        lake_root=root,
    )
    with pytest.raises(DuplicateKeysError):
        df_to_spark(
            _fixture(spark, "employee_duplicate_keys_2"),
            "employee_dup",
            parquet=True,
            lake_root=root,
            method="upsert",
            id_field=["employee_id", "week_nr"],
        )


def test_long_string_widens_to_varchar_max(spark):
    # reference: a 10,000-char value must land as VARCHAR(MAX), not be
    # truncated to the default 255 (tests/test_general.py:136-147)
    df = spark.createDataFrame(
        pd.DataFrame({"A": ["1" * 10000, "2", "3"]})
    )
    ddl = infer_sql_schema(df)
    assert ddl["A"] == "VARCHAR(MAX)"


def test_newline_and_quotes_round_trip(spark, tmp_path):
    # reference: embedded line separator + quotes survive the sink
    # (tests/test_general.py:150-169 checks the row count survives)
    payload = "text3 \n with line 'seperator' \n test"
    df = spark.createDataFrame(
        pd.DataFrame({"A": ["text1", "text2", payload]})
    )
    root = str(tmp_path)
    df_to_spark(df, "quote_char", parquet=True, lake_root=root)
    back = ParquetLake(spark, root).read("quote_char")
    assert back.count() == 3
    assert payload in {r.A for r in back.collect()}


def test_nan_and_nat_round_trip_as_null(spark, tmp_path):
    # reference: NaN floats and NaT timestamps land as SQL NULL
    # (tests/test_general.py:173-185 and SURVEY T2)
    pdf = pd.DataFrame(
        {
            "A": [1, 2, 3],
            "B": list("abc"),
            "C": [4.0, 5.0, float("nan")],
            "D": pd.to_datetime(["2020-01-01", "2020-01-02", pd.NaT]),
        }
    )
    root = str(tmp_path)
    report = df_to_spark(pdf, "nan_nat", parquet=True, lake_root=root)
    assert report.rows_written == 3
    back = ParquetLake(spark, root).read("nan_nat").orderBy("A").collect()
    assert back[2].C is None or back[2].C != back[2].C  # NULL or NaN in parquet
    assert back[2].D is None


def test_bigint_promotion_golden(spark):
    # reference golden: A (exceeds int32) → bigint, B stays int
    # (tests/test_general.py:201-220)
    df = spark.createDataFrame(
        pd.DataFrame({"A": [1, 2, -2147483649], "B": [10, 20, 30]})
    )
    ddl = infer_sql_schema(df)
    assert ddl["A"] == "BIGINT"
    assert ddl["B"] == "INT"


def test_dtype_ddl_map_golden(spark):
    # reference golden DDL map (tests/test_general.py:42-133), minus the
    # pandas-only dtypes that normalize to the same Spark types
    pdf = pd.DataFrame(
        {
            "String": list("abc"),
            "Int": [1, 2, 3],
            "Float": [4.52, 5.28, 6.71],
            "Date": pd.date_range("2020-01-01", periods=3, freq="D"),
            "Timedelta": pd.date_range("2020-01-01", periods=3, freq="D")
            - pd.date_range("2019-06-23", periods=3, freq="D"),
            "Bool": [True, False, True],
        }
    )
    from df_to_azure_spark.schema import normalize_for_sink

    df = normalize_for_sink(spark.createDataFrame(pdf))
    ddl = infer_sql_schema(df)
    assert ddl["String"].startswith("VARCHAR(")
    assert ddl["Int"] == "INT"
    assert ddl["Float"] == "NUMERIC(18, 2)"
    assert ddl["Date"] == "DATETIME"
    assert ddl["Timedelta"] == "NUMERIC(18, 2)"  # timedelta → seconds (T1)
    assert ddl["Bool"] == "BIT"


def test_pandas_facade_input(spark, tmp_path):
    # reference's sole input type is a pandas frame (export.py:20-35)
    pdf = pd.DataFrame({"col_a": [1, 3, 4], "col_b": ["x", "y", "z"]})
    root = str(tmp_path)
    report = df_to_spark(pdf, "from_pandas", parquet=True, lake_root=root)
    assert report.rows_written == 3
    back = ParquetLake(spark, root).read("from_pandas")
    assert {tuple(r) for r in back.collect()} == {(1, "x"), (3, "y"), (4, "z")}


def test_pandas_empty_frame_short_circuits(spark):
    report = df_to_spark(pd.DataFrame(), "empty", parquet=True, lake_root="/nonexistent")
    assert report.skipped_empty
    assert report.rows_written == 0


def test_upsert_with_spaces_in_column_names(spark, tmp_path):
    # reference: sample_3 has "col a"/"col b" — identifiers with spaces
    # must survive create + upsert end-to-end (tests/test_upsert.py:135-165)
    root = str(tmp_path)
    df_to_spark(_fixture(spark, "sample_1").toDF("col a", "col b", "col_c"),
                "sample_spaces", parquet=True, lake_root=root)
    df_to_spark(
        _fixture(spark, "sample_3"),
        "sample_spaces",
        parquet=True,
        lake_root=root,
        method="upsert",
        id_field="col a",
    )
    got = _rows(ParquetLake(spark, root).read("sample_spaces"), ["col a"])
    assert got == [
        (1, "updated value", "E"),
        (3, "test", "Z"),
        (4, "test", "A"),
        (5, "new value", "F"),
        (6, "also new", "H"),
    ]


def test_upsert_nan_replaces_value(spark, tmp_path):
    # reference golden: a NaN in the delta REPLACES the existing value on
    # row-level upsert (tests/test_parquet.py:118-157) — NULL is a value,
    # not a "keep the old" marker (that's the cell-level variant)
    root = str(tmp_path)
    df1 = pd.DataFrame(
        {"id": [1, 2, 3], "B": ["AA", "BB", "CC"], "C": ["111", "222", "333"]}
    )
    df2 = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "B": ["AA", "BB", None, "ZZ"],
            "C": ["111", "222", "333", "444"],
        }
    )
    df_to_spark(df1, "upsert_nans", parquet=True, lake_root=root, id_field="id")
    df_to_spark(
        df2, "upsert_nans", parquet=True, lake_root=root, method="upsert", id_field="id"
    )
    got = _rows(ParquetLake(spark, root).read("upsert_nans"), ["id"])
    assert got == [
        (1, "AA", "111"),
        (2, "BB", "222"),
        (3, None, "333"),
        (4, "ZZ", "444"),
    ]
