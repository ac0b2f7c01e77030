"""Z-order clustering quality: per-file footer ranges must be narrow on
BOTH clustered columns simultaneously (single-column sort can't do
that), which is what makes multi-column min/max skipping work."""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq

from df_to_azure_spark.operators.lake import ParquetLake
from df_to_azure_spark.operators.zorder import column_minmax, zorder_layout


def _file_ranges(data_dir: str, col_index: int):
    out = []
    for f in sorted(Path(data_dir).glob("part-*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_index).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def test_zorder_narrows_both_columns(spark, tmp_path):
    df = spark.range(40_000).selectExpr(
        "pmod(hash(id), 1000) AS x", "pmod(hash(id * 7 + 1), 1000) AS y"
    )
    lake = ParquetLake(spark, str(tmp_path))
    lake.create(zorder_layout(df, ["x", "y"], bits=10, num_files=16), "t")

    n_files = len(list(Path(lake.data_dir("t")).glob("part-*.parquet")))
    assert n_files >= 8
    # average covered AREA per file must be far below the full domain —
    # the signature of 2-D clustering (a 1-col sort gives ~1/n on one
    # axis but FULL width on the other, area ≈ domain/n at best with
    # 1e6/16 = 62500; z-order should be clearly tighter per axis)
    xr = _file_ranges(lake.data_dir("t"), 0)
    yr = _file_ranges(lake.data_dir("t"), 1)
    avg_x = sum(hi - lo for lo, hi in xr) / n_files
    avg_y = sum(hi - lo for lo, hi in yr) / n_files
    # each axis range must be materially below full width (1000): with 16
    # Z-tiles a perfect split gives 250 per axis; allow slack for hash
    # irregularity
    assert avg_x < 600, (avg_x, xr)
    assert avg_y < 600, (avg_y, yr)


def test_zorder_preserves_rows(spark, tmp_path):
    df = spark.range(5_000).selectExpr("id", "pmod(hash(id), 97) AS x", "id % 13 AS y")
    out = zorder_layout(df, ["x", "y"], bits=8, num_files=4)
    assert out.count() == 5_000
    assert set(out.columns) == {"id", "x", "y"}
    # same multiset of rows, just re-laid-out
    assert out.exceptAll(df).count() == 0 and df.exceptAll(out).count() == 0


def test_column_minmax_single_job(spark):
    df = spark.range(100).selectExpr("id AS a", "id * 2 AS b")
    stats = column_minmax(df, ["a", "b"])
    assert stats == {"a": (0.0, 99.0), "b": (0.0, 198.0)}


def test_zorder_guards(spark):
    import pytest

    from df_to_azure_spark.operators.zorder import zorder_key

    df = spark.range(10).selectExpr("id AS a", "CAST(id AS STRING) AS s")
    with pytest.raises(ValueError, match="exceeds 63"):
        zorder_key(["a", "b", "c", "d"], {c: (0.0, 1.0) for c in "abcd"}, bits=16)
    with pytest.raises(ValueError, match="non-numeric"):
        column_minmax(df, ["s"])
    empty = spark.range(10).selectExpr("CAST(NULL AS DOUBLE) AS a")
    with pytest.raises(ValueError, match="no non-NULL"):
        column_minmax(empty, ["a"])
    clash = spark.range(10).selectExpr("id AS x", "id AS __zkey")
    with pytest.raises(ValueError, match="__zkey"):
        zorder_layout(clash, ["x"], bits=8)


def test_file_skipping_profile_and_effectiveness(spark, sf_smoke, tmp_path):
    from df_to_azure_spark.operators.zorder import (
        file_skipping_profile,
        skipping_effectiveness,
    )

    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    scattered = str(tmp_path / "scattered")
    clustered = str(tmp_path / "clustered")
    # scattered: round-robin layout — every file sees the full custkey range
    orders.repartition(8).write.parquet(scattered)
    zorder_layout(orders, ["o_custkey"], num_files=8).write.parquet(clustered)

    lo, hi = 10, 40  # narrow custkey band
    prof_s = file_skipping_profile(spark, scattered, ["o_custkey"])
    prof_c = file_skipping_profile(spark, clustered, ["o_custkey"])
    # the profile is one bounded row per data file with both range ends
    row = prof_c.limit(1).collect()[0]
    assert row.n_rows > 0 and row.o_custkey_min <= row.o_custkey_max

    eff_s = skipping_effectiveness(prof_s, "o_custkey", lo, hi).collect()[0]
    eff_c = skipping_effectiveness(prof_c, "o_custkey", lo, hi).collect()[0]
    assert eff_s.n_files == 8 and eff_c.n_files == 8
    # round-robin layout: every file overlaps the band -> nothing skips;
    # range-clustered layout: the band lives in few files -> most skip
    assert eff_s.n_skipped == 0
    assert eff_c.n_skipped >= 4
    assert eff_c.row_skip_ratio > 0.5
