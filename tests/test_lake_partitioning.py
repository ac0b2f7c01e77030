"""Partitioned lake tables: hive layout on disk, partition pruning in
the plan — the property that makes selective reads cheap at scale."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from df_to_azure_spark.operators.lake import ParquetLake


def _docs(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/documents.parquet")


def test_partitioned_create_layout_and_round_trip(spark, sf_smoke, tmp_path):
    lake = ParquetLake(spark, str(tmp_path))
    docs = _docs(spark, sf_smoke)
    lake.write(docs, "docs", partition_by="lang")
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    on_disk = {
        p.name.split("=", 1)[1]
        for p in Path(lake.data_dir("docs")).iterdir()
        if p.name.startswith("lang=")
    }
    assert on_disk == langs
    back = lake.read("docs")
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)


def test_partition_filter_prunes_at_plan_time(spark, sf_smoke, tmp_path):
    lake = ParquetLake(spark, str(tmp_path))
    lake.write(_docs(spark, sf_smoke), "docs", partition_by="lang")
    df = lake.read("docs").where(F.col("lang") == "en")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the lang predicate must land in PartitionFilters (directory pruning),
    # not PushedFilters (row-group filtering inside every file)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "lang" in pf[0], plan


def test_partitioned_append_adds_new_partition(spark, sf_smoke, tmp_path):
    lake = ParquetLake(spark, str(tmp_path))
    docs = _docs(spark, sf_smoke)
    lake.write(docs, "docs", partition_by="lang")
    extra = docs.limit(5).withColumn("lang", F.lit("zz"))
    lake.write(extra, "docs", method="append", partition_by="lang")
    back = lake.read("docs")
    assert back.where("lang = 'zz'").count() == 5
    assert back.count() == docs.count() + 5


def test_partitioned_upsert_rewrites_only_touched_partitions(spark, sf_smoke, tmp_path):
    import os

    lake = ParquetLake(spark, str(tmp_path))
    docs = _docs(spark, sf_smoke)
    lake.write(docs, "docs", partition_by="lang")

    # snapshot the untouched partitions' file mtimes
    langs = sorted(
        p for p in os.listdir(lake.data_dir("docs")) if p.startswith("lang=")
    )
    target_lang = langs[0].split("=", 1)[1]
    untouched_dirs = [
        f"{lake.data_dir('docs')}/{p}" for p in langs[1:]
    ]
    before = {
        d: sorted(os.listdir(d)) for d in untouched_dirs
    }

    delta = (
        docs.where(F.col("lang") == target_lang)
        .limit(10)
        .withColumn("source", F.lit("UPDATED"))
    )
    n = lake.upsert_partitioned(delta, "docs", ["doc_id"], "lang")
    assert n == 1

    back = lake.read("docs")
    assert back.count() == docs.count()
    assert back.where("source = 'UPDATED'").count() == 10
    # untouched partition directories are bit-identical (same part files)
    after = {d: sorted(os.listdir(d)) for d in untouched_dirs}
    assert before == after


def test_partitioned_upsert_rejects_partition_moves(spark, sf_smoke, tmp_path):
    import pytest

    from df_to_azure_spark.exceptions import PipelineRunError

    lake = ParquetLake(spark, str(tmp_path))
    docs = _docs(spark, sf_smoke)
    lake.write(docs, "docs", partition_by="lang")
    langs = sorted(r.lang for r in docs.select("lang").distinct().collect())
    # take a doc from langs[1] and claim it now belongs to langs[0]
    delta = (
        docs.where(F.col("lang") == langs[1])
        .limit(1)
        .withColumn("lang", F.lit(langs[0]))
    )
    with pytest.raises(PipelineRunError, match="moves key"):
        lake.upsert_partitioned(delta, "docs", ["doc_id"], "lang")


def test_compact_preserves_partition_layout(spark, sf_smoke, tmp_path):
    import os

    lake = ParquetLake(spark, str(tmp_path))
    docs = _docs(spark, sf_smoke)
    lake.write(docs, "docs", partition_by="lang")
    for _ in range(2):
        lake.write(docs.limit(3), "docs", method="append", partition_by="lang")
    before = lake.compact("docs", target_files=2)
    assert before > 0
    # hive layout survives the compaction
    dirs = [p for p in os.listdir(lake.data_dir("docs")) if p.startswith("lang=")]
    assert dirs, "compaction flattened the partitioned layout"
    assert lake.partition_columns("docs") == ["lang"]
    assert lake.read("docs").count() == docs.count() + 6
    # pruning still works after compaction
    df = lake.read("docs").where(F.col("lang") == "en")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "lang" in pf[0]


def test_plain_upsert_preserves_partition_layout(spark, sf_smoke, tmp_path):
    import os

    lake = ParquetLake(spark, str(tmp_path))
    docs = _docs(spark, sf_smoke)
    lake.write(docs, "docs", partition_by="lang")
    delta = docs.limit(5)
    # full upsert WITHOUT restating partition_by: layout auto-detected
    lake.write(delta, "docs", method="upsert", id_field="doc_id")
    dirs = [p for p in os.listdir(lake.data_dir("docs")) if p.startswith("lang=")]
    assert dirs, "plain upsert flattened the partitioned layout"
    assert lake.read("docs").count() == docs.count()


def test_partitioned_upsert_null_partition_value(spark, tmp_path):
    lake = ParquetLake(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, None, 2.0), (3, None, 3.0), (4, "b", 4.0)],
        "id long, grp string, v double",
    )
    lake.write(base, "t", partition_by="grp")
    # delta touches ONLY the NULL partition, updating id=2
    delta = spark.createDataFrame([(2, None, 99.0)], "id long, grp string, v double")
    n = lake.upsert_partitioned(delta, "t", ["id"], "grp")
    assert n == 1
    back = {r.id: (r.grp, r.v) for r in lake.read("t").collect()}
    # id=3 lives in the NULL partition too and MUST survive
    assert back == {1: ("a", 1.0), 2: (None, 99.0), 3: (None, 3.0), 4: ("b", 4.0)}


def test_sorted_create_produces_disjoint_rowgroup_stats(spark, tmp_path):
    """sort_by clustering: parquet footer min/max ranges per file must be
    narrow and non-overlapping, which is what enables row-group skipping
    for selective filters on the sort column."""
    import pyarrow.parquet as pq

    lake = ParquetLake(spark, str(tmp_path))
    df = spark.range(10_000).selectExpr(
        "pmod(hash(id), 10000) AS k", "id AS v"
    )
    lake.create(df, "t", sort_by=["k"], sort_files=4)
    files = sorted(Path(lake.data_dir("t")).glob("part-*.parquet"))
    assert len(files) > 1, "need several files to check disjointness"
    ranges = []
    for f in files:
        md = pq.ParquetFile(str(f)).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # k is the first column
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: {(lo1, hi1)} vs {(lo2, hi2)}"
