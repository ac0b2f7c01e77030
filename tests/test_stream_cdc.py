"""Streaming CDC source over the VersionedLake manifest chain
(streaming/cdc_source.py): offsets are manifest versions, partitions
are changed files, reads are executor-side Arrow — and the feed's
contract matches ``read_changes`` exactly (file-granular; append-only
history ⇒ exact row CDC, rewrites surface as delete+insert pairs)."""

from __future__ import annotations

import pytest

from df_to_azure_spark.operators.manifest import VersionedLake
from df_to_azure_spark.streaming.cdc_source import read_changes_stream
from df_to_azure_spark.streaming.sink import stream_to_lake

_SEQ = [0]


def _run_to_memory(stream_df):
    _SEQ[0] += 1
    name = f"cdc_test_{_SEQ[0]}"
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


@pytest.fixture()
def lake(spark, tmp_path):
    return VersionedLake(spark, str(tmp_path / "src"))


def _df(spark, lo, hi, tag="a"):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        "id", F.concat(F.lit(tag), F.col("id").cast("string")).alias("v")
    )


def test_append_only_stream_equals_batch(spark, lake):
    lake.create(_df(spark, 0, 100), "t")
    lake.append(_df(spark, 100, 150), "t")
    lake.append(_df(spark, 150, 160), "t")
    got = _run_to_memory(read_changes_stream(spark, lake.root, "t"))
    assert got.count() == 160
    assert {r._change_type for r in got.select("_change_type").distinct().collect()} == {
        "insert"
    }
    # per-commit attribution is exact
    by_v = {
        r._commit_version: r["count"]
        for r in got.groupBy("_commit_version").count().collect()
    }
    assert by_v == {1: 100, 2: 50, 3: 10}
    a = got.drop("_change_type", "_commit_version")
    b = lake.read("t")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_rewrite_surfaces_delete_insert_pairs(spark, lake):
    lake.create(_df(spark, 0, 50), "t")
    lake.upsert(_df(spark, 0, 5, tag="upd"), "t", ["id"])
    got = _run_to_memory(read_changes_stream(spark, lake.root, "t"))
    v2 = got.where("_commit_version = 2")
    # the rewrite replaced whole files: old rows delete, merged insert
    kinds = {
        r._change_type: r["count"]
        for r in v2.groupBy("_change_type").count().collect()
    }
    assert kinds["delete"] == 50 and kinds["insert"] == 50
    upd = v2.where("_change_type = 'insert' AND id < 5")
    assert {r.v for r in upd.collect()} == {f"upd{i}" for i in range(5)}


def test_starting_version_skips_snapshot(spark, lake):
    lake.create(_df(spark, 0, 100), "t")
    lake.append(_df(spark, 100, 120), "t")
    got = _run_to_memory(
        read_changes_stream(spark, lake.root, "t", starting_version=1)
    )
    assert sorted(r.id for r in got.collect()) == list(range(100, 120))


def test_hive_partitioned_table_streams_partition_columns(spark, lake):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "NL"), (2, "DE"), (3, None)], "id bigint, country string"
    )
    lake.create(df, "t", partition_by=["country"])
    got = _run_to_memory(read_changes_stream(spark, lake.root, "t"))
    rows = {(r.id, r.country) for r in got.collect()}
    assert rows == {(1, "NL"), (2, "DE"), (3, None)}


def test_exactly_once_mirror_with_restart(spark, lake, tmp_path):
    """The loop the source exists for: lake → CDC stream → exactly-once
    lake sink; a restart from the checkpoint replays nothing and picks
    up exactly the new commits."""
    lake.create(_df(spark, 0, 100), "t")
    lake.append(_df(spark, 100, 130), "t")
    mirror = VersionedLake(spark, str(tmp_path / "mirror"))
    ckpt = str(tmp_path / "ckpt")

    def _run():
        feed = (
            read_changes_stream(spark, lake.root, "t")
            .where("_change_type = 'insert'")
            .drop("_change_type", "_commit_version")
        )
        q = stream_to_lake(feed, mirror, "m", checkpoint_dir=ckpt)
        q.processAllAvailable()
        q.stop()

    _run()
    assert mirror.read("m").count() == 130
    # restart with nothing new: no duplicates
    _run()
    assert mirror.read("m").count() == 130
    # new commit, restart: only the increment lands
    lake.append(_df(spark, 130, 140), "t")
    _run()
    a, b = lake.read("t"), mirror.read("m")
    assert b.count() == 140
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_vacuumed_manifest_fails_loudly(spark, lake):
    import time

    lake.create(_df(spark, 0, 10), "t")
    for i in range(25):  # past the checkpoint interval so v1 is droppable
        lake.append(_df(spark, 10 + i, 11 + i), "t")
    lake.vacuum("t", keep_last=1, older_than_ms=0)
    stream = read_changes_stream(spark, lake.root, "t", starting_version=0)
    _SEQ[0] += 1
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(f"cdc_vac_{_SEQ[0]}")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="vacuum|retention|gone"):
        try:
            q.awaitTermination()
        finally:
            q.stop()


def test_stream_resumes_from_sidecar_only_root(spark, lake):
    """After a vacuum the oldest retained root may be a columnar
    checkpoint sidecar (no full JSON anywhere) — a stream starting at
    that version must still resolve deltas from it."""
    lake.checkpoint_interval = 5
    lake.create(_df(spark, 0, 10), "t")
    for i in range(9):  # v2..v10; v5 and v10 are sidecar checkpoints
        lake.append(_df(spark, 10 + i, 11 + i), "t")
    lake.vacuum("t", keep_last=1, older_than_ms=0)
    assert min(lake.versions("t")) == 10
    got = _run_to_memory(
        read_changes_stream(spark, lake.root, "t", starting_version=10)
    )
    assert got.count() == 0  # nothing after v10 yet
    lake.append(_df(spark, 100, 105), "t")  # v11
    got = _run_to_memory(
        read_changes_stream(spark, lake.root, "t", starting_version=10)
    )
    assert sorted(r.id for r in got.collect()) == list(range(100, 105))
    # a rewrite right after the sidecar root: delete side must resolve
    # the pre-rewrite file list THROUGH the sidecar
    lake.upsert(_df(spark, 0, 3, tag="u"), "t", ["id"])
    got = _run_to_memory(
        read_changes_stream(spark, lake.root, "t", starting_version=11)
    )
    n_live = lake.read("t").count()
    ins = got.where("_change_type = 'insert'")
    assert ins.count() == n_live  # full rewrite restages everything
    a = ins.drop("_change_type", "_commit_version")
    b = lake.read("t")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_schema_has_meta_columns(spark, lake):
    lake.create(_df(spark, 0, 5), "t")
    stream = read_changes_stream(spark, lake.root, "t")
    names = [f.name for f in stream.schema.fields]
    assert names == ["id", "v", "_change_type", "_commit_version"]
    assert stream.isStreaming


def test_planner_memo_is_bounded(spark, lake):
    """Round-13 advisor: the reader's resolved-file-list memo must not
    grow one O(table) entry per full-manifest version crossed — a
    long-running stream over a large table would otherwise grow driver
    memory without bound.  After planning, only versions >= the batch
    end may remain memoized, and repeated planning stays correct."""
    from df_to_azure_spark.streaming.cdc_source import (
        LakeCdcDataSource,
        LakeCdcStreamReader,
    )

    lake.checkpoint_interval = 2  # json-mode full manifests need resolves
    lake.checkpoint_format = "json"
    lake.create(_df(spark, 0, 10), "t")
    for i in range(1, 7):
        lake.append(_df(spark, 10 * i, 10 * i + 10), "t")
    src = LakeCdcDataSource(
        options={"root": lake.root, "table": "t", "starting_version": "0"}
    )
    reader = LakeCdcStreamReader(src.options, src.schema())
    parts_all = reader.partitions({"version": 0}, {"version": 7})
    assert all(k >= 7 for k in reader._memo)
    # planning the same range again (a restart replay) is unaffected
    reader2 = LakeCdcStreamReader(src.options, src.schema())
    chunks = []
    for s, e in [(0, 3), (3, 5), (5, 7)]:
        chunks += reader2.partitions({"version": s}, {"version": e})
        assert all(k >= e for k in reader2._memo)
    key = lambda p: p.value  # noqa: E731
    assert sorted(map(key, parts_all)) == sorted(map(key, chunks))
