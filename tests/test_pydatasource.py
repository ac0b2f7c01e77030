"""Custom Python DataSource (Spark 4 API): partitioned read, filter
pushdown, and exact generator replay."""

from __future__ import annotations

import duckdb

from df_to_azure_spark.sources import pydatasource as PDS


def _load(spark, parts=3, rows=200):
    PDS.register(spark)
    return (
        spark.read.format("synthlogs")
        .option("partitions", str(parts))
        .option("rows_per_partition", str(rows))
        .load()
    )


def test_synthlogs_partitioned_read_and_schema(spark):
    df = _load(spark)
    assert df.count() == 600
    assert df.rdd.getNumPartitions() == 3
    assert [f.name for f in df.schema.fields] == [
        "log_id",
        "user_id",
        "status",
        "n_bytes",
    ]


def test_synthlogs_matches_duckdb_replay(spark):
    got = _load(spark).toPandas().sort_values("log_id").reset_index(drop=True)
    exp = (
        duckdb.sql(PDS.synthlogs_oracle_sql(3, 200))
        .df()
        .sort_values("log_id")
        .reset_index(drop=True)
    )
    for c in got.columns:
        assert (got[c].astype("int64") == exp[c].astype("int64")).all(), c


def test_synthlogs_status_pushdown(spark):
    df = _load(spark).where("status = 404")
    # semantics: pushdown must not change results
    brute = [r.log_id for r in _load(spark).collect() if r.status == 404]
    assert sorted(r.log_id for r in df.collect()) == sorted(brute)
    # the source-side skip really engaged: rows other than 404 never
    # leave the reader (observable through the RDD row count)
    assert df.count() == len(brute)


def test_synthlogs_row_function_is_pure():
    assert PDS._row(42) == PDS._row(42)
    log_id, user_id, status, n_bytes = PDS._row(7)
    assert status in PDS._STATUSES
    assert 0 <= n_bytes < 100_000
    assert 0 <= user_id < PDS._USER_MOD


def test_synthlogs_stream_accumulates_to_batch_table(spark, tmp_path):
    """Streaming twin: run the unbounded synthlogs stream for a few
    micro-batches into a memory-backed accumulator and check the rows
    are EXACTLY the batch generator's prefix — the same
    stream-equals-batch oracle pattern as the events stream twins, here
    proving the custom connector's offset/replay contract."""
    PDS.register(spark)
    stream = (
        spark.readStream.format("synthlogs")
        .option("rows_per_batch", "150")
        .option("max_rows", "450")
        .load()
    )
    got = []

    def sink(df, _bid):
        got.extend(df.collect())

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    import time

    deadline = time.time() + 120
    while len(got) < 450 and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    rows = sorted((r.log_id, r.user_id, r.status, r.n_bytes) for r in got)
    assert rows == [PDS._row(i) for i in range(450)]


def test_jsonldir_writer_round_trip_and_success_marker(spark, tmp_path):
    """Write through the custom Python DataSource sink, read the files
    back: exact row parity, one part file per task, _SUCCESS marker
    carries the committed row count."""
    import json
    import os

    from df_to_azure_spark.sources.pydatasource import register

    register(spark)
    df = spark.range(0, 100, 1, 4).selectExpr(
        "id AS log_id", "id % 7 AS user_id"
    )
    out = str(tmp_path / "sink")
    df.write.format("jsonldir").option("path", out).mode("append").save()

    parts = sorted(n for n in os.listdir(out) if n.startswith("part-"))
    assert len(parts) == 4
    rows = []
    for name in parts:
        with open(os.path.join(out, name)) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(r["log_id"] for r in rows) == list(range(100))
    assert all(r["user_id"] == r["log_id"] % 7 for r in rows)
    with open(os.path.join(out, "_SUCCESS")) as fh:
        assert fh.read().strip() == "rows=100"
    # no staged temps survive a committed job
    assert not [n for n in os.listdir(out) if n.startswith(".staged-")]


def test_jsonldir_writer_overwrite_replaces_previous_generation(
    spark, tmp_path
):
    import os

    from df_to_azure_spark.sources.pydatasource import register

    register(spark)
    out = str(tmp_path / "sink")
    spark.range(0, 50, 1, 4).selectExpr("id AS log_id").write.format(
        "jsonldir"
    ).option("path", out).mode("append").save()
    spark.range(0, 10, 1, 2).selectExpr("id AS log_id").write.format(
        "jsonldir"
    ).option("path", out).mode("overwrite").save()
    parts = [n for n in os.listdir(out) if n.startswith("part-")]
    assert len(parts) == 2  # the 4 old part files are gone
    with open(os.path.join(out, "_SUCCESS")) as fh:
        assert fh.read().strip() == "rows=10"


def test_jsonldir_writer_abort_leaves_nothing_visible(spark, tmp_path):
    """A failing task aborts the job: no part files and no _SUCCESS ever
    become visible, and a SUBSEQUENT successful write commits cleanly on
    top of whatever the aborted job left behind.

    Deliberately NOT asserted: zero ``.staged-`` temps.  Tasks that were
    still running when the failing task killed the job never deliver a
    commit message, so ``abort()`` cannot know their temp names — a
    dot-invisible temp leaking from a killed in-flight task is inherent
    to every stage-then-commit protocol on a store without directory
    transactions (cloud commit protocols sweep them with a janitor).
    Whether any leak here is pure task-timing, which is why the original
    zero-temps assertion flaked under load."""
    import os

    import pytest

    from df_to_azure_spark.sources.pydatasource import register

    register(spark)
    out = str(tmp_path / "sink")
    with pytest.raises(Exception):
        spark.range(0, 100, 1, 4).selectExpr("id AS log_id").write.format(
            "jsonldir"
        ).option("path", out).option("fail_partition", "2").mode(
            "append"
        ).save()
    leftover = os.listdir(out) if os.path.exists(out) else []
    assert not [n for n in leftover if n.startswith("part-")]
    assert "_SUCCESS" not in leftover
    # recovery: a clean retry commits and exposes exactly its own rows
    spark.range(0, 10, 1, 2).selectExpr("id AS log_id").write.format(
        "jsonldir"
    ).option("path", out).mode("overwrite").save()
    parts = [n for n in os.listdir(out) if n.startswith("part-")]
    assert len(parts) == 2
    with open(os.path.join(out, "_SUCCESS")) as fh:
        assert fh.read().strip() == "rows=10"
