"""Streaming → lake bridge: the ParquetLake twin of the JDBC foreachBatch
sink, same replay contract (keyed upsert idempotent; keyless append
guarded by the marker-file ledger)."""

from __future__ import annotations

from pyspark.sql import functions as F

from df_to_azure_spark.operators.lake import ParquetLake
from df_to_azure_spark.streaming.events import read_events_stream
from df_to_azure_spark.streaming.sink import make_lake_batch_handler, stream_to_lake


def test_stream_to_lake_appends_with_marker_ledger(spark, sf_smoke, tmp_path):
    """A real streaming query lands the events source in a lake table;
    replaying an applied batch id through the handler is a no-op."""
    lake = ParquetLake(spark, str(tmp_path / "lake"))
    stream = read_events_stream(spark, sf_smoke).select(
        "event_id", "user_id", "event_type"
    )
    q = stream_to_lake(
        stream, lake, "events_landed", checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_src = spark.read.parquet(f"{sf_smoke}/events.parquet").count()
    assert lake.read("events_landed").count() == n_src

    handle = make_lake_batch_handler(lake, "events_landed")
    batch = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .select("event_id", "user_id", "event_type")
        .limit(10)
    )
    handle(batch, 0)  # batch 0 was applied by the stream → marker exists
    assert lake.read("events_landed").count() == n_src
    handle(batch, 999)  # genuinely new batch id → appends
    assert lake.read("events_landed").count() == n_src + 10


def test_stream_to_lake_keyed_upsert_is_idempotent(spark, sf_smoke, tmp_path):
    lake = ParquetLake(spark, str(tmp_path / "lake"))
    handle = make_lake_batch_handler(lake, "events_upserted", id_field="event_id")
    batch = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .select("event_id", "user_id", "event_type")
        .limit(20)
    )
    handle(batch, 0)  # creates
    handle(batch, 0)  # replay: upsert of identical rows — no growth
    assert lake.read("events_upserted").count() == 20

    updated = batch.withColumn("event_type", F.lit("reprocessed"))
    handle(updated, 1)  # keyed update, not append
    out = lake.read("events_upserted")
    assert out.count() == 20
    assert out.where("event_type = 'reprocessed'").count() == 20


def test_lake_handler_skips_empty_batches(spark, sf_smoke, tmp_path):
    lake = ParquetLake(spark, str(tmp_path / "lake"))
    handle = make_lake_batch_handler(lake, "t")
    empty = spark.read.parquet(f"{sf_smoke}/events.parquet").limit(0)
    handle(empty, 0)
    assert not lake.exists("t")


def test_stream_to_versioned_lake_exactly_once(spark, sf_smoke, tmp_path):
    """On a VersionedLake the epoch id commits inside the manifest, so a
    replayed epoch is a strict no-op (no version committed, no rows) and
    every applied epoch leaves an atomic marker — the exactly-once sink."""
    from df_to_azure_spark.operators.manifest import VersionedLake

    lake = VersionedLake(spark, str(tmp_path / "vlake"))
    stream = read_events_stream(spark, sf_smoke).select(
        "event_id", "user_id", "event_type"
    )
    q = stream_to_lake(
        stream, lake, "events_landed", checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_src = spark.read.parquet(f"{sf_smoke}/events.parquet").count()
    assert lake.read("events_landed").count() == n_src
    assert lake.has_batch("events_landed", "epoch-0")

    handle = make_lake_batch_handler(lake, "events_landed")
    batch = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .select("event_id", "user_id", "event_type")
        .limit(10)
    )
    v = lake.current_version("events_landed")
    handle(batch, 0)  # replayed epoch → manifest marker, strict no-op
    assert lake.current_version("events_landed") == v
    assert lake.read("events_landed").count() == n_src
    handle(batch, 999)  # new epoch → one atomic commit with its marker
    assert lake.current_version("events_landed") == v + 1
    assert lake.read("events_landed").count() == n_src + 10
    assert lake.has_batch("events_landed", "epoch-999")
