"""Streaming → SQL sink bridge: land a structured stream in a JDBC table
through ``foreachBatch``, with replay-safe batch handling.

Spark's JDBC writer has no native streaming sink; the standard pattern is
``foreachBatch``, which hands each micro-batch to the batch writer.  On
failure/restart Spark MAY re-deliver the last uncommitted batch (the
checkpoint records progress after the handler returns), so a plain append
would double-write.  Exactly-once lands here as idempotence, two ways:

- ``id_field`` given → each batch is applied as a keyed staged-MERGE
  upsert, idempotent under replay by construction (re-merging the same
  rows is a no-op);
- no keys → batches APPEND, guarded by a ``<table>_batches`` ledger that
  records every applied ``batch_id``; a re-delivered batch is recognized
  and skipped.  The ledger insert runs after the data append, so the
  keyed path is the strict one — the ledger path is at-least-once with a
  one-batch replay window on crash between append and ledger insert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def make_batch_handler(
    sink,
    table: str,
    schema: str = "dbo",
    id_field: list[str] | str | None = None,
):
    """The ``foreachBatch`` handler, exposed for direct testing (replay
    semantics are exercised by invoking it twice with one batch_id)."""
    from df_to_azure_spark.operators import merge as merge_mod

    ledger = f"{table}_batches"
    keys = [id_field] if isinstance(id_field, str) else list(id_field or [])

    def _exec(sql: str) -> None:
        merge_mod.execute_statement(sink.spark, sink.url, sink.properties, sql)

    def _table_exists(name: str) -> bool:
        try:
            (
                sink.spark.read.format("jdbc")
                .option("url", sink.url)
                .options(**sink.properties)
                .option("dbtable", f"{schema}.{name}")
                .load()
                .limit(1)
                .count()
            )
            return True
        except Exception:
            return False

    def _ledger_has(batch_id: int) -> bool:
        try:
            rows = (
                sink.spark.read.format("jdbc")
                .option("url", sink.url)
                .options(**sink.properties)
                .option("dbtable", f"{schema}.{ledger}")
                .load()
                .where(f"batch_id = {int(batch_id)}")
                .limit(1)
                .count()
            )
            return rows > 0
        except Exception:
            return False  # ledger not created yet

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if keys:
            # first batch creates the table (typed DDL), later ones MERGE
            method = "upsert" if _table_exists(table) else "create"
            sink.write(batch_df, table, schema=schema, method=method, id_field=keys)
            return
        if _ledger_has(batch_id):
            return  # replayed batch — already applied
        method = "append" if _table_exists(table) else "create"
        sink.write(batch_df, table, schema=schema, method=method)
        if not _table_exists(ledger):
            _exec(f"CREATE TABLE {schema}.{ledger} (batch_id BIGINT)")
        _exec(
            f"INSERT INTO {schema}.{ledger} (batch_id) VALUES ({int(batch_id)})"
        )

    return handle


def stream_to_sql(
    stream_df: DataFrame,
    sink,
    table: str,
    schema: str = "dbo",
    checkpoint_dir: str | None = None,
    id_field: list[str] | str | None = None,
):
    """Start a ``StreamingQuery`` landing ``stream_df`` into
    ``schema.table`` through ``sink`` (a configured ``SqlSink``)."""
    handle = make_batch_handler(sink, table, schema=schema, id_field=id_field)
    writer = stream_df.writeStream.foreachBatch(handle).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
