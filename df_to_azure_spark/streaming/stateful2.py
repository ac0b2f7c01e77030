"""Custom stateful streaming via ``transformWithStateInPandas`` — the
Spark 4 successor to ``applyInPandasWithState`` (typed state handles:
ValueState/ListState/MapState + timers, schema evolution, TTL).

Same operator as ``stateful.running_user_totals`` (per-user running
count/sum), rebuilt on the new API so the engine demonstrates BOTH
stateful surfaces: migrating a processor is exactly this diff — the
tuple-in-GroupState update function becomes a ``StatefulProcessor``
class whose ``init`` declares named typed state.  Correctness contract
is unchanged and re-proven: ``stream_tws_totals_diff`` diffs the final
streamed state against the batch aggregate (empty-set oracle), and the
unit suite drives it over the closed events input.

Scale: state shards by the group key across executors exactly as with
the old API; the new API adds per-state TTL (``ttlDurationMs``) — the
knob that keeps a 100 TB keyspace's state store from growing without
bound when keys go cold.

Runtime gate: the transformWithState worker protocol needs
``google.protobuf``, which this container lacks (and installs are
off-limits) — ``has_tws_runtime()`` probes it, the e2e test skips
without it, and the processor's update logic is contract-tested
protobuf-free against a fake state handle.  On a normal cluster
(protobuf ships with Spark's own requirements) the e2e runs as-is.
That is also why ``stream_tws_totals_diff`` is NOT in the registry:
the registered stateful-streaming correctness gate stays on the
``applyInPandasWithState`` twin, which runs everywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from df_to_azure_spark.streaming.stateful import OUTPUT_SCHEMA


def has_tws_runtime() -> bool:
    """True when the transformWithState Python worker can actually run
    here (its state-server protocol imports ``google.protobuf``)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running (count, sum) in a named ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n BIGINT, total DOUBLE")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        prior = self._totals.get() if self._totals.exists() else (0, 0.0)
        n, total = int(prior[0]), float(prior[1])
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 4)],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Streaming frame → per-user running totals on the
    ``transformWithStateInPandas`` API (update mode, no time semantics —
    totals live forever, like the old NoTimeout)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_running_totals_tws(spark, sf_dir: str) -> DataFrame:
    """Drive the processor over the closed events input; return the
    final state per user (batch-comparable)."""
    from df_to_azure_spark.streaming.events import read_events_stream

    stream = running_user_totals_tws(read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_totals_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM tws_totals_out")
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def stream_tws_totals_diff(spark, sf_dir: str) -> DataFrame:
    """Equivalence gate for the new-API processor: final streamed state
    vs the batch aggregate, mismatches only (same 1e-6 float-accumulation
    tolerance as the applyInPandasWithState twin).  Oracle = empty set."""
    from pyspark.sql import functions as F

    from df_to_azure_spark.sources import load_table

    streamed = run_running_totals_tws(spark, sf_dir).select(
        "user_id",
        F.col("n_events").alias("n_stream"),
        F.col("total_value").alias("total_stream"),
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_batch"),
            F.round(F.sum("value"), 4).alias("total_batch"),
        )
    )
    joined = streamed.join(batch, "user_id", "full_outer")
    return joined.where(
        F.col("n_stream").isNull()
        | F.col("n_batch").isNull()
        | (F.col("n_stream") != F.col("n_batch"))
        | (F.abs(F.col("total_stream") - F.col("total_batch")) > 1e-6)
    )


TWS_TOTALS_DIFF_ORACLE = """
SELECT CAST(NULL AS BIGINT) AS user_id,
       CAST(NULL AS BIGINT) AS n_stream, CAST(NULL AS DOUBLE) AS total_stream,
       CAST(NULL AS BIGINT) AS n_batch, CAST(NULL AS DOUBLE) AS total_batch
WHERE 1 = 0
"""
