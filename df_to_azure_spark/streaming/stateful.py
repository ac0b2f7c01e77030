"""Custom stateful streaming operator via ``applyInPandasWithState``.

``running_user_totals``: per-user running (count, sum, max_ts) maintained
in explicit group state across micro-batches — the canonical shape for
custom stateful logic Spark's built-in aggregations can't express (the
state here is trivial on purpose; swap the update function for
session-carts, fraud counters, model features...).

State is partitioned by the group key, so a 100 TB stream shards its
state across executors; the state store bounds memory per key, and
``GroupStateTimeout`` would evict idle keys (not used here — totals are
meant to live forever).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming frame → per-user running totals, one updated row per user
    per micro-batch (update output mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_running_totals(spark, sf_dir: str) -> DataFrame:
    """Drive the stateful query over the closed events input and return
    the LAST state per user (batch-comparable)."""
    from df_to_azure_spark.streaming.events import read_events_stream

    stream = running_user_totals(read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM running_totals_out")
    # update mode appends a row per (user, batch); keep the final one
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def stream_vs_batch_totals_diff(spark, sf_dir: str) -> DataFrame:
    """Hard equivalence check for the custom stateful operator: join the
    final streamed state per user against the batch aggregate and keep
    only mismatches (count differs, or totals diverge beyond float-
    accumulation tolerance — the stateful path sums micro-batch partials
    in pandas, the batch path in the JVM, so bit-equality on doubles is
    not the contract; 1e-6 is).  Oracle = empty set."""
    from pyspark.sql import functions as F

    from df_to_azure_spark.sources import load_table

    streamed = run_running_totals(spark, sf_dir).select(
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


TOTALS_DIFF_ORACLE = """
SELECT CAST(NULL AS BIGINT) AS user_id,
       CAST(NULL AS BIGINT) AS n_stream, CAST(NULL AS DOUBLE) AS total_stream,
       CAST(NULL AS BIGINT) AS n_batch, CAST(NULL AS DOUBLE) AS total_batch
WHERE 1 = 0
"""
