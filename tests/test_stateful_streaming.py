"""Custom stateful streaming operator: final state must equal the batch
aggregate over the same closed input."""

from __future__ import annotations

from pyspark.sql import functions as F

from df_to_azure_spark.sources import load_table
from df_to_azure_spark.streaming.stateful import run_running_totals


def test_stateful_totals_match_batch(spark, sf_smoke):
    streamed = {
        r.user_id: (r.n_events, r.total_value)
        for r in run_running_totals(spark, sf_smoke).collect()
    }
    batch = {
        r.user_id: (r.n, round(r.total, 4))
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(streamed) == set(batch)
    for uid, (n, total) in batch.items():
        sn, st = streamed[uid]
        assert sn == n, uid
        assert abs(st - total) < 1e-6, uid
