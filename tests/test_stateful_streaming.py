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


def test_stateful_sessionize_matches_batch_and_timeouts_fire(spark, sf_smoke):
    """EventTimeTimeout sessionization: (a) every immediately-emitted
    session (all sessions strictly before each user's final one) equals
    the batch gap-sessionizer exactly; (b) the timeout path actually
    fires — some users' FINAL sessions are emitted, and each equals the
    batch final session for that user."""
    from df_to_azure_spark.sources import load_table
    from df_to_azure_spark.streaming.events import sessionize
    from df_to_azure_spark.streaming.stateful import (
        run_sessionize_stream,
        stream_sessionize_diff,
    )

    assert stream_sessionize_diff(spark, sf_smoke).count() == 0

    streamed = run_sessionize_stream(spark, sf_smoke)
    batch = sessionize(load_table(spark, sf_smoke, "events")).select(
        "user_id", "session_start", "session_end", "n_events"
    )
    last = batch.groupBy("user_id").agg(
        F.max("session_end").alias("session_end")
    )
    finals_emitted = streamed.join(last, ["user_id", "session_end"], "left_semi")
    assert finals_emitted.count() > 0  # the timeout callback ran
    # every emitted final session is bit-identical to the batch final
    full_final = batch.join(last, ["user_id", "session_end"], "left_semi")
    assert finals_emitted.exceptAll(full_final).count() == 0
