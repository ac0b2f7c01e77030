"""Streaming semantics: the stream twin must equal the batch twin on a
closed input, driven end-to-end through a real streaming query."""

from __future__ import annotations

from df_to_azure_spark.sources import load_table
from df_to_azure_spark.streaming import events as SE


def test_stream_equals_batch_on_closed_input(spark, sf_smoke):
    stream_in = SE.read_events_stream(spark, sf_smoke)
    assert stream_in.isStreaming
    streamed = SE.run_stream_to_memory(
        SE.windowed_counts_stream(stream_in), "t_windowed"
    )
    batch = SE.windowed_counts_batch(load_table(spark, sf_smoke, "events"))
    s = sorted(tuple(r) for r in streamed.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert s == b
    assert len(s) > 0


def test_sessionize_gap_semantics(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 100, base),
        (1, 101, base + dt.timedelta(minutes=10)),   # same session
        (1, 102, base + dt.timedelta(minutes=50)),   # 40min gap → new session
        (2, 200, base),                              # other user
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    out = {(r.user_id, r.session_seq): r.n_events for r in SE.sessionize(df, 30).collect()}
    assert out == {(1, 0): 2, (1, 1): 1, (2, 0): 1}


def test_stream_dedup_collapses_redelivery(spark, sf_smoke):
    """A doubled input stream deduped within the watermark must match the
    batch distinct set exactly."""
    from df_to_azure_spark.streaming.events import stream_dedup_diff

    assert stream_dedup_diff(spark, sf_smoke).count() == 0


def test_stream_stream_interval_join_equals_batch(spark, sf_smoke):
    """The watermarked stream-stream interval join must equal the plain
    batch interval self-join on a closed input, and the closed input must
    actually produce attributed pairs (a vacuous empty-vs-empty pass
    would prove nothing)."""
    from df_to_azure_spark.streaming.events import (
        attribution_join_batch,
        stream_attribution_diff,
    )

    assert stream_attribution_diff(spark, sf_smoke).count() == 0
    batch = attribution_join_batch(load_table(spark, sf_smoke, "events"))
    assert batch.count() > 0


def test_attribution_join_window_semantics(spark):
    """Purchases outside the horizon or by another user never attribute."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 1, "view", base),
        (2, 1, "purchase", base + dt.timedelta(minutes=10)),   # attributed
        (3, 1, "purchase", base + dt.timedelta(minutes=40)),   # outside 30m
        (4, 2, "purchase", base + dt.timedelta(minutes=5)),    # other user
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = SE.attribution_join_batch(df, "30 minutes").collect()
    assert [(r.view_event_id, r.purchase_event_id) for r in out] == [(1, 2)]


def test_stream_left_outer_interval_join_equals_batch_on_released_region(
    spark, sf_smoke
):
    """LEFT OUTER stream-stream interval join: all matched rows plus the
    watermark-released null prefix must equal the batch twin exactly —
    and the input must actually produce BOTH matched and null-attributed
    views (an empty-vs-empty pass would prove nothing about the outer
    semantics)."""
    from pyspark.sql import functions as F

    from df_to_azure_spark.streaming.events import (
        attribution_left_join_batch,
        stream_attribution_outer_diff,
    )

    assert stream_attribution_outer_diff(spark, sf_smoke).count() == 0
    batch = attribution_left_join_batch(load_table(spark, sf_smoke, "events"))
    assert batch.where(F.col("purchase_event_id").isNotNull()).count() > 0
    assert batch.where(F.col("purchase_event_id").isNull()).count() > 0


def test_stream_full_outer_interval_join_equals_batch_on_released_region(
    spark, sf_smoke
):
    """FULL OUTER stream-stream interval join: matches plus BOTH
    watermark-released null prefixes must equal the batch twin — and the
    input must actually exercise all three row classes (matched,
    view-only, purchase-only), or the pass proves nothing."""
    from pyspark.sql import functions as F

    from df_to_azure_spark.streaming.events import (
        attribution_full_join_batch,
        stream_attribution_full_diff,
    )

    assert stream_attribution_full_diff(spark, sf_smoke).count() == 0
    batch = attribution_full_join_batch(load_table(spark, sf_smoke, "events"))
    assert batch.where(F.col("purchase_event_id").isNotNull()
                       & F.col("view_event_id").isNotNull()).count() > 0
    assert batch.where(F.col("purchase_event_id").isNull()).count() > 0
    assert batch.where(F.col("view_event_id").isNull()).count() > 0


def test_stream_static_join_equals_batch(spark, sf_smoke):
    """Stream-static broadcast join + windowed agg must equal the batch
    twin exactly; the input must actually produce multiple segments."""
    from df_to_azure_spark.streaming.events import (
        segment_revenue_batch,
        stream_static_join_diff,
    )

    assert stream_static_join_diff(spark, sf_smoke).count() == 0
    batch = segment_revenue_batch(
        load_table(spark, sf_smoke, "events"),
        load_table(spark, sf_smoke, "customer"),
    )
    assert batch.select("segment").distinct().count() > 1


def test_stream_sliding_and_builtin_session_equal_batch(spark, sf_smoke):
    """Sliding (hopping) windows and the built-in session window must
    match their batch twins; the inputs must actually produce overlap
    (more sliding rows than tumbling) and multi-event sessions."""
    from pyspark.sql import functions as F

    from df_to_azure_spark.streaming.events import (
        builtin_session_batch,
        sliding_counts_batch,
        stream_builtin_session_diff,
        stream_sliding_counts_diff,
        windowed_counts_batch,
    )

    assert stream_sliding_counts_diff(spark, sf_smoke).count() == 0
    assert stream_builtin_session_diff(spark, sf_smoke).count() == 0
    ev = load_table(spark, sf_smoke, "events")
    assert sliding_counts_batch(ev).count() > windowed_counts_batch(ev).count()
    assert builtin_session_batch(ev).where(F.col("n_events") > 1).count() > 0


def test_stream_right_outer_interval_join_equals_batch_on_released_region(
    spark, sf_smoke
):
    """RIGHT OUTER stream-stream interval join: all matched rows plus
    the watermark-released null-view prefix must equal the batch twin —
    and the input must actually produce BOTH attributed and organic
    (view-less) purchases, or the pass proves nothing about the outer
    semantics."""
    from pyspark.sql import functions as F

    from df_to_azure_spark.streaming.events import (
        attribution_right_join_batch,
        stream_attribution_right_diff,
    )

    assert stream_attribution_right_diff(spark, sf_smoke).count() == 0
    batch = attribution_right_join_batch(load_table(spark, sf_smoke, "events"))
    assert batch.where(F.col("view_event_id").isNotNull()).count() > 0
    assert batch.where(F.col("view_event_id").isNull()).count() > 0


def test_stream_static_binned_interval_join_equals_batch(spark, sf_smoke):
    """The binned range join (operators/intervaljoin.py) lowers to a
    stateless equi-join + filter, so the SAME operator code must produce
    identical pair sets driven by a real purchase stream against static
    session intervals and by the batch twin."""
    from df_to_azure_spark.streaming.events import stream_interval_join_diff

    assert stream_interval_join_diff(spark, sf_smoke).count() == 0
