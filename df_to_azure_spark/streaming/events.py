"""Streaming operators over the events table: windowed aggregation with
watermarks, and batch-equivalent forms for oracle checking.

Pattern: every streaming query here has a batch twin with identical
semantics on a closed input — the stream is driven with
``availableNow``/``processAllAvailable`` in tests and its output compared
to the batch twin, which in turn is oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_physical_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """Probe the events file's PHYSICAL read schema via the batch reader.

    Streaming file sources require an explicit schema, and guessing it is
    how environments drift silently: the same parquet reads as nanos-long,
    ``TIMESTAMP_NTZ``, or ``TIMESTAMP`` depending on Spark version and
    session confs.  Reading one footer batch-side (metadata only — no data
    scan) guarantees the stream sees exactly what batch sees, so the same
    ``normalize_ts_col`` applies to both and stream output is
    byte-identical to the batch twin."""
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet").schema


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet.  The physical schema is
    probed from the batch reader and ``ts`` normalized with the same
    source-level rule as the batch path (nanos-long / NTZ / TIMESTAMP →
    session-zoned TIMESTAMP), then asserted equal to the normalized batch
    schema — encoding drift fails loudly here, not as 1970-era dates six
    queries downstream."""
    from df_to_azure_spark.sources import load_table, normalize_ts_col

    raw = (
        spark.readStream.format("parquet")
        .schema(_events_physical_schema(spark, sf_dir))
        # load the table path itself: works whether events.parquet is a
        # single file (the shipped testdata layout) or a directory of part
        # files (any Spark-written copy, e.g. the scale-probe dirs) — a
        # pathGlobFilter on the parent dir silently matches NOTHING in the
        # directory layout
        .option("recursiveFileLookup", "true")
        .load(f"{sf_dir.rstrip('/')}/events.parquet")
    )
    stream = normalize_ts_col(raw, "ts")
    batch_schema = load_table(spark, sf_dir, "events").schema
    if stream.schema != batch_schema:
        # a real exception, not assert: the "encoding drift fails loudly
        # here" guarantee must survive python -O / PYTHONOPTIMIZE
        raise TypeError(
            f"normalized stream schema {stream.schema.simpleString()} != "
            f"batch schema {batch_schema.simpleString()}"
        )
    return stream


def windowed_counts_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts/sums per event type with late-data
    watermark — the canonical streaming agg.  State is bounded by the
    watermark horizon; at scale, partitioned by (window, event_type)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(T.DecimalType(18, 4))).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            F.col("total_value").cast("double").alias("total_value"),
        )
    )


def windowed_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch twin of ``windowed_counts_stream`` (same grouping, no
    watermark — a closed input has no late data)."""
    return (
        events.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(T.DecimalType(18, 4))).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            F.col("total_value").cast("double").alias("total_value"),
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str = "stream_out",
    output_mode: str = "complete",
) -> DataFrame:
    """Drive a streaming frame over all available input synchronously and
    return the materialized result (memory sink) — the local harness for
    stream correctness checks.  ``complete`` for aggregations, ``append``
    for row-wise operators like dedup."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


_STREAM_QUERY_SEQ = [0]


def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the watermarked windowed agg driven through a REAL
    streaming query over the events file source, returning the
    materialized batch result.  Not SQL-expressible (streaming execution)
    → rows-only check; ``stream_vs_batch_windowed_diff`` hash-checks its
    exact equivalence to the batch twin ``events_hourly``."""
    _STREAM_QUERY_SEQ[0] += 1
    name = f"stream_windowed_counts_{_STREAM_QUERY_SEQ[0]}"
    stream = windowed_counts_stream(read_events_stream(spark, sf_dir))
    return run_stream_to_memory(stream, name)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization (batch form): a new session starts when a
    user's inter-event gap exceeds ``gap_minutes``.  lag + running sum of
    session-start flags — two analytic windows over one shuffle on
    user_id."""
    from pyspark.sql import Window as W

    w_user = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w_user)))
            > gap_us,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    with_ids = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w_user.rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        with_ids.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def stream_vs_batch_windowed_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard equivalence check for the streaming path, registered as a
    query: symmetric multiset difference between the REAL streaming run
    of the watermarked windowed agg and its batch twin over the same
    closed input.  Both sum exact DECIMAL(18,4), so equality is exact —
    the oracle is the empty set, making the driver's hash check prove
    stream/batch equivalence instead of a rows-only count."""
    from df_to_azure_spark.sources import load_table

    _STREAM_QUERY_SEQ[0] += 1
    name = f"stream_diff_{_STREAM_QUERY_SEQ[0]}"
    streamed = run_stream_to_memory(
        windowed_counts_stream(read_events_stream(spark, sf_dir)), name
    )
    batch = windowed_counts_batch(load_table(spark, sf_dir, "events"))
    return (
        streamed.exceptAll(batch)
        .withColumn("side", F.lit("stream_only"))
        .unionByName(batch.exceptAll(streamed).withColumn("side", F.lit("batch_only")))
    )


STREAM_DIFF_ORACLE = """
SELECT CAST(NULL AS TIMESTAMP) AS window_start, CAST(NULL AS VARCHAR) AS event_type,
       CAST(NULL AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS total_value,
       CAST(NULL AS VARCHAR) AS side
WHERE 1 = 0
"""


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: drop repeated event_ids arriving within the
    watermark horizon (at-least-once sources redeliver; this makes the
    pipeline effectively-once).  State holds one entry per key seen
    within the horizon and is evicted by the watermark — bounded memory
    at any stream length."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_dedup_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard equivalence check: feed the events source TWICE (union of two
    identical streams — a worst-case redelivery), dedup within the
    watermark, and diff the surviving ids against the batch distinct set.
    Oracle = empty set."""
    from df_to_azure_spark.sources import load_table

    _STREAM_QUERY_SEQ[0] += 1
    name = f"stream_dedup_{_STREAM_QUERY_SEQ[0]}"
    doubled = read_events_stream(spark, sf_dir).unionByName(
        read_events_stream(spark, sf_dir)
    )
    deduped = dedup_stream(doubled).select("event_id")
    streamed = run_stream_to_memory(deduped, name, output_mode="append")
    batch = load_table(spark, sf_dir, "events").select("event_id").distinct()
    return (
        streamed.exceptAll(batch)
        .withColumn("side", F.lit("stream_only"))
        .unionByName(batch.exceptAll(streamed).withColumn("side", F.lit("batch_only")))
    )


STREAM_DEDUP_ORACLE = """
SELECT CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS VARCHAR) AS side
WHERE 1 = 0
"""


def attribution_join_stream(
    views: DataFrame, purchases: DataFrame, horizon: str = "30 minutes"
) -> DataFrame:
    """Stream-stream INTERVAL join: each purchase attributed to every view
    by the same user within the preceding ``horizon``.  Both sides carry
    watermarks and the join condition bounds purchase time relative to
    view time, so Spark can evict view-side state once the watermark
    passes ``view_ts + horizon`` and purchase-side state at the
    watermark — bounded state at any stream length (the unbounded-state
    trap of stream-stream joins is the time-range condition being
    absent).  At scale both sides shuffle on user_id only."""
    v = views.withWatermark("ts", "2 hours").select(
        F.col("event_id").alias("view_event_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.withWatermark("ts", "2 hours").select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    return v.join(
        p,
        F.expr(
            "v_user = p_user AND purchase_ts >= view_ts "
            f"AND purchase_ts <= view_ts + INTERVAL {horizon}"
        ),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_event_id",
        "purchase_event_id",
        "view_ts",
        "purchase_ts",
    )


def attribution_join_batch(events: DataFrame, horizon: str = "30 minutes") -> DataFrame:
    """Batch twin of the attribution join — the plain interval self-join."""
    v = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    return v.join(
        p,
        F.expr(
            "v_user = p_user AND purchase_ts >= view_ts "
            f"AND purchase_ts <= view_ts + INTERVAL {horizon}"
        ),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_event_id",
        "purchase_event_id",
        "view_ts",
        "purchase_ts",
    )


def stream_attribution_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard equivalence check for the stream-stream interval join: run the
    REAL streaming join over the closed events source and diff against
    the batch twin.  Oracle = empty set."""
    from df_to_azure_spark.sources import load_table

    _STREAM_QUERY_SEQ[0] += 1
    name = f"stream_attr_{_STREAM_QUERY_SEQ[0]}"
    src = read_events_stream(spark, sf_dir)
    streamed = run_stream_to_memory(
        attribution_join_stream(
            src.where(F.col("event_type") == "view"),
            src.where(F.col("event_type") == "purchase"),
        ),
        name,
        output_mode="append",
    )
    batch = attribution_join_batch(load_table(spark, sf_dir, "events"))
    return (
        streamed.exceptAll(batch)
        .withColumn("side", F.lit("stream_only"))
        .unionByName(batch.exceptAll(streamed).withColumn("side", F.lit("batch_only")))
    )


STREAM_ATTR_ORACLE = """
SELECT CAST(NULL AS BIGINT) AS user_id, CAST(NULL AS BIGINT) AS view_event_id,
       CAST(NULL AS BIGINT) AS purchase_event_id,
       CAST(NULL AS TIMESTAMP) AS view_ts, CAST(NULL AS TIMESTAMP) AS purchase_ts,
       CAST(NULL AS VARCHAR) AS side
WHERE 1 = 0
"""


def attribution_left_join_stream(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every view row, with its
    attributed purchases where they exist and NULLs where none arrived
    within ``horizon`` — the abandonment feed next to the conversion
    feed.

    The outer side is the semantically hard part of streaming joins:
    Spark can only emit a null-matched view once the watermark PROVES no
    matching purchase can still arrive (past ``view_ts + horizon``, plus
    an engine-internal eviction margin), so null rows surface with
    watermark latency, and views near the end of a closed input are
    never emitted at all — their no-match proof never materializes.
    Matched rows are NOT gated (they emit as soon as both sides arrive),
    so equivalence to the batch twin holds for ALL matches and for the
    null-attributed prefix the watermark actually released — which is
    exactly what ``stream_attribution_outer_diff`` checks.  State stays
    bounded: both sides evict by the same watermark as the inner join."""
    v = views.withWatermark("ts", watermark).select(
        F.col("event_id").alias("view_event_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    return v.join(
        p,
        F.expr(
            "v_user = p_user AND purchase_ts >= view_ts "
            f"AND purchase_ts <= view_ts + INTERVAL {horizon}"
        ),
        "leftOuter",
    ).select(
        F.col("v_user").alias("user_id"),
        "view_event_id",
        "view_ts",
        "purchase_event_id",
        "purchase_ts",
    )


def attribution_left_join_batch(
    events: DataFrame, horizon: str = "30 minutes"
) -> DataFrame:
    """Batch twin: the plain left interval self-join."""
    v = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    return v.join(
        p,
        F.expr(
            "v_user = p_user AND purchase_ts >= view_ts "
            f"AND purchase_ts <= view_ts + INTERVAL {horizon}"
        ),
        "left",
    ).select(
        F.col("v_user").alias("user_id"),
        "view_event_id",
        "view_ts",
        "purchase_event_id",
        "purchase_ts",
    )


def stream_attribution_outer_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard equivalence check for the stream-stream LEFT OUTER interval
    join: symmetric multiset diff vs the batch twin over (a) EVERY
    matched row — match emission is not watermark-gated, so any
    divergence there is a bug at any timestamp — and (b) null-attributed
    views up to the emission boundary the final watermark actually
    released (the stream's own max null ``view_ts``; Spark's eviction
    adds an engine-internal margin on top of ``view_ts + horizon``, so
    deriving the boundary from the emissions is the robust form — the
    emitted set must still be a clean PREFIX of the batch nulls, or
    batch-only rows appear inside the boundary and the diff is
    non-empty).  Oracle = empty set."""
    from df_to_azure_spark.sources import load_table

    _STREAM_QUERY_SEQ[0] += 1
    name = f"stream_attr_outer_{_STREAM_QUERY_SEQ[0]}"
    src = read_events_stream(spark, sf_dir)
    streamed = run_stream_to_memory(
        attribution_left_join_stream(
            src.where(F.col("event_type") == "view"),
            src.where(F.col("event_type") == "purchase"),
        ),
        name,
        output_mode="append",
    )
    batch = attribution_left_join_batch(load_table(spark, sf_dir, "events"))
    is_null = F.col("purchase_event_id").isNull()
    # 1-row bounded collect: the watermark-released null-emission boundary
    boundary = streamed.where(is_null).agg(F.max("view_ts")).collect()[0][0]
    released = (
        ~is_null
        if boundary is None
        else (~is_null) | (F.col("view_ts") <= F.lit(boundary))
    )
    streamed, batch = streamed.where(released), batch.where(released)
    return (
        streamed.exceptAll(batch)
        .withColumn("side", F.lit("stream_only"))
        .unionByName(batch.exceptAll(streamed).withColumn("side", F.lit("batch_only")))
    )


STREAM_ATTR_OUTER_ORACLE = """
SELECT CAST(NULL AS BIGINT) AS user_id, CAST(NULL AS BIGINT) AS view_event_id,
       CAST(NULL AS TIMESTAMP) AS view_ts, CAST(NULL AS BIGINT) AS purchase_event_id,
       CAST(NULL AS TIMESTAMP) AS purchase_ts, CAST(NULL AS VARCHAR) AS side
WHERE 1 = 0
"""


def attribution_full_join_stream(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream FULL OUTER interval join: conversions, abandoned
    views AND orphan purchases (a purchase with no preceding view — the
    missing-tracking signal) in one feed.

    Both unmatched sides are watermark-gated: a null-purchase view emits
    once no purchase can arrive in ``[view_ts, view_ts + horizon]``, a
    null-view purchase once no view can arrive in
    ``[purchase_ts - horizon, purchase_ts]``; matches emit ungated.
    ``user_id`` is coalesced across sides so the output key is total."""
    v = views.withWatermark("ts", watermark).select(
        F.col("event_id").alias("view_event_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    return v.join(
        p,
        F.expr(
            "v_user = p_user AND purchase_ts >= view_ts "
            f"AND purchase_ts <= view_ts + INTERVAL {horizon}"
        ),
        "fullOuter",
    ).select(
        F.coalesce("v_user", "p_user").alias("user_id"),
        "view_event_id",
        "view_ts",
        "purchase_event_id",
        "purchase_ts",
    )


def attribution_full_join_batch(
    events: DataFrame, horizon: str = "30 minutes"
) -> DataFrame:
    """Batch twin: the plain full-outer interval self-join."""
    v = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    return v.join(
        p,
        F.expr(
            "v_user = p_user AND purchase_ts >= view_ts "
            f"AND purchase_ts <= view_ts + INTERVAL {horizon}"
        ),
        "full",
    ).select(
        F.coalesce("v_user", "p_user").alias("user_id"),
        "view_event_id",
        "view_ts",
        "purchase_event_id",
        "purchase_ts",
    )


def stream_attribution_full_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence check for the FULL OUTER stream-stream join: matched
    rows must agree everywhere; each side's null-extended rows must be a
    clean prefix of the batch twin's, up to the emission boundary that
    side's watermark actually released (max released timestamp per side
    — same robust emissions-derived boundary as the left-outer check).
    Oracle = empty set."""
    from df_to_azure_spark.sources import load_table

    _STREAM_QUERY_SEQ[0] += 1
    name = f"stream_attr_full_{_STREAM_QUERY_SEQ[0]}"
    src = read_events_stream(spark, sf_dir)
    streamed = run_stream_to_memory(
        attribution_full_join_stream(
            src.where(F.col("event_type") == "view"),
            src.where(F.col("event_type") == "purchase"),
        ),
        name,
        output_mode="append",
    )
    batch = attribution_full_join_batch(load_table(spark, sf_dir, "events"))
    null_p = F.col("purchase_event_id").isNull()
    null_v = F.col("view_event_id").isNull()
    bounds = streamed.agg(
        F.max(F.when(null_p, F.col("view_ts"))).alias("vb"),
        F.max(F.when(null_v, F.col("purchase_ts"))).alias("pb"),
    ).collect()[0]
    released = ~null_p & ~null_v  # matches: never gated
    if bounds.vb is not None:
        released = released | (null_p & (F.col("view_ts") <= F.lit(bounds.vb)))
    if bounds.pb is not None:
        released = released | (null_v & (F.col("purchase_ts") <= F.lit(bounds.pb)))
    streamed, batch = streamed.where(released), batch.where(released)
    return (
        streamed.exceptAll(batch)
        .withColumn("side", F.lit("stream_only"))
        .unionByName(batch.exceptAll(streamed).withColumn("side", F.lit("batch_only")))
    )


STREAM_ATTR_FULL_ORACLE = """
SELECT CAST(NULL AS BIGINT) AS user_id, CAST(NULL AS BIGINT) AS view_event_id,
       CAST(NULL AS TIMESTAMP) AS view_ts, CAST(NULL AS BIGINT) AS purchase_event_id,
       CAST(NULL AS TIMESTAMP) AS purchase_ts, CAST(NULL AS VARCHAR) AS side
WHERE 1 = 0
"""


def segment_revenue_stream(
    events: DataFrame,
    customers: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STATIC join + windowed agg: purchase events enriched with
    the static customer dimension, revenue per (window, market segment).

    The third join class next to batch-batch and stream-stream: the
    static side needs NO watermark and NO state — Spark re-plans it per
    micro-batch as an ordinary broadcast-hash join (dim tables at 100 TB
    stream scale stay broadcast-sized), so the only streaming state is
    the windowed aggregation's."""
    purchases = events.where(F.col("event_type") == "purchase")
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return (
        purchases.withWatermark("ts", watermark)
        .join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", window), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast(T.DecimalType(18, 4))).alias("revenue"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "segment",
            "n_purchases",
            F.col("revenue").cast("double").alias("revenue"),
        )
    )


def segment_revenue_batch(
    events: DataFrame, customers: DataFrame, window: str = "1 hour"
) -> DataFrame:
    """Batch twin of ``segment_revenue_stream``."""
    purchases = events.where(F.col("event_type") == "purchase")
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return (
        purchases.join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", window), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast(T.DecimalType(18, 4))).alias("revenue"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "segment",
            "n_purchases",
            F.col("revenue").cast("double").alias("revenue"),
        )
    )


def stream_static_join_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence gate for the stream-static join: exact DECIMAL sums,
    symmetric multiset diff vs the batch twin.  Oracle = empty set."""
    from df_to_azure_spark.sources import load_table

    _STREAM_QUERY_SEQ[0] += 1
    name = f"stream_static_{_STREAM_QUERY_SEQ[0]}"
    customers = load_table(spark, sf_dir, "customer")
    streamed = run_stream_to_memory(
        segment_revenue_stream(read_events_stream(spark, sf_dir), customers),
        name,
    )
    batch = segment_revenue_batch(
        load_table(spark, sf_dir, "events"), customers
    )
    return (
        streamed.exceptAll(batch)
        .withColumn("side", F.lit("stream_only"))
        .unionByName(batch.exceptAll(streamed).withColumn("side", F.lit("batch_only")))
    )


STREAM_STATIC_ORACLE = """
SELECT CAST(NULL AS TIMESTAMP) AS window_start, CAST(NULL AS VARCHAR) AS segment,
       CAST(NULL AS BIGINT) AS n_purchases, CAST(NULL AS DOUBLE) AS revenue,
       CAST(NULL AS VARCHAR) AS side
WHERE 1 = 0
"""


def sliding_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """SLIDING (hopping) windowed agg — each event lands in
    window/slide overlapping windows (2 here), the shape for
    "rolling last-hour metric refreshed every half hour".  State scales
    with windows-per-event × key cardinality; the watermark still
    bounds it."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


def sliding_counts_batch(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Batch twin of ``sliding_counts_stream``."""
    return (
        events.groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


def stream_sliding_counts_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence gate for the sliding-window agg.  Oracle = empty set."""
    from df_to_azure_spark.sources import load_table

    _STREAM_QUERY_SEQ[0] += 1
    name = f"stream_sliding_{_STREAM_QUERY_SEQ[0]}"
    streamed = run_stream_to_memory(
        sliding_counts_stream(read_events_stream(spark, sf_dir)), name
    )
    batch = sliding_counts_batch(load_table(spark, sf_dir, "events"))
    return (
        streamed.exceptAll(batch)
        .withColumn("side", F.lit("stream_only"))
        .unionByName(batch.exceptAll(streamed).withColumn("side", F.lit("batch_only")))
    )


STREAM_SLIDING_ORACLE = """
SELECT CAST(NULL AS TIMESTAMP) AS window_start, CAST(NULL AS VARCHAR) AS event_type,
       CAST(NULL AS BIGINT) AS n, CAST(NULL AS VARCHAR) AS side
WHERE 1 = 0
"""


def builtin_session_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Built-in SESSION window (``F.session_window``) — the declarative
    gap-sessionizer, third sessionization surface next to the batch
    window-chain (``sessionize_events``) and the custom stateful
    processor (``sessionize_stream``).  Session state merges adjacent
    windows engine-side and is closed by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def builtin_session_batch(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Batch twin: the same ``session_window`` grouping on the closed
    input."""
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_builtin_session_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence gate for the built-in streaming session window.
    Oracle = empty set."""
    from df_to_azure_spark.sources import load_table

    _STREAM_QUERY_SEQ[0] += 1
    name = f"stream_builtin_session_{_STREAM_QUERY_SEQ[0]}"
    streamed = run_stream_to_memory(
        builtin_session_stream(read_events_stream(spark, sf_dir)), name
    )
    batch = builtin_session_batch(load_table(spark, sf_dir, "events"))
    return (
        streamed.exceptAll(batch)
        .withColumn("side", F.lit("stream_only"))
        .unionByName(batch.exceptAll(streamed).withColumn("side", F.lit("batch_only")))
    )


STREAM_BUILTIN_SESSION_ORACLE = """
SELECT CAST(NULL AS TIMESTAMP) AS session_start, CAST(NULL AS TIMESTAMP) AS session_end,
       CAST(NULL AS BIGINT) AS user_id, CAST(NULL AS BIGINT) AS n_events,
       CAST(NULL AS VARCHAR) AS side
WHERE 1 = 0
"""


def attribution_right_join_stream(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream RIGHT OUTER interval join — the mirror of
    ``attribution_left_join_stream``: every purchase row, with the
    view(s) it attributes to where one preceded it within ``horizon``
    and NULLs where none did (the organic-purchase feed next to the
    attributed feed).  A null-matched purchase can only emit once the
    watermark PROVES no qualifying view can still arrive — views for a
    purchase at ``purchase_ts`` live in
    ``[purchase_ts - horizon, purchase_ts]``, so the proof lands when
    the watermark passes ``purchase_ts`` plus the engine's eviction
    margin.  Matched rows are not gated.  Completes the streaming
    join-type matrix (inner/left/right/full) next to the other three.
    State bounded by the shared watermark on both sides."""
    v = views.withWatermark("ts", watermark).select(
        F.col("event_id").alias("view_event_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    return v.join(
        p,
        F.expr(
            "v_user = p_user AND purchase_ts >= view_ts "
            f"AND purchase_ts <= view_ts + INTERVAL {horizon}"
        ),
        "rightOuter",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_event_id",
        "purchase_ts",
        "view_event_id",
        "view_ts",
    )


def attribution_right_join_batch(
    events: DataFrame, horizon: str = "30 minutes"
) -> DataFrame:
    """Batch twin: the plain right interval self-join."""
    v = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    return v.join(
        p,
        F.expr(
            "v_user = p_user AND purchase_ts >= view_ts "
            f"AND purchase_ts <= view_ts + INTERVAL {horizon}"
        ),
        "right",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_event_id",
        "purchase_ts",
        "view_event_id",
        "view_ts",
    )


def stream_attribution_right_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence check for the stream-stream RIGHT OUTER interval
    join, mirroring ``stream_attribution_outer_diff``: symmetric
    multiset diff vs the batch twin over every matched row (never
    watermark-gated) plus the null-attributed purchases up to the
    emission boundary the final watermark actually released (the
    stream's own max null ``purchase_ts`` — the emitted null set must be
    a clean PREFIX of the batch nulls).  Oracle = empty set."""
    from df_to_azure_spark.sources import load_table

    _STREAM_QUERY_SEQ[0] += 1
    name = f"stream_attr_right_{_STREAM_QUERY_SEQ[0]}"
    src = read_events_stream(spark, sf_dir)
    streamed = run_stream_to_memory(
        attribution_right_join_stream(
            src.where(F.col("event_type") == "view"),
            src.where(F.col("event_type") == "purchase"),
        ),
        name,
        output_mode="append",
    )
    batch = attribution_right_join_batch(load_table(spark, sf_dir, "events"))
    is_null = F.col("view_event_id").isNull()
    # 1-row bounded collect: the watermark-released null-emission boundary
    boundary = streamed.where(is_null).agg(F.max("purchase_ts")).collect()[0][0]
    released = (
        ~is_null
        if boundary is None
        else (~is_null) | (F.col("purchase_ts") <= F.lit(boundary))
    )
    streamed, batch = streamed.where(released), batch.where(released)
    return (
        streamed.exceptAll(batch)
        .withColumn("side", F.lit("stream_only"))
        .unionByName(batch.exceptAll(streamed).withColumn("side", F.lit("batch_only")))
    )


STREAM_ATTR_RIGHT_ORACLE = """
SELECT CAST(NULL AS BIGINT) AS user_id, CAST(NULL AS BIGINT) AS purchase_event_id,
       CAST(NULL AS TIMESTAMP) AS purchase_ts, CAST(NULL AS BIGINT) AS view_event_id,
       CAST(NULL AS TIMESTAMP) AS view_ts, CAST(NULL AS VARCHAR) AS side
WHERE 1 = 0
"""


def _interval_pairs(purchases: DataFrame, sessions: DataFrame) -> DataFrame:
    """Shared builder for the stream-static INTERVAL join equivalence
    pair: each purchase (point) joined to every OTHER user's session
    interval covering it, via the binned range join from
    ``operators/intervaljoin.py`` — the SAME operator code runs both the
    batch and the streaming side (the binned form is an equi-join on the
    hour bucket plus a filter, which is exactly the stateless shape
    stream-static joins support in append mode)."""
    from df_to_azure_spark.operators.intervaljoin import interval_point_join

    return interval_point_join(
        purchases,
        sessions,
        ts_col="ts",
        start_col="session_start",
        end_col="session_end",
        bucket_seconds=3600,
        extra_on=F.col("p_user") != F.col("s_user"),
    ).select("event_id", "s_user", "session_start")


def stream_interval_join_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence gate for the stream-static binned INTERVAL join: the
    purchase stream joined against a static session-interval table (in
    production: the previous day's sessions materialized to the lake)
    must emit exactly the batch twin's pair set.  Because the binned
    interval join lowers to equi-join + filter, it needs NO streaming
    state and works in append mode — the property this diff proves.
    Oracle = empty set."""
    from df_to_azure_spark.sources import load_table

    _STREAM_QUERY_SEQ[0] += 1
    name = f"stream_interval_{_STREAM_QUERY_SEQ[0]}"
    batch_events = load_table(spark, sf_dir, "events")
    sessions = sessionize(batch_events, gap_minutes=30).select(
        F.col("user_id").alias("s_user"), "session_start", "session_end"
    )
    purchases_stream = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select("event_id", F.col("user_id").alias("p_user"), "ts")
    )
    streamed = run_stream_to_memory(
        _interval_pairs(purchases_stream, sessions), name, output_mode="append"
    )
    purchases_batch = batch_events.where(
        F.col("event_type") == "purchase"
    ).select("event_id", F.col("user_id").alias("p_user"), "ts")
    batch = _interval_pairs(purchases_batch, sessions)
    return (
        streamed.exceptAll(batch)
        .withColumn("side", F.lit("stream_only"))
        .unionByName(batch.exceptAll(streamed).withColumn("side", F.lit("batch_only")))
    )


STREAM_INTERVAL_ORACLE = """
SELECT CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS BIGINT) AS s_user,
       CAST(NULL AS TIMESTAMP) AS session_start, CAST(NULL AS VARCHAR) AS side
WHERE 1 = 0
"""
