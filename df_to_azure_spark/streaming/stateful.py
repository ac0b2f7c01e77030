"""Custom stateful streaming operator via ``applyInPandasWithState``.

``running_user_totals``: per-user running (count, sum, max_ts) maintained
in explicit group state across micro-batches — the canonical shape for
custom stateful logic Spark's built-in aggregations can't express (the
state here is trivial on purpose; swap the update function for
session-carts, fraud counters, model features...).

State is partitioned by the group key, so a 100 TB stream shards its
state across executors; the state store bounds memory per key.  Both
timeout regimes are covered: ``running_user_totals`` uses ``NoTimeout``
(totals live forever), while ``sessionize_stream`` below uses
``EventTimeTimeout`` — the watermark-driven eviction that closes each
user's open session and frees its state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

_SESSION_GAP_US = 30 * 60 * 1_000_000


def _session_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Gap-sessionization with explicit state + EVENT-TIME TIMEOUT — the
    canonical custom-stateful pattern ``running_user_totals`` leaves out:
    sessions closed by in-batch gaps emit immediately; the user's OPEN
    session lives in state with a timeout at ``session_end + gap``, so
    the watermark passing that instant proves no event can extend it and
    fires the timeout callback, which emits the final session and clears
    the state.  State per user is three longs — bounded at any stream
    length; idle users cost nothing after their timeout fires."""
    (user_id,) = key

    def _emit(rows: list[tuple[int, int, int]]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(rows),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in rows],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in rows],
                "n_events": [n for _, _, n in rows],
            }
        )

    if state.hasTimedOut:
        s, e, n = state.get
        state.remove()
        yield _emit([(s, e, n)])
        return

    ts_us: list[int] = []
    for pdf in pdfs:
        # arrow hands tz-naive datetime64 in the session (UTC) zone
        ts_us.extend(pdf["ts"].astype("datetime64[us]").astype("int64").tolist())
    ts_us.sort()
    closed: list[tuple[int, int, int]] = []
    if state.exists:
        s, e, n = state.get
        # Late-but-within-watermark events EARLIER than the carried
        # session start need care the merge loop below can't give them:
        # they may bridge into the open session (lowering its start),
        # form their own earlier session(s), or chain into both — the
        # batch sessionizer takes min(ts) per session, so the stream
        # must too.  Sessionize them first with the standard gap walk,
        # then merge the final run into the open session iff it reaches
        # within the gap of s.
        pre = [t for t in ts_us if t < s]
        ts_us = [t for t in ts_us if t >= s]
        cur: list[int] | None = None
        for t in pre:
            if cur is None:
                cur = [t, t, 1]
            elif t - cur[1] <= _SESSION_GAP_US:
                cur[1], cur[2] = t, cur[2] + 1
            else:
                closed.append((cur[0], cur[1], cur[2]))
                cur = [t, t, 1]
        if cur is not None:
            if s - cur[1] <= _SESSION_GAP_US:
                s, n = cur[0], n + cur[2]
            else:
                closed.append((cur[0], cur[1], cur[2]))
    else:
        s, e, n = ts_us[0], ts_us[0], 1
        ts_us = ts_us[1:]
    for t in ts_us:
        if t - e <= _SESSION_GAP_US:
            # max, not assignment: an event can land inside [s, e]
            e, n = max(e, t), n + 1
        else:
            closed.append((s, e, n))
            s, e, n = t, t, 1
    wm_ms = state.getCurrentWatermarkMs()
    timeout_ms = (e + _SESSION_GAP_US) // 1000 + 1
    if timeout_ms <= wm_ms:
        # watermark already proves the open session closed — emit now
        # (setTimeoutTimestamp would reject a timestamp behind the watermark)
        closed.append((s, e, n))
        if state.exists:
            state.remove()
    else:
        state.update((s, e, n))
        state.setTimeoutTimestamp(timeout_ms)
    if closed:
        yield _emit(closed)


def sessionize_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming gap-sessionization via ``applyInPandasWithState`` with
    ``EventTimeTimeout`` — the stream twin of ``events.sessionize``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_sessionize_stream(spark, sf_dir: str) -> DataFrame:
    """Drive the stateful sessionizer over the closed events input and
    return the materialized emitted sessions."""
    from df_to_azure_spark.streaming.events import read_events_stream

    stream = sessionize_stream(read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(
        "SELECT user_id, session_start, session_end, n_events FROM sessions_out"
    )


def stream_sessionize_diff(spark, sf_dir: str) -> DataFrame:
    """Hard equivalence check for stateful sessionization against the
    batch gap-sessionizer.  Emission has two regimes: sessions closed by
    an in-batch gap emit immediately (never gated), while each user's
    LAST session sits open in state until the watermark fires its
    event-time timeout — and near the end of a closed input that proof
    never arrives.  So the diff compares, per user, every session
    strictly BEFORE the user's final batch session (all immediately
    emitted) on both sides; a stream bug that mis-merges or mis-splits
    sessions shifts those earlier sessions and surfaces here.  Timeout
    emissions themselves are asserted separately in the pytest (they are
    environment-timing-shaped, not set-shaped).  Oracle = empty set."""
    from pyspark.sql import functions as F

    from df_to_azure_spark.sources import load_table
    from df_to_azure_spark.streaming.events import sessionize

    streamed = run_sessionize_stream(spark, sf_dir)
    batch = sessionize(load_table(spark, sf_dir, "events")).select(
        "user_id", "session_start", "session_end", "n_events"
    )
    user_last = batch.groupBy("user_id").agg(
        F.max("session_end").alias("last_end")
    )

    def released(df: DataFrame) -> DataFrame:
        return (
            df.join(user_last, "user_id")
            .where(F.col("session_end") < F.col("last_end"))
            .drop("last_end")
        )

    streamed, batch = released(streamed), released(batch)
    return (
        streamed.exceptAll(batch)
        .withColumn("side", F.lit("stream_only"))
        .unionByName(batch.exceptAll(streamed).withColumn("side", F.lit("batch_only")))
    )


SESSIONIZE_DIFF_ORACLE = """
SELECT CAST(NULL AS BIGINT) AS user_id, CAST(NULL AS TIMESTAMP) AS session_start,
       CAST(NULL AS TIMESTAMP) AS session_end, CAST(NULL AS BIGINT) AS n_events,
       CAST(NULL AS VARCHAR) AS side
WHERE 1 = 0
"""


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


# --------------------------------------------------------------------------
# Streaming Misra-Gries heavy hitters (bucket-sharded sketch state)
# --------------------------------------------------------------------------

HH_OUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("version", T.LongType()),
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ]
)

HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("seen", T.LongType()),
    ]
)


def _hh_update_factory(counters: int):
    def _hh_update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        if state.exists:
            items, counts, seen = state.get
            d = dict(zip(items, counts))
        else:
            d, seen = {}, 0
        for pdf in pdfs:
            for tok, n in pdf["tok"].value_counts().items():
                d[tok] = d.get(tok, 0) + int(n)
                seen += int(n)
            if len(d) > counters:
                # mergeable-summaries reduction (same as the batch
                # sketch.heavy_hitters_exact kernel): subtract the
                # (c+1)-th largest count, drop non-positive
                m = sorted(d.values(), reverse=True)[counters]
                d = {k: v - m for k, v in d.items() if v > m}
        state.update((list(d.keys()), [int(v) for v in d.values()], seen))
        yield pd.DataFrame(
            {
                "bucket": [bucket],
                "version": [seen],
                "items": [list(d.keys())],
                "counts": [[int(v) for v in d.values()]],
            }
        )

    return _hh_update


def streaming_heavy_hitter_candidates(
    tokens: DataFrame, buckets: int = 8, counters: int = 200
) -> DataFrame:
    """Streaming Misra-Gries candidate maintenance: the token stream is
    sharded into ``buckets`` by a deterministic md5 bucket of the token
    (every occurrence of a token lands in ONE bucket, so its in-bucket
    frequency share can only be ≥ its global share), and each bucket
    keeps an MG summary with ``counters`` counters in group state,
    folded batch-by-batch with the same mergeable reduction as the
    batch kernel (``sketch.heavy_hitters_exact``).  Union of the final
    bucket summaries ⊇ every token with global share > 1/(counters+1)
    — the streaming half of the two-pass heavy-hitter design, with the
    exact verification pass running batch-side whenever a snapshot is
    taken.

    State per bucket is ≤ counters (item, count) pairs — bounded by
    config, never by stream length; ``NoTimeout`` because the summary
    must live as long as the count stream does.  Output mode 'update':
    one (bucket, version, summary) row per bucket per micro-batch;
    ``version`` is the bucket's total tokens seen, so the latest
    snapshot per bucket is the max-version row."""
    keyed = tokens.withColumn(
        "bucket",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long"),
            F.lit(int(buckets)),
        ).cast("int"),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _hh_update_factory(int(counters)),
        outputStructType=HH_OUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_heavy_hitter_superset_diff(spark, sf_dir: str) -> DataFrame:
    """Tripwire for the streaming sketch: every EXACT batch heavy hitter
    (share > 1/100 of the token stream — same contract as the batch
    ``heavy_hitter_tokens`` query) must appear in the streaming
    Misra-Gries candidate union.  Emits the missing tokens — expected
    EMPTY, so the driver's empty-set oracle hash-proves the superset
    guarantee end to end (stream sharding + state folding + snapshot
    extraction)."""
    from pyspark.sql import Window as W

    from df_to_azure_spark.functions.text import tokens as tok_expr
    from df_to_azure_spark.sources import load_table

    docs_schema = spark.read.parquet(
        f"{sf_dir.rstrip('/')}/documents.parquet"
    ).schema
    raw = (
        spark.readStream.format("parquet")
        .schema(docs_schema)
        .option("recursiveFileLookup", "true")
        .load(f"{sf_dir.rstrip('/')}/documents.parquet")
    )
    toks_stream = raw.select(F.explode(tok_expr("text")).alias("tok"))
    q = (
        streaming_heavy_hitter_candidates(toks_stream, buckets=8, counters=200)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("hh_candidates_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    snap = spark.sql("SELECT * FROM hh_candidates_out")
    w = W.partitionBy("bucket").orderBy(F.desc("version"))
    cands = (
        snap.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.explode("items").alias("tok"))
        .distinct()
    )
    batch_toks = load_table(spark, sf_dir, "documents").select(
        F.explode(tok_expr("text")).alias("tok")
    )
    total = batch_toks.agg(F.count(F.lit(1)).alias("n_total"))
    exact_hh = (
        batch_toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * 100 > F.col("n_total"))
        .select("tok", F.col("cnt").cast("bigint").alias("cnt"))
    )
    return exact_hh.join(cands, "tok", "left_anti")


STREAM_HH_SUPERSET_ORACLE = """
SELECT CAST(NULL AS VARCHAR) AS tok, CAST(NULL AS BIGINT) AS cnt
WHERE 1 = 0
"""


def _doc_positions(df: DataFrame, shingle_n: int = 8) -> DataFrame:
    """(doc_id, pos, h) positional k-gram fingerprints — the same
    tokenize/shingle/48-bit-md5 lane as ``dedup.duplicate_spans_global``,
    stateless so it applies to a stream and a batch frame identically."""
    from df_to_azure_spark.functions.dedup import shingles

    return df.select(
        "doc_id",
        F.posexplode(shingles("text", shingle_n)).alias("pos0", "s"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.conv(F.substring(F.md5("s"), 1, 12), 16, 10)
        .cast("bigint")
        .alias("h"),
    )


def stream_contamination_diff(spark, sf_dir: str) -> DataFrame:
    """Streaming eval-leakage screen — the production deployment shape
    of ``suffix_contamination_spans``'s marking stage: documents ARRIVE
    as a stream (an eval-set ingestion feed), the TRAIN corpus's
    distinct 8-gram fingerprints are a static table, and every incoming
    test position whose fingerprint exists in train is flagged by a
    stream-static LEFT SEMI join — per-row, append-mode, no watermark
    and no stream state (the static side is just a join build side each
    micro-batch; at 100 TB it is the lake-persisted fingerprint table).
    The maximal-span chaining stays a downstream batch step by design:
    it needs per-document position ordering, which an append stream
    hands to the sink.

    Emits the symmetric multiset diff of marked ``(doc_id, pos)`` pairs
    vs the batch twin (the same marking computed batch-side).  Expected
    EMPTY — the driver's empty-set oracle hash-proves stream/batch
    marking equivalence end to end."""
    from df_to_azure_spark.functions.sampling import with_split
    from df_to_azure_spark.sources import load_table

    docs_schema = spark.read.parquet(
        f"{sf_dir.rstrip('/')}/documents.parquet"
    ).schema
    raw = (
        spark.readStream.format("parquet")
        .schema(docs_schema)
        .option("recursiveFileLookup", "true")
        .load(f"{sf_dir.rstrip('/')}/documents.parquet")
    )
    batch_docs = with_split(load_table(spark, sf_dir, "documents"), "doc_id")
    train_h = _doc_positions(
        batch_docs.where(F.col("split") == "train")
    ).select("h").distinct()

    stream_marked = (
        _doc_positions(
            with_split(raw, "doc_id").where(F.col("split") == "test")
        )
        .join(train_h, "h", "left_semi")
        .select("doc_id", "pos")
    )
    q = (
        stream_marked.writeStream.outputMode("append")
        .format("memory")
        .queryName("contamination_marks_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.sql("SELECT * FROM contamination_marks_out")
    batch_marked = (
        _doc_positions(batch_docs.where(F.col("split") == "test"))
        .join(train_h, "h", "left_semi")
        .select("doc_id", "pos")
    )
    return (
        streamed.exceptAll(batch_marked)
        .withColumn("side", F.lit("stream_only"))
        .unionByName(
            batch_marked.exceptAll(streamed).withColumn(
                "side", F.lit("batch_only")
            )
        )
    )


STREAM_CONTAMINATION_ORACLE = """
SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS pos,
       CAST(NULL AS VARCHAR) AS side
WHERE 1 = 0
"""


def stream_concurrency_diff(spark, sf_dir: str) -> DataFrame:
    """Equivalence check composing the stateful sessionizer with the
    slice-clipped sweep-line concurrency operator
    (``plans.pipeline4.hourly_concurrency``): derive the full hourly
    profile — including the peak, which is a deterministic function of
    the session SET — from the streamed sessions and from the batch
    sessions, and keep only mismatching hour rows.  Both sides restrict
    to sessions strictly before each user's final batch session (the
    same released-emission regime as ``stream_sessionize_diff`` — the
    watermark never fires for the tail of a closed input).  A stream bug
    that mis-merges or mis-splits sessions perturbs segment counts, busy
    time, or the peak and surfaces here.  Oracle = empty set."""
    from pyspark.sql import functions as F

    from df_to_azure_spark.plans.pipeline4 import hourly_concurrency
    from df_to_azure_spark.sources import load_table
    from df_to_azure_spark.streaming.events import sessionize

    streamed = run_sessionize_stream(spark, sf_dir)
    batch = sessionize(load_table(spark, sf_dir, "events")).select(
        "user_id", "session_start", "session_end"
    )
    user_last = batch.groupBy("user_id").agg(
        F.max("session_end").alias("last_end")
    )

    def released(df: DataFrame) -> DataFrame:
        return (
            df.join(user_last, "user_id")
            .where(F.col("session_end") < F.col("last_end"))
            .select("user_id", "session_start", "session_end")
        )

    s_prof = hourly_concurrency(released(streamed))
    b_prof = hourly_concurrency(released(batch))
    return (
        s_prof.exceptAll(b_prof)
        .withColumn("side", F.lit("stream_only"))
        .unionByName(
            b_prof.exceptAll(s_prof).withColumn("side", F.lit("batch_only"))
        )
    )


CONCURRENCY_DIFF_ORACLE = """
SELECT CAST(NULL AS TIMESTAMP) AS hour, CAST(NULL AS BIGINT) AS n_segments,
       CAST(NULL AS BIGINT) AS peak_concurrency, CAST(NULL AS BIGINT) AS busy_us,
       CAST(NULL AS VARCHAR) AS side
WHERE 1 = 0
"""


def stream_cms_diff(spark, sf_dir: str) -> DataFrame:
    """Streaming maintenance of the Count-Min sketch: build the exact
    same ``_CMS_D × _CMS_W`` counter cells as the batch
    ``plans.pipeline5.cms_cells`` through a Structured Streaming
    aggregation (complete mode — the sketch IS the running aggregate;
    counters only ever add, the mergeable-sketch property the streaming
    path exploits), then full-outer-diff the final snapshot against the
    batch cells.  Expected EMPTY — the driver's empty-set oracle
    hash-proves that incremental sketch maintenance and the batch build
    agree cell for cell.

    Scale shape: the streaming state is the d·w counter grid — constant
    size, independent of stream length; exactly why a CMS is what a
    100 TB ingest keeps instead of exact counts."""
    from df_to_azure_spark.plans.pipeline5 import cms_cells
    from df_to_azure_spark.sources import load_table

    events_schema = spark.read.parquet(
        f"{sf_dir.rstrip('/')}/events.parquet"
    ).schema
    raw = (
        spark.readStream.format("parquet")
        .schema(events_schema)
        .option("recursiveFileLookup", "true")
        .load(f"{sf_dir.rstrip('/')}/events.parquet")
    )
    q = (
        cms_cells(raw.select("user_id"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("cms_cells_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.sql(
        "SELECT i, pos, cnt FROM cms_cells_out"
    )
    batch = cms_cells(load_table(spark, sf_dir, "events").select("user_id"))
    s = streamed.select(
        F.col("i").alias("si"), F.col("pos").alias("sp"),
        F.col("cnt").alias("scnt"),
    )
    b = batch.select(
        F.col("i").alias("bi"), F.col("pos").alias("bp"),
        F.col("cnt").alias("bcnt"),
    )
    joined = s.join(
        b, (F.col("si") == F.col("bi")) & (F.col("sp") == F.col("bp")), "full"
    )
    return (
        joined.where(
            F.col("si").isNull()
            | F.col("bi").isNull()
            | (F.col("scnt") != F.col("bcnt"))
        )
        .select(
            F.coalesce("si", "bi").cast("int").alias("i"),
            F.coalesce("sp", "bp").cast("bigint").alias("pos"),
            F.col("scnt").cast("bigint").alias("stream_cnt"),
            F.col("bcnt").cast("bigint").alias("batch_cnt"),
        )
    )


STREAM_CMS_DIFF_ORACLE = """
SELECT CAST(NULL AS INT) AS i, CAST(NULL AS BIGINT) AS pos,
       CAST(NULL AS BIGINT) AS stream_cnt, CAST(NULL AS BIGINT) AS batch_cnt
WHERE 1 = 0
"""


def stream_hll_diff(spark, sf_dir: str) -> DataFrame:
    """Streaming maintenance of the portable HyperLogLog registers:
    build the exact same (event_type, bucket, m_rho) register frame as
    the batch ``plans.pipeline5.hll_registers`` through a Structured
    Streaming MAX aggregation (complete mode), then full-outer-diff the
    final snapshot against the batch registers.  Expected EMPTY.

    The twin needs NO dedup or watermark: HLL register insertion is
    idempotent (MAX over any duplicate arrivals of a user is the same
    register) — the mergeability that makes HLL the sketch a 100 TB
    ingest maintains incrementally; state is |types| × 256 integers,
    constant in stream length."""
    from df_to_azure_spark.plans.pipeline5 import hll_registers
    from df_to_azure_spark.sources import load_table

    events_schema = spark.read.parquet(
        f"{sf_dir.rstrip('/')}/events.parquet"
    ).schema
    raw = (
        spark.readStream.format("parquet")
        .schema(events_schema)
        .option("recursiveFileLookup", "true")
        .load(f"{sf_dir.rstrip('/')}/events.parquet")
    )
    q = (
        hll_registers(raw.select("event_type", "user_id"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_regs_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.sql("SELECT event_type, bucket, m_rho FROM hll_regs_out")
    batch = hll_registers(
        load_table(spark, sf_dir, "events").select("event_type", "user_id")
    )
    s = streamed.select(
        F.col("event_type").alias("st"), F.col("bucket").alias("sb"),
        F.col("m_rho").alias("sr"),
    )
    b = batch.select(
        F.col("event_type").alias("bt"), F.col("bucket").alias("bb"),
        F.col("m_rho").alias("br"),
    )
    joined = s.join(
        b, (F.col("st") == F.col("bt")) & (F.col("sb") == F.col("bb")), "full"
    )
    return (
        joined.where(
            F.col("st").isNull()
            | F.col("bt").isNull()
            | (F.col("sr") != F.col("br"))
        )
        .select(
            F.coalesce("st", "bt").alias("event_type"),
            F.coalesce("sb", "bb").cast("bigint").alias("bucket"),
            F.col("sr").cast("int").alias("stream_rho"),
            F.col("br").cast("int").alias("batch_rho"),
        )
    )


STREAM_HLL_DIFF_ORACLE = """
SELECT CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS BIGINT) AS bucket,
       CAST(NULL AS INT) AS stream_rho, CAST(NULL AS INT) AS batch_rho
WHERE 1 = 0
"""


def stream_quantile_hist_diff(spark, sf_dir: str) -> DataFrame:
    """Streaming maintenance of the 256-bin mergeable equi-width
    histogram (the ``quantile_histogram_check`` sketch): bin edges are
    a TRAINED artifact (one bounded min/max row collected from the
    batch table up front — exactly how production streaming histograms
    deploy pre-fitted edges), the stream maintains per-(event_type,
    bin) integer counters through a plain COUNT aggregation in
    complete mode, and the final snapshot is full-outer-diffed against
    the batch histogram built with the SAME edges.  Expected EMPTY.

    Like the HLL/CMS twins, no watermark and no dedup state: counter
    increments are order-insensitive and the state is |types| × 256
    integers — constant in stream length, the property that lets a
    100 TB ingest keep quantile estimates hot without re-scanning."""
    from df_to_azure_spark.sources import load_table

    _BINS = 256
    batch_ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    row = batch_ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx")).collect()[0]
    mn, mx = float(row["mn"]), float(row["mx"])
    bin_expr = (
        f"LEAST({_BINS - 1}, CAST(FLOOR((value - CAST({mn!r} AS DOUBLE))"
        f" / (CAST({mx!r} AS DOUBLE) - CAST({mn!r} AS DOUBLE))"
        f" * CAST({_BINS} AS DOUBLE)) AS INT))"
    )

    def hist(df):
        return (
            df.select("event_type", F.expr(bin_expr).alias("bin"))
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    # Load the table path itself (works whether events.parquet is a single
    # file — the shipped testdata layout — or a directory of part files, as
    # a Spark-written copy is; a pathGlobFilter on the parent dir would
    # silently match nothing in the latter case).
    events_path = f"{sf_dir.rstrip('/')}/events.parquet"
    events_schema = spark.read.parquet(events_path).schema
    raw = (
        spark.readStream.format("parquet")
        .schema(events_schema)
        .option("recursiveFileLookup", "true")
        .load(events_path)
    )
    q = (
        hist(raw.select("event_type", "value"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("qhist_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.sql("SELECT event_type, bin, cnt FROM qhist_out")
    batch = hist(batch_ev)
    s = streamed.select(
        F.col("event_type").alias("st"), F.col("bin").alias("sb"),
        F.col("cnt").alias("sc"),
    )
    b = batch.select(
        F.col("event_type").alias("bt"), F.col("bin").alias("bb"),
        F.col("cnt").alias("bc"),
    )
    joined = s.join(
        b, (F.col("st") == F.col("bt")) & (F.col("sb") == F.col("bb")), "full"
    )
    return (
        joined.where(
            F.col("st").isNull()
            | F.col("bt").isNull()
            | (F.col("sc") != F.col("bc"))
        )
        .select(
            F.coalesce("st", "bt").alias("event_type"),
            F.coalesce("sb", "bb").cast("int").alias("bin"),
            F.col("sc").cast("bigint").alias("stream_cnt"),
            F.col("bc").cast("bigint").alias("batch_cnt"),
        )
    )


STREAM_QHIST_DIFF_ORACLE = """
SELECT CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS INT) AS bin,
       CAST(NULL AS BIGINT) AS stream_cnt, CAST(NULL AS BIGINT) AS batch_cnt
WHERE 1 = 0
"""
