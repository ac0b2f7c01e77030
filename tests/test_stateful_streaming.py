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


class _FakeState:
    """Minimal GroupState stand-in to drive _session_update directly —
    the only way to exercise multi-micro-batch state transitions in a
    unit test (processAllAvailable over one file is a single batch)."""

    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None
        self.timeout_set = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self.exists, self._v = True, v

    def remove(self):
        self.exists, self._v = False, None

    def getCurrentWatermarkMs(self):
        return 0

    def setTimeoutTimestamp(self, ms):
        self.timeout_set = ms


def _feed(state, ts_us):
    import pandas as pd

    from df_to_azure_spark.streaming.stateful import _session_update

    pdf = pd.DataFrame({"ts": pd.to_datetime(ts_us, unit="us")})
    return list(_session_update(("u1",), iter([pdf]), state))


def test_late_event_lowers_carried_session_start():
    from df_to_azure_spark.streaming.stateful import _SESSION_GAP_US as GAP

    base = 10 * GAP
    state = _FakeState()
    assert _feed(state, [base]) == []
    assert state._v == (base, base, 1)
    # a late-but-within-watermark event BEFORE the carried start, within
    # the gap: must merge AND lower session_start (batch takes min(ts))
    late = base - GAP // 2
    assert _feed(state, [late]) == []
    assert state._v == (late, base, 2)


def test_late_event_beyond_gap_splits_into_earlier_session():
    from df_to_azure_spark.streaming.stateful import _SESSION_GAP_US as GAP

    base = 10 * GAP
    state = _FakeState()
    _feed(state, [base])
    early = base - 3 * GAP
    out = _feed(state, [early])
    # the early event can't reach the open session: it closes as its own
    # earlier session; the open session's state is untouched
    assert len(out) == 1
    row = out[0].iloc[0]
    assert int(row["session_start"].value // 1000) == early
    assert int(row["session_end"].value // 1000) == early
    assert row["n_events"] == 1
    assert state._v == (base, base, 1)


def test_late_chain_bridges_into_carried_session():
    from df_to_azure_spark.streaming.stateful import _SESSION_GAP_US as GAP

    base = 10 * GAP
    state = _FakeState()
    _feed(state, [base])
    # two late events chaining within gap of each other AND of the start:
    # the whole chain folds into the open session, start drops to t1
    t1, t2 = base - GAP - GAP // 2, base - GAP // 2
    assert _feed(state, [t1, t2]) == []
    assert state._v == (t1, base, 3)


def test_streaming_heavy_hitters_multibatch_state_carry(spark, sf_smoke, tmp_path):
    """Stream the corpus in FOUR micro-batches (maxFilesPerTrigger=1) and
    assert (a) state really carried across batches (several snapshots
    per bucket, monotone versions) and (b) the final candidate union is
    a superset of the exact >1% heavy hitters of the whole corpus."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    from df_to_azure_spark.functions.text import tokens as tok_expr
    from df_to_azure_spark.streaming.stateful import (
        streaming_heavy_hitter_candidates,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    src = str(tmp_path / "docs_split")
    docs.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    raw = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    toks = raw.select(F.explode(tok_expr("text")).alias("tok"))
    q = (
        streaming_heavy_hitter_candidates(toks, buckets=4, counters=64)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("hh_mb_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    snap = spark.sql("SELECT * FROM hh_mb_out")
    per_bucket = {
        r.bucket: r.n for r in
        snap.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # 4 files -> up to 4 batches; every bucket must have folded >1 batch
    assert all(n > 1 for n in per_bucket.values()), per_bucket
    w = W.partitionBy("bucket").orderBy(F.desc("version"))
    cands = {
        r.tok
        for r in snap.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.explode("items").alias("tok"))
        .collect()
    }
    batch_toks = docs.select(F.explode(tok_expr("text")).alias("tok"))
    total = batch_toks.count()
    exact_hh = {
        r.tok
        for r in batch_toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * 100 > total)
        .collect()
    }
    assert exact_hh and exact_hh <= cands
