"""As-of join semantics (union+window formulation)."""

from __future__ import annotations

import datetime as dt

from df_to_azure_spark.operators.asof import asof_join


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_matches_latest_preceding(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (1, 101, _ts(30)), (2, 200, _ts(5))],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 900, _ts(8)), (1, 901, _ts(20)), (1, 902, _ts(40)), (3, 903, _ts(0))],
        "user_id long, ref_id long, ts timestamp",
    )
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                    right_payload=["ref_id"])
    m = {r.event_id: (r.ref_id_asof, r.ts_asof) for r in out.collect()}
    assert m[100] == (900, _ts(8))    # latest ref before :10 is :08
    assert m[101] == (901, _ts(20))   # :40 is in the future → :20
    assert m[200] == (None, None)     # no ref rows for user 2


def test_asof_tie_at_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, 100, _ts(10))], "user_id long, event_id long, ts timestamp")
    right = spark.createDataFrame([(1, 900, _ts(10))], "user_id long, ref_id long, ts timestamp")
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                    right_payload=["ref_id"]).collect()
    assert out[0].ref_id_asof == 900  # right row at exactly probe ts matches


def test_asof_forward_matches_earliest_following(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (1, 101, _ts(30)), (2, 200, _ts(5))],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 900, _ts(8)), (1, 901, _ts(20)), (1, 902, _ts(40)), (3, 903, _ts(0))],
        "user_id long, ref_id long, ts timestamp",
    )
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                    right_payload=["ref_id"], direction="forward")
    m = {r.event_id: (r.ref_id_asof, r.ts_asof) for r in out.collect()}
    assert m[100] == (901, _ts(20))   # earliest ref at-or-after :10 is :20
    assert m[101] == (902, _ts(40))
    assert m[200] == (None, None)


def test_asof_nearest_prefers_backward_on_tie(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (1, 101, _ts(31))],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 900, _ts(5)), (1, 901, _ts(15)), (1, 902, _ts(30)), (1, 903, _ts(32))],
        "user_id long, ref_id long, ts timestamp",
    )
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                    right_payload=["ref_id"], direction="nearest")
    m = {r.event_id: r.ref_id_asof for r in out.collect()}
    assert m[100] == 900  # :05 and :15 both 5 min away → backward wins
    assert m[101] == 902  # :30 and :32 both 1 min away → backward wins


def test_asof_tolerance_masks_far_matches(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (1, 101, _ts(50))],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 900, _ts(8)), (1, 901, _ts(20))],
        "user_id long, ref_id long, ts timestamp",
    )
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                    right_payload=["ref_id"], tolerance="INTERVAL 5 MINUTES")
    m = {r.event_id: (r.ref_id_asof, r.ts_asof) for r in out.collect()}
    assert m[100] == (900, _ts(8))    # 2 min back, inside tolerance
    assert m[101] == (None, None)     # latest ref is 30 min back → masked
    # forward with tolerance
    out_f = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                      right_payload=["ref_id"], direction="forward",
                      tolerance="INTERVAL 5 MINUTES")
    m_f = {r.event_id: r.ref_id_asof for r in out_f.collect()}
    assert m_f[100] is None           # next ref is 10 min ahead → masked
    assert m_f[101] is None


def test_asof_disallow_exact_matches(spark):
    left = spark.createDataFrame([(1, 100, _ts(10))], "user_id long, event_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, 900, _ts(10)), (1, 901, _ts(4))],
        "user_id long, ref_id long, ts timestamp",
    )
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                    right_payload=["ref_id"], allow_exact_matches=False).collect()
    assert out[0].ref_id_asof == 901  # the :10 row is excluded, falls to :04
    out_f = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                      right_payload=["ref_id"], direction="forward",
                      allow_exact_matches=False).collect()
    assert out_f[0].ref_id_asof is None  # nothing strictly after :10


def test_asof_direction_guard(spark):
    import pytest

    left = spark.createDataFrame([(1, 100, _ts(1))], "user_id long, event_id long, ts timestamp")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, left, on="user_id", left_ts="ts", right_ts="ts",
                  right_payload=["event_id"], direction="sideways")
