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
