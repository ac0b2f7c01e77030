"""Property-based check of the binned interval joins against quadratic
in-Python references: hypothesis generates small point/interval sets on
a coarse integer timeline (forcing bucket-boundary and multi-bucket
cases), and the distributed binned plan must produce exactly the
brute-force pair set — for several bucket widths, including widths
smaller and larger than every interval."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from df_to_azure_spark.operators.intervaljoin import (
    interval_overlap_join,
    interval_point_join,
)

_EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds: int) -> dt.datetime:
    return _EPOCH + dt.timedelta(seconds=seconds)


# offsets in seconds on a ±2-bucket timeline (bucket = 600 s below), with
# values clustered near multiples of 600 to hit boundary cases
_OFFSETS = st.integers(min_value=0, max_value=2400)

POINTS = st.lists(_OFFSETS, min_size=0, max_size=6)
INTERVALS = st.lists(
    st.tuples(_OFFSETS, st.integers(min_value=0, max_value=1500)),
    min_size=0,
    max_size=5,
)


@settings(max_examples=12, deadline=None)
@given(points=POINTS, intervals=INTERVALS, width=st.sampled_from([60, 600, 3600]))
def test_interval_point_join_equals_bruteforce(spark, points, intervals, width):
    pts = spark.createDataFrame(
        [(i, _ts(s)) for i, s in enumerate(points)] or [(None, None)],
        "pid int, ts timestamp",
    ).where("pid IS NOT NULL")
    ivs = spark.createDataFrame(
        [(j, _ts(s), _ts(s + ln)) for j, (s, ln) in enumerate(intervals)]
        or [(None, None, None)],
        "iid int, s timestamp, e timestamp",
    ).where("iid IS NOT NULL")
    got = sorted(
        (r.pid, r.iid)
        for r in interval_point_join(
            pts, ivs, "ts", "s", "e", bucket_seconds=width
        ).collect()
    )
    expect = sorted(
        (i, j)
        for i, p in enumerate(points)
        for j, (s, ln) in enumerate(intervals)
        if s <= p <= s + ln
    )
    assert got == expect


@settings(max_examples=12, deadline=None)
@given(left=INTERVALS, right=INTERVALS)
def test_interval_overlap_join_equals_bruteforce(spark, left, right):
    lf = spark.createDataFrame(
        [(i, "k", s, s + ln) for i, (s, ln) in enumerate(left)]
        or [(None, None, None, None)],
        "lid int, lk string, ls int, le int",
    ).where("lid IS NOT NULL")
    rf = spark.createDataFrame(
        [(j, "k", s, s + ln) for j, (s, ln) in enumerate(right)]
        or [(None, None, None, None)],
        "rid int, rk string, rs int, re int",
    ).where("rid IS NOT NULL")
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            lf, rf, [("lk", "rk")], "ls", "le", "rs", "re"
        ).collect()
    )
    expect = sorted(
        (i, j)
        for i, (ls, lln) in enumerate(left)
        for j, (rs, rln) in enumerate(right)
        if ls < rs + rln and rs < ls + lln  # half-open overlap
    )
    assert got == expect
