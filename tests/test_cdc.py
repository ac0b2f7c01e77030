"""Unit tests for operators.cdc apply_changes / latest_changes."""

from __future__ import annotations

import pytest

from df_to_azure_spark.operators.cdc import apply_changes, latest_changes


def _base(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, val string"
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, "id long, val string, seq long, op string")


def test_latest_seq_wins_and_tombstone_deletes(spark):
    base = _base(spark)
    ch = _changes(spark, [
        (1, "a1", 1, "U"),
        (1, "a2", 2, "U"),   # latest update for key 1
        (2, "x", 1, "U"),
        (2, "x", 2, "D"),    # delete overrides earlier update
        (4, "new", 1, "U"),  # insert of unseen key
    ])
    out = {r.id: r.val for r in apply_changes(base, ch, ["id"]).collect()}
    assert out == {1: "a2", 3: "c", 4: "new"}


def test_same_seq_tie_breaks_to_delete(spark):
    ch = _changes(spark, [(1, "u", 5, "U"), (1, "u", 5, "D")])
    survivor = latest_changes(ch, ["id"]).collect()
    assert len(survivor) == 1 and survivor[0].op == "D"
    out = apply_changes(_base(spark), ch, ["id"]).collect()
    assert {r.id for r in out} == {2, 3}


def test_untouched_rows_pass_through_unchanged(spark):
    base = _base(spark)
    ch = _changes(spark, [(2, "b2", 1, "U")])
    out = sorted(map(tuple, apply_changes(base, ch, ["id"]).collect()))
    assert out == [(1, "a"), (2, "b2"), (3, "c")]


def test_missing_feed_columns_raise(spark):
    bad = _base(spark)  # no seq/op
    with pytest.raises(ValueError, match="lacks columns"):
        apply_changes(_base(spark), bad, ["id"])


def test_partitioning_invariant(spark):
    base = _base(spark)
    rows = [(i % 5, f"v{i}", i, "U" if i % 4 else "D") for i in range(40)]
    ch = _changes(spark, rows)
    a = sorted(map(tuple, apply_changes(base, ch, ["id"]).collect()))
    b = sorted(map(tuple, apply_changes(base, ch.repartition(7), ["id"]).collect()))
    assert a == b


# ---------------------------------------------------------------- property

from hypothesis import given, settings, strategies as st

_KEYS = st.integers(min_value=0, max_value=6)
_CHANGE = st.tuples(
    _KEYS,                                   # id
    st.text("ab", min_size=1, max_size=3),   # val
    st.integers(min_value=0, max_value=9),   # seq
    st.sampled_from(["U", "D"]),             # op
)
_FEED = st.lists(_CHANGE, min_size=0, max_size=25)
_BASE = st.dictionaries(_KEYS, st.text("xy", min_size=1, max_size=3), max_size=7)


def _model(base: dict, feed: list) -> dict:
    """Reference semantics in plain python: per key, survivor = max seq,
    ties to 'D'; D removes, U upserts, untouched keys pass through."""
    best: dict = {}
    for kid, val, seq, op in feed:
        cur = best.get(kid)
        if cur is None or (seq, op == "D") > (cur[1], cur[2] == "D"):
            best[kid] = (val, seq, op)
    out = dict(base)
    for kid, (val, _seq, op) in best.items():
        if op == "D":
            out.pop(kid, None)
        else:
            out[kid] = val
    return out


@settings(max_examples=15, deadline=None)
@given(base=_BASE, feed=_FEED)
def test_apply_changes_matches_dict_model(spark, base, feed):
    # the contract requires (key, seq, op) unique — keep one payload per
    # triple (duplicate-payload survivors are unspecified by design)
    seen = {}
    for kid, val, seq, op in feed:
        seen.setdefault((kid, seq, op), (kid, val, seq, op))
    feed = list(seen.values())
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(99, "sentinel")],
        "id long, val string",
    )
    if not base:
        base_df = base_df.where("id < 0")  # truly empty, schema kept
    ch = spark.createDataFrame(feed or [(0, "z", 0, "U")], "id long, val string, seq long, op string")
    if not feed:
        ch = ch.where("id < 0")
    got = {r.id: r.val for r in apply_changes(base_df, ch, ["id"]).collect()}
    assert got == _model(base, feed)
