"""Property-based check of the upsert algebra against an in-Python
reference model (hypothesis generates key/value frames; the distributed
anti-join+union must match dict-semantics row-level upsert exactly)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from df_to_azure_spark.operators.upsert import upsert_frames

ROWS = st.lists(
    st.tuples(st.integers(0, 20), st.integers(-1000, 1000)),
    min_size=0,
    max_size=25,
)


def _dedup_keys(rows):
    seen, out = set(), []
    for k, v in rows:
        if k not in seen:
            seen.add(k)
            out.append((k, v))
    return out


@settings(max_examples=15, deadline=None)
@given(new=ROWS, existing=ROWS)
def test_upsert_matches_dict_model(spark, new, existing):
    new = _dedup_keys(new)
    existing = _dedup_keys(existing)
    new_df = spark.createDataFrame(new or [(999999, 0)], "k long, v long")
    ex_df = spark.createDataFrame(existing or [(999998, 0)], "k long, v long")
    if not new:
        new_df = new_df.where("k < 0")
    if not existing:
        ex_df = ex_df.where("k < 0")

    model = dict(existing)
    model.update(dict(new))  # row-level: new wins on key collision

    out = upsert_frames(new_df, ex_df, ["k"], sort=False, check_keys=False)
    got = {r.k: r.v for r in out.collect()}
    assert got == model
