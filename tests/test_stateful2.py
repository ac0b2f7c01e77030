"""transformWithStateInPandas surface (streaming/stateful2).

The worker protocol needs google.protobuf, absent in this container —
the e2e is skipif-gated on the runtime probe, and the processor's
update logic is contract-tested against a fake state handle (same
stand-in pattern as tests/test_lake_merge.py's DeltaTable surface)."""

from __future__ import annotations

import pandas as pd
import pytest

from df_to_azure_spark.streaming.stateful2 import (
    RunningTotalsProcessor,
    has_tws_runtime,
)


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        st = _FakeValueState()
        self.states[name] = (st, schema)
        return st


def test_processor_accumulates_across_batches():
    p = RunningTotalsProcessor()
    handle = _FakeHandle()
    p.init(handle)
    assert "totals" in handle.states

    out1 = list(
        p.handleInputRows((7,), iter([pd.DataFrame({"value": [1.0, 2.0]})]), None)
    )
    assert out1[0].iloc[0].tolist() == [7, 2, 3.0]

    # second micro-batch resumes from state
    out2 = list(
        p.handleInputRows((7,), iter([pd.DataFrame({"value": [4.0]})]), None)
    )
    assert out2[0].iloc[0].tolist() == [7, 3, 7.0]
    assert handle.states["totals"][0].get() == (3, 7.0)


def test_processor_rounding_matches_batch_contract():
    p = RunningTotalsProcessor()
    p.init(_FakeHandle())
    out = list(
        p.handleInputRows(
            (1,), iter([pd.DataFrame({"value": [0.123456, 0.2]})]), None
        )
    )
    assert out[0].iloc[0]["total_value"] == round(0.123456 + 0.2, 4)


@pytest.mark.skipif(
    not has_tws_runtime(),
    reason="transformWithState worker needs google.protobuf (absent here; "
    "pip re-attempted through 2026-08-16 round 10 (rounds 6-10), index host DNS-blocked)",
)
def test_tws_totals_diff_is_empty(spark, sf_smoke):
    from df_to_azure_spark.streaming.stateful2 import stream_tws_totals_diff

    assert stream_tws_totals_diff(spark, sf_smoke).count() == 0
