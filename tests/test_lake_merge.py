"""Lake MERGE (W3 on the lake target) and the snapshot-swap concurrency
contract.

The Delta log-backed path is exercised only when delta-spark is
installed (skipped-not-failed otherwise); the fallback algebra and the
reader-visible swap guarantees are tested unconditionally.

delta-spark is not installed in this build environment (pip install
re-attempted through 2026-08-16 round 10 (rounds 6-10): the index host is unreachable — DNS-blocked
sandbox) and the environment contract forbids adding packages, so
``test_delta_merge_when_available`` stays a gated skip here; it runs
the real DeltaTable.merge end-to-end (log-backed create, MERGE, read
back) on any cluster where delta-spark is present.  The routing into
``_delta_merge`` is contract-tested unconditionally below via the API
stand-in.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from df_to_azure_spark.exceptions import WrongMethodError
from df_to_azure_spark.operators.lake import ParquetLake


def _seed(spark, lake, rows):
    df = spark.createDataFrame(rows, "id long, val string")
    lake.write(df, "t", method="create")


def _rows(df):
    return sorted((r.id, r.val) for r in df.collect())


@pytest.fixture()
def lake(spark, tmp_path):
    lake = ParquetLake(spark, str(tmp_path / "lake"))
    _seed(spark, lake, [(1, "a"), (2, "b"), (3, "c")])
    return lake


def test_merge_upsert_both_clauses(spark, lake):
    delta = spark.createDataFrame([(2, "B"), (4, "d")], "id long, val string")
    lake.merge(delta, "t", ["id"])
    assert _rows(lake.read("t")) == [(1, "a"), (2, "B"), (3, "c"), (4, "d")]


def test_merge_update_only_drops_new_keys(spark, lake):
    delta = spark.createDataFrame([(2, "B"), (4, "d")], "id long, val string")
    lake.merge(delta, "t", ["id"], when_not_matched=None)
    assert _rows(lake.read("t")) == [(1, "a"), (2, "B"), (3, "c")]


def test_merge_insert_only_keeps_target_rows(spark, lake):
    delta = spark.createDataFrame([(2, "B"), (4, "d")], "id long, val string")
    lake.merge(delta, "t", ["id"], when_matched=None)
    assert _rows(lake.read("t")) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_merge_noop_when_both_clauses_none(spark, lake):
    delta = spark.createDataFrame([(2, "B")], "id long, val string")
    lake.merge(delta, "t", ["id"], when_matched=None, when_not_matched=None)
    assert _rows(lake.read("t")) == [(1, "a"), (2, "b"), (3, "c")]


def test_merge_rejects_unknown_clause(spark, lake):
    delta = spark.createDataFrame([(2, "B")], "id long, val string")
    with pytest.raises(WrongMethodError):
        lake.merge(delta, "t", ["id"], when_matched="delete")


def test_concurrent_read_during_upsert_swap(spark, lake):
    """The documented reader contract: a plan built BEFORE the swap either
    completes on a whole snapshot or fails with a missing-file error —
    it never returns a torn mix of old and new rows.  A read started
    AFTER the swap always sees the new snapshot."""
    pre_swap_plan = lake.read("t")
    delta = spark.createDataFrame([(2, "B"), (4, "d")], "id long, val string")
    lake.merge(delta, "t", ["id"])

    old = [(1, "a"), (2, "b"), (3, "c")]
    new = [(1, "a"), (2, "B"), (3, "c"), (4, "d")]
    try:
        seen = _rows(pre_swap_plan)
        assert seen in (old, new), f"torn read: {seen}"
    except Exception:
        pass  # missing-file failure is within contract
    assert _rows(lake.read("t")) == new


def test_delta_merge_when_available(spark, tmp_path):
    pytest.importorskip("delta")
    from delta.tables import DeltaTable

    lake = ParquetLake(spark, str(tmp_path / "dlake"))
    path = lake.data_dir("t")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, val string").write.format(
        "delta"
    ).save(path)
    assert DeltaTable.isDeltaTable(spark, path)
    delta = spark.createDataFrame([(2, "B"), (3, "c")], "id long, val string")
    lake.merge(delta, "t", ["id"])
    got = sorted((r.id, r.val) for r in spark.read.format("delta").load(path).collect())
    assert got == [(1, "a"), (2, "B"), (3, "c")]


class _FakeBuilder:
    def __init__(self, log):
        self.log = log

    def whenMatchedUpdateAll(self):
        self.log.append("whenMatchedUpdateAll")
        return self

    def whenNotMatchedInsertAll(self):
        self.log.append("whenNotMatchedInsertAll")
        return self

    def execute(self):
        self.log.append("execute")


class _FakeTarget:
    def __init__(self, log):
        self.log = log

    def alias(self, a):
        self.log.append(f"alias:{a}")
        return self

    def merge(self, src, cond):
        self.log.append(f"merge:{cond}")
        return _FakeBuilder(self.log)


def _install_fake_delta(monkeypatch, log):
    """Inject a delta.tables stand-in so the _delta_merge True path runs
    in this delta-less container — contract coverage for the routing and
    clause algebra, exactly the API surface DeltaTable exposes."""
    import sys
    import types

    class _FakeDeltaTable:
        @staticmethod
        def isDeltaTable(spark, path):
            log.append(f"isDeltaTable:{path}")
            return True

        @staticmethod
        def forPath(spark, path):
            log.append(f"forPath:{path}")
            return _FakeTarget(log)

    tables_mod = types.ModuleType("delta.tables")
    tables_mod.DeltaTable = _FakeDeltaTable
    delta_mod = types.ModuleType("delta")
    delta_mod.tables = tables_mod
    monkeypatch.setitem(sys.modules, "delta", delta_mod)
    monkeypatch.setitem(sys.modules, "delta.tables", tables_mod)


def test_delta_merge_routing_and_clause_algebra(spark, lake, monkeypatch):
    log: list[str] = []
    _install_fake_delta(monkeypatch, log)
    before = _rows(lake.read("t"))
    delta = spark.createDataFrame([(2, "B"), (4, "d")], "id long, val string")
    lake.merge(delta, "t", ["id"])
    # routed to the Delta path: builder driven with BOTH clauses, and the
    # snapshot-swap fallback never ran (table untouched by the fake)
    assert log[-1] == "execute"
    assert "whenMatchedUpdateAll" in log and "whenNotMatchedInsertAll" in log
    assert any(s.startswith("merge:t.`id` <=> s.`id`") for s in log)
    assert _rows(lake.read("t")) == before


def test_delta_merge_insert_only_skips_update_clause(spark, lake, monkeypatch):
    log: list[str] = []
    _install_fake_delta(monkeypatch, log)
    delta = spark.createDataFrame([(4, "d")], "id long, val string")
    lake.merge(delta, "t", ["id"], when_matched=None)
    assert "whenNotMatchedInsertAll" in log
    assert "whenMatchedUpdateAll" not in log
    assert log[-1] == "execute"


def test_delta_merge_falls_back_when_not_a_delta_table(spark, lake, monkeypatch):
    import sys
    import types

    log: list[str] = []

    class _NotDelta:
        @staticmethod
        def isDeltaTable(spark, path):
            log.append("probed")
            return False

    tables_mod = types.ModuleType("delta.tables")
    tables_mod.DeltaTable = _NotDelta
    delta_mod = types.ModuleType("delta")
    delta_mod.tables = tables_mod
    monkeypatch.setitem(sys.modules, "delta", delta_mod)
    monkeypatch.setitem(sys.modules, "delta.tables", tables_mod)

    delta = spark.createDataFrame([(2, "B"), (4, "d")], "id long, val string")
    lake.merge(delta, "t", ["id"])
    # probed the log dir, declined, and the snapshot-swap path did the work
    assert log == ["probed"]
    assert _rows(lake.read("t")) == [(1, "a"), (2, "B"), (3, "c"), (4, "d")]
