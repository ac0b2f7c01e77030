"""Write-audit-publish gate tests: bad batches never land, quarantine
splits exactly, tolerance math is on the quarantined fraction."""

from __future__ import annotations

import pytest

from df_to_azure_spark.operators.expectations import in_range, not_null
from df_to_azure_spark.operators.lake import ParquetLake
from df_to_azure_spark.operators.publish import (
    AuditFailedError,
    publish_with_audit,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id int, v int")


def test_strict_gate_blocks_and_leaves_target_untouched(spark, tmp_path):
    lake = ParquetLake(spark, str(tmp_path))
    good = _df(spark, [(1, 5), (2, 7)])
    rules = [not_null("v"), in_range("v", 0, 10)]
    rep = publish_with_audit(lake, good, "t", rules)
    assert rep.n_rows_published == 2 and rep.n_rows_quarantined == 0
    assert lake.read("t").count() == 2

    bad = _df(spark, [(3, 99)])
    with pytest.raises(AuditFailedError, match="v_in_range"):
        publish_with_audit(lake, bad, "t", rules, method="append")
    # target untouched by the failed publish
    assert lake.read("t").count() == 2


def test_quarantine_splits_rows_exactly(spark, tmp_path):
    lake = ParquetLake(spark, str(tmp_path))
    mixed = _df(spark, [(1, 5), (2, None), (3, 50), (4, 9)])
    rules = [not_null("v"), in_range("v", 0, 10)]
    rep = publish_with_audit(
        lake, mixed, "t", rules,
        max_violation_frac=0.6, quarantine_table="t_bad",
    )
    assert rep.n_rows_in == 4
    assert rep.n_rows_published == 2 and rep.n_rows_quarantined == 2
    assert {r.id for r in lake.read("t").collect()} == {1, 4}
    assert {r.id for r in lake.read("t_bad").collect()} == {2, 3}


def test_quarantine_tolerance_still_aborts(spark, tmp_path):
    lake = ParquetLake(spark, str(tmp_path))
    rotten = _df(spark, [(1, None), (2, None), (3, 5)])
    with pytest.raises(AuditFailedError, match="over tolerance"):
        publish_with_audit(
            lake, rotten, "t", [not_null("v")],
            max_violation_frac=0.5, quarantine_table="t_bad",
        )
    assert not lake.exists("t")
