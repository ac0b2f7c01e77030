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


def test_batch_marker_makes_append_retry_idempotent(spark, tmp_path):
    """A retried append with the same batch_id must NOT duplicate the
    already-published rows (round-9 ADVICE), while a new batch_id
    appends normally."""
    lake = ParquetLake(spark, str(tmp_path))
    rules = [not_null("v")]
    first = _df(spark, [(1, 5), (2, 7)])
    publish_with_audit(lake, first, "t", rules, batch_id="b1")
    assert lake.read("t").count() == 2

    # simulated retry of the SAME batch (crash after publish): skipped
    rep = publish_with_audit(
        lake, first, "t", rules, method="append", batch_id="b1"
    )
    assert lake.read("t").count() == 2
    assert rep.n_rows_in == 2

    # a genuinely new batch still appends
    second = _df(spark, [(3, 9)])
    publish_with_audit(
        lake, second, "t", rules, method="append", batch_id="b2"
    )
    assert lake.read("t").count() == 3


def test_batch_marker_retry_still_repairs_quarantine(spark, tmp_path):
    """Crash-between-writes repair: the retry skips the clean append
    (marker present) but still lands the quarantine rows."""
    lake = ParquetLake(spark, str(tmp_path))
    rules = [not_null("v")]
    mixed = _df(spark, [(1, 5), (2, None)])
    rep1 = publish_with_audit(
        lake, mixed, "t", rules, method="create",
        max_violation_frac=1.0, quarantine_table="q", batch_id="b1",
    )
    assert rep1.n_rows_published == 1 and rep1.n_rows_quarantined == 1
    # wipe the quarantine table to simulate the crash window (publish
    # succeeded + marker written, quarantine write lost)
    import shutil

    shutil.rmtree(str(tmp_path / "q"))
    rep2 = publish_with_audit(
        lake, mixed, "t", rules, method="append",
        max_violation_frac=1.0, quarantine_table="q", batch_id="b1",
    )
    assert lake.read("t").count() == 1  # clean append skipped
    assert lake.read("q").count() == 1  # quarantine repaired
    assert rep2.n_rows_quarantined == 1


def test_batch_id_must_be_plain_token(spark, tmp_path):
    lake = ParquetLake(spark, str(tmp_path))
    with pytest.raises(ValueError, match="plain token"):
        publish_with_audit(
            lake, _df(spark, [(1, 1)]), "t", [not_null("v")],
            batch_id="a/b",
        )


def test_versioned_quarantine_marker_blocks_duplicates_on_retry(spark, tmp_path):
    """On a VersionedLake the quarantine append carries its own derived
    marker (<batch_id>.q), so a blind retry duplicates neither the
    published nor the quarantined rows (round-11 ADVICE: the quarantine
    append previously ran outside any marked commit)."""
    from df_to_azure_spark.operators.manifest import VersionedLake

    lake = VersionedLake(spark, str(tmp_path / "v"))
    rules = [not_null("v")]
    mixed = _df(spark, [(1, 5), (2, None)])
    rep1 = publish_with_audit(
        lake, mixed, "t", rules, method="create",
        max_violation_frac=1.0, quarantine_table="q", batch_id="b1",
    )
    assert rep1.n_rows_published == 1 and rep1.n_rows_quarantined == 1
    # blind retry of the fully-successful call: both writes skipped
    publish_with_audit(
        lake, mixed, "t", rules, method="append",
        max_violation_frac=1.0, quarantine_table="q", batch_id="b1",
    )
    assert lake.read("t").count() == 1
    assert lake.read("q").count() == 1
    assert lake.has_batch("q", "b1.q")


def test_plain_lake_quarantine_marker_blocks_duplicates_on_retry(spark, tmp_path):
    """Round-12 ADVICE: on a plain ParquetLake with batch_id set, a
    blind retry of a fully-successful call used to skip the publish
    (marker present) but RE-APPEND the dirty rows; the side-file
    quarantine marker (_batches/<batch_id>.q) now blocks that."""
    lake = ParquetLake(spark, str(tmp_path))
    rules = [not_null("v")]
    mixed = _df(spark, [(1, 5), (2, None)])
    publish_with_audit(
        lake, mixed, "t", rules, method="create",
        max_violation_frac=1.0, quarantine_table="q", batch_id="b1",
    )
    # blind retry of the fully-successful call: both writes skipped
    publish_with_audit(
        lake, mixed, "t", rules, method="append",
        max_violation_frac=1.0, quarantine_table="q", batch_id="b1",
    )
    assert lake.read("t").count() == 1
    assert lake.read("q").count() == 1  # NOT duplicated
    # a NEW batch with dirty rows still appends to quarantine
    publish_with_audit(
        lake, _df(spark, [(3, 7), (4, None)]), "t", rules, method="append",
        max_violation_frac=1.0, quarantine_table="q", batch_id="b2",
    )
    assert lake.read("t").count() == 2
    assert lake.read("q").count() == 2
