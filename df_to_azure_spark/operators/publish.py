"""Write-audit-publish (WAP): gate every lake publish behind a
declarative expectations audit, so a bad batch can never land in the
serving table.

The Iceberg/DLT pattern: stage → audit → publish.  Here the audit is
the one-scan fused-aggregate report from ``operators.expectations``,
and the publish is the lake's snapshot-swap write — if ANY rule exceeds
its violation tolerance the publish raises and the target table is left
byte-identical (nothing was written).  Optionally the violating rows
divert to a quarantine table (DLT's ``expect_or_drop``) and only the
clean rows publish.

The reference ships frames to Azure unconditionally
(`/root/reference/df_to_azure/export.py` upload flow — no audit gate);
engine-extension per the governance brief.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from df_to_azure_spark.exceptions import PipelineRunError
from df_to_azure_spark.operators.expectations import (
    Expectation,
    evaluate_expectations,
)
from df_to_azure_spark.operators.lake import ParquetLake

__all__ = ["AuditFailedError", "PublishReport", "publish_with_audit"]


class AuditFailedError(PipelineRunError):
    """The expectations audit exceeded tolerance; nothing was published."""


@dataclass(frozen=True)
class PublishReport:
    table: str
    n_rows_in: int
    n_rows_published: int
    n_rows_quarantined: int
    audit: list  # Row(rule, n_rows, n_violations, pass) per rule


def publish_with_audit(
    lake: ParquetLake,
    df: DataFrame,
    table: str,
    rules: list[Expectation],
    method: str = "create",
    id_field: list[str] | str | None = None,
    max_violation_frac: float = 0.0,
    quarantine_table: str | None = None,
    batch_id: str | None = None,
) -> PublishReport:
    """Audit ``df`` against ``rules``, then publish via the lake writer.

    - ``max_violation_frac = 0.0`` (default): any violating row on any
      rule aborts with ``AuditFailedError`` — the strict gate.
    - With ``quarantine_table``: rows violating ANY rule are written
      there (append) and only clean rows publish; the tolerance then
      applies to the QUARANTINED fraction, so a feed that suddenly
      rots past the threshold still aborts instead of silently
      quarantining itself away.

    Retry contract (round-9 ADVICE): retries are safe by construction
    for idempotent methods (``create`` overwrites, ``upsert`` is keyed).
    For ``method='append'`` pass a caller-stable ``batch_id`` — the
    publish then writes a per-batch marker next to the table and a
    retry that finds the marker SKIPS the clean-row append instead of
    duplicating already-published rows (the quarantine append still
    runs, repairing a crash between the two writes).  An ``append``
    without ``batch_id`` keeps the documented non-atomic window: a
    crash after the publish write but before return means a blind retry
    appends the batch twice.

    One audit scan (fused aggregate), one publish write, at most one
    quarantine write — no per-rule passes.

    On a :class:`~df_to_azure_spark.operators.manifest.VersionedLake`
    the ``batch_id`` marker is recorded INSIDE the atomic manifest
    commit, so for the PUBLISHED table "rows published" and "marker
    exists" are one fact and the publish-succeeds-then-marker-crashes
    window of the plain lake's side-file marker does not exist.  The
    quarantine append is a separate commit carrying its own derived
    marker (``<batch_id>.q``): a crash between the two writes loses
    nothing — the retry skips the already-marked publish and replays
    only the missing quarantine append, never duplicating either.

    On a plain ``ParquetLake`` with ``batch_id`` set, the quarantine
    append carries the same derived marker as a SIDE FILE
    (``_batches/<batch_id>.q`` under the quarantine table) — so a retry
    never re-appends already-quarantined rows either; the side-file
    marker keeps the plain lake's documented non-atomic window (marker
    lands after the write, so a crash exactly between them re-appends
    once on retry — duplicates possible, drops impossible)."""
    from df_to_azure_spark.operators.manifest import VersionedLake

    if not rules:
        raise ValueError("publish_with_audit needs at least one rule")
    versioned = isinstance(lake, VersionedLake)
    marker_fs = marker_path = None
    already_published = False
    if batch_id is not None:
        if "/" in batch_id or batch_id in ("", ".", ".."):
            raise ValueError(f"batch_id {batch_id!r} must be a plain token")
        if versioned:
            already_published = lake.has_batch(table, batch_id)
        else:
            marker = f"{lake.table_dir(table)}/_batches/{batch_id}"
            marker_fs, marker_path, _ = lake._fs(marker)
            already_published = marker_fs.exists(marker_path)
    audit_rows = evaluate_expectations(df, rules).collect()
    n_in = int(audit_rows[0]["n_rows"]) if audit_rows else 0
    worst = max((r["n_violations"] for r in audit_rows), default=0)

    if quarantine_table is None:
        if worst > max_violation_frac * n_in:
            failing = [
                r["rule"] for r in audit_rows if r["n_violations"] > 0
            ]
            raise AuditFailedError(
                f"publish to {table!r} aborted: rules {failing} exceed "
                f"tolerance {max_violation_frac} (worst {worst}/{n_in} rows)"
            )
        if not already_published:
            if versioned and batch_id is not None:
                lake.write(
                    df, table, method=method, id_field=id_field,
                    batch_id=batch_id,
                )
            else:
                lake.write(df, table, method=method, id_field=id_field)
                if marker_path is not None:
                    marker_fs.createNewFile(marker_path)
        return PublishReport(table, n_in, n_in, 0, audit_rows)

    clean_pred = F.lit(True)
    for e in rules:
        clean_pred = clean_pred & F.coalesce(e.condition, F.lit(False))
    # one boolean column, evaluated once per branch — the two writes
    # partition the input exactly
    flagged = df.withColumn("__clean", clean_pred)
    dirty = flagged.where(~F.col("__clean")).drop("__clean")
    clean = flagged.where(F.col("__clean")).drop("__clean")
    n_dirty = dirty.count()
    if n_dirty > max_violation_frac * n_in:
        raise AuditFailedError(
            f"publish to {table!r} aborted: {n_dirty}/{n_in} rows violate "
            f"the rule set, over tolerance {max_violation_frac}"
        )
    # Clean rows publish FIRST, quarantine after (round-8 ADVICE): if the
    # publish write fails, nothing has landed anywhere and a retry of the
    # whole call is clean; the old order left this batch's dirty rows in
    # the quarantine table on a failed publish, so the retry appended
    # them twice.  The two writes are still non-atomic — a crash in the
    # window between them loses only the quarantine audit trail, never
    # published data.  Re-running the call repairs it safely when the
    # method is idempotent (create/upsert) or when ``batch_id`` is set
    # (the marker below makes the retry skip the clean append); an
    # unmarked append retry after a mid-window crash duplicates the
    # published rows — see the retry contract in the docstring.
    if not already_published:
        if versioned and batch_id is not None:
            lake.write(
                clean, table, method=method, id_field=id_field,
                batch_id=batch_id,
            )
        else:
            lake.write(clean, table, method=method, id_field=id_field)
            if marker_path is not None:
                marker_fs.createNewFile(marker_path)
    if n_dirty:
        method_q = "append" if lake.exists(quarantine_table) else "create"
        if versioned and batch_id is not None:
            # the quarantine commit carries its own derived marker, so a
            # retry after a crash anywhere in this function duplicates
            # neither published nor quarantined rows (round-11 ADVICE:
            # the published table's marker alone left this append
            # unguarded on retries)
            q_marker = f"{batch_id}.q"
            if not lake.has_batch(quarantine_table, q_marker):
                lake.write(
                    dirty, quarantine_table, method=method_q,
                    batch_id=q_marker,
                )
        elif batch_id is not None:
            # mirror the versioned path's derived marker with a side
            # file (round-12 ADVICE): without it, a retry after a crash
            # that followed a successful quarantine append would skip
            # the publish (marker exists) but re-append the dirty rows,
            # duplicating the quarantine table.  Same non-atomic window
            # as the plain lake's publish marker, same direction: the
            # marker lands AFTER the write, so a crash between them
            # re-appends once — never silently drops.
            q_marker = f"{lake.table_dir(quarantine_table)}/_batches/{batch_id}.q"
            q_fs, q_path, _ = lake._fs(q_marker)
            if not q_fs.exists(q_path):
                lake.write(dirty, quarantine_table, method=method_q)
                q_fs.mkdirs(q_path.getParent())
                q_fs.createNewFile(q_path)
        else:
            lake.write(dirty, quarantine_table, method=method_q)
    return PublishReport(table, n_in, n_in - n_dirty, n_dirty, audit_rows)
