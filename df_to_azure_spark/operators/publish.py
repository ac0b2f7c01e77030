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
) -> PublishReport:
    """Audit ``df`` against ``rules``, then publish via the lake writer.

    - ``max_violation_frac = 0.0`` (default): any violating row on any
      rule aborts with ``AuditFailedError`` — the strict gate.
    - With ``quarantine_table``: rows violating ANY rule are written
      there (append) and only clean rows publish; the tolerance then
      applies to the QUARANTINED fraction, so a feed that suddenly
      rots past the threshold still aborts instead of silently
      quarantining itself away.

    One audit scan (fused aggregate), one publish write, at most one
    quarantine write — no per-rule passes."""
    if not rules:
        raise ValueError("publish_with_audit needs at least one rule")
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
        lake.write(df, table, method=method, id_field=id_field)
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
    # published data, and re-running the call repairs it (the quarantine
    # append then duplicates only if the PUBLISH also succeeded, which a
    # caller can detect via the returned PublishReport).
    lake.write(clean, table, method=method, id_field=id_field)
    if n_dirty:
        method_q = "append" if lake.exists(quarantine_table) else "create"
        lake.write(dirty, quarantine_table, method=method_q)
    return PublishReport(table, n_in, n_in - n_dirty, n_dirty, audit_rows)
