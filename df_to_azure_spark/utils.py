"""Small engine utilities (SURVEY §2.5 T7, §2.6 O14)."""

from __future__ import annotations

import logging
import re

logger = logging.getLogger("df_to_azure_spark")

# characters the reference strips from generated resource identifiers
# (adf.py:55-58); kept for any name the engine generates (staging tables,
# checkpoint dirs, stream query names)
_IDENT_UNSAFE = re.compile(r"[<>*#.%&:\\+?/\s]")


def sanitize_identifier(name: str, replacement: str = "-") -> str:
    """Replace filesystem/URL-hostile characters in a generated
    identifier, reference T7 semantics."""
    return _IDENT_UNSAFE.sub(replacement, name)


def log_run_metrics(report) -> None:
    """The reference logs dataRead/dataWritten/copyDuration per pipeline
    run (utils.py:50-53); same shape from the local RunReport."""
    logger.info(
        "table=%s method=%s rows_written=%d duration_sec=%.3f%s",
        report.table,
        report.method,
        report.rows_written,
        report.duration_sec,
        " (skipped: empty input)" if report.skipped_empty else "",
    )
