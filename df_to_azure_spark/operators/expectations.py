"""Declarative data-quality expectations evaluated in ONE scan.

The DLT/dbt-style contract: a pipeline declares row-level rules
(not-null, in-range, set-membership, regex, cross-column) and gets a
violation report per rule — without N passes over the data.  Every rule
compiles to a conditional COUNT in a single fused aggregate, so the
whole report costs one scan + one 1-row reduction regardless of how
many rules are declared (the same fused-aggregate trick as
``schema.widening_scan``, which collapses the reference's per-column
bound loops — `/root/reference/df_to_azure/export.py:259,277` — into
one job).

Uniqueness/FK rules need a shuffle by nature and live elsewhere
(``checks.validate_unique_keys``, the ``fk_orphan_check`` query); this
module is the scan-shaped family.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """``name`` labels the report row; ``condition`` is the PASS
    predicate — rows where it is False OR NULL count as violations
    (a NULL comparison is a failed expectation, not a free pass)."""

    name: str
    condition: Column


def not_null(col: str) -> Expectation:
    return Expectation(f"{col}_not_null", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"{col}_in_range", (F.col(col) >= lo) & (F.col(col) <= hi)
    )


def in_set(col: str, values: list) -> Expectation:
    return Expectation(f"{col}_in_set", F.col(col).isin(values))


def matches(col: str, pattern: str) -> Expectation:
    return Expectation(f"{col}_matches", F.col(col).rlike(pattern))


def evaluate_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> DataFrame:
    """→ ``(rule, n_rows, n_violations, pass)`` — one row per rule, one
    scan total.  ``pass`` is zero-violations; thresholded quarantine
    (DLT's ``expect_or_drop``) composes as
    ``df.where(rule.condition)`` with the same Column.
    """
    if not expectations:
        raise ValueError("evaluate_expectations: empty rule list")
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names in {names}")
    # ASCII-only: str.isalnum() admits non-ASCII alphanumerics (e.g.
    # 'prix_élevé') that Spark's unquoted-identifier grammar then rejects
    # with a confusing parse error when spliced as v_<name> aliases.
    bad = [n for n in names if not re.fullmatch(r"[A-Za-z0-9_]+", n)]
    if bad:
        # names are spliced into stack(...) literals and v_<name> aliases
        raise ValueError(
            f"expectation names must be ASCII alphanumeric/underscore, got {bad}"
        )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for e in expectations:
        # violation = NOT coalesce(condition, false): NULL-result rows fail
        aggs.append(
            F.count(
                F.when(~F.coalesce(e.condition, F.lit(False)), 1)
            ).alias(f"v_{e.name}")
        )
    row = df.agg(*aggs)
    stacked = ", ".join(f"'{e.name}', v_{e.name}" for e in expectations)
    return row.selectExpr(
        f"stack({len(expectations)}, {stacked}) AS (rule, n_violations)",
        "n_rows",
    ).select(
        "rule",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
        (F.col("n_violations") == 0).alias("pass"),
    )
