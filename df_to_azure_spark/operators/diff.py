"""Keyed table diff — the data-diff primitive behind snapshot audits,
CDC validation, and migration sign-off: given two versions of a table
and a key, report what was added, removed, and changed (and where).

No counterpart in the reference (zypp-io/df_to_azure ships frames one
way; `/root/reference/df_to_azure/export.py` has no compare surface);
engine-extension.  The shape is ONE full-outer join on the key plus
null-safe column comparisons — a single shuffle at any scale, with the
per-column change counts folded into the same pass (no per-column
scans, which is what a naive pandas ``compare`` port would do at
100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["diff_rows", "diff_summary"]


def _common_value_cols(old: DataFrame, new: DataFrame, keys: list[str]) -> list[str]:
    common = [c for c in new.columns if c in set(old.columns)]
    return [c for c in common if c not in set(keys)]


def _joined(old: DataFrame, new: DataFrame, keys: list[str]):
    o = old.select(
        *[F.col(k) for k in keys],
        *[
            F.col(c).alias(f"__o_{c}")
            for c in _common_value_cols(old, new, keys)
        ],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[
            F.col(c).alias(f"__n_{c}")
            for c in _common_value_cols(old, new, keys)
        ],
        F.lit(1).alias("__in_new"),
    )
    return o.join(n, keys, "full_outer")


def _changed_expr(cols: list[str]) -> Column:
    """True when any common value column differs (null-safe: NULL→value
    and value→NULL count as changes; NULL→NULL does not)."""
    expr = F.lit(False)
    for c in cols:
        expr = expr | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    return expr


def diff_rows(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Row-level diff: one row per key whose state differs between the
    versions, with ``change_type`` ∈ {'added', 'removed', 'changed'}
    and the list of changed column names.  Unchanged rows are not
    emitted (the common case is a small delta over a huge table — the
    output is delta-sized, not table-sized)."""
    cols = _common_value_cols(old, new, keys)
    j = _joined(old, new, keys)
    changed_cols = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                    F.lit(c),
                )
                for c in cols
            ]
        )
    )
    return (
        j.withColumn(
            "change_type",
            F.when(F.col("__in_old").isNull(), F.lit("added"))
            .when(F.col("__in_new").isNull(), F.lit("removed"))
            .when(_changed_expr(cols), F.lit("changed")),
        )
        .where(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            F.when(F.col("change_type") == "changed", changed_cols)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_columns"),
        )
    )


def diff_summary(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """One-pass diff summary: a single row with added/removed/changed/
    unchanged counts plus a ``(column → n_changed)`` map — every count
    from the SAME full-outer join (no per-column rescans)."""
    cols = _common_value_cols(old, new, keys)
    j = _joined(old, new, keys)
    aggs = [
        F.sum(
            F.when(F.col("__in_old").isNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_added"),
        F.sum(
            F.when(F.col("__in_new").isNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_removed"),
        F.sum(
            F.when(
                F.col("__in_old").isNotNull()
                & F.col("__in_new").isNotNull()
                & _changed_expr(cols),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_changed"),
        F.sum(
            F.when(
                F.col("__in_old").isNotNull()
                & F.col("__in_new").isNotNull()
                & ~_changed_expr(cols),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_unchanged"),
    ]
    for c in cols:
        aggs.append(
            F.sum(
                F.when(
                    F.col("__in_old").isNotNull()
                    & F.col("__in_new").isNotNull()
                    & ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias(f"__chg_{c}")
        )
    wide = j.agg(*aggs)
    kv = []
    for c in cols:
        kv.append(F.lit(c))
        kv.append(F.col(f"__chg_{c}"))
    return wide.select(
        "n_added",
        "n_removed",
        "n_changed",
        "n_unchanged",
        F.create_map(*kv).alias("changed_by_column") if kv else F.create_map().alias("changed_by_column"),
    )
