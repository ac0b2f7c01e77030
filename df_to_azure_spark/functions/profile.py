"""Table profiling: per-column null/distinct statistics in one pass.

The generalization of the reference's widening scans (SURVEY T3/T4) into
a proper profiling operator: every statistic for every column comes out
of a single ``agg`` (one table scan, map-side partials), then unpivots to
one row per column.  On 100 TB this is exactly one read of the table —
the reference's per-column loop would be N reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Returns (column, n_rows, n_nulls, n_distinct) per column.

    ``n_distinct`` is exact (COUNT(DISTINCT col)); swap for
    ``approx_count_distinct`` when profiling runs in a tight SLA at full
    scale — kept exact here so the oracle can pin it.
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"nn__{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"nd__{c}"))
    wide = df.agg(*aggs)

    stack_args = ", ".join(
        f"'{c}', nn__{c}, nd__{c}" for c in cols
    )
    return wide.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) AS (column_name, n_non_null, n_distinct)",
    ).selectExpr(
        "column_name",
        "CAST(__n AS BIGINT) AS n_rows",
        "CAST(__n - n_non_null AS BIGINT) AS n_nulls",
        "CAST(n_distinct AS BIGINT) AS n_distinct",
    )


def corr_matrix(
    df: DataFrame, columns: list[str], scale: int = 2
) -> DataFrame:
    """All pairwise Pearson correlations over ``columns`` from ONE fused
    aggregation scan — the multi-column generalization of the exact-sums
    correlation recipe (see ``plans.analytics5.quantity_price_correlation``):
    inputs cast to DECIMAL(18, scale), the sufficient sums (Σx per column,
    Σxy / Σx² per pair) accumulate as DECIMAL(38, 2·scale) — exact and
    aggregation-order-free, unlike any streaming-float ``corr()`` — and
    each correlation is one double expression over those sums, ROUND(6).

    One table scan for d columns and d·(d+1)/2 pairs (the per-pair loop a
    pandas ``df.corr()`` port would run is d² scans at 100 TB); output is
    one row per unordered pair (col_a ≤ col_b by position, diagonal
    included as a self-check — exactly 1.0 for non-degenerate columns).
    A CONSTANT column has zero variance, so its correlation is
    undefined: every cell involving it (diagonal included) is NULL —
    an explicit, queryable verdict rather than the 0/0 NaN sentinel
    the bare formula would produce."""
    d = len(columns)
    if d < 1:
        raise ValueError("corr_matrix needs at least one column")
    s2 = 2 * scale
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for i, c in enumerate(columns):
        aggs.append(
            F.expr(f"SUM(CAST({c} AS DECIMAL(18,{scale})))").alias(f"s{i}")
        )
    for i in range(d):
        for j in range(i, d):
            aggs.append(
                F.expr(
                    f"SUM(CAST(CAST({columns[i]} AS DECIMAL(18,{scale}))"
                    f" * CAST({columns[j]} AS DECIMAL(18,{scale}))"
                    f" AS DECIMAL(38,{s2})))"
                ).alias(f"p{i}_{j}")
            )
    wide = df.agg(*aggs)
    def _var(i: int) -> str:
        return (
            f"(CAST(n AS DOUBLE) * CAST(p{i}_{i} AS DOUBLE)"
            f" - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE))"
        )

    cells = ", ".join(
        f"named_struct('col_a', '{columns[i]}', 'col_b', '{columns[j]}',"
        " 'corr',"
        f" CASE WHEN {_var(i)} = 0.0D OR {_var(j)} = 0.0D THEN NULL"
        f" ELSE ROUND((CAST(n AS DOUBLE) * CAST(p{i}_{j} AS DOUBLE)"
        f"        - CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE))"
        f" / SQRT({_var(i)} * {_var(j)}), 6) END)"
        for i in range(d)
        for j in range(i, d)
    )
    return wide.select(F.explode(F.expr(f"array({cells})")).alias("c")).select(
        F.col("c.col_a").alias("col_a"),
        F.col("c.col_b").alias("col_b"),
        F.col("c.corr").alias("corr"),
    )
