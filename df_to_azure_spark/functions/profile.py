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
