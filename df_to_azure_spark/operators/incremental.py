"""Incremental aggregate maintenance (materialized-view update).

At 100 TB you never recompute a rollup from scratch when a day of data
arrives: combinable aggregates (count, sum, min, max) merge an existing
state with the delta's partial aggregate — work proportional to
|state| + |delta|, not |history|.

``incremental_agg`` re-aggregates ``state ∪ partial(delta)``; since the
measures are combinable, the result is identical to aggregating the full
input, which is exactly what the DuckDB oracle pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_agg(
    df: DataFrame, keys: list[str], sum_cols: dict[str, str]
) -> DataFrame:
    """Aggregate a batch into combinable state: count + typed sums.
    ``sum_cols`` maps output name → input expression (SQL text)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for out, expr in sum_cols.items():
        aggs.append(F.expr(f"SUM({expr})").alias(out))
    return df.groupBy(*keys).agg(*aggs)


def merge_states(state: DataFrame, delta_state: DataFrame, keys: list[str]) -> DataFrame:
    """Combine two states: union + re-sum of every non-key column."""
    measures = [c for c in state.columns if c not in keys]
    unioned = state.unionByName(delta_state)
    return unioned.groupBy(*keys).agg(
        *[F.expr(f"SUM({m})").alias(m) for m in measures]
    )


def incremental_agg(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
) -> DataFrame:
    """State from ``base``, merged with the partial aggregate of
    ``delta`` — equivalent to ``partial_agg(base ∪ delta)``."""
    return merge_states(
        partial_agg(base, keys, sum_cols),
        partial_agg(delta, keys, sum_cols),
        keys,
    )
