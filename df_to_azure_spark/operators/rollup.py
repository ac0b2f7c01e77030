"""Incremental aggregate maintenance — keep a grouped rollup (COUNT /
SUM / MIN / MAX per key) up to date under append-only ingestion without
rescanning the base table.

This is the materialized-view-maintenance move every warehouse makes at
scale: the delta batch aggregates to per-key PARTIALS (delta-sized),
and partials MERGE with the stored rollup by the aggregates' own
combine functions (SUM adds, COUNT adds, MIN/MAX fold) — one keyed
full-outer join on frames bounded by |keys touched|, never a scan of
history.  Valid for APPEND-ONLY feeds: deletes/updates would need
retractable aggregates (count/sum could subtract, MIN/MAX could not) —
enforced by contract and documented, same stance as the reference's
append path (`/root/reference/df_to_azure/export.py` upload modes; the
reference has no aggregate maintenance at all — engine-extension).

Exactness: SUM columns are widened to DECIMAL(38,6) partials so the
stored state is aggregation-order-free and overflow-safe; re-running
``init`` from the full base always reproduces the maintained state
bit-for-bit (the equivalence the tests pin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from df_to_azure_spark.operators.lake import ParquetLake

__all__ = ["IncrementalRollup"]


class IncrementalRollup:
    """Maintain ``(keys, n_rows, sum_<c>, min_<c>, max_<c>)`` in a lake
    table under append-only deltas."""

    def __init__(
        self,
        lake: ParquetLake,
        table: str,
        keys: list[str],
        value_cols: list[str],
    ):
        if not keys or not value_cols:
            raise ValueError("IncrementalRollup needs keys and value_cols")
        self.lake = lake
        self.table = table
        self.keys = list(keys)
        self.value_cols = list(value_cols)

    def _partials(self, df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
        for c in self.value_cols:
            aggs.append(
                F.sum(F.col(c).cast("decimal(38,6)")).alias(f"sum_{c}")
            )
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
        return df.groupBy(*self.keys).agg(*aggs)

    def init(self, base: DataFrame) -> None:
        """Full build from the base table (also the recovery path)."""
        self.lake.write(self._partials(base), self.table, method="create")

    def apply_delta(self, delta: DataFrame) -> None:
        """Fold one append-only micro-batch into the stored rollup.
        Keys must be non-null (the grouping contract)."""
        d = self._partials(delta)
        for c in d.columns:
            d = d.withColumnRenamed(c, f"__d_{c}")
        s = self.lake.read(self.table)
        cond = None
        for k in self.keys:
            e = s[k] == d[f"__d_{k}"]
            cond = e if cond is None else (cond & e)
        merged_cols = [
            F.coalesce(
                s["n_rows"] + d["__d_n_rows"], s["n_rows"], d["__d_n_rows"]
            ).cast("bigint").alias("n_rows")
        ]
        for c in self.value_cols:
            merged_cols.append(
                F.coalesce(
                    s[f"sum_{c}"] + d[f"__d_sum_{c}"],
                    s[f"sum_{c}"],
                    d[f"__d_sum_{c}"],
                ).alias(f"sum_{c}")
            )
            # Spark's least/greatest skip NULLs, which is exactly the
            # one-sided-key merge semantics needed here
            merged_cols.append(
                F.least(s[f"min_{c}"], d[f"__d_min_{c}"]).alias(f"min_{c}")
            )
            merged_cols.append(
                F.greatest(s[f"max_{c}"], d[f"__d_max_{c}"]).alias(f"max_{c}")
            )
        joined = s.join(d, cond, "full_outer").select(
            *[F.coalesce(s[k], d[f"__d_{k}"]).alias(k) for k in self.keys],
            *merged_cols,
        )
        # materialize before the swap: the lazy plan reads the very
        # snapshot the swap replaces (same self-overwrite trap as upsert)
        self.lake._swap_in(joined.localCheckpoint(), self.table)

    def read(self) -> DataFrame:
        return self.lake.read(self.table)
