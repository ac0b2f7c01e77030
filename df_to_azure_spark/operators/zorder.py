"""Z-order (Morton) clustering for multi-column data skipping.

Sorting by one column makes that column's row-group ranges narrow and
every OTHER column's ranges full-width — point/range lookups on a second
column still scan everything.  Interleaving the bits of N normalized
columns into one Z-key and sorting by IT gives every clustered column
simultaneously narrow per-file ranges (each file covers a roughly
rectangular region of the value space), so parquet min/max skipping
works for filters on ANY of them.  This is Delta/Iceberg's
``OPTIMIZE ZORDER BY`` re-expressed as plain Spark: the key is a flat
chain of shift/mask expressions (whole-stage codegen, no UDF), the
layout is ``repartitionByRange + sortWithinPartitions`` on the key.

Column normalization uses global min/max from one bounded aggregate
(2 values per column — driver-safe at any scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    cols: list[str],
    stats: dict[str, tuple[float, float]],
    bits: int = 16,
) -> Column:
    """Morton key: each column scaled to ``[0, 2^bits)`` by its
    ``stats[col] = (min, max)``, then bit-interleaved (column j
    contributes bit i to key position ``i*len(cols) + j``).  Flat
    shift/mask expression chain — stays in codegen."""
    n = len(cols)
    max_q = (1 << bits) - 1
    quantized = []
    for c in cols:
        lo, hi = stats[c]
        span = (hi - lo) or 1.0
        q = F.least(
            F.lit(max_q).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                ((F.col(c).cast("double") - F.lit(float(lo)))
                 * F.lit(float(max_q)) / F.lit(float(span))).cast("long"),
            ),
        )
        quantized.append(q)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(quantized):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def column_minmax(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """One aggregate job → ``{col: (min, max)}`` (2 scalars per column)."""
    exprs = []
    for c in cols:
        exprs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
        exprs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
    row = df.agg(*exprs).collect()[0].asDict()
    return {c: (row[f"__min_{c}"], row[f"__max_{c}"]) for c in cols}


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
) -> DataFrame:
    """Return ``df`` re-laid-out in Z-order on ``cols`` — write the
    result to cluster a table (``ParquetLake.create`` the returned
    frame).  ``num_files`` pins the range-partition count for small
    inputs; at scale leave None and let AQE size files."""
    stats = column_minmax(df, cols)
    keyed = df.withColumn("__zkey", zorder_key(cols, stats, bits))
    if num_files:
        keyed = keyed.repartitionByRange(num_files, "__zkey")
    else:
        keyed = keyed.repartitionByRange("__zkey")
    return keyed.sortWithinPartitions("__zkey").drop("__zkey")
