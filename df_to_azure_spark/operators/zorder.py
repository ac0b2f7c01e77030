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
    if bits * n > 63:
        raise ValueError(
            f"zorder_key: bits*len(cols) = {bits * n} exceeds 63 — the key "
            "would reach the long sign bit (negative keys break range "
            "partitioning) or wrap shiftleft's modulo-64 semantics; lower "
            "bits or cluster fewer columns"
        )
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
    from pyspark.sql import types as T

    numeric = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType, T.DateType,
        T.TimestampType, T.TimestampNTZType,
    )
    for c in cols:
        if not isinstance(df.schema[c].dataType, numeric):
            raise ValueError(
                f"zorder column {c!r} has non-numeric type "
                f"{df.schema[c].dataType.simpleString()}: its cast to double "
                "would be NULL for every row and the column would silently "
                "contribute zero clustering"
            )
    exprs = []
    for c in cols:
        exprs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
        exprs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
    row = df.agg(*exprs).collect()[0].asDict()
    out = {}
    for c in cols:
        lo, hi = row[f"__min_{c}"], row[f"__max_{c}"]
        if lo is None or hi is None:
            raise ValueError(
                f"zorder column {c!r} has no non-NULL values (or the input "
                "is empty) — cannot derive a quantization range"
            )
        out[c] = (lo, hi)
    return out


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
    if "__zkey" in df.columns:
        raise ValueError(
            "input already has a __zkey column — rename it before Z-ordering"
        )
    stats = column_minmax(df, cols)
    keyed = df.withColumn("__zkey", zorder_key(cols, stats, bits))
    if num_files:
        keyed = keyed.repartitionByRange(num_files, "__zkey")
    else:
        keyed = keyed.repartitionByRange("__zkey")
    return keyed.sortWithinPartitions("__zkey").drop("__zkey")


def file_skipping_profile(
    spark, path: str, cols: list[str]
) -> DataFrame:
    """Per-file min/max/count profile of a parquet table — the
    clustering-quality introspection for min/max data skipping: these
    are exactly the ranges parquet footers carry, so a predicate prunes
    a file iff its interval misses the file's [min, max] here.  Run it
    after ``zorder_layout`` (or any re-clustering) to SEE whether the
    layout actually tightened per-file ranges instead of trusting that
    it did.

    One scan grouped by ``input_file_name()`` — output is one row per
    data file (bounded by file count, not rows)."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
    )


def skipping_effectiveness(
    profile: DataFrame, col: str, lo, hi
) -> DataFrame:
    """Given a :func:`file_skipping_profile`, the one-row pruning summary
    for predicate ``col BETWEEN lo AND hi``: how many files a min/max
    reader skips outright, and what fraction of rows they held.  The
    skip test mirrors the reader's: a file survives only if
    ``[min, max]`` overlaps ``[lo, hi]``."""
    skippable = (F.col(f"{col}_max") < F.lit(lo)) | (
        F.col(f"{col}_min") > F.lit(hi)
    )
    return profile.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum(skippable.cast("long")).cast("bigint").alias("n_skipped"),
        F.round(
            F.sum(skippable.cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("file_skip_ratio"),
        F.round(
            F.sum(F.when(skippable, F.col("n_rows")).otherwise(0)).cast("double")
            / F.sum("n_rows").cast("double"),
            6,
        ).alias("row_skip_ratio"),
    )
