"""Mergeable frequency sketches — distributed heavy hitters.

The reference (zypp-io/df_to_azure) has no sketch surface; this module
extends the engine for training-data-pipeline work (vocabulary pruning,
hot-key detection, stopword discovery) where the item domain is too wide
to aggregate exactly but the frequent tail is what matters.

``heavy_hitters_exact`` is the production two-pass shape: an
approximate, *mergeable* Misra-Gries candidate pass whose output is a
small superset of the true heavy hitters, followed by an exact counting
pass restricted to those candidates.  The final answer is EXACT (and
therefore strict-oracle-checkable); the sketch only bounds what the
exact pass has to shuffle.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def heavy_hitters_exact(
    items: DataFrame,
    item_col: str = "item",
    phi_num: int = 1,
    phi_den: int = 200,
    counters: int | None = None,
) -> DataFrame:
    """All items whose exact count exceeds ``phi = phi_num/phi_den`` of
    the stream, with their exact counts — computed without ever hash-
    aggregating the full item domain.

    Pass 1 (candidates): a per-partition Misra-Gries summary with ``c``
    counters, run as an Arrow-batched ``mapInPandas`` kernel that keeps
    dict state across the partition's batches.  Batches fold in via the
    mergeable-summaries reduction (Agarwal et al., PODS'12): add the
    batch's value counts, then if more than ``c`` keys remain, subtract
    the (c+1)-th largest count from every key and drop the non-positive
    — the classic MG decrement, amortized over a whole batch.  With
    ``c ≥ 2·phi_den/phi_num`` the summary's undercount is at most
    ``n_p/(c+1) < phi·n_p/2``; any item with global frequency > phi has
    (pigeonhole) local frequency > phi in at least one partition, so it
    survives that partition's summary.  The union of the per-partition
    summaries is therefore a SUPERSET of the true heavy hitters, of
    bounded size (≤ partitions × c rows) — which also makes the final
    output invariant to how the input happens to be partitioned.

    Pass 2 (exact): broadcast the candidate set back over the stream as
    a map-side semi join, so the exact groupBy shuffles only candidate
    rows, then keep ``cnt · phi_den > n_total · phi_num`` — an integer
    comparison, no float threshold to drift cross-engine.

    Scale: the full-domain aggregation this replaces is the shuffle
    that dies first on a 100 TB token stream (billions of distinct
    keys); here the only wide shuffle is over rows matching ≤
    partitions × c candidate keys.  Driver state: the candidate frame
    (bounded by config, never by data).

    Returns ``(item_col, cnt BIGINT, share DOUBLE ROUND 6)``.
    """
    if phi_num <= 0 or phi_den <= 0:
        raise ValueError("phi must be a positive fraction phi_num/phi_den")
    c = int(counters) if counters is not None else max(8, (2 * phi_den) // phi_num)
    if c < phi_den / phi_num:
        raise ValueError(
            f"counters={c} too small for phi={phi_num}/{phi_den}: "
            "the superset guarantee needs counters >= phi_den/phi_num"
        )
    field = items.schema[item_col]
    out_schema = T.StructType([field])

    def _mg(batches: Iterator) -> Iterator:
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            for it, n in pdf[item_col].value_counts().items():
                counts[it] = counts.get(it, 0) + int(n)
            if len(counts) > c:
                # subtract the (c+1)-th largest count from everything:
                # one MG decrement step per batch, not per item
                m = sorted(counts.values(), reverse=True)[c]
                counts = {k: v - m for k, v in counts.items() if v > m}
        yield pd.DataFrame({item_col: pd.Series(list(counts), dtype="object")})

    cands = items.select(item_col).mapInPandas(_mg, schema=out_schema).distinct()
    total = items.agg(F.count(F.lit(1)).alias("__n_total"))
    return (
        items.join(F.broadcast(cands), item_col)
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(
            F.col("cnt") * F.lit(int(phi_den))
            > F.col("__n_total") * F.lit(int(phi_num))
        )
        .select(
            item_col,
            F.col("cnt").cast("bigint").alias("cnt"),
            F.expr(
                "ROUND(CAST(cnt AS DOUBLE) / CAST(__n_total AS DOUBLE), 6)"
            ).alias("share"),
        )
    )
