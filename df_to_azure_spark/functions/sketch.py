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

    NULL contract: NULL items are dropped up front — they count
    toward NEITHER the total nor any candidate, so shares are fractions
    of the non-NULL stream and NULL can never appear in the output.
    (Without the explicit filter the behavior was accidental: pandas
    ``value_counts()`` silently excludes NaN in the candidate pass and
    the exact-pass equi-join never matches NULL, so a NULL-valued item
    exceeding phi would vanish while still inflating the denominator.)

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
    items = items.where(F.col(item_col).isNotNull())

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


def kmv_set_jaccard(
    items: DataFrame,
    set_col: str,
    item_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise Jaccard between named item sets, BOTH exact and by KMV
    bottom-k sketch — the mergeable-sketch set algebra (Beyer et al.,
    SIGMOD'07) a data-source overlap audit runs when the sets are too
    big to intersect exactly: bottom-k(A ∪ B) = bottom-k of the merged
    signatures, and ``J ≈ |bottom-k(A∪B) ∩ A ∩ B| / k``.  The hash is
    the engine-portable 48-bit md5 prefix normalized to (0, 1] (same as
    ``kmv_distinct_users``), so the ESTIMATE ITSELF is deterministic
    and oracle-checkable, and the exact Jaccard rides along from the
    same frame for direct error inspection.

    Scale shape: one distinct shuffle on (set, item); the pair
    expansion replicates each membership once per partner set — the
    honest Σ|A|+|B| cost of all-pairs set comparison, bounded by the
    SET DOMAIN (sources, shards), never by item count per pair beyond
    that.  Bottom-k selection is TWO-PHASE: a per-(pair, partition)
    local bottom-k window cuts each pair to ≤ partitions × k rows
    before the global per-pair window, so no single task ever sorts a
    pair's full union — the same no-fat-partition discipline as
    ``distrank``.  Groups with union < k degrade to exact (the sketch
    IS the set below k).

    Returns one row per unordered set pair: ``(set_a, set_b, n_union,
    n_inter, jaccard_exact, jaccard_kmv)``, ROUND(6) doubles over exact
    integer counts."""
    if k < 1:
        raise ValueError("k must be >= 1")
    # pinned: the distinct membership frame feeds BOTH pair-expansion
    # sides, and its upstream (often an explode over interpreted HOF
    # expressions) is the expensive stage — evaluate it once
    d = items.select(set_col, item_col).distinct().localCheckpoint()
    h = (
        F.conv(
            F.substring(F.md5(F.col(item_col).cast("string")), 1, 12), 16, 10
        ).cast("double")
        / F.lit(float(1 << 48))
    ).alias("h")
    d = d.select(F.col(set_col).alias("s"), F.col(item_col).alias("it"), h)
    names = d.select(F.col("s").alias("set_a")).distinct()
    pairs = (
        names.crossJoin(names.select(F.col("set_a").alias("set_b")))
        .where(F.col("set_a") < F.col("set_b"))
    )
    # membership expansion: each (set, item) row joins every pair its
    # set participates in (broadcast — the pair list is domain-bounded)
    ja = d.join(
        F.broadcast(pairs), d["s"] == pairs["set_a"]
    ).select("set_a", "set_b", "it", "h", F.lit(1).alias("fa"), F.lit(0).alias("fb"))
    jb = d.join(
        F.broadcast(pairs), d["s"] == pairs["set_b"]
    ).select("set_a", "set_b", "it", "h", F.lit(0).alias("fa"), F.lit(1).alias("fb"))
    # two consumers (the bottom-k window chain AND the exact aggregate)
    # read the pair-expanded membership frame, and building it is the
    # expensive stage (union + keyed agg over Σ|A|+|B| rows per pair) —
    # pin it so the expansion runs once, not twice
    memb = (
        ja.unionByName(jb)
        .groupBy("set_a", "set_b", "it", "h")
        .agg(F.max("fa").alias("in_a"), F.max("fb").alias("in_b"))
        .localCheckpoint()
    )
    from pyspark.sql import Window as W

    local = W.partitionBy("set_a", "set_b", F.spark_partition_id()).orderBy(
        "h", "it"
    )
    pruned = (
        memb.withColumn("__lrn", F.row_number().over(local))
        .where(F.col("__lrn") <= int(k))
        .drop("__lrn")
    )
    glob = W.partitionBy("set_a", "set_b").orderBy("h", "it")
    bottom = pruned.withColumn("rn", F.row_number().over(glob)).where(
        F.col("rn") <= int(k)
    )
    exact = memb.groupBy("set_a", "set_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_inter"),
    )
    sk = bottom.groupBy("set_a", "set_b").agg(
        F.count(F.lit(1)).alias("n_bottom"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("k_inter"),
    )
    return (
        exact.join(sk, ["set_a", "set_b"])
        .select(
            "set_a",
            "set_b",
            "n_union",
            "n_inter",
            F.expr(
                "ROUND(CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE), 6)"
            ).alias("jaccard_exact"),
            F.expr(
                "ROUND(CAST(k_inter AS DOUBLE) / CAST(n_bottom AS DOUBLE), 6)"
            ).alias("jaccard_kmv"),
        )
    )
