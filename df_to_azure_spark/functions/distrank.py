"""Exact two-phase distributed ranking — global row numbers, ntile codes
and running sums WITHOUT a single-partition window.

A global ``row_number()/ntile()/cumsum`` window (``Window.orderBy`` with no
``partitionBy``) forces every row through ONE task — Spark itself warns
"No Partition Defined for Window operation" — which is the canonical
scale-killer at 100 TB.  The classic fix is the two-phase (a.k.a.
"sample/offset") exact rank used by distributed sort implementations:

1. ``repartitionByRange`` on the total-order key: partition *i* holds rows
   strictly before partition *i+1* in the requested order (ties cannot
   split — range boundaries are key values).  ``localCheckpoint`` pins the
   partitioning so the counting pass and the ranking pass see identical
   partitions (range sampling is otherwise re-run per job).
2. One tiny counting job: rows (and optionally an exact DECIMAL sum) per
   ``(partition, group)`` — at most ``num_partitions × |groups|`` rows are
   collected to the driver (bounded by a config constant, never by data).
3. Exclusive prefix offsets computed driver-side with exact Python
   int/Decimal arithmetic, broadcast back, and joined on
   ``(partition, group)``.
4. A *partitioned* window per ``(partition, group)`` yields the local rank
   / local running sum; ``global = offset + local``.

Every stage is parallel: the only single-point work is the
O(partitions × groups) offset computation.  Results are bit-identical to
the global window (ranks are integers; running sums are exact decimals),
so oracle hashes are unchanged.

No counterpart exists in the reference (pandas ranks in memory,
``/root/reference/df_to_azure/export.py`` operates on driver-local
frames); this is engine-extension surface for the Spark build.
"""

from __future__ import annotations

from decimal import Decimal
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "two_phase_rank",
    "ntile_from_rank",
    "with_rank_family",
    "bracketed_middle_rows",
]


def _sort_cols(order_by: Sequence[tuple[str, str]]) -> list[Column]:
    cols = []
    for name, direction in order_by:
        if direction not in ("asc", "desc"):
            raise ValueError(f"direction must be asc|desc, got {direction!r}")
        c = F.col(name)
        cols.append(c.asc() if direction == "asc" else c.desc())
    return cols


def two_phase_rank(
    df: DataFrame,
    order_by: Sequence[tuple[str, str]],
    group_cols: Sequence[str] = (),
    sum_col: str | None = None,
    rank_col: str = "__rn",
    total_col: str = "__grp_n",
    cum_col: str = "__cum",
    sum_total_col: str = "__grp_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add an exact global ``row_number`` (``rank_col``, 1-based within each
    ``group_cols`` group, ordered by ``order_by``) and the group row count
    (``total_col``) — plus, when ``sum_col`` names an exact-typed (decimal/
    integral) column, the exact running sum ``cum_col`` and the group grand
    total ``sum_total_col`` (free: it falls out of the offset pass, saving
    consumers a second aggregation scan) — using range repartitioning +
    per-partition offsets instead of a global window.

    ``order_by`` is ``[(column, "asc"|"desc"), ...]`` and, together with
    ``group_cols``, must form a total order (add a unique tie-break key);
    keys must be non-null (range vs window NULL placement is not
    reconciled here).

    Integral ``sum_col`` inputs are widened to ``DECIMAL(38,0)`` *before*
    the per-partition partial sums — Spark's non-ANSI ``SUM`` over
    ``LongType`` wraps silently on overflow, which would corrupt the
    partials before the driver's exact-``Decimal`` pass ever sees them.
    The running sum therefore comes back as ``DECIMAL(38,0)`` (not the
    input's integral type): exactness is preserved instead of int64 wrap
    semantics, at the cost of a wider output column.
    """
    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    group_cols = list(group_cols)
    range_exprs = [F.col(g).asc() for g in group_cols] + _sort_cols(order_by)

    # Phase 0: range-partition on the full order and PIN the partitioning
    # (eager localCheckpoint) so both downstream jobs agree on boundaries.
    ranged = df.repartitionByRange(n_part, *range_exprs).localCheckpoint()
    withpid = ranged.withColumn("__pid", F.spark_partition_id())

    # Phase 1: bounded counting job — one row per (partition, group).
    # Integral sum inputs are widened to DECIMAL(38,0) FIRST: non-ANSI
    # SUM(bigint) wraps on overflow before the exact driver pass runs.
    sum_expr = None
    if sum_col is not None:
        in_t = {f.name: f.dataType for f in df.schema.fields}.get(sum_col)
        if isinstance(in_t, T.DecimalType):
            sum_expr = F.col(sum_col)
        elif isinstance(in_t, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            sum_expr = F.col(sum_col).cast(T.DecimalType(38, 0))
        else:
            raise ValueError(
                f"sum_col must be exact-typed (decimal/integral), got {in_t}"
            )
    aggs = [F.count(F.lit(1)).alias("__cnt")]
    if sum_expr is not None:
        aggs.append(F.sum(sum_expr).alias("__psum"))
    per = withpid.groupBy("__pid", *group_cols).agg(*aggs)
    stats = per.collect()  # ≤ num_partitions × |groups| rows — config-bounded

    # Phase 2: exclusive prefix offsets per group, exact driver arithmetic.
    per_fields = {f.name: f for f in per.schema.fields}
    if sum_col is not None:
        sum_t = per_fields["__psum"].dataType
    stats.sort(key=lambda r: ([r[g] for g in group_cols], r["__pid"]))
    offsets: list[dict] = []
    cnt_totals: dict[tuple, int] = {}
    sum_totals: dict[tuple, Decimal] = {}
    run_cnt, run_sum, cur_key = 0, Decimal(0), object()
    for r in stats:
        key = tuple(r[g] for g in group_cols)
        if key != cur_key:
            cur_key, run_cnt, run_sum = key, 0, Decimal(0)
        offsets.append({"pid": r["__pid"], "key": key, "off": run_cnt, "sumoff": run_sum})
        run_cnt += r["__cnt"]
        if sum_col is not None:
            run_sum += Decimal(str(r["__psum"] if r["__psum"] is not None else 0))
        cnt_totals[key] = run_cnt
        sum_totals[key] = run_sum

    fields = [T.StructField("__pid", T.IntegerType())]
    fields += [per_fields[g] for g in group_cols]
    fields += [
        T.StructField("__off", T.LongType()),
        T.StructField(total_col, T.LongType()),
    ]
    rows = []
    if sum_col is not None:
        dec_t = T.DecimalType(38, getattr(sum_t, "scale", 0))
        fields += [
            T.StructField("__sumoff", dec_t),
            T.StructField(sum_total_col, dec_t),
        ]
        rows = [
            (o["pid"], *o["key"], o["off"], cnt_totals[o["key"]],
             o["sumoff"], sum_totals[o["key"]])
            for o in offsets
        ]
    else:
        rows = [
            (o["pid"], *o["key"], o["off"], cnt_totals[o["key"]])
            for o in offsets
        ]
    off_df = spark.createDataFrame(rows, schema=T.StructType(fields))

    # Phase 3: partitioned local window + broadcast offset join.
    joined = withpid.join(F.broadcast(off_df), ["__pid", *group_cols])
    w = Window.partitionBy("__pid", *group_cols).orderBy(*_sort_cols(order_by))
    out = joined.withColumn(
        rank_col, (F.col("__off") + F.row_number().over(w)).cast("bigint")
    )
    if sum_col is not None:
        cum_local = F.sum(sum_expr).over(w.rowsBetween(Window.unboundedPreceding, 0))
        out = out.withColumn(
            cum_col,
            (F.col("__sumoff") + cum_local).cast(per_fields["__psum"].dataType),
        ).withColumn(
            sum_total_col,
            F.col(sum_total_col).cast(per_fields["__psum"].dataType),
        )
        out = out.drop("__sumoff")
    return out.drop("__pid", "__off")


def bracketed_middle_rows(
    df: DataFrame,
    val_col: str,
    tie_break: Sequence[str],
    rank_col: str = "__rn",
    total_col: str = "__grp_n",
    n_buckets: int = 8192,
) -> DataFrame:
    """Exact global MEDIAN selection over a non-null double ``val_col``:
    return the row(s) at global ranks ``(n+1) DIV 2`` and ``n DIV 2 + 1``
    of ``ORDER BY val_col, *tie_break`` with ``rank_col`` (global, 1-based)
    and ``total_col`` (= n) attached — bit-identical to ranking every row,
    WITHOUT range-shuffling the whole frame.

    Selection-by-value bracketing (the distributed quickselect step):

    1. one map-side aggregation job → ``n, min, max`` (three scalars);
    2. one map-side histogram job → per-bucket counts over ``n_buckets``
       equal-width buckets of ``[min, max]`` (≤ ``n_buckets`` rows
       shuffled, a config constant);
    3. the cumulative bucket counts locate the bucket(s) holding the two
       middle ranks; only rows in those buckets (expected ``n/n_buckets``)
       flow into ``two_phase_rank``, with the exact count of rows below
       the bracket folded back in as a rank offset.

    Exactness: the bucket index is ONE deterministic expression of the
    value (``floor((v - min)/w)`` clamped), so the histogram's cumulative
    counts are exact predicate counts and the bracket filter reuses the
    same expression — no row can sit on the wrong side.  Because
    ``val_col`` is the leading sort key, the values at the two middle
    ranks are a pure function of the value multiset; the tie-break only
    fixes WHICH physical row carries them, and callers aggregate the
    values.  Degenerate brackets (all values equal, or min = max) fall
    back to ranking the full frame — today's shape, still exact.

    The two driver actions collect 1 and ≤ ``n_buckets`` rows — the same
    config-bounded class as ``two_phase_rank``'s offset pass, never data-
    sized.  At 100 TB this replaces a full range shuffle + pinned
    checkpoint of the pair frame with two shuffle-free aggregation passes
    (guide §2.3 "aggregate before you shuffle", §2.4 "remove shuffles").
    """
    order_by = [(val_col, "asc")] + [(t, "asc") for t in tie_break]
    head = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.min(val_col).alias("__lo"),
        F.max(val_col).alias("__hi"),
    ).collect()[0]
    n = head["__n"]
    if n == 0:
        # empty input: preserve the empty-selection shape downstream
        return (
            df.withColumn(rank_col, F.lit(None).cast("bigint"))
            .withColumn(total_col, F.lit(None).cast("bigint"))
            .where(F.lit(False))
        )
    r1, r2 = (n + 1) // 2, n // 2 + 1
    lo, hi = float(head["__lo"]), float(head["__hi"])
    width = (hi - lo) / n_buckets
    if width > 0.0 and lo + width > lo:
        bucket = F.expr(
            f"least(greatest(CAST(floor((CAST({val_col} AS DOUBLE)"
            f" - CAST({lo!r} AS DOUBLE)) / CAST({width!r} AS DOUBLE))"
            f" AS BIGINT), CAST(0 AS BIGINT)),"
            f" CAST({n_buckets - 1} AS BIGINT))"
        )
        hist = {
            r["__b"]: r["__c"]
            for r in df.groupBy(bucket.alias("__b"))
            .agg(F.count(F.lit(1)).alias("__c"))
            .collect()
        }
        cum, b1, b2, below1 = 0, None, None, 0
        for b in sorted(hist):
            if b1 is None and cum + hist[b] >= r1:
                b1, below1 = b, cum
            if cum + hist[b] >= r2:
                b2 = b
                break
            cum += hist[b]
        filtered = df.where(bucket.between(b1, b2))
        offset = below1
    else:
        # min == max (or width underflow): every row ties on the value —
        # rank the full frame, the degenerate-but-correct fallback
        filtered, offset = df, 0
    ranked = two_phase_rank(
        filtered, order_by, rank_col=rank_col, total_col="__local_n"
    )
    g = (F.col(rank_col) + F.lit(offset)).cast("bigint")
    return (
        ranked.withColumn(rank_col, g)
        .withColumn(total_col, F.lit(n).cast("bigint"))
        .where((F.col(rank_col) == r1) | (F.col(rank_col) == r2))
        .drop("__local_n")
    )


def with_rank_family(
    ranked: DataFrame,
    weak_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    rank_col: str = "__rn",
    total_col: str = "__grp_n",
    dense: bool = False,
    asc: Sequence[bool] | None = None,
) -> DataFrame:
    """Extend a ``two_phase_rank`` output with the exact SQL rank family
    over the WEAK order key (``weak_cols`` — the ``order_by`` columns
    minus the unique tie-break): ``__rank`` (= ``rank()``), ``__pct_rank``
    (= ``percent_rank()``) and ``__cume_dist`` (= ``cume_dist()``), plus
    ``__dense_rank`` when ``dense=True``.

    ``row_number`` alone cannot express these: a peer group (rows tied on
    the weak key) may span range-partition boundaries, so the peer's min
    and max global row numbers come from ONE aggregation keyed on
    ``(group, weak)`` joined back — a keyed shuffle, never a global
    window.  Identities (both Spark's and DuckDB's definitions):
    ``rank = min(rn) over peers``, ``percent_rank = (rank-1)/(n-1)``
    (0.0 when n = 1), ``cume_dist = max(rn)/n`` — integer arithmetic
    plus one double division each, so results are cross-engine exact.

    ``dense_rank`` is the index of the peer group itself, so it comes
    from ``two_phase_rank`` applied recursively to the DISTINCT peer
    frame (bounded by weak-key cardinality, not data) — an extra range
    shuffle over that frame only, hence opt-in.  ``asc`` gives the
    per-``weak_cols`` sort direction for that pass (default all
    ascending) and must match the direction used in the original
    ``order_by``.

    When ``dense=True`` the output also carries ``__n_peers`` (distinct
    weak keys per group) — the ``dense_rank`` analogue of ``total_col``,
    free from the recursive peer pass.
    """
    keys = [*group_cols, *weak_cols]
    peers = ranked.groupBy(*keys).agg(
        F.min(rank_col).alias("__peer_min"),
        F.max(rank_col).alias("__peer_max"),
    )
    if dense:
        dirs = list(asc) if asc is not None else [True] * len(weak_cols)
        order = [
            (c, "asc" if a else "desc") for c, a in zip(weak_cols, dirs)
        ]
        peers = two_phase_rank(
            peers, order, group_cols=group_cols,
            rank_col="__dense_rank", total_col="__n_peers",
        ).withColumn("__dense_rank", F.col("__dense_rank").cast("bigint"))
    out = ranked.join(peers, keys)
    n = F.col(total_col)
    pct = F.when(n == 1, F.lit(0.0)).otherwise(
        (F.col("__peer_min") - 1).cast("double") / (n - 1).cast("double")
    )
    return (
        out.withColumn("__rank", F.col("__peer_min").cast("bigint"))
        .withColumn("__pct_rank", pct)
        .withColumn(
            "__cume_dist",
            F.col("__peer_max").cast("double") / n.cast("double"),
        )
        .drop("__peer_min", "__peer_max")
    )


def ntile_from_rank(rank_col: str, total_col: str, buckets: int) -> Column:
    """SQL ``ntile(buckets)`` computed arithmetically from an exact global
    row number and group size: with ``n`` rows, ``q = n div b`` and
    ``r = n mod b``, the first ``r`` buckets take ``q+1`` rows — the
    standard-SQL split Spark and DuckDB both implement.  ``IF`` keeps the
    ``q = 0`` (n < buckets) case out of the ``DIV q`` branch."""
    b = int(buckets)
    rn, n = rank_col, total_col
    return F.expr(
        f"IF({rn} <= ({n} % {b}) * ({n} DIV {b} + 1), "
        f"   ({rn} - 1) DIV ({n} DIV {b} + 1) + 1, "
        f"   ({n} % {b}) + ({rn} - 1 - ({n} % {b}) * ({n} DIV {b} + 1))"
        f"       DIV ({n} DIV {b}) + 1)"
    )


def _two_phase_cumext(
    df: DataFrame,
    order_by: Sequence[tuple[str, str]],
    val_col: str,
    out_col: str,
    inclusive: bool,
    take_max: bool,
) -> DataFrame:
    """Shared body of ``two_phase_cummin`` / ``two_phase_cummax``: range
    repartition pins a total order, one bounded counting job takes each
    partition's extremum, the driver folds the exclusive prefix per
    partition (≤ num_partitions values), and a *partitioned* local
    window finishes the job."""
    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(n_part, *_sort_cols(order_by)).localCheckpoint()
    withpid = ranged.withColumn("__pid", F.spark_partition_id())

    ext = F.max(val_col) if take_max else F.min(val_col)
    per = withpid.groupBy("__pid").agg(ext.alias("__pext"))
    stats = sorted(per.collect(), key=lambda r: r["__pid"])

    val_t = {f.name: f.dataType for f in df.schema.fields}[val_col]
    rows, run = [], None
    for r in stats:
        rows.append((r["__pid"], run))
        if r["__pext"] is not None and (
            run is None or (r["__pext"] > run if take_max else r["__pext"] < run)
        ):
            run = r["__pext"]
    off_df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("__pid", T.IntegerType()),
                T.StructField("__extoff", val_t),
            ]
        ),
    )

    joined = withpid.join(F.broadcast(off_df), "__pid")
    w = Window.partitionBy("__pid").orderBy(*_sort_cols(order_by))
    lo, hi = Window.unboundedPreceding, (0 if inclusive else -1)
    local_ext = F.max(val_col) if take_max else F.min(val_col)
    local = local_ext.over(w.rowsBetween(lo, hi))
    combine = F.greatest if take_max else F.least
    return joined.withColumn(
        out_col, combine(F.col("__extoff"), local)
    ).drop("__pid", "__extoff")


def two_phase_cummin(
    df: DataFrame,
    order_by: Sequence[tuple[str, str]],
    val_col: str,
    out_col: str = "__cummin",
    inclusive: bool = True,
) -> DataFrame:
    """Exact global running MIN of ``val_col`` in ``order_by`` order —
    the prefix-min sibling of ``two_phase_rank``, with the same
    two-phase shape: range repartition pins a total order, one bounded
    counting job takes each partition's min, the driver folds the
    exclusive prefix-min per partition (≤ num_partitions values), and a
    *partitioned* local window finishes the job — bit-identical to
    ``MIN(val) OVER (ORDER BY ...)`` with no single-partition
    WindowExec.

    ``inclusive=False`` gives the EXCLUSIVE prefix
    (``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``): the min of
    all rows STRICTLY before the current one, NULL for the global first
    row — the form dominance/skyline tests need.  ``order_by`` must be
    a total order (add a unique tie-break) with non-null keys, same
    contract as ``two_phase_rank``."""
    return _two_phase_cumext(df, order_by, val_col, out_col, inclusive, take_max=False)


def two_phase_cummax(
    df: DataFrame,
    order_by: Sequence[tuple[str, str]],
    val_col: str,
    out_col: str = "__cummax",
    inclusive: bool = True,
) -> DataFrame:
    """Exact global running MAX — mirror of ``two_phase_cummin`` (same
    two-phase shape, same contracts), bit-identical to
    ``MAX(val) OVER (ORDER BY ...)`` with no single-partition
    WindowExec.  ``inclusive=False`` is the exclusive prefix-max (NULL
    for the global first row) — the form running-record detection needs:
    a row is a new record iff ``val > cummax_exclusive`` (or the prefix
    is NULL)."""
    return _two_phase_cumext(df, order_by, val_col, out_col, inclusive, take_max=True)
