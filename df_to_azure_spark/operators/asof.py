"""As-of join — Spark has no native one (SURVEY §2.7 / pyspark guide
"Common OLAP patterns").  Full pandas ``merge_asof`` parity:
``direction`` backward / forward / nearest, ``tolerance``, and
``allow_exact_matches``.

The scalable formulation is NOT a join at all: tag and union the two
inputs, sort within each key partition by (time, side), and carry the
reference side's payload forward with ``last(..., ignorenulls)``.  One
shuffle on the key, no per-row probing, no O(n·m) worst case — the same
shape Flink's event-time join and kdb's ``aj`` use internally.
``forward`` is the identical window over the reversed time ordering;
``nearest`` runs both carries over ONE union (two sorts inside the same
keyed partition — no second shuffle) and picks the closer side per row.
``tolerance`` is a post-mask on the carried timestamp: a match farther
than the tolerance nulls out, exactly pandas' semantics — no change to
the carry itself, so it costs one codegen'd expression.

Matching semantics (backward): for each left row, the latest right row
with ``right.ts <= left.ts`` in the same key group.  With
``allow_exact_matches`` (default) a right row at exactly the probe time
matches — implemented purely in the sort: the right side's tie tag
sorts before the left row when exact matches are allowed and after it
when not, in BOTH time orderings, so one tag drives all three
directions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_DIRECTIONS = ("backward", "forward", "nearest")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: str | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Append the as-of matched ``right_payload`` columns (renamed with
    ``suffix``) and the matched right timestamp (``right_ts + suffix``)
    to every ``left`` row; unmatched rows get NULLs.

    ``direction``: ``'backward'`` (latest right at-or-before),
    ``'forward'`` (earliest right at-or-after), ``'nearest'`` (the
    closer of the two; ties prefer backward, pandas' rule).
    ``tolerance``: an SQL expression comparable to a timestamp
    difference (e.g. ``"INTERVAL 2 HOURS"``) — matches farther away
    null out.  ``allow_exact_matches=False`` excludes right rows at
    exactly the probe time."""
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}")
    keys = [on] if isinstance(on, str) else list(on)
    # at equal ts: tag 0 sorts before the left row (visible to it) in
    # both time orderings; tag 2 sorts after it (invisible) in both
    r_side = 0 if allow_exact_matches else 2

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in right_payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__p_ts"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in right_payload],
        F.col(right_ts).alias("__p_ts"),
    ).select(*l_tagged.columns)  # align column order for the union

    unioned = l_tagged.unionByName(r_tagged)
    frame = (W.unboundedPreceding, 0)
    w_b = (
        W.partitionBy(*keys).orderBy(F.asc("__ts"), F.asc("__side"))
        .rowsBetween(*frame)
    )
    w_f = (
        W.partitionBy(*keys).orderBy(F.desc("__ts"), F.asc("__side"))
        .rowsBetween(*frame)
    )

    def _carried(w) -> list:
        return [
            *[
                F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
                for c in right_payload
            ],
            F.last("__p_ts", ignorenulls=True).over(w).alias("__m_ts"),
        ]

    def _masked(matched_prefix: str, diff_ok) -> list:
        """Project the matched columns, nulled where the tolerance mask
        fails."""
        keep = F.col(f"{matched_prefix}_ts").isNotNull() & diff_ok
        return [
            *[
                F.when(keep, F.col(f"{matched_prefix}_{c}")).alias(f"{c}{suffix}")
                for c in right_payload
            ],
            F.when(keep, F.col(f"{matched_prefix}_ts")).alias(f"{right_ts}{suffix}"),
        ]

    tol = F.expr(tolerance) if tolerance is not None else None

    if direction in ("backward", "forward"):
        w = w_b if direction == "backward" else w_f
        carried = unioned.select(
            *[c for c in left.columns], "__side", "__ts", *_carried(w)
        )
        if tol is not None:
            diff = (
                F.col("__ts") - F.col("__m_ts")
                if direction == "backward"
                else F.col("__m_ts") - F.col("__ts")
            )
            out_cols = _masked("__m", diff <= tol)
        else:
            out_cols = _masked("__m", F.lit(True))
        return (
            carried.where(F.col("__side") == 1)
            .select(*[c for c in left.columns], *out_cols)
        )

    # nearest: both carries over the same union (one shuffle, two sorts)
    b_cols = [
        F.last(f"__p_{c}", ignorenulls=True).over(w_b).alias(f"__b_{c}")
        for c in right_payload
    ] + [F.last("__p_ts", ignorenulls=True).over(w_b).alias("__b_ts")]
    f_cols = [
        F.last(f"__p_{c}", ignorenulls=True).over(w_f).alias(f"__f_{c}")
        for c in right_payload
    ] + [F.last("__p_ts", ignorenulls=True).over(w_f).alias("__f_ts")]
    carried = unioned.select(
        *[c for c in left.columns], "__side", "__ts", *b_cols, *f_cols
    ).where(F.col("__side") == 1)
    d_b = F.col("__ts") - F.col("__b_ts")
    d_f = F.col("__f_ts") - F.col("__ts")
    ok_b = F.col("__b_ts").isNotNull() & (
        (d_b <= tol) if tol is not None else F.lit(True)
    )
    ok_f = F.col("__f_ts").isNotNull() & (
        (d_f <= tol) if tol is not None else F.lit(True)
    )
    # pandas tie rule: backward wins at equal distance
    use_b = ok_b & (~ok_f | (d_b <= d_f))
    out_cols = [
        *[
            F.when(use_b, F.col(f"__b_{c}"))
            .when(ok_f, F.col(f"__f_{c}"))
            .alias(f"{c}{suffix}")
            for c in right_payload
        ],
        F.when(use_b, F.col("__b_ts"))
        .when(ok_f, F.col("__f_ts"))
        .alias(f"{right_ts}{suffix}"),
    ]
    return carried.select(*[c for c in left.columns], *out_cols)
