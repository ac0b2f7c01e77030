"""As-of join — Spark has no native one (SURVEY §2.7 / pyspark guide
"Common OLAP patterns").

The scalable formulation is NOT a join at all: tag and union the two
inputs, sort within each key partition by (time, side), and carry the
reference side's payload forward with ``last(..., ignorenulls)``.  One
shuffle on the key, no per-row probing, no O(n·m) worst case — the same
shape Flink's event-time join and kdb's ``aj`` use internally.

Matching semantics: for each left row, the latest right row with
``right.ts <= left.ts`` in the same key group (ties on ts: the right row
wins, i.e. a reference row at exactly the probe time matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Append the as-of matched ``right_payload`` columns (renamed with
    ``suffix``) and the matched right timestamp (``right_ts + suffix``) to
    every ``left`` row; unmatched rows get NULLs."""
    keys = [on] if isinstance(on, str) else list(on)

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
        F.lit(0).alias("__side"),  # 0 < 1: right row sorts before left at equal ts
        *[F.col(c).alias(f"__p_{c}") for c in right_payload],
        F.col(right_ts).alias("__p_ts"),
    ).select(*l_tagged.columns)  # align column order for the union

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *[c for c in left.columns],
        F.col("__side"),
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_payload
        ],
        F.last("__p_ts", ignorenulls=True).over(w).alias(f"{right_ts}{suffix}"),
    )
    return carried.where(F.col("__side") == 1).drop("__side")
