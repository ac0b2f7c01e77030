"""Range/interval joins — the bin-bucketed scale path.

A time-range predicate (``point BETWEEN start AND end``, or two
intervals overlapping) has no equi-key, so a naive plan is a nested-loop
cross product: at 100 TB that is the single worst join shape an engine
can emit.  The classic fix (the same binning strategy Databricks' range
join optimization and KDB's window joins use) converts the range
predicate into an EQUI-join on a coarse time bucket:

* every interval is replicated once per bucket it covers
  (``explode(sequence(floor(start/W), floor(end/W)))``) — the
  replication factor is ``len/W + 1``, a knob, not a data property;
* every point carries exactly ONE bucket (``floor(ts/W)``), so each
  qualifying (point, interval) pair meets in exactly one bucket and no
  dedup pass is needed;
* the exact range predicate runs as a post-join filter on the
  hash-partitioned pairs.

The shuffle is keyed by time bucket: with data spread over months of
buckets this parallelizes like any other equi-join, and a hot bucket is
an ordinary skew problem (AQE skew-join / salting apply).  Pick ``W``
near the typical interval length: much smaller multiplies interval
replication, much larger multiplies the post-filter's candidate count.

Reference anchor: the reference (``/root/reference/df_to_azure``, a
pandas→Azure mover) has no join surface at all; this extends the
engine's operator inventory per the brief (as-of joins live in
``operators/asof.py``; this module covers containment and overlap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(ts: Column, width_s: int) -> Column:
    """Coarse time bucket id: floor(epoch_seconds / width).  Computed on
    whole seconds (``unix_timestamp`` truncates sub-second digits), which
    is exact for any width that divides whole seconds; the precise range
    predicate re-checks full-precision timestamps after the join."""
    return F.floor(F.unix_timestamp(ts) / F.lit(width_s)).cast("long")


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    extra_on: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to every interval row whose closed interval
    ``[start, end]`` contains the point's timestamp.

    ``points`` and ``intervals`` must have disjoint column names apart
    from the three named here.  ``extra_on`` adds a predicate evaluated
    with the range check (e.g. a key-mismatch filter).  ``how`` may be
    ``inner`` or ``left`` (points preserved, interval columns NULL when
    nothing contains the point).

    Plan shape: intervals replicated per covered bucket (factor
    ``(end-start)/W + 1``), points bucketed once, ONE hash equi-join on
    the bucket id, exact containment as the join filter.  Each matching
    pair meets in exactly one bucket (the point's), so the output has no
    bucket-induced duplicates by construction.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    iv = intervals.withColumn(
        "_ij_bucket",
        F.explode(
            F.sequence(
                _bucket(F.col(start_col), bucket_seconds),
                _bucket(F.col(end_col), bucket_seconds),
            )
        ),
    )
    pt = points.withColumn("_ij_bucket", _bucket(F.col(ts_col), bucket_seconds))
    cond = (
        (pt["_ij_bucket"] == iv["_ij_bucket"])
        & (pt[ts_col] >= iv[start_col])
        & (pt[ts_col] <= iv[end_col])
    )
    if extra_on is not None:
        cond = cond & extra_on
    return pt.join(iv, cond, how).drop("_ij_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    how: str = "inner",
) -> DataFrame:
    """Keyed interval-overlap join: pairs rows sharing ``keys`` whose
    half-open intervals ``[start, end)`` overlap
    (``l.start < r.end AND r.start < l.end``).

    ``keys`` entries are either a column name present on both sides or a
    ``(left_name, right_name)`` pair — self-joins MUST pre-rename both
    sides to distinct names and pass pairs, or Spark's lineage-shared
    attributes make the equality trivially ambiguous.

    The equi-key carries the shuffle (ordinary hash join); the overlap
    predicate is the join filter.  Per-key fan-out is bounded by the
    key's interval count squared — callers pick keys whose cardinality
    the domain bounds (orders per customer, sessions per user).  For a
    keyless overlap join, bucket both sides with
    ``interval_point_join``'s binning on the interval midpoints instead.
    """
    cond = None
    for k in keys:
        lk, rk = k if isinstance(k, tuple) else (k, k)
        c = left[lk] == right[rk]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (left[left_start] < right[right_end])
        & (right[right_start] < left[left_end])
    )
    return left.join(right, cond, how)
