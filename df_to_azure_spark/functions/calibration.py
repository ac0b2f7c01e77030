"""Probability-calibration operators: isotonic (PAV) recalibration over
bounded bin grids.

Pool-adjacent-violators is a sequential pooling loop, but restricted to
a BOUNDED bin grid its closed form is the minimax identity

    iso(i) = max_{a <= i} min_{b >= a} ( sum_{j=a..b} pos_j / sum_{j=a..b} n_j )

— a <= bins² relational fold, which is how a sequential algorithm with a
domain-bounded state space ports to a distributed engine (same family
as the calendar-bounded Theil-Sen pair grid).  Interval rates are
single IEEE divisions of exact integer sums (correctly rounded in any
engine), so the min/max folds are cross-engine exact; consumers round
once at output.

Two consumers in the registry: ``logistic_isotonic_recalibration``
(IRLS model, fixed-width probability bins) and
``quality_isotonic_recalibration`` (learned quality classifier vs the
Gopher rule labels, rank-decile bins).

No counterpart in the reference (`/root/reference/df_to_azure` has no
analytics surface); engine-extension per the training-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["pav_isotonic", "pav_isotonic_ctes"]


def pav_isotonic(
    bins: DataFrame,
    bin_col: str = "bin",
    n_col: str = "n",
    pos_col: str = "n_pos",
    out_col: str = "iso_rate",
    round_digits: int = 6,
) -> DataFrame:
    """Append the isotonic (monotone nondecreasing in ``bin_col``) PAV
    fit of ``pos_col / n_col`` to a BOUNDED bin frame.

    ``bins`` must be small (one row per bin — tens, not millions): the
    minimax fold materializes the bins² interval grid.  That is the
    intended regime — calibration bins are a model artifact, never
    data-sized.  Returns ``bins`` with ``out_col`` added."""
    # bounded: windows + joins below run over the bin frame (one row per
    # calibration bin), never the data
    wb = W.orderBy(bin_col)
    pre = bins.withColumn("__cn", F.sum(n_col).over(wb)).withColumn(
        "__cp", F.sum(pos_col).over(wb)
    )
    a = pre.select(
        F.col(bin_col).alias("__abin"),
        F.col(n_col).alias("__an"),
        F.col(pos_col).alias("__ap"),
        F.col("__cn").alias("__acn"),
        F.col("__cp").alias("__acp"),
    )
    b = pre.select(
        F.col(bin_col).alias("__bbin"),
        F.col("__cn").alias("__bcn"),
        F.col("__cp").alias("__bcp"),
    )
    # both sides are bin-count-bounded: broadcast the range join so the
    # plan is a BroadcastNestedLoop over bounded frames, never a
    # CartesianProduct
    iv = a.join(F.broadcast(b), F.col("__bbin") >= F.col("__abin")).select(
        "__abin",
        F.expr(
            "CAST(__bcp - __acp + __ap AS DOUBLE)"
            " / CAST(__bcn - __acn + __an AS DOUBLE)"
        ).alias("__rate"),
    )
    mins = iv.groupBy("__abin").agg(F.min("__rate").alias("__minr"))
    iso = (
        pre.select(F.col(bin_col).alias("__ibin"))
        .join(F.broadcast(mins), F.col("__abin") <= F.col("__ibin"))
        .groupBy("__ibin")
        .agg(
            F.expr(f"ROUND(MAX(__minr), {int(round_digits)})").alias(out_col)
        )
    )
    return bins.join(
        iso, bins[bin_col] == iso["__ibin"]
    ).drop("__ibin")


def pav_isotonic_ctes(
    bins_cte: str = "agg",
    bin_col: str = "bin",
    n_col: str = "n",
    pos_col: str = "n_pos",
    round_digits: int = 6,
) -> str:
    """DuckDB twin of ``pav_isotonic`` as a CTE fragment: given an
    existing CTE ``bins_cte`` with (bin, n, pos) columns, defines
    ``pav_pre, pav_iv, pav_mins, pav_iso`` where ``pav_iso`` is
    ``(bin_col, iso_rate)`` — the identical minimax fold, shared by
    every SQL oracle that pairs with the Spark operator."""
    return f"""pav_pre AS (
  SELECT {bin_col}, {n_col}, {pos_col},
         SUM({n_col}) OVER (ORDER BY {bin_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
         SUM({pos_col}) OVER (ORDER BY {bin_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
  FROM {bins_cte}
), pav_iv AS (
  SELECT a.{bin_col} AS abin,
         CAST(b.cp - a.cp + a.{pos_col} AS DOUBLE)
           / CAST(b.cn - a.cn + a.{n_col} AS DOUBLE) AS rate
  FROM pav_pre a JOIN pav_pre b ON b.{bin_col} >= a.{bin_col}
), pav_mins AS (
  SELECT abin, MIN(rate) AS minr FROM pav_iv GROUP BY abin
), pav_iso AS (
  SELECT p.{bin_col}, ROUND(MAX(m.minr), {int(round_digits)}) AS iso_rate
  FROM pav_pre p JOIN pav_mins m ON m.abin <= p.{bin_col}
  GROUP BY p.{bin_col}
)"""
