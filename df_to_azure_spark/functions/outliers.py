"""Grouped-map Pandas UDF surface: per-group robust outlier detection.

This is the batch ``applyInPandas`` counterpart of the streaming
``applyInPandasWithState`` operator — the remaining cell of the UDF
surface matrix (scalar exprs → codegen; mapInPandas → multimodal;
grouped map → here).  Arrow moves each group to Python as one batch, so
the per-row serde tax of classic Python UDFs is amortized; at scale the
only shuffle is on the group key and per-group state is one pandas frame
(groups here are per-user event sets — small and bounded).

Cross-engine determinism: medians are LOWER medians (the element at
index ``(n-1)//2`` of the sorted values) — actual elements, never
interpolated — so the DuckDB oracle can select the identical value with
a window rank and every downstream comparison is bit-exact.  An
interpolated median ``(a+b)/2`` would already diverge from SQL's
``a + (b-a)*0.5`` in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def robust_outlier_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Per group: n rows, lower-median, MAD (lower-median of absolute
    deviations), and how many values deviate more than ``k * MAD``."""
    import pandas as pd

    schema = (
        f"{group_col} long, n_events long, med double, mad double, n_outliers long"
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        med = v.sort_values().iloc[(len(v) - 1) // 2]
        ad = (v - med).abs()
        mad = ad.sort_values().iloc[(len(ad) - 1) // 2]
        n_out = int((ad > k * mad).sum()) if mad > 0 else 0
        return pd.DataFrame(
            [[pdf[group_col].iloc[0], len(v), float(med), float(mad), n_out]],
            columns=[group_col, "n_events", "med", "mad", "n_outliers"],
        )

    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(
        stats, schema
    )


def trimmed_mean_udaf(trim_pct: int = 10):
    """The last cell of the UDF surface matrix: an Arrow-vectorized
    GROUPED_AGG ``pandas_udf`` (scalar exprs → codegen; mapInPandas →
    multimodal; grouped map → robust_outlier_stats; grouped AGG → here).
    Spark feeds each group's column as ONE pandas Series and the return
    value becomes the aggregate — the ``applyInPandas`` escape hatch is
    unnecessary when the result is a single cell per group.

    Semantics: symmetric ``trim_pct``% trimmed mean of a 2-decimal
    value column, exact by construction — values become integer cents
    (``rint`` is safe: 2-dp doubles ×100 land within 1e-9 of an
    integer), the sorted middle slice sums as int64, and the ONE double
    division happens at the end, so the result is independent of row
    order and partitioning and the SQL oracle (window rank + filtered
    exact sum) matches bit-for-bit.  Trimming is positional on the
    sorted values: equal values are interchangeable, so no tie-break is
    needed.

    Scale: grouped-agg UDFs do a map-side partial?  NO — unlike
    built-in aggregates there is no partial aggregation: every group's
    full value set moves to one Python worker.  Fine for bounded groups
    (event types here); for data-sized groups use the codegen'd
    expression formulation instead — documented trade, same contract as
    ``robust_outlier_stats``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    pct = int(trim_pct)

    def _trimmed(v: pd.Series) -> float:
        cents = np.rint(v.to_numpy(dtype="float64") * 100.0).astype(np.int64)
        cents.sort()
        # integer arithmetic for the trim count (float n*0.1 would round
        # differently from SQL's integer division for some n)
        k = (len(cents) * pct) // 100
        mid = cents[k : len(cents) - k] if len(cents) > 2 * k else cents
        # no Python round() here: it is HALF_EVEN while SQL ROUND is
        # HALF_UP — the caller applies ROUND(...,6) engine-side so both
        # engines round the identical IEEE quotient the identical way
        return float(int(mid.sum())) / (100.0 * len(mid))

    # this module postpones annotation evaluation (PEP 563), which turns
    # the hints into strings and breaks pandas_udf's Series->scalar
    # GROUPED_AGG inference — restore real objects before wrapping
    _trimmed.__annotations__ = {"v": pd.Series, "return": float}
    return pandas_udf(_trimmed, "double")
