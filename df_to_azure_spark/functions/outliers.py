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
