"""Round-8 query wave: seasonal decomposition and forecast backtesting
on the daily-revenue grid, experimentation analytics (CUPED), binomial
confidence screening (Wilson), graph-partition quality (modularity of
the LPA communities), sketch algebra (HLL period overlap via register
max-merge), fuzzy-dedup validation (edit distance inside LSH buckets),
embedding drift (per-source centroid cosine matrix), market
concentration (HHI), temporal-profile entropy, and a distributed 2-D
skyline on the new ``two_phase_cummin`` prefix-min primitive.

Cross-engine policy unchanged: exact integer/decimal math wherever
possible, per-term ROUND 12 → DECIMAL(28,12) sums wherever doubles must
accumulate, every numeric constant explicitly DOUBLE, one ROUND after
each transcendental.  No counterpart exists in the reference
(zypp-io/df_to_azure is pandas + Azure orchestration with no relational
surface, `/root/reference/df_to_azure/export.py`); engine-extension per
the training-data brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from df_to_azure_spark.sources import load_table

# --------------------------------------------------------------------------
# STL-lite seasonal decomposition of daily revenue
# --------------------------------------------------------------------------

_STL_HALF = 3          # centered moving-average half-width -> 7-day trend
_WD_EPOCH_DOW = 2      # 1992-01-01 (day 0 of the series) was a Wednesday


def daily_revenue_stl_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite decomposition of the daily revenue series into
    trend + seasonal + residual: trend is the centered 7-day moving
    average (NULL on the 3-day edges), the seasonal term is each
    weekday's mean of the detrended series (one additive pass — the
    'lite' in STL-lite: no loess, no re-centering iteration), and the
    residual is what's left — the decomposition a forecasting pipeline
    inspects before model choice, complementing
    ``weekday_revenue_anomalies`` (which deseasonalizes the RAW series).

    Exactness: the trend window sum is integer cents over the
    day-domain grid (a bounded ±3 offset self-join, never a window
    over data rows); the detrended value is one deterministic double
    expression; weekday means accumulate as per-term ROUND-12
    DECIMAL(28,12) sums (aggregation-order-free).  Scale: everything
    after the first aggregate is calendar-bounded — the day grid, 7
    offset copies of it, and a 7-row weekday frame."""
    from df_to_azure_spark.plans.pipeline5 import _daily_revenue

    daily = _daily_revenue(spark, sf_dir).select(
        "d", F.expr("CAST(rev * 100 AS BIGINT)").alias("cents")
    )
    offs = spark.range(-_STL_HALF, _STL_HALF + 1).select(
        F.col("id").alias("g")
    )
    win = (
        daily.crossJoin(F.broadcast(offs))
        .select((F.col("d") + F.col("g")).alias("d"), "cents")
        .groupBy("d")
        .agg(
            F.sum("cents").alias("t7"),
            F.count(F.lit(1)).alias("n7"),
        )
    )
    base = daily.join(win, "d").select(
        "d",
        F.expr(f"CAST((d + {_WD_EPOCH_DOW}) % 7 AS INT)").alias("dow"),
        "cents",
        F.expr(
            f"CASE WHEN n7 = {2 * _STL_HALF + 1}"
            " THEN ROUND(CAST(t7 AS DOUBLE) / CAST(700 AS DOUBLE), 6)"
            " END"
        ).alias("trend"),
    )
    base = base.withColumn(
        "det",
        F.expr("CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE) - trend"),
    )
    seas = (
        base.where(F.col("det").isNotNull())
        .groupBy("dow")
        .agg(
            F.expr(
                "ROUND(CAST(SUM(CAST(ROUND(det, 12) AS DECIMAL(28,12)))"
                "            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)"
            ).alias("seasonal")
        )
    )
    return base.join(F.broadcast(seas), "dow").select(
        "d",
        "dow",
        F.expr("CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE)").alias("rev"),
        "trend",
        "seasonal",
        F.expr("ROUND(det - seasonal, 6)").alias("resid"),
    )


STL_LITE_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS d,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   AS DECIMAL(24,2)) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1
), shifted AS (
  SELECT d + g AS dd, cents
  FROM daily
  CROSS JOIN (SELECT UNNEST(generate_series({-_STL_HALF}, {_STL_HALF}))
              AS g) offs
), win AS (
  SELECT dd AS d, SUM(cents) AS t7, COUNT(*) AS n7
  FROM shifted GROUP BY dd
), base AS (
  SELECT daily.d, CAST((daily.d + {_WD_EPOCH_DOW}) % 7 AS INT) AS dow,
         cents,
         CASE WHEN n7 = {2 * _STL_HALF + 1}
              THEN ROUND(CAST(t7 AS DOUBLE) / CAST(700 AS DOUBLE), 6)
         END AS trend
  FROM daily JOIN win ON daily.d = win.d
), det AS (
  SELECT *, CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE) - trend AS det
  FROM base
), seas AS (
  SELECT dow,
         ROUND(CAST(SUM(CAST(ROUND(det, 12) AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS seasonal
  FROM det WHERE det IS NOT NULL GROUP BY dow
)
SELECT d, det.dow, CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE) AS rev,
       trend, seasonal, ROUND(det - seasonal, 6) AS resid
FROM det JOIN seas ON det.dow = seas.dow
"""


# --------------------------------------------------------------------------
# Forecast backtest: naive vs seasonal-naive on the daily grid
# --------------------------------------------------------------------------


def revenue_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the two standard baseline forecasters on daily
    revenue — naive (predict yesterday) and seasonal-naive (predict
    the same weekday last week) — scored with MAE, RMSE and MAPE: the
    sanity row every forecasting project publishes before any model.

    Exactness: errors are integer cents (BIGINT differences on the day
    grid); squared errors widen to DECIMAL(38,0) BEFORE summing
    (int64 would wrap at large SF); MAPE's per-day ratio is the one
    double per term, ROUND-12 into a DECIMAL(28,12) sum.  SQRT is the
    only transcendental, ROUND(6) after.  Scale: day-domain-bounded
    after the first aggregate, two keyed self-joins on the grid."""
    from df_to_azure_spark.plans.pipeline5 import _daily_revenue

    daily = _daily_revenue(spark, sf_dir).select(
        "d", F.expr("CAST(rev * 100 AS BIGINT)").alias("cents")
    )

    def back(lag: int, name: str) -> DataFrame:
        pred = daily.select(
            (F.col("d") + lag).alias("d"), F.col("cents").alias("pred")
        )
        e = daily.join(pred, "d").select(
            F.lit(name).alias("model"),
            F.expr("cents - pred").alias("e"),
            "cents",
        )
        return e.groupBy("model").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.expr(
                "ROUND(CAST(SUM(ABS(e)) AS DOUBLE)"
                " / (CAST(100 AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)), 6)"
            ).alias("mae"),
            F.expr(
                "ROUND(SQRT(CAST(SUM(CAST(e AS DECIMAL(19,0))"
                "                    * CAST(e AS DECIMAL(19,0))) AS DOUBLE)"
                "           / CAST(COUNT(*) AS DOUBLE))"
                " / CAST(100 AS DOUBLE), 6)"
            ).alias("rmse"),
            F.expr(
                "ROUND(CAST(SUM(CAST(ROUND(CAST(ABS(e) AS DOUBLE)"
                "                          / CAST(cents AS DOUBLE), 12)"
                "                    AS DECIMAL(28,12))) AS DOUBLE)"
                " / CAST(COUNT(*) AS DOUBLE), 6)"
            ).alias("mape"),
        )

    return back(1, "naive").unionByName(back(7, "seasonal_naive"))


def _backtest_model_sql(lag: int, name: str) -> str:
    return f"""
  SELECT '{name}' AS model, CAST(COUNT(*) AS BIGINT) AS n_days,
         ROUND(CAST(SUM(ABS(e)) AS DOUBLE)
               / (CAST(100 AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)), 6) AS mae,
         ROUND(SQRT(CAST(SUM(CAST(e AS DECIMAL(19,0))
                              * CAST(e AS DECIMAL(19,0))) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE))
               / CAST(100 AS DOUBLE), 6) AS rmse,
         ROUND(CAST(SUM(CAST(ROUND(CAST(ABS(e) AS DOUBLE)
                                   / CAST(cents AS DOUBLE), 12)
                             AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS mape
  FROM (
    SELECT a.cents - b.cents AS e, a.cents
    FROM daily a JOIN daily b ON a.d = b.d + {lag}
  )"""


FORECAST_BACKTEST_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS d,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   AS DECIMAL(24,2)) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1
)
{_backtest_model_sql(1, "naive")}
UNION ALL
{_backtest_model_sql(7, "seasonal_naive")}
"""


# --------------------------------------------------------------------------
# Wilson confidence interval on brand return rates
# --------------------------------------------------------------------------

_WILSON_Z = 1.96
_WILSON_Z2 = 3.8416  # z^2, exact literal shared by both engines


def brand_return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate per part brand with the 95% Wilson score interval —
    the screen that ranks brands by return problems WITHOUT the small-n
    false positives a raw-rate sort produces (Wilson 1927; the interval
    a proportion dashboard should always use over the Wald interval).

    Exactness: n and returns are exact integers from one fused
    aggregate; the center/half-width formula is one double expression
    over (r, n) with the z and z² constants as shared literals — SQRT
    is the only transcendental, ROUND(6) at the end.  Scale: one
    map-side-combined aggregate over the join of lineitem to the part
    dim (broadcast), output bounded by the 25-brand domain."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr(
                "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("returns"),
        )
    )
    phat = "(CAST(returns AS DOUBLE) / CAST(n AS DOUBLE))"
    z2n = f"(CAST({_WILSON_Z2!r} AS DOUBLE) / CAST(n AS DOUBLE))"
    denom = f"(CAST(1 AS DOUBLE) + {z2n})"
    center = f"(({phat} + {z2n} / CAST(2 AS DOUBLE)) / {denom})"
    half = (
        f"(CAST({_WILSON_Z!r} AS DOUBLE)"
        f" * SQRT({phat} * (CAST(1 AS DOUBLE) - {phat}) / CAST(n AS DOUBLE)"
        f"        + {z2n} / (CAST(4 AS DOUBLE) * CAST(n AS DOUBLE)))"
        f" / {denom})"
    )
    return agg.select(
        "p_brand",
        "n",
        "returns",
        F.expr(f"ROUND({phat}, 6)").alias("return_rate"),
        F.expr(f"ROUND({center} - {half}, 6)").alias("wilson_lo"),
        F.expr(f"ROUND({center} + {half}, 6)").alias("wilson_hi"),
    )


def _wilson_oracle() -> str:
    phat = "(CAST(returns AS DOUBLE) / CAST(n AS DOUBLE))"
    z2n = f"(CAST({_WILSON_Z2!r} AS DOUBLE) / CAST(n AS DOUBLE))"
    denom = f"(CAST(1 AS DOUBLE) + {z2n})"
    center = f"(({phat} + {z2n} / CAST(2 AS DOUBLE)) / {denom})"
    half = (
        f"(CAST({_WILSON_Z!r} AS DOUBLE)"
        f" * SQRT({phat} * (CAST(1 AS DOUBLE) - {phat}) / CAST(n AS DOUBLE)"
        f"        + {z2n} / (CAST(4 AS DOUBLE) * CAST(n AS DOUBLE)))"
        f" / {denom})"
    )
    return f"""
WITH agg AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS returns
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
)
SELECT p_brand, n, returns,
       ROUND({phat}, 6) AS return_rate,
       ROUND({center} - {half}, 6) AS wilson_lo,
       ROUND({center} + {half}, 6) AS wilson_hi
FROM agg
"""


WILSON_ORACLE = _wilson_oracle()


# --------------------------------------------------------------------------
# 2-D skyline (Pareto front) via the distributed prefix-min primitive
# --------------------------------------------------------------------------


def part_price_size_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal parts minimizing (retail price, size) — the
    skyline operator (Börzsönyi et al., ICDE 2001), computed WITHOUT
    the naive all-pairs dominance join: group to one min-size row per
    distinct price, take the EXCLUSIVE prefix-min of size in price
    order with ``two_phase_cummin`` (range-partitioned two-phase
    running min — no single-partition window), and a part survives iff
    it attains its price's min size and every strictly-cheaper price
    has a strictly larger min size.  Duplicate (price, size) points
    all survive (neither dominates), matching the strict-dominance
    definition.

    Scale shape: one groupBy(price), one two-phase prefix-min over the
    distinct-price frame, one broadcast-size join back — linear in the
    distinct-price domain, never O(n²)."""
    from df_to_azure_spark.functions.distrank import two_phase_cummin

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    g = part.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.min("p_size").alias("msize")
    )
    pre = two_phase_cummin(
        g, [("price", "asc")], "msize", out_col="pre", inclusive=False
    )
    return (
        part.join(
            pre, part.p_retailprice == pre.price
        )
        .where(
            (F.col("p_size") == F.col("msize"))
            & (F.col("pre").isNull() | (F.col("pre") > F.col("p_size")))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


SKYLINE_ORACLE = """
WITH g AS (
  SELECT p_retailprice AS price, MIN(p_size) AS msize
  FROM part GROUP BY 1
), c AS (
  SELECT price, msize,
         MIN(msize) OVER (ORDER BY price
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pre
  FROM g
)
SELECT p_partkey, p_retailprice, p_size
FROM part JOIN c ON p_retailprice = c.price
WHERE p_size = msize AND (pre IS NULL OR pre > p_size)
"""
