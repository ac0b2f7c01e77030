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
        li.join(part, li.l_partkey == part.p_partkey)
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


# --------------------------------------------------------------------------
# Modularity of the LPA communities — partition quality in one number
# --------------------------------------------------------------------------


def lpa_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the ``part_lpa_communities`` partition
    over the part co-purchase graph — the single quality number that
    says whether a community structure is real (Q >> 0) or noise
    (Q ~ 0), closing the loop the LPA query opens (Newman & Girvan
    2004).

    With the symmetric directed edge frame (2m directed edges),
    ``Q = (sum_c intra2_c * M2 - sum_c deg_c^2) / M2^2`` — every term
    an exact integer (DECIMAL(38,0) products so nothing wraps), ONE
    double division at the end.  Scale shape: two label joins keyed on
    node id, one community-keyed degree count, two 1-row aggregates;
    the iteration inside is the audited ``label_propagation`` chain."""
    from df_to_azure_spark.functions.graph import label_propagation
    from df_to_azure_spark.plans.pipeline2 import _part_edges
    from df_to_azure_spark.plans.pipeline5 import _LPA_ITERS

    edges = _part_edges(spark, sf_dir).localCheckpoint()
    labels = label_propagation(edges, _LPA_ITERS)
    return _modularity(edges, labels)


def _modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman Q of a (node, label) partition over a SYMMETRIC directed
    edge frame — the exact-integer formula shared by ``lpa_modularity``
    and the unit tests."""
    e = edges.join(
        labels.select(F.col("node").alias("src"), F.col("label").alias("cl_s")),
        "src",
    ).join(
        labels.select(F.col("node").alias("dst"), F.col("label").alias("cl_d")),
        "dst",
    )
    tot = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("m2"),
        F.expr(
            "CAST(SUM(CASE WHEN cl_s = cl_d THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("intra2"),
    )
    sd = (
        e.groupBy("cl_s")
        .agg(F.count(F.lit(1)).cast("bigint").alias("dg"))
        .agg(F.expr("SUM(CAST(dg AS DECIMAL(38,0)) * dg)").alias("sd2"))
    )
    nc = labels.agg(
        F.expr("CAST(COUNT(DISTINCT label) AS BIGINT)").alias("n_communities")
    )
    return (
        tot.crossJoin(F.broadcast(sd))
        .crossJoin(F.broadcast(nc))
        .select(
            "n_communities",
            F.expr("m2 DIV 2").alias("m_edges"),
            F.expr(
                "ROUND(CAST(CAST(intra2 AS DECIMAL(38,0)) * m2 - sd2"
                "           AS DOUBLE)"
                " / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)), 6)"
            ).alias("q_modularity"),
        )
    )


def _lpa_modularity_oracle() -> str:
    from df_to_azure_spark.plans.pipeline5 import _lpa_label_body

    body, last = _lpa_label_body()
    return f"""
WITH {body},
lab AS (SELECT node, label FROM {last}),
e AS (
  SELECT a.label AS cl_s, b.label AS cl_d
  FROM edges JOIN lab a ON edges.src = a.node
             JOIN lab b ON edges.dst = b.node
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m2,
         CAST(SUM(CASE WHEN cl_s = cl_d THEN 1 ELSE 0 END) AS BIGINT)
           AS intra2
  FROM e
), sd AS (
  SELECT SUM(CAST(dg AS DECIMAL(38,0)) * dg) AS sd2
  FROM (SELECT cl_s, CAST(COUNT(*) AS BIGINT) AS dg FROM e GROUP BY cl_s)
), nc AS (
  SELECT CAST(COUNT(DISTINCT label) AS BIGINT) AS n_communities FROM lab
)
SELECT n_communities, m2 // 2 AS m_edges,
       ROUND(CAST(CAST(intra2 AS DECIMAL(38,0)) * m2 - sd2 AS DOUBLE)
             / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)), 6) AS q_modularity
FROM tot CROSS JOIN sd CROSS JOIN nc
"""


# --------------------------------------------------------------------------
# HLL sketch algebra: period overlap via register max-merge
# --------------------------------------------------------------------------

_HLL_SPLIT_TS = "2024-01-16 00:00:00"


def _hll_est(zsum: str, v_zero: str) -> str:
    """The shared HLL estimate expression over a (zsum, v_zero) pair —
    identical text in Spark and DuckDB (constants from
    ``pipeline5.hll_distinct_users``)."""
    from df_to_azure_spark.plans.pipeline5 import (
        _HLL_ALPHA,
        _HLL_M,
        _HLL_WBITS,
    )

    raw = (
        f"CAST({_HLL_ALPHA!r} AS DOUBLE) * CAST({_HLL_M * _HLL_M} AS DOUBLE)"
        f" / (CAST({zsum} AS DOUBLE) / CAST({1 << (_HLL_WBITS + 1)} AS DOUBLE))"
    )
    return (
        f"CASE WHEN {raw} <= CAST({5 * _HLL_M // 2} AS DOUBLE)"
        f" AND {v_zero} > 0"
        f" THEN ROUND(CAST({_HLL_M} AS DOUBLE)"
        f"      * LN(CAST({_HLL_M} AS DOUBLE) / CAST({v_zero} AS DOUBLE)), 6)"
        f" ELSE ROUND({raw}, 6) END"
    )


def hll_period_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user overlap between two halves of the event stream
    estimated ENTIRELY from HyperLogLog registers — the sketch-algebra
    move that makes HLL the warehouse workhorse: per-period registers
    max-MERGE into the union sketch without touching the data again,
    and inclusion-exclusion gives the intersection
    (|A∩B| ≈ est(A) + est(B) − est(A∪B)).  The exact overlap runs
    alongside as the yardstick, same contract as
    ``hll_distinct_users``.

    Scale shape: one distinct shuffle keyed (period, user), constant
    256-register state per period, register merge is a 256-row
    aggregate; the portable estimate arithmetic is bit-reproducible
    (integer rho thresholds, BIGINT harmonic sums, shared literals)."""
    from df_to_azure_spark.plans.pipeline5 import _HLL_M, _HLL_WBITS, _rho_case

    ev = load_table(spark, sf_dir, "events").select(
        F.expr(
            f"CASE WHEN ts < TIMESTAMP '{_HLL_SPLIT_TS}' THEN 1 ELSE 2 END"
        ).alias("period"),
        "user_id",
    )
    d = ev.distinct()
    hb = d.select(
        "period",
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 12), 16, 10)"
            " AS BIGINT)"
        ).alias("h48"),
    ).select(
        "period",
        F.expr(f"h48 % {_HLL_M}").alias("bucket"),
        F.expr(f"h48 DIV {_HLL_M}").alias("w"),
    )
    regs = hb.groupBy("period", "bucket").agg(
        F.expr(f"MAX({_rho_case('w')})").alias("m_rho")
    )
    buckets = spark.range(_HLL_M).select(F.col("id").alias("bucket"))
    grid = (
        spark.range(1, 3)
        .select(F.col("id").cast("int").alias("period"))
        .crossJoin(F.broadcast(buckets))
    )
    full = grid.join(regs, ["period", "bucket"], "left").select(
        "period", "bucket", F.coalesce("m_rho", F.lit(0)).alias("m0")
    )

    def agg_est(frame: DataFrame, out: str) -> DataFrame:
        per = frame.agg(
            F.expr(
                f"CAST(SUM(CAST(POWER(CAST(2 AS DOUBLE), {_HLL_WBITS + 1} - m0)"
                " AS BIGINT)) AS BIGINT)"
            ).alias("zsum"),
            F.expr(
                "CAST(SUM(CASE WHEN m0 = 0 THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("v_zero"),
        )
        return per.select(
            F.expr(_hll_est("zsum", "v_zero")).alias(out)
        )

    e1 = agg_est(full.where("period = 1"), "est_p1")
    e2 = agg_est(full.where("period = 2"), "est_p2")
    eu = agg_est(
        full.groupBy("bucket").agg(F.max("m0").alias("m0")), "est_union"
    )
    exact = (
        d.groupBy("user_id")
        .agg(
            F.max(F.expr("CASE WHEN period = 1 THEN 1 ELSE 0 END")).alias("p1"),
            F.max(F.expr("CASE WHEN period = 2 THEN 1 ELSE 0 END")).alias("p2"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("n_exact_overlap")
        )
    )
    return (
        e1.crossJoin(F.broadcast(e2))
        .crossJoin(F.broadcast(eu))
        .crossJoin(F.broadcast(exact))
        .select(
            F.lit(_HLL_M).cast("bigint").alias("m"),
            "est_p1",
            "est_p2",
            "est_union",
            F.expr("ROUND(est_p1 + est_p2 - est_union, 6)").alias(
                "est_overlap"
            ),
            "n_exact_overlap",
            F.expr(
                "ROUND((ROUND(est_p1 + est_p2 - est_union, 6)"
                "       - CAST(n_exact_overlap AS DOUBLE))"
                " / CAST(n_exact_overlap AS DOUBLE), 6)"
            ).alias("rel_err"),
        )
    )


def _hll_overlap_oracle() -> str:
    from df_to_azure_spark.plans.pipeline5 import _HLL_M, _HLL_WBITS, _rho_case

    zexpr = (
        f"CAST(SUM(CAST(POWER(CAST(2 AS DOUBLE), {_HLL_WBITS + 1} - m0)"
        " AS BIGINT)) AS BIGINT)"
    )
    vexpr = "CAST(SUM(CASE WHEN m0 = 0 THEN 1 ELSE 0 END) AS BIGINT)"
    return f"""
WITH d AS (
  SELECT DISTINCT
         CASE WHEN ts < TIMESTAMP '{_HLL_SPLIT_TS}' THEN 1 ELSE 2 END
           AS period,
         user_id
  FROM events
), hb AS (
  SELECT period,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h48
  FROM d
), split AS (
  SELECT period, h48 % {_HLL_M} AS bucket, h48 // {_HLL_M} AS w FROM hb
), regs AS (
  SELECT period, bucket, MAX({_rho_case('w')}) AS m_rho
  FROM split GROUP BY period, bucket
), grid AS (
  SELECT p.p AS period, b.range AS bucket
  FROM (SELECT UNNEST([1, 2]) AS p) p, range({_HLL_M}) b
), filled AS (
  SELECT grid.period, grid.bucket, COALESCE(regs.m_rho, 0) AS m0
  FROM grid LEFT JOIN regs
    ON grid.period = regs.period AND grid.bucket = regs.bucket
), s1 AS (
  SELECT {zexpr} AS zsum, {vexpr} AS v_zero FROM filled WHERE period = 1
), s2 AS (
  SELECT {zexpr} AS zsum, {vexpr} AS v_zero FROM filled WHERE period = 2
), su AS (
  SELECT {zexpr} AS zsum, {vexpr} AS v_zero
  FROM (SELECT bucket, MAX(m0) AS m0 FROM filled GROUP BY bucket)
), e1 AS (SELECT {_hll_est('zsum', 'v_zero')} AS est_p1 FROM s1),
e2 AS (SELECT {_hll_est('zsum', 'v_zero')} AS est_p2 FROM s2),
eu AS (SELECT {_hll_est('zsum', 'v_zero')} AS est_union FROM su),
exact AS (
  SELECT CAST(SUM(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exact_overlap
  FROM (
    SELECT user_id,
           MAX(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS p1,
           MAX(CASE WHEN period = 2 THEN 1 ELSE 0 END) AS p2
    FROM d GROUP BY user_id
  )
)
SELECT CAST({_HLL_M} AS BIGINT) AS m, est_p1, est_p2, est_union,
       ROUND(est_p1 + est_p2 - est_union, 6) AS est_overlap,
       n_exact_overlap,
       ROUND((ROUND(est_p1 + est_p2 - est_union, 6)
              - CAST(n_exact_overlap AS DOUBLE))
             / CAST(n_exact_overlap AS DOUBLE), 6) AS rel_err
FROM e1 CROSS JOIN e2 CROSS JOIN eu CROSS JOIN exact
"""


# --------------------------------------------------------------------------
# Market concentration: supplier HHI per part
# --------------------------------------------------------------------------


def part_supply_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of each part's supply across
    suppliers (quantity shares): ``HHI = Σ q_s² / (Σ q_s)²`` — 1.0 =
    single-sourced, →0 = fragmented; the sourcing-risk screen
    procurement runs next to ``part_abc_classification``.

    Exactness: quantities are integral doubles in the data — cast to
    BIGINT, so both sums are exact integers widened to DECIMAL(38,0)
    products; ONE double division at the end.  Scale: two map-side-
    combined aggregates keyed (part, supplier) then part — no joins,
    no windows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty"),
    )
    per_supp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.expr("CAST(SUM(qty) AS BIGINT)").alias("q_s")
    )
    return per_supp.groupBy("l_partkey").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_suppliers"),
        F.expr("CAST(SUM(q_s) AS BIGINT)").alias("total_qty"),
        F.expr(
            "ROUND(CAST(SUM(CAST(q_s AS DECIMAL(38,0)) * q_s) AS DOUBLE)"
            " / (CAST(SUM(q_s) AS DOUBLE) * CAST(SUM(q_s) AS DOUBLE)), 6)"
        ).alias("hhi"),
    )


HHI_ORACLE = """
WITH per_supp AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q_s
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT l_partkey,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(q_s) AS BIGINT) AS total_qty,
       ROUND(CAST(SUM(CAST(q_s AS DECIMAL(38,0)) * q_s) AS DOUBLE)
             / (CAST(SUM(q_s) AS DOUBLE) * CAST(SUM(q_s) AS DOUBLE)), 6)
         AS hhi
FROM per_supp GROUP BY l_partkey
"""


# --------------------------------------------------------------------------
# Hour-of-day profile entropy per event type
# --------------------------------------------------------------------------


def event_hour_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each event type's hour-of-day profile — how
    spread over the clock a type's activity is (ln(24) = uniform,
    0 = single-hour spike) — plus the peak hour and its share: the
    temporal fingerprint that separates organic usage from batch jobs
    in an event stream.

    Exactness: ``H = ln(N) − (Σ n_h·ln n_h)/N`` over the 24-bin
    integer histogram; each per-bin ``n·ln n`` term rounds to 12
    decimals into a DECIMAL(28,12) sum (order-free), LN appears once
    per bin and once on N, ROUND(6) at the end; the peak hour is an
    integer argmax with an explicit min-hour tie-break (no engine
    arg_max semantics).  Scale: one (type, hour) aggregate with
    map-side combine — the grid is 24 × |types|."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("CAST(hour(ts) AS INT)").alias("hr")
    )
    bins = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h")
    )
    per = bins.groupBy("event_type").agg(
        F.expr("CAST(SUM(n_h) AS BIGINT)").alias("n"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_hours"),
        F.expr(
            "SUM(CAST(ROUND(CAST(n_h AS DOUBLE) * LN(CAST(n_h AS DOUBLE)), 12)"
            " AS DECIMAL(28,12)))"
        ).alias("s_nlogn"),
        F.max("n_h").alias("mx"),
    )
    peak = bins.join(
        per.select("event_type", "mx"), "event_type"
    ).where(F.col("n_h") == F.col("mx")).groupBy("event_type").agg(
        F.min("hr").alias("peak_hour")
    )
    return per.join(peak, "event_type").select(
        "event_type",
        "n",
        "n_hours",
        "peak_hour",
        F.expr(
            "ROUND(CAST(mx AS DOUBLE) / CAST(n AS DOUBLE), 6)"
        ).alias("peak_share"),
        F.expr(
            "ROUND(LN(CAST(n AS DOUBLE))"
            " - CAST(s_nlogn AS DOUBLE) / CAST(n AS DOUBLE), 6)"
        ).alias("hour_entropy"),
    )


HOUR_ENTROPY_ORACLE = """
WITH bins AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n_h
  FROM events GROUP BY 1, 2
), per AS (
  SELECT event_type,
         CAST(SUM(n_h) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         SUM(CAST(ROUND(CAST(n_h AS DOUBLE) * LN(CAST(n_h AS DOUBLE)), 12)
             AS DECIMAL(28,12))) AS s_nlogn,
         MAX(n_h) AS mx
  FROM bins GROUP BY event_type
), peak AS (
  SELECT bins.event_type, MIN(hr) AS peak_hour
  FROM bins JOIN per ON bins.event_type = per.event_type AND n_h = mx
  GROUP BY bins.event_type
)
SELECT per.event_type, n, n_hours, peak_hour,
       ROUND(CAST(mx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS peak_share,
       ROUND(LN(CAST(n AS DOUBLE))
             - CAST(s_nlogn AS DOUBLE) / CAST(n AS DOUBLE), 6)
         AS hour_entropy
FROM per JOIN peak ON per.event_type = peak.event_type
"""


# --------------------------------------------------------------------------
# A/B experiment readout with CUPED variance reduction
# --------------------------------------------------------------------------

_CUPED_SPLIT_DATE = "1996-01-01"


def _cuped_output_exprs() -> list[str]:
    """Output expressions over the 13-sum one-row frame (n_a..syy_b) —
    IDENTICAL text in Spark and DuckDB, so the whole CUPED readout is
    one shared formula over exact integer sums.  x = pre-period cents
    (covariate), y = post-period cents (metric); population moments."""

    def D(e: str) -> str:
        return f"CAST({e} AS DOUBLE)"

    n = f"({D('n_a')} + {D('n_b')})"
    sx, sy = f"({D('sx_a + sx_b')})", f"({D('sy_a + sy_b')})"
    sxy, sxx = f"({D('sxy_a + sxy_b')})", f"({D('sxx_a + sxx_b')})"
    theta = (
        f"(({n} * {sxy} - {sx} * {sy}) / ({n} * {sxx} - {sx} * {sx}))"
    )
    out = []
    parts = {}
    for g in ("a", "b"):
        ng = D(f"n_{g}")
        xm = f"({D(f'sx_{g}')} / {ng})"
        ym = f"({D(f'sy_{g}')} / {ng})"
        madj = f"({ym} - {theta} * ({xm} - {sx} / {n}))"
        vy = f"({D(f'syy_{g}')} / {ng} - {ym} * {ym})"
        cv = f"({D(f'sxy_{g}')} / {ng} - {xm} * {ym})"
        vx = f"({D(f'sxx_{g}')} / {ng} - {xm} * {xm})"
        vadj = (
            f"({vy} - CAST(2 AS DOUBLE) * {theta} * {cv}"
            f" + {theta} * {theta} * {vx})"
        )
        parts[g] = {"ym": ym, "madj": madj, "vy": vy, "vadj": vadj, "n": ng}
    a, b = parts["a"], parts["b"]
    c100 = "CAST(100 AS DOUBLE)"
    diff_raw = f"(({b['ym']} - {a['ym']}) / {c100})"
    diff_cuped = f"(({b['madj']} - {a['madj']}) / {c100})"
    se = (
        f"SQRT({a['vadj']} / {a['n']} + {b['vadj']} / {b['n']})"
    )
    z = f"(({b['madj']} - {a['madj']}) / {se})"
    vred = (
        f"(CAST(1 AS DOUBLE) - ({a['vadj']} + {b['vadj']})"
        f" / ({a['vy']} + {b['vy']}))"
    )
    out.append("CAST(n_a AS BIGINT) AS n_a")
    out.append("CAST(n_b AS BIGINT) AS n_b")
    out.append(f"ROUND({diff_raw}, 6) AS diff_raw")
    out.append(f"ROUND({theta}, 6) AS theta")
    out.append(f"ROUND({diff_cuped}, 6) AS diff_cuped")
    out.append(f"ROUND({z}, 6) AS z_cuped")
    out.append(f"ROUND({vred}, 6) AS var_reduction")
    return out


def ab_test_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with CUPED variance reduction (Deng et
    al., WSDM 2013): customers hash-split 50/50 into arms (md5 parity —
    deterministic, engine-portable), the metric is post-period revenue,
    the covariate is the SAME customer's pre-period revenue, and the
    CUPED-adjusted difference ``ȳ_g − θ(x̄_g − x̄)`` cancels the
    between-customer variance the covariate explains — the standard
    trick that makes flat experiments readable.  Reported: raw and
    adjusted lift, pooled θ, the z statistic on the adjusted means, and
    the achieved variance reduction.

    Exactness: per-customer pre/post revenues are integer cents from
    ONE conditional scan; the 12 per-arm sufficient sums (n, Σx, Σy,
    Σxy, Σx², Σy²) widen to DECIMAL(38,0) BEFORE summing; every output
    is one shared double formula over those sums (``_cuped_output_
    exprs`` — byte-identical text in both engines), SQRT the only
    transcendental.  Scale: one customer-keyed aggregate, one 13-sum
    global aggregate — nothing data-sized past the first shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        orders.select(
            "o_custkey",
            F.expr(
                f"CASE WHEN CAST(o_orderdate AS DATE)"
                f" < DATE '{_CUPED_SPLIT_DATE}'"
                " THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT) ELSE CAST(0 AS BIGINT) END"
            ).alias("pre_c"),
            F.expr(
                f"CASE WHEN CAST(o_orderdate AS DATE)"
                f" >= DATE '{_CUPED_SPLIT_DATE}'"
                " THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT) ELSE CAST(0 AS BIGINT) END"
            ).alias("post_c"),
        )
        .groupBy("o_custkey")
        .agg(
            F.expr("CAST(SUM(pre_c) AS BIGINT)").alias("x"),
            F.expr("CAST(SUM(post_c) AS BIGINT)").alias("y"),
        )
        .withColumn(
            "arm",
            F.expr(
                "CAST(conv(substring(md5(CAST(o_custkey AS STRING)), 1, 4),"
                " 16, 10) AS INT) % 2"
            ),
        )
    )
    sums = []
    for g, arm in (("a", 0), ("b", 1)):
        c = f"CASE WHEN arm = {arm} THEN"
        sums += [
            F.expr(f"SUM({c} 1 ELSE 0 END)").alias(f"n_{g}"),
            F.expr(
                f"SUM({c} CAST(x AS DECIMAL(38,0)) ELSE CAST(0 AS"
                " DECIMAL(38,0)) END)"
            ).alias(f"sx_{g}"),
            F.expr(
                f"SUM({c} CAST(y AS DECIMAL(38,0)) ELSE CAST(0 AS"
                " DECIMAL(38,0)) END)"
            ).alias(f"sy_{g}"),
            F.expr(
                f"SUM({c} CAST(x AS DECIMAL(38,0)) * y ELSE CAST(0 AS"
                " DECIMAL(38,0)) END)"
            ).alias(f"sxy_{g}"),
            F.expr(
                f"SUM({c} CAST(x AS DECIMAL(38,0)) * x ELSE CAST(0 AS"
                " DECIMAL(38,0)) END)"
            ).alias(f"sxx_{g}"),
            F.expr(
                f"SUM({c} CAST(y AS DECIMAL(38,0)) * y ELSE CAST(0 AS"
                " DECIMAL(38,0)) END)"
            ).alias(f"syy_{g}"),
        ]
    wide = per_cust.agg(*sums)
    return wide.selectExpr(*_cuped_output_exprs())


def _cuped_oracle() -> str:
    sums = []
    for g, arm in (("a", 0), ("b", 1)):
        c = f"CASE WHEN arm = {arm} THEN"
        z0 = "CAST(0 AS DECIMAL(38,0))"
        sums += [
            f"SUM({c} 1 ELSE 0 END) AS n_{g}",
            f"SUM({c} CAST(x AS DECIMAL(38,0)) ELSE {z0} END) AS sx_{g}",
            f"SUM({c} CAST(y AS DECIMAL(38,0)) ELSE {z0} END) AS sy_{g}",
            f"SUM({c} CAST(x AS DECIMAL(38,0)) * y ELSE {z0} END) AS sxy_{g}",
            f"SUM({c} CAST(x AS DECIMAL(38,0)) * x ELSE {z0} END) AS sxx_{g}",
            f"SUM({c} CAST(y AS DECIMAL(38,0)) * y ELSE {z0} END) AS syy_{g}",
        ]
    return f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE)
                            < DATE '{_CUPED_SPLIT_DATE}'
                       THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT) ELSE CAST(0 AS BIGINT) END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE)
                            >= DATE '{_CUPED_SPLIT_DATE}'
                       THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT) ELSE CAST(0 AS BIGINT) END)
              AS BIGINT) AS y
  FROM orders GROUP BY o_custkey
), armed AS (
  SELECT x, y,
         ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 4))::INTEGER % 2
           AS arm
  FROM per_cust
), wide AS (
  SELECT {", ".join(sums)} FROM armed
)
SELECT {", ".join(_cuped_output_exprs())} FROM wide
"""


# --------------------------------------------------------------------------
# Fuzzy-dedup validation: edit distance inside LSH candidate buckets
# --------------------------------------------------------------------------

_ED_PREFIX = 200      # chars of text scored (bounds the DP cost per pair)
_ED_MAX_DIST = 60


def lsh_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification of the MinHash-LSH candidate pairs:
    every banded candidate (``dedup.minhash_lsh_pairs``, est. Jaccard ≥
    0.3) is re-scored with the EXACT Levenshtein distance of the two
    documents' first ``_ED_PREFIX`` characters — the
    character-level confirmation pass a fuzzy-dedup pipeline runs when
    shingle Jaccard alone is too coarse (transpositions, small edits).

    Scale shape: the quadratic work is bounded twice over — candidate
    generation is the audited banded LSH join (never all-pairs), and
    the DP cost per pair is capped by the prefix length, a constant.
    ``levenshtein`` is the classic unit-cost DP in both engines —
    byte-identical on this corpus, so the pair list is strict-oracle-
    checkable.  Output: (id_a, id_b, est_jaccard, edit_dist ≤
    ``_ED_MAX_DIST``)."""
    from df_to_azure_spark.functions.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, num_hashes=64, bands=16, shingle_n=3, threshold=0.3
    )
    pref = docs.select(
        "doc_id", F.expr(f"substring(text, 1, {_ED_PREFIX})").alias("pref")
    )
    return (
        pairs.join(
            pref.select(
                F.col("doc_id").alias("id_a"), F.col("pref").alias("pref_a")
            ),
            "id_a",
        )
        .join(
            pref.select(
                F.col("doc_id").alias("id_b"), F.col("pref").alias("pref_b")
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "est_jaccard",
            F.expr("CAST(levenshtein(pref_a, pref_b) AS INT)").alias(
                "edit_dist"
            ),
        )
        .where(F.col("edit_dist") <= _ED_MAX_DIST)
    )


def _edit_distance_oracle() -> str:
    from df_to_azure_spark.plans.training_data import _minhash_oracle

    return f"""
WITH cand AS ({_minhash_oracle()}),
pref AS (
  SELECT doc_id, substring(text, 1, {_ED_PREFIX}) AS pref FROM documents
)
SELECT id_a, id_b, est_jaccard,
       CAST(levenshtein(a.pref, b.pref) AS INT) AS edit_dist
FROM cand JOIN pref a ON cand.id_a = a.doc_id
          JOIN pref b ON cand.id_b = b.doc_id
WHERE CAST(levenshtein(a.pref, b.pref) AS INT) <= {_ED_MAX_DIST}
"""


# --------------------------------------------------------------------------
# Embedding drift: per-source centroid cosine matrix
# --------------------------------------------------------------------------


def source_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity of the per-source embedding CENTROIDS
    — the drift matrix that tells a corpus owner which sources occupy
    the same embedding region (redundant) and which are outliers
    (distribution shift), the aggregate-level companion to the
    per-vector ANN family.

    Exactness: float components cast to DOUBLE and ROUND-12 into
    DECIMAL(28,12) per-dimension sums (order-free — a plain float SUM
    would depend on partitioning), centroid means are one double
    division per dimension, and the pairwise dot/norm sums over the
    bounded dimension count use the same ROUND-12 DECIMAL device; SQRT
    twice per pair, ROUND(6) at the end.  Scale: one (source, dim)
    aggregate with map-side combine (the only data-sized stage), then
    a |sources|²-bounded self-join on the tiny centroid frame."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    j = emb.join(docs, emb.vec_id == docs.doc_id).select(
        "source", "embedding"
    )
    comp = j.select(
        "source", F.posexplode("embedding").alias("pos", "v")
    )
    cent = comp.groupBy("source", "pos").agg(
        F.expr(
            "CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE), 12) AS DECIMAL(28,12)))"
            " AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
        ).alias("m")
    )
    norms = cent.groupBy("source").agg(
        F.expr(
            "CAST(SUM(CAST(ROUND(m * m, 12) AS DECIMAL(28,12))) AS DOUBLE)"
        ).alias("n2")
    )
    a = cent.select(
        F.col("source").alias("source_a"), "pos", F.col("m").alias("ma")
    )
    b = cent.select(
        F.col("source").alias("source_b"), "pos", F.col("m").alias("mb")
    )
    dots = (
        a.join(b, "pos")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(ma * mb, 12) AS DECIMAL(28,12)))"
                " AS DOUBLE)"
            ).alias("dot")
        )
    )
    return (
        dots.join(
            norms.select(F.col("source").alias("source_a"), F.col("n2").alias("na")),
            "source_a",
        )
        .join(
            norms.select(F.col("source").alias("source_b"), F.col("n2").alias("nb")),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            F.expr("ROUND(dot / (SQRT(na) * SQRT(nb)), 6)").alias("cos_sim"),
        )
    )


CENTROID_SIM_ORACLE = """
WITH j AS (
  SELECT source, embedding
  FROM embeddings JOIN documents ON vec_id = doc_id
), comp AS (
  SELECT source, p - 1 AS pos, CAST(embedding[p] AS DOUBLE) AS v
  FROM (SELECT source, embedding,
               UNNEST(generate_series(1, len(embedding))) AS p
        FROM j)
), cent AS (
  SELECT source, pos,
         CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE), 12) AS DECIMAL(28,12)))
              AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS m
  FROM comp GROUP BY source, pos
), norms AS (
  SELECT source,
         CAST(SUM(CAST(ROUND(m * m, 12) AS DECIMAL(28,12))) AS DOUBLE) AS n2
  FROM cent GROUP BY source
), dots AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(SUM(CAST(ROUND(a.m * b.m, 12) AS DECIMAL(28,12))) AS DOUBLE)
           AS dot
  FROM cent a JOIN cent b ON a.pos = b.pos AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT source_a, source_b,
       ROUND(dot / (SQRT(na.n2) * SQRT(nb.n2)), 6) AS cos_sim
FROM dots JOIN norms na ON dots.source_a = na.source
          JOIN norms nb ON dots.source_b = nb.source
"""


# --------------------------------------------------------------------------
# Contrastive training data: hard-negative mining across sources
# --------------------------------------------------------------------------

_HN_K = 3


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard negatives for contrastive training: for each anchor vector,
    the ``_HN_K`` most-similar vectors from a DIFFERENT source — the
    near-misses that teach an embedding model the boundary (a random
    negative is trivially far; the hard ones are what curriculum
    actually needs).  Anchors are the fixed query batch the ANN family
    shares (vec_id < 5).

    Plan shape: the source label joins onto the corpus once, anchors
    broadcast into a nest-loop cosine scan with the cross-source filter
    applied BEFORE the rank window (so the window ranks only true
    candidates), per-anchor top-k.  Same broadcast-bounded contract as
    ``knn_topk``; the source filter is a map-side predicate."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    from pyspark.sql import Window as W

    from df_to_azure_spark.functions.similarity import (
        _as_double,
        _spread,
        cosine,
    )

    v = _spread(emb.join(docs, emb.vec_id == docs.doc_id)).select(
        "vec_id", "source", _as_double("embedding").alias("cv")
    )
    q = v.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("source").alias("q_source"),
        F.col("cv").alias("qv"),
    )
    scored = (
        v.join(F.broadcast(q))
        .where(
            (F.col("query_id") != F.col("vec_id"))
            & (F.col("source") != F.col("q_source"))
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("source").alias("neighbor_source"),
            F.round(cosine(F.col("qv"), F.col("cv")), 8).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _HN_K)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "neighbor_id",
            "neighbor_source",
            "cos_sim",
        )
    )


def _hard_negative_oracle() -> str:
    from df_to_azure_spark.plans.training_data import _COS

    return f"""
WITH v AS (
  SELECT vec_id, source,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings JOIN documents ON vec_id = doc_id
), q AS (
  SELECT vec_id AS query_id, source AS q_source, cv AS qv
  FROM v WHERE vec_id < 5
), scored AS (
  SELECT query_id, v.vec_id AS neighbor_id, v.source AS neighbor_source,
         {_COS} AS cos_sim
  FROM v CROSS JOIN q
  WHERE v.vec_id <> query_id AND v.source <> q_source
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, neighbor_source,
       cos_sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= {_HN_K}
"""


# --------------------------------------------------------------------------
# STL strength measures (Wang, Hyndman & Smith 2006)
# --------------------------------------------------------------------------


def stl_strength_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend and seasonality STRENGTH of the daily revenue series —
    ``F_T = max(0, 1 − Var(R)/Var(T+R))`` and
    ``F_S = max(0, 1 − Var(R)/Var(S+R))`` over the STL-lite components
    (Wang, Hyndman & Smith 2006; the two numbers the feature-based
    forecasting literature extracts from every series before model
    selection) — one aggregate over ``daily_revenue_stl_lite``'s
    interior days.

    Exactness: the components are already ROUND(6) doubles; their
    variance sums accumulate per-term ROUND-12 into DECIMAL(38,12)
    (wide integer part — squared daily revenues) so the population
    variances are aggregation-order-free; the final ratios are fixed
    double expressions.  Scale: inherits the day-domain bound."""

    def var_exprs(x: str, p: str) -> list:
        return [
            F.expr(
                f"SUM(CAST(ROUND({x}, 12) AS DECIMAL(38,12)))"
            ).alias(f"s_{p}"),
            F.expr(
                f"SUM(CAST(ROUND(({x}) * ({x}), 12) AS DECIMAL(38,12)))"
            ).alias(f"ss_{p}"),
        ]

    comp = (
        daily_revenue_stl_lite(spark, sf_dir)
        .where(F.col("trend").isNotNull())
        .select(
            "resid",
            F.expr("rev - seasonal").alias("tr"),
            F.expr("rev - trend").alias("sr"),
        )
    )
    wide = comp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *var_exprs("resid", "r"),
        *var_exprs("tr", "t"),
        *var_exprs("sr", "s"),
    )

    def var(p: str) -> str:
        return (
            f"(CAST(ss_{p} AS DOUBLE) / CAST(n AS DOUBLE)"
            f" - (CAST(s_{p} AS DOUBLE) / CAST(n AS DOUBLE))"
            f" * (CAST(s_{p} AS DOUBLE) / CAST(n AS DOUBLE)))"
        )

    return wide.select(
        F.col("n").alias("n_days"),
        F.expr(
            f"ROUND(GREATEST(CAST(0 AS DOUBLE),"
            f" CAST(1 AS DOUBLE) - {var('r')} / {var('t')}), 6)"
        ).alias("f_trend"),
        F.expr(
            f"ROUND(GREATEST(CAST(0 AS DOUBLE),"
            f" CAST(1 AS DOUBLE) - {var('r')} / {var('s')}), 6)"
        ).alias("f_seasonal"),
    )


def _stl_strength_oracle() -> str:
    def var(p: str) -> str:
        return (
            f"(CAST(ss_{p} AS DOUBLE) / CAST(n AS DOUBLE)"
            f" - (CAST(s_{p} AS DOUBLE) / CAST(n AS DOUBLE))"
            f" * (CAST(s_{p} AS DOUBLE) / CAST(n AS DOUBLE)))"
        )

    sums = ", ".join(
        f"SUM(CAST(ROUND({x}, 12) AS DECIMAL(38,12))) AS s_{p},"
        f" SUM(CAST(ROUND(({x}) * ({x}), 12) AS DECIMAL(38,12))) AS ss_{p}"
        for x, p in (("resid", "r"), ("rev - seasonal", "t"),
                     ("rev - trend", "s"))
    )
    return f"""
WITH stl AS ({STL_LITE_ORACLE}),
wide AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, {sums}
  FROM stl WHERE trend IS NOT NULL
)
SELECT n AS n_days,
       ROUND(GREATEST(CAST(0 AS DOUBLE),
             CAST(1 AS DOUBLE) - {var('r')} / {var('t')}), 6) AS f_trend,
       ROUND(GREATEST(CAST(0 AS DOUBLE),
             CAST(1 AS DOUBLE) - {var('r')} / {var('s')}), 6) AS f_seasonal
FROM wide
"""


# --------------------------------------------------------------------------
# Sessionization gap-sensitivity sweep
# --------------------------------------------------------------------------

_GAP_SWEEP_MIN = [5, 15, 30, 60]


def session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How the session count depends on the inactivity-gap threshold:
    ONE pass computes every user's inter-event gaps (the same
    lag-window device as ``user_interarrival_expfit``), and each
    candidate threshold g gets ``sessions(g) = users + gaps > g`` —
    the sweep an analyst runs BEFORE freezing the 30-minute convention,
    with no re-sessionization per candidate.

    Exactness: gaps are integer microseconds, thresholds integer
    minutes — the comparison and counts are pure integers; the mean
    sessions-per-user is the one double.  Scale: one user-keyed window
    pass; the sweep itself is a 4-row conditional aggregate."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = events.withColumn(
        "gap_us",
        F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)),
    )
    users = gaps.agg(
        F.expr("CAST(COUNT(DISTINCT user_id) AS BIGINT)").alias("n_users")
    )
    th = spark.createDataFrame(
        [(g,) for g in _GAP_SWEEP_MIN], "gap_minutes int"
    )
    per = (
        gaps.where(F.col("gap_us").isNotNull())
        .crossJoin(F.broadcast(th))
        .groupBy("gap_minutes")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN gap_us > CAST(gap_minutes AS BIGINT)"
                " * 60000000 THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_breaks")
        )
    )
    return (
        per.crossJoin(F.broadcast(users))
        .select(
            "gap_minutes",
            F.expr("n_users + n_breaks").alias("n_sessions"),
            "n_users",
            F.expr(
                "ROUND(CAST(n_users + n_breaks AS DOUBLE)"
                " / CAST(n_users AS DOUBLE), 6)"
            ).alias("sessions_per_user"),
        )
    )


GAP_SENSITIVITY_ORACLE = f"""
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER
           (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
), users AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM gaps
), th AS (
  SELECT UNNEST([{", ".join(str(g) for g in _GAP_SWEEP_MIN)}])::INTEGER
    AS gap_minutes
), per AS (
  SELECT gap_minutes,
         CAST(SUM(CASE WHEN gap_us > CAST(gap_minutes AS BIGINT) * 60000000
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_breaks
  FROM gaps CROSS JOIN th
  WHERE gap_us IS NOT NULL
  GROUP BY gap_minutes
)
SELECT gap_minutes, n_users + n_breaks AS n_sessions, n_users,
       ROUND(CAST(n_users + n_breaks AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
         AS sessions_per_user
FROM per CROSS JOIN users
"""


# --------------------------------------------------------------------------
# Event-type co-occurrence PMI over users
# --------------------------------------------------------------------------


def event_type_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event types at the USER
    level: for each type pair, ``PMI = ln(n_ab · N / (n_a · n_b))``
    where n_a counts users who ever fired type a and n_ab users who
    fired both — positive = the behaviors travel together, negative =
    they repel; the co-occurrence screen behind 'users who X also Y'.

    Exactness: all counts are exact integers off ONE distinct
    (user, type) frame; LN is the single transcendental, ROUND(6).
    Scale: the per-user pair explode is bounded by the type domain
    (≤ |types|² pairs per user); everything aggregates with map-side
    combine."""
    ut = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    n_users = ut.agg(
        F.expr("CAST(COUNT(DISTINCT user_id) AS BIGINT)").alias("n_total")
    )
    singles = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_single")
    )
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    return (
        pairs.join(
            F.broadcast(
                singles.select(
                    F.col("event_type").alias("type_a"),
                    F.col("n_single").alias("n_a"),
                )
            ),
            "type_a",
        )
        .join(
            F.broadcast(
                singles.select(
                    F.col("event_type").alias("type_b"),
                    F.col("n_single").alias("n_b"),
                )
            ),
            "type_b",
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr(
                "ROUND(LN(CAST(n_both AS DOUBLE) * CAST(n_total AS DOUBLE)"
                " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))), 6)"
            ).alias("pmi"),
        )
    )


EVENT_PMI_ORACLE = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), n_users AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_total FROM ut
), singles AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_single
  FROM ut GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, sa.n_single AS n_a, sb.n_single AS n_b, n_both,
       ROUND(LN(CAST(n_both AS DOUBLE) * CAST(n_total AS DOUBLE)
                / (CAST(sa.n_single AS DOUBLE)
                   * CAST(sb.n_single AS DOUBLE))), 6) AS pmi
FROM pairs JOIN singles sa ON pairs.type_a = sa.event_type
           JOIN singles sb ON pairs.type_b = sb.event_type
           CROSS JOIN n_users
"""


# --------------------------------------------------------------------------
# Customer feature store: one wide ML-ready frame per customer
# --------------------------------------------------------------------------


def customer_feature_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-customer FEATURE TABLE a churn/LTV model trains on —
    order recency/frequency/monetary, inter-order cadence, basket
    breadth and return behavior assembled in one pass each over orders
    and lineitem: the 'feature store materialization' step between the
    warehouse and the trainer.

    Exactness: money and discounts ride integer cents (2-dp inputs);
    ``mean_gap_days = (last − first)/(n − 1)`` uses exact day diffs;
    the three small-integer ratios (mean gap, return rate, average
    discount) round by the EXACT half-up integer-division device
    ``(2·a·10⁶ + b) DIV (2·b)`` instead of ROUND on a double quotient —
    quotients of small integers land exactly on .5·10⁻⁶ boundaries
    often enough that engine ROUND implementations diverge there (this
    bit at sf0.1: 0.0628125 rounded differently).  Scale: two keyed
    aggregates (orders by customer; lineitem by order's customer via an
    orderkey→custkey join) and one customer-keyed join — no windows, no
    data-sized broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    mx = orders.agg(F.max("o_orderdate").alias("mxd"))
    o_feat = (
        orders.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)"
            ).alias("monetary"),
            F.expr(
                "CAST(MIN(datediff(CAST(mxd AS DATE),"
                " CAST(o_orderdate AS DATE))) AS BIGINT)"
            ).alias("r_days"),
            F.expr(
                "CAST(datediff(MAX(CAST(o_orderdate AS DATE)),"
                " MIN(CAST(o_orderdate AS DATE))) AS BIGINT)"
            ).alias("span_days"),
        )
        .withColumn(
            "mean_gap_days",
            F.expr(
                "CASE WHEN n_orders > 1 THEN"
                " CAST((2000000 * span_days + (n_orders - 1))"
                "      DIV (2 * (n_orders - 1)) AS DOUBLE)"
                " / CAST(1000000 AS DOUBLE) END"
            ),
        )
    )
    l_feat = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.expr("CAST(COUNT(DISTINCT p_brand) AS BIGINT)").alias(
                "n_brands"
            ),
            F.expr(
                "CAST((2000000 * SUM(CASE WHEN l_returnflag = 'R' THEN 1"
                " ELSE 0 END) + COUNT(*)) DIV (2 * COUNT(*)) AS DOUBLE)"
                " / CAST(1000000 AS DOUBLE)"
            ).alias("return_rate"),
            F.expr(
                "CAST((20000 * SUM(CAST(ROUND(l_discount * 100, 0)"
                " AS BIGINT)) + COUNT(*)) DIV (2 * COUNT(*)) AS DOUBLE)"
                " / CAST(1000000 AS DOUBLE)"
            ).alias("avg_discount"),
        )
    )
    return o_feat.join(l_feat, "o_custkey", "left").select(
        "o_custkey",
        "n_orders",
        "monetary",
        "r_days",
        "mean_gap_days",
        F.coalesce("n_items", F.lit(0)).cast("bigint").alias("n_items"),
        F.coalesce("n_brands", F.lit(0)).cast("bigint").alias("n_brands"),
        "return_rate",
        "avg_discount",
    )


FEATURE_STORE_ORACLE = """
WITH mx AS (SELECT MAX(o_orderdate) AS mxd FROM orders),
o_feat AS (
  SELECT o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
           AS monetary,
         CAST(MIN(date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(mxd AS DATE))) AS BIGINT) AS r_days,
         CAST(date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                        MAX(CAST(o_orderdate AS DATE))) AS BIGINT)
           AS span_days
  FROM orders CROSS JOIN mx GROUP BY o_custkey
), l_feat AS (
  SELECT o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brands,
         CAST((2000000 * SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
           / CAST(1000000 AS DOUBLE) AS return_rate,
         CAST((20000 * SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT))
               + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
           / CAST(1000000 AS DOUBLE) AS avg_discount
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY o_custkey
)
SELECT o_feat.o_custkey, n_orders, monetary, r_days,
       CASE WHEN n_orders > 1 THEN
            CAST((2000000 * span_days + (n_orders - 1))
                 // (2 * (n_orders - 1)) AS DOUBLE)
            / CAST(1000000 AS DOUBLE) END AS mean_gap_days,
       CAST(COALESCE(n_items, 0) AS BIGINT) AS n_items,
       CAST(COALESCE(n_brands, 0) AS BIGINT) AS n_brands,
       return_rate, avg_discount
FROM o_feat LEFT JOIN l_feat ON o_feat.o_custkey = l_feat.o_custkey
"""


# --------------------------------------------------------------------------
# Mergeable histogram quantiles + exactness audit
# --------------------------------------------------------------------------

_QH_BINS = 256
_QH_TARGETS = [(50, 1, 2), (90, 9, 10), (99, 99, 100)]


def quantile_histogram_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles from a MERGEABLE equi-width histogram —
    the constant-state sketch (256 integer counters) a streaming or
    federated pipeline keeps when exact ranks are too expensive — with
    the exact nearest-rank value computed alongside (``two_phase_rank``)
    and the absolute error reported: the audit row that tells you
    whether the cheap histogram is good enough for your SLA, same
    estimate-plus-yardstick contract as ``hll_distinct_users``.

    Exactness (of the approximation itself): bin ids are one
    deterministic double expression; counts are integers; the
    cumulative profile is a bounded 256×256 triangular self-join
    (domain-bounded — no window at all); the interpolation is a fixed
    double formula; rank targets use pure integer ceil arithmetic
    ((N·qn + qd − 1) DIV qd, positive operands so Spark's truncation
    and DuckDB's floor agree).  Scale: one scan for min/max, one for
    the histogram, one range shuffle for the exact yardstick."""
    from df_to_azure_spark.functions.distrank import two_phase_rank

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    stats = ev.agg(
        F.min("value").alias("mn"), F.max("value").alias("mx"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    binned = ev.crossJoin(F.broadcast(stats)).select(
        F.expr(
            f"LEAST({_QH_BINS - 1}, CAST(FLOOR((value - mn) / (mx - mn)"
            f" * CAST({_QH_BINS} AS DOUBLE)) AS INT))"
        ).alias("bin")
    )
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    h2 = hist.select(F.col("bin").alias("b2"), F.col("cnt").alias("c2"))
    cum = (
        hist.join(F.broadcast(h2), F.col("b2") <= F.col("bin"))
        .groupBy("bin", "cnt")
        .agg(F.expr("CAST(SUM(c2) AS BIGINT)").alias("cum"))
    )
    targets = spark.createDataFrame(
        _QH_TARGETS, "q_pct int, qn int, qd int"
    ).crossJoin(F.broadcast(stats)).select(
        "q_pct",
        F.expr("(n * qn + qd - 1) DIV qd").cast("bigint").alias("rk"),
        F.expr(
            "CAST(n * qn AS DOUBLE) / CAST(qd AS DOUBLE)"
        ).alias("t"),
        "mn",
        "mx",
    )
    approx = targets.join(
        F.broadcast(cum),
        (F.col("cum") - F.col("cnt") < F.col("t"))
        & (F.col("cum") >= F.col("t")),
    ).select(
        "q_pct",
        "rk",
        F.expr(
            f"mn + (mx - mn) / CAST({_QH_BINS} AS DOUBLE)"
            " * (CAST(bin AS DOUBLE)"
            "    + (t - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE))"
        ).alias("approx_raw"),
    )
    ranked = two_phase_rank(
        ev, [("value", "asc"), ("event_id", "asc")]
    ).select("value", "__rn")
    exact = approx.join(
        ranked, F.col("__rn") == F.col("rk")
    ).select(
        "q_pct",
        F.col("value").alias("exact_value"),
        F.expr("ROUND(approx_raw, 6)").alias("approx_value"),
        F.expr("ROUND(ABS(approx_raw - value), 6)").alias("abs_err"),
    )
    return exact


def _quantile_histogram_oracle() -> str:
    vals = ", ".join(f"({q}, {qn}, {qd})" for q, qn, qd in _QH_TARGETS)
    return f"""
WITH ev AS (SELECT event_id, value FROM events),
stats AS (
  SELECT MIN(value) AS mn, MAX(value) AS mx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ev
), binned AS (
  SELECT LEAST({_QH_BINS - 1}, CAST(FLOOR((value - mn) / (mx - mn)
               * CAST({_QH_BINS} AS DOUBLE)) AS INT)) AS bin
  FROM ev CROSS JOIN stats
), hist AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM binned GROUP BY bin
), cum AS (
  SELECT h.bin, h.cnt, CAST(SUM(h2.cnt) AS BIGINT) AS cum
  FROM hist h JOIN hist h2 ON h2.bin <= h.bin
  GROUP BY h.bin, h.cnt
), targets AS (
  SELECT q_pct, (n * qn + qd - 1) // qd AS rk,
         CAST(n * qn AS DOUBLE) / CAST(qd AS DOUBLE) AS t, mn, mx
  FROM (VALUES {vals}) v(q_pct, qn, qd) CROSS JOIN stats
), approx AS (
  SELECT q_pct, rk,
         mn + (mx - mn) / CAST({_QH_BINS} AS DOUBLE)
            * (CAST(bin AS DOUBLE)
               + (t - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE))
           AS approx_raw
  FROM targets JOIN cum ON (cum - cnt < t AND cum >= t)
), ranked AS (
  SELECT value, row_number() OVER (ORDER BY value, event_id) AS rn FROM ev
)
SELECT q_pct, value AS exact_value,
       ROUND(approx_raw, 6) AS approx_value,
       ROUND(ABS(approx_raw - value), 6) AS abs_err
FROM approx JOIN ranked ON rn = rk
"""


# --------------------------------------------------------------------------
# Funnel conversion rates with Wilson intervals
# --------------------------------------------------------------------------


def _wilson_parts(r: str, n: str) -> tuple[str, str, str]:
    """(phat, center, half) Wilson-score expressions over count columns
    ``r``/``n`` — shared text across engines and across every query
    that screens a proportion (``brand_return_rate_wilson``,
    ``funnel_conversion_wilson``)."""
    phat = f"(CAST({r} AS DOUBLE) / CAST({n} AS DOUBLE))"
    z2n = f"(CAST({_WILSON_Z2!r} AS DOUBLE) / CAST({n} AS DOUBLE))"
    denom = f"(CAST(1 AS DOUBLE) + {z2n})"
    center = f"(({phat} + {z2n} / CAST(2 AS DOUBLE)) / {denom})"
    half = (
        f"(CAST({_WILSON_Z!r} AS DOUBLE)"
        f" * SQRT({phat} * (CAST(1 AS DOUBLE) - {phat}) / CAST({n} AS DOUBLE)"
        f"        + {z2n} / (CAST(4 AS DOUBLE) * CAST({n} AS DOUBLE)))"
        f" / {denom})"
    )
    return phat, center, half


def funnel_conversion_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The strict three-step funnel (``pipeline2.funnel_three_step``)
    re-read as per-step conversion PROPORTIONS with 95% Wilson score
    intervals — the uncertainty-aware funnel report that stops a
    product team from chasing a 2% step change inside a ±4% interval.

    Plan: the same three chained conditional min-aggregations produce
    the stage counts; each step row is (numerator, denominator) and the
    Wilson math is the shared ``_wilson_parts`` formula.  Output: one
    row per funnel step."""
    events = load_table(spark, sf_dir, "events")
    v = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        events.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    nv = v.agg(F.count(F.lit(1)).cast("bigint").alias("nv"))
    nc = c.agg(F.count(F.lit(1)).cast("bigint").alias("nc"))
    np_ = p.agg(F.count(F.lit(1)).cast("bigint").alias("np"))
    wide = nv.crossJoin(F.broadcast(nc)).crossJoin(F.broadcast(np_))
    phat, center, half = _wilson_parts("num", "den")
    steps = wide.selectExpr(
        "stack(2, 'view_to_click', nc, nv, 'click_to_purchase', np, nc)"
        " AS (step, num, den)"
    )
    return steps.select(
        "step",
        F.col("num").cast("bigint").alias("n_converted"),
        F.col("den").cast("bigint").alias("n_entered"),
        F.expr(f"ROUND({phat}, 6)").alias("rate"),
        F.expr(f"ROUND({center} - {half}, 6)").alias("wilson_lo"),
        F.expr(f"ROUND({center} + {half}, 6)").alias("wilson_hi"),
    )


def _funnel_wilson_oracle() -> str:
    phat, center, half = _wilson_parts("num", "den")
    return f"""
WITH v AS (
  SELECT user_id, MIN(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.v_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
  GROUP BY e.user_id
), wide AS (
  SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS nv,
         CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS nc,
         CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS np
), steps AS (
  SELECT 'view_to_click' AS step, nc AS num, nv AS den FROM wide
  UNION ALL
  SELECT 'click_to_purchase' AS step, np AS num, nc AS den FROM wide
)
SELECT step, CAST(num AS BIGINT) AS n_converted,
       CAST(den AS BIGINT) AS n_entered,
       ROUND({phat}, 6) AS rate,
       ROUND({center} - {half}, 6) AS wilson_lo,
       ROUND({center} + {half}, 6) AS wilson_hi
FROM steps
"""


# --------------------------------------------------------------------------
# GNN-style 2-hop neighborhood features on the co-purchase graph
# --------------------------------------------------------------------------


def part_two_hop_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE-style neighborhood aggregation features per part node:
    degree, the MEAN DEGREE of its neighbors (the one-round message
    pass every GNN starts with), and the distinct 2-hop reach
    (neighbors-of-neighbors excluding self and direct neighbors) — the
    structural features a fraud/recommendation model consumes without
    running a full GNN.

    Exactness: degrees and reach are exact integer counts; the
    neighbor-degree mean is one double division, ROUND(6).  Scale: the
    2-hop expansion is one keyed self-join bounded by Σdeg² — the
    support-filtered, mega-basket-capped edge build keeps degrees
    bounded (same contract as ``part_pagerank``); everything else is
    keyed aggregation."""
    from df_to_azure_spark.plans.pipeline2 import _part_edges

    edges = _part_edges(spark, sf_dir).localCheckpoint()
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    nbr_deg = (
        edges.join(deg.select(F.col("src").alias("dst"), "deg"), "dst")
        .groupBy("src")
        .agg(
            F.expr(
                "ROUND(CAST(SUM(deg) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),"
                " 6)"
            ).alias("nbr_deg_mean")
        )
    )
    hop2 = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(
            edges.select(F.col("src").alias("b"), F.col("dst").alias("c")),
            "b",
        )
        .where(F.col("a") != F.col("c"))
        .select("a", "c")
        .distinct()
        .join(
            edges.select(
                F.col("src").alias("a"), F.col("dst").alias("c")
            ),
            ["a", "c"],
            "left_anti",
        )
        .groupBy("a")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_two_hop"))
    )
    return (
        deg.join(nbr_deg, "src")
        .join(hop2, F.col("src") == F.col("a"), "left")
        .select(
            F.col("src").alias("part"),
            "deg",
            "nbr_deg_mean",
            F.coalesce("n_two_hop", F.lit(0)).cast("bigint").alias(
                "n_two_hop"
            ),
        )
    )


def _two_hop_oracle() -> str:
    from df_to_azure_spark.plans.pipeline2 import _PR_MAX_BASKET, _PR_MIN_SUPPORT

    return f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sized AS (
  SELECT l_orderkey FROM li GROUP BY l_orderkey
  HAVING COUNT(*) <= {_PR_MAX_BASKET}
), pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN sized s ON a.l_orderkey = s.l_orderkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_PR_MIN_SUPPORT}
), edges AS (
  SELECT pa AS src, pb AS dst FROM pairs
  UNION ALL SELECT pb AS src, pa AS dst FROM pairs
), deg AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
), nbr_deg AS (
  SELECT e.src,
         ROUND(CAST(SUM(d.deg) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           AS nbr_deg_mean
  FROM edges e JOIN deg d ON e.dst = d.src
  GROUP BY e.src
), hop2 AS (
  SELECT a, CAST(COUNT(*) AS BIGINT) AS n_two_hop
  FROM (
    SELECT DISTINCT e1.src AS a, e2.dst AS c
    FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
    WHERE e1.src <> e2.dst
  ) t
  WHERE NOT EXISTS (
    SELECT 1 FROM edges d WHERE d.src = t.a AND d.dst = t.c
  )
  GROUP BY a
)
SELECT deg.src AS part, deg.deg, nbr_deg_mean,
       CAST(COALESCE(n_two_hop, 0) AS BIGINT) AS n_two_hop
FROM deg JOIN nbr_deg ON deg.src = nbr_deg.src
         LEFT JOIN hop2 ON deg.src = hop2.a
"""


# --------------------------------------------------------------------------
# Pattern detection: revenue dip-and-recovery episodes
# --------------------------------------------------------------------------

_DIP_NUM, _DIP_DEN = 8, 10   # dip = revenue < 8/10 of the previous day
_DIP_LOOKAHEAD = 7


def revenue_dip_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern on the daily grid WITHOUT
    a pattern engine: find every day whose revenue fell below 8/10 of
    the previous day (the dip), and the first day within the next 7
    that recovered to at least the pre-dip level — the
    drop-then-rebound episode an on-call dashboard pages on, expressed
    as two bounded offset joins.

    Exactness: the dip predicate is the integer cross-multiplication
    ``10·rev_d < 8·rev_{d−1}`` (no ratio, no float threshold); recovery
    is an integer comparison per lookahead offset with an integer MIN.
    Scale: day-domain-bounded — one keyed self-join for the dip, one
    7-offset join for the recovery scan."""
    from df_to_azure_spark.plans.pipeline5 import _daily_revenue

    daily = _daily_revenue(spark, sf_dir).select(
        "d", F.expr("CAST(rev * 100 AS BIGINT)").alias("cents")
    )
    prev = daily.select((F.col("d") + 1).alias("d"), F.col("cents").alias("prev_c"))
    dips = daily.join(prev, "d").where(
        F.expr(f"cents * {_DIP_DEN} < prev_c * {_DIP_NUM}")
    )
    look = spark.range(1, _DIP_LOOKAHEAD + 1).select(F.col("id").alias("g"))
    fut = daily.select(F.col("d").alias("fd"), F.col("cents").alias("fut_c"))
    rec = (
        dips.crossJoin(F.broadcast(look))
        .join(
            fut,
            F.col("fd") == F.col("d") + F.col("g"),
        )
        .where(F.col("fut_c") >= F.col("prev_c"))
        .groupBy("d")
        .agg(F.min("g").cast("bigint").alias("days_to_recover"))
    )
    return dips.join(rec, "d", "left").select(
        "d",
        F.expr("CAST(prev_c AS DOUBLE) / CAST(100 AS DOUBLE)").alias(
            "rev_before"
        ),
        F.expr("CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE)").alias(
            "rev_dip"
        ),
        F.expr(
            "ROUND(CAST(1 AS DOUBLE) - CAST(cents AS DOUBLE)"
            " / CAST(prev_c AS DOUBLE), 6)"
        ).alias("drop_frac"),
        "days_to_recover",
    )


DIP_RECOVERY_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS d,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   AS DECIMAL(24,2)) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1
), dips AS (
  SELECT a.d, a.cents, b.cents AS prev_c
  FROM daily a JOIN daily b ON a.d = b.d + 1
  WHERE a.cents * {_DIP_DEN} < b.cents * {_DIP_NUM}
), rec AS (
  SELECT dips.d, CAST(MIN(g) AS BIGINT) AS days_to_recover
  FROM dips
  CROSS JOIN (SELECT UNNEST(generate_series(1, {_DIP_LOOKAHEAD})) AS g) look
  JOIN daily f ON f.d = dips.d + g
  WHERE f.cents >= dips.prev_c
  GROUP BY dips.d
)
SELECT dips.d,
       CAST(prev_c AS DOUBLE) / CAST(100 AS DOUBLE) AS rev_before,
       CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE) AS rev_dip,
       ROUND(CAST(1 AS DOUBLE) - CAST(cents AS DOUBLE)
             / CAST(prev_c AS DOUBLE), 6) AS drop_frac,
       days_to_recover
FROM dips LEFT JOIN rec ON dips.d = rec.d
"""


# --------------------------------------------------------------------------
# Bollinger bands on the daily grid
# --------------------------------------------------------------------------

_BB_WIN = 20


def revenue_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 20-day Bollinger bands (MA ± 2σ) with breakout flags on
    daily revenue — the volatility envelope a monitoring system draws
    around any KPI; days outside the band are the candidate anomalies.

    Exactness: the trailing window is a bounded 20-offset join on the
    day grid (NULL until a full window exists).  The population
    variance rides the EXACT integer numerator
    ``NUM = n·Σc² − (Σc)²`` (cents, DECIMAL(38,0) — no mid-plan
    division), and NUM reaches double precision through an exact
    hi/lo split (``NUM DIV 10⁹`` and ``NUM % 10⁹``, both < 2⁵³)
    recombined with IEEE arithmetic — a DIRECT cast of a >17-digit
    decimal is NOT correctly rounded in every engine, and because
    ``σ = √NUM/(n·100)`` feeds a ROUND(6), a 1-ulp cast difference
    flipped boundary rows at sf0.1 until this device replaced it.
    SQRT is the only transcendental; the breakout flags compare the
    raw value against the ROUND(6)-ed band edges.  Scale:
    day-domain-bounded."""
    from df_to_azure_spark.plans.pipeline5 import _daily_revenue

    daily = _daily_revenue(spark, sf_dir).select(
        "d", F.expr("CAST(rev * 100 AS BIGINT)").alias("cents")
    )
    offs = spark.range(_BB_WIN).select(F.col("id").alias("g"))
    win = (
        daily.crossJoin(F.broadcast(offs))
        .select((F.col("d") + F.col("g")).alias("wd"), "cents")
        .groupBy("wd")
        .agg(
            F.count(F.lit(1)).alias("nw"),
            F.expr("CAST(SUM(cents) AS BIGINT)").alias("sc"),
            F.expr(
                "SUM(CAST(cents AS DECIMAL(19,0))"
                " * CAST(cents AS DECIMAL(19,0)))"
            ).alias("scc"),
        )
        .where(F.col("nw") == _BB_WIN)
        .withColumn(
            "num",
            F.expr(
                f"CAST({_BB_WIN} * scc"
                " - CAST(sc AS DECIMAL(38,0)) * sc AS DECIMAL(38,0))"
            ),
        )
        .select(
            "wd",
            "sc",
            F.expr("CAST(num DIV 1000000000 AS BIGINT)").alias("num_hi"),
            F.expr("CAST(num % 1000000000 AS BIGINT)").alias("num_lo"),
        )
    )
    dblnum = (
        "(CAST(num_hi AS DOUBLE) * CAST(1000000000 AS DOUBLE)"
        " + CAST(num_lo AS DOUBLE))"
    )
    mu = f"(CAST(sc AS DOUBLE) / CAST({_BB_WIN * 100} AS DOUBLE))"
    sig = f"(SQRT({dblnum}) / CAST({_BB_WIN * 100} AS DOUBLE))"
    return (
        daily.join(win, daily.d == F.col("wd"))
        .select(
            "d",
            F.expr("CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE)").alias(
                "rev"
            ),
            F.expr(f"ROUND({mu}, 6)").alias("ma20"),
            F.expr(f"ROUND({sig}, 6)").alias("sigma20"),
            F.expr(
                f"ROUND({mu} + CAST(2 AS DOUBLE) * {sig}, 6)"
            ).alias("upper"),
            F.expr(
                f"ROUND({mu} - CAST(2 AS DOUBLE) * {sig}, 6)"
            ).alias("lower"),
        )
        .withColumn(
            "breakout",
            F.expr(
                "CASE WHEN rev > upper THEN 'above'"
                " WHEN rev < lower THEN 'below' END"
            ),
        )
    )


BOLLINGER_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS d,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   AS DECIMAL(24,2)) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1
), win AS (
  SELECT wd, COUNT(*) AS nw, CAST(SUM(cents) AS BIGINT) AS sc,
         SUM(CAST(cents AS DECIMAL(19,0)) * CAST(cents AS DECIMAL(19,0)))
           AS scc
  FROM (
    SELECT d + g AS wd, cents
    FROM daily CROSS JOIN (SELECT UNNEST(generate_series(0, {_BB_WIN - 1}))
                           AS g) offs
  )
  GROUP BY wd
  HAVING COUNT(*) = {_BB_WIN}
), split AS (
  SELECT wd, sc,
         CAST(CAST({_BB_WIN} * scc - CAST(sc AS DECIMAL(38,0)) * sc
                   AS HUGEINT) // 1000000000 AS BIGINT) AS num_hi,
         CAST(CAST({_BB_WIN} * scc - CAST(sc AS DECIMAL(38,0)) * sc
                   AS HUGEINT) % 1000000000 AS BIGINT) AS num_lo
  FROM win
), j AS (
  SELECT d, cents,
         (CAST(sc AS DOUBLE) / CAST({_BB_WIN * 100} AS DOUBLE)) AS mu,
         (SQRT(CAST(num_hi AS DOUBLE) * CAST(1000000000 AS DOUBLE)
               + CAST(num_lo AS DOUBLE))
          / CAST({_BB_WIN * 100} AS DOUBLE)) AS sig
  FROM daily JOIN split ON daily.d = split.wd
)
SELECT d, CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE) AS rev,
       ROUND(mu, 6) AS ma20,
       ROUND(sig, 6) AS sigma20,
       ROUND(mu + CAST(2 AS DOUBLE) * sig, 6) AS upper,
       ROUND(mu - CAST(2 AS DOUBLE) * sig, 6) AS lower,
       CASE WHEN CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE)
                 > ROUND(mu + CAST(2 AS DOUBLE) * sig, 6) THEN 'above'
            WHEN CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE)
                 < ROUND(mu - CAST(2 AS DOUBLE) * sig, 6) THEN 'below' END
         AS breakout
FROM j
"""


# --------------------------------------------------------------------------
# Sorted-neighborhood blocking for fuzzy dedup
# --------------------------------------------------------------------------

_SNM_WINDOW = 3
_SNM_KEY_LEN = 24
_SNM_MAX_DIST = 60


def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood record linkage (Hernández & Stolfo 1995) —
    the OTHER classic blocking strategy next to LSH banding: sort the
    corpus by a normalized key (lowercased 24-char prefix), compare
    each document only to its ``_SNM_WINDOW`` successors in sort
    order, and confirm candidates with the exact prefix Levenshtein.
    Catches near-dups whose shared prefix survives small edits — the
    complement of shingle-based LSH (which needs content overlap, not
    prefix locality).

    Scale shape: the global sort order comes from ``two_phase_rank``
    (range-partitioned, no single-partition window) and the
    window-of-w comparison is an EQUI-join on ``rank + offset`` with a
    broadcast w-row offset frame — O(n·w) candidate pairs by
    construction, never quadratic.  Exactness: ranks and offsets are
    integers; ``levenshtein`` is byte-identical cross-engine on this
    corpus."""
    from df_to_azure_spark.functions.distrank import two_phase_rank

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"lower(substring(text, 1, {_SNM_KEY_LEN}))").alias("k"),
        F.expr(f"substring(text, 1, {_ED_PREFIX})").alias("pref"),
    )
    ranked = two_phase_rank(
        docs, [("k", "asc"), ("doc_id", "asc")]
    ).select("doc_id", "k", "pref", F.col("__rn").alias("rn"))
    offs = spark.range(1, _SNM_WINDOW + 1).select(F.col("id").alias("w"))
    a = ranked.select(
        F.col("doc_id").alias("id_a"), F.col("pref").alias("pref_a"),
        F.col("rn").alias("rn_a"),
    )
    b = ranked.select(
        F.col("doc_id").alias("id_b"), F.col("pref").alias("pref_b"),
        F.col("rn").alias("rn_b"),
    )
    return (
        a.crossJoin(F.broadcast(offs))
        .join(b, F.col("rn_b") == F.col("rn_a") + F.col("w"))
        .select(
            "id_a",
            "id_b",
            F.col("w").cast("int").alias("window_dist"),
            F.expr("CAST(levenshtein(pref_a, pref_b) AS INT)").alias(
                "edit_dist"
            ),
        )
        .where(F.col("edit_dist") <= _SNM_MAX_DIST)
    )


SNM_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, lower(substring(text, 1, {_SNM_KEY_LEN})) AS k,
         substring(text, 1, {_ED_PREFIX}) AS pref
  FROM documents
), ranked AS (
  SELECT doc_id, pref,
         row_number() OVER (ORDER BY k, doc_id) AS rn
  FROM docs
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(w AS INT) AS window_dist,
       CAST(levenshtein(a.pref, b.pref) AS INT) AS edit_dist
FROM ranked a
CROSS JOIN (SELECT UNNEST(generate_series(1, {_SNM_WINDOW})) AS w) offs
JOIN ranked b ON b.rn = a.rn + w
WHERE CAST(levenshtein(a.pref, b.pref) AS INT) <= {_SNM_MAX_DIST}
"""


# --------------------------------------------------------------------------
# Neyman sampling allocation across strata
# --------------------------------------------------------------------------

_NEYMAN_N = 10000


def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal (Neyman 1934) sample-size allocation across event-type
    strata for a fixed budget of {n} draws: ``n_h ∝ N_h·σ_h`` — the
    allocation that minimizes the estimator variance, and the number a
    data-labeling or QA pipeline needs before drawing its audit sample
    (uniform allocation over-samples quiet strata).

    Exactness: per-stratum N and σ come from exact integer cent sums
    (DECIMAL(38,0) squares); each σ is one SQRT ROUND(12); the
    normalizing Σ N_k·σ_k accumulates the ROUND-12 products as
    DECIMAL(28,12) (order-free across the bounded stratum domain);
    allocations are one shared double formula with half-up ROUND.
    Scale: one aggregate, then arithmetic on a |types|-row frame."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("c"),
    )
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.expr("CAST(SUM(c) AS BIGINT)").alias("sc"),
        F.expr(
            "SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))"
        ).alias("scc"),
    )
    mu = "(CAST(sc AS DOUBLE) / CAST(n_h AS DOUBLE))"
    sig = (
        f"ROUND(SQRT(CAST(scc AS DOUBLE) / CAST(n_h AS DOUBLE)"
        f" - {mu} * {mu}) / CAST(100 AS DOUBLE), 12)"
    )
    wsig = per.withColumn("sig", F.expr(sig)).withColumn(
        "w", F.expr("ROUND(CAST(n_h AS DOUBLE) * sig, 12)")
    )
    tot = wsig.agg(
        F.expr(
            "CAST(SUM(CAST(w AS DECIMAL(28,12))) AS DOUBLE)"
        ).alias("wtot")
    )
    return wsig.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_h",
        F.expr("ROUND(sig, 6)").alias("sigma"),
        F.expr("ROUND(w / wtot, 6)").alias("alloc_frac"),
        F.expr(
            f"CAST(ROUND(CAST({_NEYMAN_N} AS DOUBLE) * w / wtot, 0)"
            " AS BIGINT)"
        ).alias("alloc_n"),
    )


def _neyman_oracle() -> str:
    mu = "(CAST(sc AS DOUBLE) / CAST(n_h AS DOUBLE))"
    sig = (
        f"ROUND(SQRT(CAST(scc AS DOUBLE) / CAST(n_h AS DOUBLE)"
        f" - {mu} * {mu}) / CAST(100 AS DOUBLE), 12)"
    )
    return f"""
WITH ev AS (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events
), per AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_h,
         CAST(SUM(c) AS BIGINT) AS sc,
         SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS scc
  FROM ev GROUP BY event_type
), wsig AS (
  SELECT event_type, n_h, {sig} AS sig,
         ROUND(CAST(n_h AS DOUBLE) * {sig}, 12) AS w
  FROM per
), tot AS (
  SELECT CAST(SUM(CAST(w AS DECIMAL(28,12))) AS DOUBLE) AS wtot FROM wsig
)
SELECT event_type, n_h, ROUND(sig, 6) AS sigma,
       ROUND(w / wtot, 6) AS alloc_frac,
       CAST(ROUND(CAST({_NEYMAN_N} AS DOUBLE) * w / wtot, 0) AS BIGINT)
         AS alloc_n
FROM wsig CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# Readability scoring (Flesch-Kincaid with a vowel-run syllable proxy)
# --------------------------------------------------------------------------


def doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document readability: words, sentences, a vowel-run syllable
    proxy, and the Flesch-Kincaid grade / Flesch reading-ease scores —
    the classic text-quality signals a curation pipeline files next to
    the Gopher filters (``doc_repetition_stats``); syllables-by-
    vowel-groups is the standard dictionary-free proxy.

    Exactness: all three counts are regexp counts (identical RE2/Java
    patterns without engine-divergent constructs); the two scores are
    fixed double formulas over integer counts with the published
    constants as shared literals, ROUND(6).  Scale: pure map-side
    expressions — no shuffle at all beyond the scan."""
    docs = load_table(spark, sf_dir, "documents")
    words = "CAST(size(regexp_extract_all(text, '[A-Za-z]+', 0)) AS BIGINT)"
    sents = (
        "CAST(GREATEST(size(regexp_extract_all(text, '[.!?]+', 0)), 1)"
        " AS BIGINT)"
    )
    syls = (
        "CAST(GREATEST(size(regexp_extract_all(lower(text),"
        " '[aeiouy]+', 0)), 1) AS BIGINT)"
    )
    base = docs.select(
        "doc_id",
        F.expr(words).alias("n_words"),
        F.expr(sents).alias("n_sentences"),
        F.expr(syls).alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    wps = "(CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))"
    spw = "(CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))"
    return base.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(
            f"ROUND(CAST(0.39 AS DOUBLE) * {wps}"
            f" + CAST(11.8 AS DOUBLE) * {spw}"
            " - CAST(15.59 AS DOUBLE), 6)"
        ).alias("fk_grade"),
        F.expr(
            f"ROUND(CAST(206.835 AS DOUBLE)"
            f" - CAST(1.015 AS DOUBLE) * {wps}"
            f" - CAST(84.6 AS DOUBLE) * {spw}, 6)"
        ).alias("reading_ease"),
    )


READABILITY_ORACLE = """
WITH base AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
           AS n_words,
         CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS n_sentences,
         CAST(GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
              AS BIGINT) AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       ROUND(CAST(0.39 AS DOUBLE)
             * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             + CAST(11.8 AS DOUBLE)
             * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
             - CAST(15.59 AS DOUBLE), 6) AS fk_grade,
       ROUND(CAST(206.835 AS DOUBLE)
             - CAST(1.015 AS DOUBLE)
             * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             - CAST(84.6 AS DOUBLE)
             * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 6)
         AS reading_ease
FROM base WHERE n_words > 0
"""


# --------------------------------------------------------------------------
# Markov entropy rate of the event-type chain
# --------------------------------------------------------------------------


def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state next-event uncertainty of the user behavior chain:
    for each source event type, the conditional entropy
    ``H(next | from) = ln(n_i) − (Σ_j n_ij ln n_ij)/n_i`` over the
    transition counts of ``event_transition_matrix``, its empirical
    stationary weight ``π_i``, and the contribution ``π_i · H_i`` whose
    sum is the chain's entropy rate — the one-number answer to "how
    predictable is user behavior after X?".

    Exactness: transition counts are exact integers off the same
    user-keyed lag pass as the transition matrix; every ``n·ln n`` term
    rounds to 12 decimals into DECIMAL(28,12) sums over the bounded
    |types|² grid; the outputs are fixed double formulas, ROUND(6)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("from_type", F.lag("event_type").over(w))
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ij"))
    )
    per_from = pairs.groupBy("from_type").agg(
        F.expr("CAST(SUM(n_ij) AS BIGINT)").alias("n_i"),
        F.expr(
            "SUM(CAST(ROUND(CAST(n_ij AS DOUBLE)"
            " * LN(CAST(n_ij AS DOUBLE)), 12) AS DECIMAL(28,12)))"
        ).alias("s_nlogn"),
    )
    tot = per_from.agg(F.expr("CAST(SUM(n_i) AS BIGINT)").alias("n_tot"))
    h_i = (
        "(LN(CAST(n_i AS DOUBLE))"
        " - CAST(s_nlogn AS DOUBLE) / CAST(n_i AS DOUBLE))"
    )
    pi = "(CAST(n_i AS DOUBLE) / CAST(n_tot AS DOUBLE))"
    return per_from.crossJoin(F.broadcast(tot)).select(
        "from_type",
        "n_i",
        F.expr(f"ROUND({h_i}, 6)").alias("h_next"),
        F.expr(f"ROUND({pi}, 6)").alias("pi"),
        F.expr(f"ROUND({pi} * {h_i}, 6)").alias("rate_contrib"),
    )


ENTROPY_RATE_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type
  FROM events
), pairs AS (
  SELECT from_type, event_type AS to_type,
         CAST(COUNT(*) AS BIGINT) AS n_ij
  FROM ordered WHERE from_type IS NOT NULL
  GROUP BY 1, 2
), per_from AS (
  SELECT from_type, CAST(SUM(n_ij) AS BIGINT) AS n_i,
         SUM(CAST(ROUND(CAST(n_ij AS DOUBLE)
                        * LN(CAST(n_ij AS DOUBLE)), 12)
             AS DECIMAL(28,12))) AS s_nlogn
  FROM pairs GROUP BY from_type
), tot AS (SELECT CAST(SUM(n_i) AS BIGINT) AS n_tot FROM per_from)
SELECT from_type, n_i,
       ROUND((LN(CAST(n_i AS DOUBLE))
              - CAST(s_nlogn AS DOUBLE) / CAST(n_i AS DOUBLE)), 6)
         AS h_next,
       ROUND((CAST(n_i AS DOUBLE) / CAST(n_tot AS DOUBLE)), 6) AS pi,
       ROUND((CAST(n_i AS DOUBLE) / CAST(n_tot AS DOUBLE))
             * (LN(CAST(n_i AS DOUBLE))
                - CAST(s_nlogn AS DOUBLE) / CAST(n_i AS DOUBLE)), 6)
         AS rate_contrib
FROM per_from CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# Fulfillment latency percentiles per order priority
# --------------------------------------------------------------------------

_FULFILL_PCTS = [(50, 1, 2), (90, 9, 10), (99, 99, 100)]


def fulfillment_latency_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """p50/p90/p99 of order→ship latency PER ORDER PRIORITY — the SLA
    matrix that answers "does URGENT actually ship faster?", computed
    as exact grouped nearest-rank order statistics
    (``k = ceil(p·n_g)``, pure integer arithmetic) on the GROUPED
    ``two_phase_rank`` — no single-partition sort, no
    ``percentile_approx`` engine internals.

    Latency is an exact integer day difference per lineitem; the rank
    filter selects 3 rows per priority."""
    from df_to_azure_spark.functions.distrank import two_phase_rank

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "CAST(datediff(CAST(l_shipdate AS DATE),"
            " CAST(o_orderdate AS DATE)) AS BIGINT)"
        ).alias("lat_days"),
    )
    ranked = two_phase_rank(
        lat,
        [("lat_days", "asc"), ("l_orderkey", "asc"), ("l_linenumber", "asc")],
        group_cols=["o_orderpriority"],
    )
    picks = None
    for label, num, den in _FULFILL_PCTS:
        sel = ranked.where(
            F.col("__rn") == F.expr(f"({num} * __grp_n + {den} - 1) DIV {den}")
        ).select(
            "o_orderpriority",
            F.lit(f"p{label}").alias("percentile"),
            F.col("__grp_n").cast("bigint").alias("n_lineitems"),
            F.col("lat_days").alias("latency_days"),
        )
        picks = sel if picks is None else picks.unionAll(sel)
    return picks


def _fulfillment_oracle() -> str:
    parts = []
    for label, num, den in _FULFILL_PCTS:
        parts.append(f"""
  SELECT o_orderpriority, 'p{label}' AS percentile,
         CAST(n_g AS BIGINT) AS n_lineitems,
         lat_days AS latency_days
  FROM ranked
  WHERE rn = ({num} * n_g + {den} - 1) // {den}""")
    return f"""
WITH lat AS (
  SELECT o_orderpriority, l_orderkey, l_linenumber,
         CAST(date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) AS BIGINT) AS lat_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), ranked AS (
  SELECT o_orderpriority, lat_days,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY lat_days, l_orderkey, l_linenumber)
           AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n_g
  FROM lat
)
{" UNION ALL ".join(parts)}
"""


# --------------------------------------------------------------------------
# Multimodal dedup: SimHash banding over the media feature vectors
# --------------------------------------------------------------------------

_MEDIA_SH_BITS = 12
_MEDIA_SH_SEED = 29


def _media_planes() -> list[list[float]]:
    import random

    rng = random.Random(_MEDIA_SH_SEED)
    return [
        [rng.gauss(0, 1) for _ in range(16)] for _ in range(_MEDIA_SH_BITS)
    ]


def media_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal pipeline reaching DEDUP: hyperplane-sign SimHash
    over the (stub-decoded) media feature vectors, candidate pairs from
    exact bucket collisions, cosine confirm — the same
    bucketed-never-all-pairs contract as the text/embedding dedup
    family, now on the media modality (features come from the
    Arrow-batched ``multimodal.extract_features`` stub whose values are
    sha256-derived, so the WHOLE chain — decode plumbing included — is
    hash-checked against SQL).

    Scale shape: map-side bucket assignment (seeded plane literals),
    one equi-join keyed on the 12-bit bucket; pair volume is bounded by
    bucket collisions, never |media|²."""
    from df_to_azure_spark.functions import multimodal as MM
    from df_to_azure_spark.functions.similarity import (
        cosine,
        hyperplane_bucket,
    )

    feats = MM.extract_features(MM.synthesize_media(spark, n=200)).select(
        "media_id", "features"
    )
    b = feats.withColumn(
        "bucket", hyperplane_bucket(F.col("features"), _media_planes())
    )
    a = b.select(
        F.col("media_id").alias("id_a"), F.col("bucket"),
        F.col("features").alias("fa"),
    )
    c = b.select(
        F.col("media_id").alias("id_b"), F.col("bucket"),
        F.col("features").alias("fb"),
    )
    return (
        a.join(c, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.col("bucket").cast("bigint").alias("bucket"),
            F.round(cosine(F.col("fa"), F.col("fb")), 8).alias("cos_sim"),
        )
    )


def _media_simhash_oracle() -> str:
    from df_to_azure_spark.plans.training_data import _dot_sql

    planes = _media_planes()
    lits = [
        "CAST([" + ", ".join(repr(x) for x in p) + "] AS DOUBLE[])"
        for p in planes
    ]
    bucket = " + ".join(
        f"(CASE WHEN {_dot_sql('features', lits[i])} >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(len(planes))
    )
    cos = (
        f"round({_dot_sql('fa', 'fb')} / "
        f"(sqrt({_dot_sql('fa', 'fa')}) * sqrt({_dot_sql('fb', 'fb')})), 8)"
    )
    return f"""
WITH m AS (
  SELECT range AS media_id,
         encode(sha256(CAST(range AS VARCHAR))) AS payload
  FROM range(0, 200)
), h AS (
  SELECT media_id, sha256(decode(payload)) AS hx FROM m
), f AS (
  SELECT media_id,
         list_transform(range(1, 17),
           i -> CAST(strpos('0123456789abcdef', hx[i]) - 1 AS DOUBLE) / 15.0
         ) AS features
  FROM h
), b AS (
  SELECT media_id, features, CAST({bucket} AS BIGINT) AS bucket FROM f
)
SELECT a.media_id AS id_a, c.media_id AS id_b, a.bucket,
       {cos.replace("fa", "a.features").replace("fb", "c.features")} AS cos_sim
FROM b a JOIN b c ON a.bucket = c.bucket AND a.media_id < c.media_id
"""


# --------------------------------------------------------------------------
# Dedup observability: near-dup component size distribution
# --------------------------------------------------------------------------


def neardup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size distribution of the near-duplicate components — the one
    chart a dedup report leads with (how much of the corpus sits in
    2-clusters vs giant boilerplate blobs), plus the rows deletion
    would save per size class.  Composes ``neardup_components``; counts
    are exact integers off two keyed aggregations."""
    from df_to_azure_spark.functions.graph import connected_components
    from df_to_azure_spark.functions import similarity as SIM_
    from df_to_azure_spark.plans.training_data import _neardup_planes

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = SIM_.embedding_neardup_pairs_lsh(
        emb, _neardup_planes(), threshold=0.6
    ).select("id_a", "id_b")
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("size")
    )
    return sizes.groupBy("size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.expr("CAST(SUM(size - 1) AS BIGINT)").alias("rows_deletable"),
    )


def _neardup_sizes_oracle() -> str:
    from df_to_azure_spark.plans.training_data import _NEARDUP_COMP_CTES

    return f"""
{_NEARDUP_COMP_CTES},
sizes AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS size
  FROM comp GROUP BY component
)
SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(size - 1) AS BIGINT) AS rows_deletable
FROM sizes GROUP BY size
"""
