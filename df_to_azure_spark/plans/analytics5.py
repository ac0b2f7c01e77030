"""Fifth analytics wave — exact-arithmetic statistics over the star
schema: per-nation OLS revenue trend from closed-form sums, per-user
event-mix Shannon entropy, and a chi-square independence test between
order priority and status.

Numeric policy: every floating-point result derives from EXACT integer
or decimal sums computed distributively (one shuffle per groupBy), with
the float expression applied once per OUTPUT row in the final
projection and rounded to 6 places.  That keeps results
partition-order-independent — the only fp ops happen after aggregation,
on values that are bit-identical across engines — which is what lets
DuckDB hash-match these queries exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from df_to_azure_spark.sources import load_table


def nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation ordinary-least-squares trend of order value over time:
    slope (price units per day) and intercept of ``o_totalprice``
    regressed on order date, from the closed-form normal equations.

    Spark ships ``regr_slope``/``regr_intercept``, but those aggregate
    doubles and are partition-order-dependent; instead the five
    sufficient statistics (n, Σx, Σy, Σx², Σxy) are aggregated EXACTLY
    (BIGINT / DECIMAL) in one map-side-combinable pass, and the slope
    is a single double expression over them.  x is centred on
    1995-01-01 so the decimal sums stay small enough that the final
    decimal→double casts are exact.

    Scale: orders⋈customer shuffles on custkey (both scale — no static
    hint, AQE picks the strategy); nation (25 rows) is the only
    broadcast.  The agg is 25-group, map-side combined: one narrow
    shuffle of 5 numbers per nation per task.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS BIGINT)"
        ).alias("x"),
        F.expr("CAST(o_totalprice AS DECIMAL(18,2))").alias("y"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    sums = (
        orders.join(cust, "o_custkey")
        .join(F.broadcast(nation), "c_nationkey")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("SUM(x)").alias("sx"),
            F.expr("SUM(y)").alias("sy"),
            F.expr("SUM(x * x)").alias("sxx"),
            F.expr("SUM(CAST(x AS DECIMAL(10,0)) * y)").alias("sxy"),
        )
    )
    # all-double arithmetic, identical op order on both sides
    num = "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    den = "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    inum = "(CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))"
    return sums.select(
        "n_name",
        F.col("n").alias("n_orders"),
        F.expr(f"ROUND({num} / {den}, 6)").alias("slope_per_day"),
        F.expr(f"ROUND({inum} / {den}, 6)").alias("intercept"),
    )


NATION_TREND_ORACLE = """
WITH pts AS (
  SELECT n_name,
         CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         CAST(o_totalprice AS DECIMAL(18,2)) AS y
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
), sums AS (
  SELECT n_name, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, SUM(y) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         SUM(CAST(x AS DECIMAL(10,0)) * y) AS sxy
  FROM pts GROUP BY n_name
)
SELECT n_name, n AS n_orders,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
         AS slope_per_day,
       ROUND((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
         AS intercept
FROM sums
"""


def user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy (nats) of the event-type mix — the
    standard behavioural-diversity / bot-detection feature (a user who
    only ever fires one event type scores 0).

    Uses the factored form H = ln(n) − (Σ c·ln c)/n so one
    (user, type) count pass plus one per-user pass suffice — no
    join-back of totals.  Both aggregations are map-side combinable;
    the ≤|type-domain| float terms per user are summed post-shuffle
    within one group, and ROUND(6) absorbs the sub-1e-12 ordering
    noise.  Scale: shuffles on user_id — the natural key; skewed power
    users are bounded by the type domain (≤5 rows per user after the
    first agg).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    return c.groupBy("user_id").agg(
        F.expr("CAST(SUM(c) AS BIGINT)").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        F.expr(
            "ROUND(LN(CAST(SUM(c) AS DOUBLE))"
            " - SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE)))"
            " / CAST(SUM(c) AS DOUBLE), 6)"
        ).alias("entropy_nats"),
    )


USER_ENTROPY_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
)
SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events, COUNT(*) AS n_types,
       ROUND(LN(CAST(SUM(c) AS DOUBLE))
             - SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE)))
             / CAST(SUM(c) AS DOUBLE), 6) AS entropy_nats
FROM c GROUP BY user_id
"""


def priority_status_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between ``o_orderpriority`` and
    ``o_orderstatus``: Σ (observed − expected)²/expected over the
    contingency table, with expected = row·col/grand marginals.

    The full scan reduces to the ≤|priority|×|status| cell table first
    (one map-side-combined shuffle); the three marginal windows then
    run over that TINY frame — window-over-aggregate, not
    window-over-fact, so the unpartitioned total-count window is a
    few-row single task, fine at any scale.  dof comes from the
    distinct level counts of the same cell frame.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus"
    )
    cells = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("c")
    )
    m = cells.select(
        "c",
        F.sum("c").over(W.partitionBy("o_orderpriority")).alias("rp"),
        F.sum("c").over(W.partitionBy("o_orderstatus")).alias("cs"),
        F.sum("c").over(W.partitionBy()).alias("n"),
        F.col("o_orderpriority"),
        F.col("o_orderstatus"),
    )
    e = "(CAST(rp AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(n AS DOUBLE))"
    term = f"((CAST(c AS DOUBLE) - {e}) * (CAST(c AS DOUBLE) - {e}) / {e})"
    return m.agg(
        F.expr(f"ROUND(SUM({term}), 6)").alias("chi2"),
        F.expr(
            "CAST((COUNT(DISTINCT o_orderpriority) - 1)"
            " * (COUNT(DISTINCT o_orderstatus) - 1) AS BIGINT)"
        ).alias("dof"),
        F.expr("CAST(MAX(n) AS BIGINT)").alias("n_orders"),
    )


CHI2_ORACLE = """
WITH cells AS (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS c
  FROM orders GROUP BY 1, 2
), m AS (
  SELECT c,
         CAST(SUM(c) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS rp,
         CAST(SUM(c) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS cs,
         CAST(SUM(c) OVER () AS BIGINT) AS n,
         o_orderpriority, o_orderstatus
  FROM cells
)
SELECT ROUND(SUM((CAST(c AS DOUBLE) - (CAST(rp AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(n AS DOUBLE)))
                 * (CAST(c AS DOUBLE) - (CAST(rp AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(n AS DOUBLE)))
                 / (CAST(rp AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS chi2,
       CAST((COUNT(DISTINCT o_orderpriority) - 1)
            * (COUNT(DISTINCT o_orderstatus) - 1) AS BIGINT) AS dof,
       CAST(MAX(n) AS BIGINT) AS n_orders
FROM m
"""


# Poisson(1) CDF thresholds for the hash-bootstrap weights; generated
# once so the Spark plan and the SQL oracle share identical double
# literals (the comparison boundaries must match bit-for-bit).
import math as _math

_POISSON_CDF = []
_acc, _pmf = 0.0, _math.exp(-1.0)
for _i in range(5):
    _acc += _pmf
    _POISSON_CDF.append(_acc)
    _pmf /= (_i + 1)


def bootstrap_order_price_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bootstrap over orders: 32 resampling replicas of
    mean(o_totalprice), each row's replica weight drawn as
    Poisson(1)-quantile of a hash of (order id, replica) — the standard
    "Poissonized" bootstrap that needs NO shuffling of the data and no
    randomness: every weight is a pure function of (id, replica), so the
    replica means are bit-reproducible in any engine and across any
    partitioning.  Downstream, the spread of these means IS the
    confidence interval of the mean.

    Exactness: weighted sums are DECIMAL (order-free); the mean divides
    once at the end in DOUBLE and rounds to 6 dp.  Scale shape: explode
    x32 (map-side), ONE partial-agg shuffle keyed by replica — at 100 TB
    this is the only sane bootstrap (collecting a sample to the driver
    is not one)."""
    b = 32
    orders = load_table(spark, sf_dir, "orders")
    r = F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("replica")
    rows = orders.select(F.col("o_orderkey"), F.col("o_totalprice"), r)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("o_orderkey"), F.col("replica"))),
                1, 8,
            ),
            16, 10,
        ).cast("double")
        / F.lit(float(1 << 32))
    )
    w = F.lit(5)
    for i in range(4, -1, -1):
        w = F.when(u < F.lit(_POISSON_CDF[i]), F.lit(i)).otherwise(w)
    weighted = rows.select(
        "replica",
        w.alias("w"),
        F.expr("CAST(o_totalprice AS DECIMAL(18,2))").alias("x"),
    ).select(
        "replica", "w", (F.col("w").cast("decimal(10,0)") * F.col("x")).alias("wx")
    )
    return (
        weighted.groupBy("replica")
        .agg(
            F.sum("w").cast("bigint").alias("n_eff"),
            F.expr("ROUND(CAST(SUM(wx) AS DOUBLE) / SUM(w), 6)").alias("mean_price"),
        )
        .select(F.col("replica").cast("bigint").alias("replica"), "n_eff", "mean_price")
    )


def _bootstrap_oracle() -> str:
    cases = " ".join(
        f"WHEN u < {_POISSON_CDF[i]!r} THEN {i}" for i in range(5)
    )
    return f"""
WITH reps AS (
  SELECT o_orderkey, o_totalprice, r.i AS replica
  FROM orders CROSS JOIN range(32) r(i)
), uw AS (
  SELECT replica, o_totalprice,
         ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':' ||
                             CAST(replica AS VARCHAR)), 1, 8))::BIGINT
           / CAST({float(1 << 32)!r} AS DOUBLE) AS u
  FROM reps
), w AS (
  SELECT replica, o_totalprice,
         CASE {cases} ELSE 5 END AS w
  FROM uw
)
SELECT CAST(replica AS BIGINT) AS replica,
       CAST(SUM(w) AS BIGINT) AS n_eff,
       ROUND(CAST(SUM(CAST(w AS DECIMAL(10,0)) *
                       CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / SUM(w), 6) AS mean_price
FROM w GROUP BY replica
"""


BOOTSTRAP_ORACLE = _bootstrap_oracle()


def event_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier profile via Median Absolute Deviation —
    the standard-deviation-free anomaly screen (a single wild value
    cannot move the median or the MAD, unlike mean/stddev z-scores):
    per event_type, ``med = median(value)``, ``mad = median(|v - med|)``,
    and the count/rate of values beyond ``3 * MAD``.

    Exactness: the medians are ``percentile(…, 0.5)`` — Spark and DuckDB
    both linear-interpolate, and the interpolation arithmetic on
    identical doubles is bit-identical — and the only other fp ops are
    one subtraction, one |·|, and one multiply-by-CAST(3 AS DOUBLE)
    comparison per row, applied to identical inputs in both engines;
    outputs ROUND(6).

    Scale shape: two grouped percentile aggregations (group cardinality
    rows each) + two broadcast-joins of those tiny per-group stats back
    onto the event scan — no window, no global ordering, the scan is
    read twice (once per median level, the honest cost of an exact
    two-level median)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.expr("abs(value - med)").alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "med",
        "mad",
        (F.col("adev") > F.expr("CAST(3 AS DOUBLE)") * F.col("mad"))
        .cast("long")
        .alias("is_outlier"),
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("ROUND(MIN(med), 6)").alias("median_value"),
        F.expr("ROUND(MIN(mad), 6)").alias("mad_value"),
        F.sum("is_outlier").cast("bigint").alias("n_outliers"),
        F.expr(
            "ROUND(CAST(SUM(is_outlier) AS DOUBLE) / COUNT(*), 6)"
        ).alias("outlier_rate"),
    )


MAD_OUTLIERS_ORACLE = """
WITH ev AS (
  SELECT event_type, value FROM events
), med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM ev GROUP BY event_type
), dev AS (
  SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
  FROM ev e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY event_type
), flagged AS (
  SELECT d.event_type, d.med, m.mad,
         CASE WHEN d.adev > CAST(3 AS DOUBLE) * m.mad THEN 1 ELSE 0 END AS is_outlier
  FROM dev d JOIN mad m USING (event_type)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(med), 6) AS median_value,
       ROUND(MIN(mad), 6) AS mad_value,
       CAST(SUM(is_outlier) AS BIGINT) AS n_outliers,
       ROUND(CAST(SUM(is_outlier) AS DOUBLE) / COUNT(*), 6) AS outlier_rate
FROM flagged GROUP BY event_type
"""


def quantity_price_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-linestatus Pearson correlation of quantity vs extended price
    from closed-form EXACT sums — the portable twin of Spark's
    ``corr()`` aggregate, which (like any streaming-float moment
    estimator) is partition-order-dependent in its low bits and so can
    never hash-match another engine.

    Same policy as ``nation_revenue_trend``: the five sufficient sums
    (Σx, Σy, Σxy, Σx², Σy²) accumulate as DECIMAL products of the
    2-dp-cast inputs — exact and order-independent — and the correlation
    is ONE double expression per output row over those sums (every term
    CAST to DOUBLE first; sqrt is IEEE-correctly-rounded in both
    engines), ROUND(6)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_linestatus",
        F.expr("CAST(l_quantity AS DECIMAL(18,2))").alias("x"),
        F.expr("CAST(l_extendedprice AS DECIMAL(18,2))").alias("y"),
    )
    s = li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("SUM(x)").alias("sx"),
        F.expr("SUM(y)").alias("sy"),
        F.expr("SUM(CAST(x * y AS DECIMAL(38,4)))").alias("sxy"),
        F.expr("SUM(CAST(x * x AS DECIMAL(38,4)))").alias("sxx"),
        F.expr("SUM(CAST(y * y AS DECIMAL(38,4)))").alias("syy"),
    )
    corr = (
        "ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        "       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        "  / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        "          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        "         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        "            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)"
    )
    cov = (
        "ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        "       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        "  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)"
    )
    return s.select(
        "l_linestatus",
        "n",
        F.expr(corr).alias("corr_qty_price"),
        F.expr(cov).alias("cov_qty_price"),
    )


QTY_PRICE_CORR_ORACLE = """
WITH s AS (
  SELECT l_linestatus,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(x * y AS DECIMAL(38,4))) AS sxy,
         SUM(CAST(x * x AS DECIMAL(38,4))) AS sxx,
         SUM(CAST(y * y AS DECIMAL(38,4))) AS syy
  FROM (SELECT l_linestatus,
               CAST(l_quantity AS DECIMAL(18,2)) AS x,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS y
        FROM lineitem)
  GROUP BY l_linestatus
)
SELECT l_linestatus, n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS corr_qty_price,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS cov_qty_price
FROM s
"""


def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix over the event stream: users are
    assigned to the week of their FIRST event (cohort), and each
    (cohort, weeks-since-cohort) cell counts how many of that cohort's
    users were active that week, plus the retention ratio — the standard
    product-analytics triangle view.

    Week index is an exact integer (`floor(days_since_epoch_anchor/7)`)
    rather than `date_trunc('week')`, so both engines bucket timestamps
    identically with no week-start convention in play.

    Scale: distinct (user, week) pairs first (map-side combined — the
    frame shrinks to |users|×|weeks| before anything else), one groupBy
    user for cohorts, one groupBy (cohort, offset) for the matrix;
    cohort sizes are a tiny broadcast (≤ |weeks| rows).  No windows, no
    driver-sized collects — every shuffle is keyed on user or cohort."""
    wk = (
        "CAST(FLOOR(CAST(datediff(CAST(ts AS DATE), DATE'2024-01-01') AS DOUBLE)"
        " / 7.0) AS INT)"
    )
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(wk).alias("wk")
    )
    uw = ev.distinct()
    cohort = uw.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    sizes = cohort.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    act = (
        uw.join(cohort, "user_id")
        .groupBy(
            "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    return act.join(F.broadcast(sizes), "cohort_wk").select(
        "cohort_wk",
        "week_offset",
        "n_active",
        "cohort_size",
        F.expr(
            "ROUND(CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE), 6)"
        ).alias("retention"),
    )


RETENTION_COHORTS_ORACLE = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                         AS DOUBLE) / 7.0) AS INT) AS wk
  FROM events
), cohort AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY user_id
), sizes AS (
  SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM cohort GROUP BY cohort_wk
), act AS (
  SELECT c.cohort_wk, uw.wk - c.cohort_wk AS week_offset,
         CAST(COUNT(*) AS BIGINT) AS n_active
  FROM uw JOIN cohort c USING (user_id)
  GROUP BY c.cohort_wk, uw.wk - c.cohort_wk
)
SELECT a.cohort_wk, a.week_offset, a.n_active, s.cohort_size,
       ROUND(CAST(a.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE), 6)
         AS retention
FROM act a JOIN sizes s USING (cohort_wk)
"""


def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered three-step funnel (signup → first click AFTER
    signup → first purchase AFTER that click) with per-step conversion
    rates — the order-sensitive funnel a sessionized event log is
    usually asked for first.  A user who purchased before clicking, or
    clicked before signing up, does NOT advance: each stage joins on the
    previous stage's timestamp and keeps only later events.

    Scale: three filtered groupBys on user_id (each a keyed shuffle of
    the filtered slice only) chained by broadcast-friendly joins on
    user_id; the final rate row is a crossJoin of four 1-row aggregates
    (broadcast, bounded).  Rates are one double division of exact
    counts, ROUND(6)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(s, "user_id")
        .where(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    tot = ev.agg(F.count_distinct(F.col("user_id")).cast("bigint").alias("n_users"))
    ns = s.agg(F.count(F.lit(1)).cast("bigint").alias("n_signup"))
    nc = c.agg(F.count(F.lit(1)).cast("bigint").alias("n_click_after"))
    np_ = p.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchase_after"))
    return (
        tot.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_users",
            "n_signup",
            "n_click_after",
            "n_purchase_after",
            F.expr(
                "ROUND(CAST(n_signup AS DOUBLE) / CAST(n_users AS DOUBLE), 6)"
            ).alias("signup_rate"),
            F.expr(
                "ROUND(CAST(n_click_after AS DOUBLE)"
                " / CAST(n_signup AS DOUBLE), 6)"
            ).alias("click_rate"),
            F.expr(
                "ROUND(CAST(n_purchase_after AS DOUBLE)"
                " / CAST(n_click_after AS DOUBLE), 6)"
            ).alias("purchase_rate"),
        )
    )


FUNNEL_ORACLE = """
WITH s AS (
  SELECT user_id, MIN(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS c_ts
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s.s_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
  GROUP BY e.user_id
)
SELECT
  (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events) AS n_users,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_signup,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click_after,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase_after,
  ROUND(CAST((SELECT COUNT(*) FROM s) AS DOUBLE)
    / CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS DOUBLE), 6)
    AS signup_rate,
  ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
    / CAST((SELECT COUNT(*) FROM s) AS DOUBLE), 6) AS click_rate,
  ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
    / CAST((SELECT COUNT(*) FROM c) AS DOUBLE), 6) AS purchase_rate
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: count (previous type → current type) pairs across every
    user's time-ordered events, and normalize per source type — "after
    an error, what do users do next?".

    Determinism: the ordering within a user is (ts, event_id), so
    simultaneous events cannot reorder between engines; probabilities
    are one double division of exact counts, ROUND(6).

    Scale: ONE shuffle on user_id for the lag window (user streams are
    the natural partition; no global ordering), then a groupBy on the
    (from, to) pair — bounded by the type-domain squared (~25 rows out).
    The per-from totals ride a bounded broadcast join."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("from_type", F.lag("event_type").over(w))
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_trans"))
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n_trans").cast("bigint").alias("n_from")
    )
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n_trans",
        F.expr(
            "ROUND(CAST(n_trans AS DOUBLE) / CAST(n_from AS DOUBLE), 6)"
        ).alias("p_trans"),
    )


TRANSITION_MATRIX_ORACLE = """
WITH pairs AS (
  SELECT from_type, event_type AS to_type,
         CAST(COUNT(*) AS BIGINT) AS n_trans
  FROM (
    SELECT user_id, event_type, lag(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS from_type
    FROM events
  )
  WHERE from_type IS NOT NULL
  GROUP BY from_type, event_type
), totals AS (
  SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
  FROM pairs GROUP BY from_type
)
SELECT p.from_type, p.to_type, p.n_trans,
       ROUND(CAST(p.n_trans AS DOUBLE) / CAST(t.n_from AS DOUBLE), 6)
         AS p_trans
FROM pairs p JOIN totals t USING (from_type)
"""


def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler over ``events.user_id`` — the pre-flight
    diagnostic a 100 TB join needs BEFORE it runs: the top-10 heaviest
    keys with their share of all rows and their skew ratio vs a uniform
    key (``n_rows · n_keys / total``).  A ratio ≫ 1 on the head key is
    the signal to salt that key (see ``salted_join_revenue``) or let
    AQE's skew-join splitting handle it; share tells you how much of
    the shuffle one task would absorb.

    Determinism: counts are exact bigints; the two ROUND(…, 6) doubles
    are single divisions of those exact integers per output row; the
    top-10 ties break on user_id.

    Scale: ONE map-side-combinable groupBy on the key; the global
    summary is a second keyless agg over the (already tiny) per-key
    counts, broadcast back as one row; top-10 is TakeOrderedAndProject
    (per-partition heaps, no global sort, no global window)."""
    counts = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    summary = counts.agg(
        F.sum("n_rows").cast("bigint").alias("total_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    top = counts.orderBy(F.desc("n_rows"), "user_id").limit(10)
    return top.crossJoin(F.broadcast(summary)).select(
        "user_id",
        "n_rows",
        "total_rows",
        "n_keys",
        F.expr(
            "ROUND(CAST(n_rows AS DOUBLE) / CAST(total_rows AS DOUBLE), 6)"
        ).alias("share"),
        F.expr(
            "ROUND(CAST(n_rows AS DOUBLE) * CAST(n_keys AS DOUBLE)"
            " / CAST(total_rows AS DOUBLE), 6)"
        ).alias("skew_ratio"),
    )


SKEW_PROFILE_ORACLE = """
WITH counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM events GROUP BY user_id
), summary AS (
  SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM counts
)
SELECT c.user_id, c.n_rows, s.total_rows, s.n_keys,
       ROUND(CAST(c.n_rows AS DOUBLE) / CAST(s.total_rows AS DOUBLE), 6)
         AS share,
       ROUND(CAST(c.n_rows AS DOUBLE) * CAST(s.n_keys AS DOUBLE)
         / CAST(s.total_rows AS DOUBLE), 6) AS skew_ratio
FROM counts c CROSS JOIN summary s
ORDER BY c.n_rows DESC, c.user_id LIMIT 10
"""
