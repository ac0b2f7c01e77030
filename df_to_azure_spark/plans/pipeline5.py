"""Round-7 final wave: nonparametric trend tests on the bounded day
grid (Mann-Kendall, Theil-Sen via distributed exact rank), a PORTABLE
HyperLogLog whose estimate is bit-reproducible cross-engine, quantile
normalization (the ML-preprocessing shape: two distributed ranks + an
index join), synchronous label-propagation communities over the
co-purchase graph, and a truncated EWMA smoother.

Same cross-engine exactness policy as ``pipeline2``..``pipeline4``:
integer/decimal arithmetic end-to-end, double literals shared via
``repr`` + ``CAST(.. AS DOUBLE)`` on both engines, one ROUND(6..12)
after each transcendental, per-row ROUND → DECIMAL before any SUM whose
order Spark doesn't fix.

Reference anchor: the reference (``/root/reference/df_to_azure``) is a
pandas→Azure mover with no analytics surface; these extend the engine's
query capabilities per the brief (trend/drift screens, sketches, and
feature-preprocessing a training-data pipeline runs after landing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from df_to_azure_spark.functions.distrank import (
    bracketed_middle_rows,
    two_phase_rank,
)
from df_to_azure_spark.sources import load_table


# --------------------------------------------------------------------------
# Shared daily-revenue series (same shape as pipeline4.daily_revenue_acf)
# --------------------------------------------------------------------------


def _daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(d BIGINT days-since-1992-01-01, rev DECIMAL(24,2)) — the exact
    daily series every trend query in this module consumes.  The
    pre-aggregation collapses the data to the calendar-bounded day
    domain FIRST, so everything downstream is bounded by the date range,
    never by the row count — the property that makes the pair-grid
    queries below scale-safe."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.expr(
                "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01')"
                " AS BIGINT)"
            ).alias("d")
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2))"
            ).alias("rev")
        )
    )


_DAILY_SQL = """
  SELECT CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2)) AS rev
  FROM orders GROUP BY 1
"""


# --------------------------------------------------------------------------
# Mann-Kendall trend test (Mann 1945; Kendall 1975) on daily revenue
# --------------------------------------------------------------------------


def daily_revenue_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric monotone-trend test over daily revenue: the
    statistic ``S = Σ_{i<j} sign(x_j − x_i)``, its tie-corrected
    variance, the continuity-corrected z, and Kendall's tau-b — the
    drift screen run before trusting any revenue forecast.

    Scale shape: the textbook S is a quadratic pass over the SERIES, not
    the data — and the series is pre-aggregated to the calendar-bounded
    day grid, so the pair frame is |days|² regardless of row count
    (2 405 days → ~2.9 M sign comparisons at any SF; at 100 TB the grid
    is identical).  The non-equi self-join broadcasts the day frame —
    kilobytes.  Everything is integer/decimal until z and tau
    (DECIMAL(38,0) variance numerator; the /18, sqrt and divisions
    happen once, in double, ROUND(6))."""
    # the day series feeds four plan branches; measured 2026-08-15:
    # localCheckpoint-pinning it is ~0.6 s SLOWER at sf0.1 (the eager
    # job + AQE losing the runtime re-plan below the pin outweigh the
    # repeated kilobyte-sized pre-agg) -- declined, same verdict as the
    # winnow no-persist trade
    daily = _daily_revenue(spark, sf_dir)
    a = daily.select(F.col("d").alias("da"), F.col("rev").alias("ra"))
    b = daily.select(F.col("d").alias("db"), F.col("rev").alias("rb"))
    pair_s = (
        a.join(F.broadcast(b), F.col("da") < F.col("db"))
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN rb > ra THEN 1"
                " WHEN rb < ra THEN -1 ELSE 0 END) AS BIGINT)"
            ).alias("s_stat")
        )
    )
    ties = daily.groupBy("rev").agg(F.count(F.lit(1)).alias("t")).agg(
        F.expr(
            "CAST(SUM(CAST(t AS DECIMAL(19,0)) * (t - 1) * (2 * t + 5))"
            " AS DECIMAL(38,0))"
        ).alias("tie_corr"),
        F.expr("CAST(SUM(CAST(t AS DECIMAL(19,0)) * (t - 1)) AS DECIMAL(38,0))")
        .alias("tie_pairs2"),
    )
    n = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    out = n.crossJoin(F.broadcast(pair_s)).crossJoin(F.broadcast(ties))
    # var(S) = (n(n-1)(2n+5) - Σ t(t-1)(2t+5)) / 18, exact numerator
    out = out.withColumn(
        "var18",
        F.expr(
            "CAST(CAST(n_days AS DECIMAL(19,0)) * (n_days - 1) * (2 * n_days + 5)"
            " AS DECIMAL(38,0)) - tie_corr"
        ),
    )
    z = (
        "CASE WHEN s_stat = 0 OR var18 = 0 THEN CAST(0 AS DOUBLE)"
        " ELSE ROUND((CAST(s_stat AS DOUBLE)"
        "             - CAST(CASE WHEN s_stat > 0 THEN 1 ELSE -1 END AS DOUBLE))"
        "      / SQRT(CAST(var18 AS DOUBLE) / CAST(18 AS DOUBLE)), 6) END"
    )
    # tau-b: S / sqrt((n0 - n1)(n0 - n2)); n1 = 0 (days are distinct)
    tau = (
        "ROUND(CAST(s_stat AS DOUBLE)"
        " / SQRT(CAST(CAST(n_days AS DECIMAL(19,0)) * (n_days - 1) AS DOUBLE)"
        "        / CAST(2 AS DOUBLE)"
        "        * (CAST(CAST(n_days AS DECIMAL(19,0)) * (n_days - 1) AS DOUBLE)"
        "           / CAST(2 AS DOUBLE)"
        "           - CAST(tie_pairs2 AS DOUBLE) / CAST(2 AS DOUBLE))), 6)"
    )
    return out.select(
        "n_days",
        "s_stat",
        F.expr(z).alias("z_stat"),
        F.expr(tau).alias("tau_b"),
        F.expr(
            "CASE WHEN " + z + " > CAST(1.959964 AS DOUBLE) THEN 'increasing'"
            " WHEN " + z + " < CAST(-1.959964 AS DOUBLE) THEN 'decreasing'"
            " ELSE 'no_trend' END"
        ).alias("trend"),
    )


MANN_KENDALL_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
pair_s AS (
  SELECT CAST(SUM(CASE WHEN b.rev > a.rev THEN 1
                       WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM daily a JOIN daily b ON a.d < b.d
), ties AS (
  SELECT CAST(SUM(CAST(t AS DECIMAL(19,0)) * (t - 1) * (2 * t + 5))
              AS DECIMAL(38,0)) AS tie_corr,
         CAST(SUM(CAST(t AS DECIMAL(19,0)) * (t - 1)) AS DECIMAL(38,0))
           AS tie_pairs2
  FROM (SELECT rev, COUNT(*) AS t FROM daily GROUP BY rev)
), base AS (
  SELECT n.n_days, p.s_stat, t.tie_corr, t.tie_pairs2,
         CAST(CAST(n.n_days AS DECIMAL(19,0)) * (n.n_days - 1) * (2 * n.n_days + 5)
              AS DECIMAL(38,0)) - t.tie_corr AS var18
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily) n, pair_s p, ties t
), scored AS (
  SELECT n_days, s_stat,
         CASE WHEN s_stat = 0 OR var18 = 0 THEN CAST(0 AS DOUBLE)
              ELSE ROUND((CAST(s_stat AS DOUBLE)
                          - CAST(CASE WHEN s_stat > 0 THEN 1 ELSE -1 END AS DOUBLE))
                   / SQRT(CAST(var18 AS DOUBLE) / CAST(18 AS DOUBLE)), 6) END AS z_stat,
         ROUND(CAST(s_stat AS DOUBLE)
           / SQRT(CAST(CAST(n_days AS DECIMAL(19,0)) * (n_days - 1) AS DOUBLE)
                  / CAST(2 AS DOUBLE)
                  * (CAST(CAST(n_days AS DECIMAL(19,0)) * (n_days - 1) AS DOUBLE)
                     / CAST(2 AS DOUBLE)
                     - CAST(tie_pairs2 AS DOUBLE) / CAST(2 AS DOUBLE))), 6) AS tau_b
  FROM base
)
SELECT n_days, s_stat, z_stat, tau_b,
       CASE WHEN z_stat > CAST(1.959964 AS DOUBLE) THEN 'increasing'
            WHEN z_stat < CAST(-1.959964 AS DOUBLE) THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM scored
"""


# --------------------------------------------------------------------------
# Theil-Sen robust slope (Theil 1950; Sen 1968) via distributed exact rank
# --------------------------------------------------------------------------


def daily_revenue_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend line over daily revenue: the MEDIAN of all
    pairwise slopes (and the median-residual intercept) — the estimator
    that shrugs off the outlier days OLS chases.

    The median over ~2.9 M pairwise slopes needs one exact global
    order statistic.  Round 14 (optimization): served by
    ``bracketed_middle_rows`` — two shuffle-free map-side aggregation
    passes (n/min/max, then an 8192-bucket histogram) bracket the two
    middle ranks by VALUE, and only the bracketed sliver (expected
    |pairs|/8192 rows) flows through ``two_phase_rank``; previously the
    whole pair frame paid a range shuffle + pinned checkpoint.  Results
    are bit-identical (exact integer rank arithmetic over exact bucket
    counts; the same ranks select the same slope values).  Pair count
    is |days|² (calendar-bounded, data-independent); slopes are one
    IEEE division ROUND(9) each, compared bit-identically by both
    engines.  The intercept is a second, |days|-sized median of
    residuals — small enough that the plain two-phase rank stays.

    ``slopes`` IS pinned here (unlike mann_kendall's unpinned single
    pass, see its note): the bracketing makes three passes over the
    pair frame (n/min/max, histogram, bracket filter), so each pass
    would otherwise replay the broadcast pair join; the pin is one
    in-memory copy of (da, db, slope) — the same frame the old
    implementation materialized anyway through its range shuffle, now
    written once and never shuffled."""
    daily = _daily_revenue(spark, sf_dir).localCheckpoint()
    a = daily.select(F.col("d").alias("da"), F.col("rev").alias("ra"))
    b = daily.select(F.col("d").alias("db"), F.col("rev").alias("rb"))
    # nullif keeps the division ANSI-safe if the optimizer pushes the
    # bracket filter into the join condition (where it may evaluate
    # before the da < db conjunct, on da = db pairs); for every row the
    # join admits, db - da > 0 and the value is bit-identical
    slopes = a.join(F.broadcast(b), F.col("da") < F.col("db")).select(
        "da",
        "db",
        F.expr(
            "ROUND(CAST(rb - ra AS DOUBLE)"
            " / CAST(nullif(db - da, 0) AS DOUBLE), 9)"
        ).alias("slope"),
    ).localCheckpoint()
    med_slope = bracketed_middle_rows(slopes, "slope", ["da", "db"]).agg(
        F.max("__grp_n").cast("bigint").alias("n_pairs"),
        F.expr(
            "CAST(SUM(slope) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
        ).alias("slope_per_day"),
    )
    resid = daily.crossJoin(F.broadcast(med_slope)).select(
        "d",
        "n_pairs",
        "slope_per_day",
        F.expr(
            "ROUND(CAST(rev AS DOUBLE) - slope_per_day * CAST(d AS DOUBLE), 6)"
        ).alias("res"),
    )
    rranked = two_phase_rank(resid, [("res", "asc"), ("d", "asc")])
    return (
        rranked.where(
            (F.col("__rn") == F.expr("(__grp_n + 1) DIV 2"))
            | (F.col("__rn") == F.expr("__grp_n DIV 2 + 1"))
        )
        .agg(
            F.max("n_pairs").alias("n_pairs"),
            F.expr("ROUND(MAX(slope_per_day), 9)").alias("slope_per_day"),
            F.expr(
                "ROUND(CAST(SUM(res) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)"
            ).alias("intercept"),
        )
    )


THEIL_SEN_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
slopes AS (
  SELECT a.d AS da, b.d AS db,
         ROUND(CAST(b.rev - a.rev AS DOUBLE) / CAST(b.d - a.d AS DOUBLE), 9)
           AS slope
  FROM daily a JOIN daily b ON a.d < b.d
), ranked AS (
  SELECT slope,
         row_number() OVER (ORDER BY slope, da, db) AS rn,
         COUNT(*) OVER () AS n
  FROM slopes
), med AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n_pairs,
         CAST(SUM(slope) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS slope_per_day
  FROM ranked WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
), resid AS (
  SELECT daily.d, med.n_pairs, med.slope_per_day,
         ROUND(CAST(daily.rev AS DOUBLE)
               - med.slope_per_day * CAST(daily.d AS DOUBLE), 6) AS res
  FROM daily, med
), rranked AS (
  SELECT n_pairs, slope_per_day, res,
         row_number() OVER (ORDER BY res, d) AS rn,
         COUNT(*) OVER () AS n
  FROM resid
)
SELECT MAX(n_pairs) AS n_pairs,
       ROUND(MAX(slope_per_day), 9) AS slope_per_day,
       ROUND(CAST(SUM(res) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS intercept
FROM rranked WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
"""

# --------------------------------------------------------------------------
# Portable HyperLogLog (Flajolet et al. 2007) — bit-reproducible estimate
# --------------------------------------------------------------------------

_HLL_P = 8                      # 2^8 = 256 registers, ~6.5% std error
_HLL_M = 1 << _HLL_P
_HLL_WBITS = 48 - _HLL_P        # rank bits left after the bucket split
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)   # bias constant, m >= 128


def _rho_case(w: str) -> str:
    """SQL for rho(w) = 1 + leading zeros of the 40-bit register word —
    an unrolled integer-threshold CASE, the same text in both engines,
    so no engine's log2/bit_length rounding can diverge."""
    branches = " ".join(
        f"WHEN {w} >= {1 << (_HLL_WBITS - 1 - i)} THEN {i + 1}"
        for i in range(_HLL_WBITS)
    )
    return f"CASE {branches} ELSE {_HLL_WBITS + 1} END"


def hll_registers(
    d: DataFrame, key: str = "event_type", item: str = "user_id"
) -> DataFrame:
    """``(key, bucket, m_rho)`` HLL register frame — the md5 48-bit
    hash → bucket/word split and per-bucket MAX rho.  Register inserts
    are IDEMPOTENT (MAX absorbs duplicates), so the input needs no
    ``distinct()`` — the property that lets the streaming twin
    (``streaming.stateful.stream_hll_diff``) maintain the identical
    registers as a plain streaming MAX aggregation with no
    dedup/watermark state."""
    hb = d.select(
        key,
        F.expr(
            f"CAST(conv(substring(md5(CAST({item} AS STRING)), 1, 12),"
            " 16, 10) AS BIGINT)"
        ).alias("h48"),
    ).select(
        key,
        F.expr(f"h48 % {_HLL_M}").alias("bucket"),
        F.expr(f"h48 DIV {_HLL_M}").alias("w"),
    )
    return hb.groupBy(key, "bucket").agg(
        F.expr(f"MAX({_rho_case('w')})").alias("m_rho")
    )


def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type by a PORTABLE HyperLogLog — the
    register-level sketch (md5 48-bit hash → 8-bit bucket, 40-bit word,
    rho = leading zeros + 1, harmonic mean + linear-counting fallback)
    built from engine-neutral integer arithmetic, so the ESTIMATE ITSELF
    is bit-reproducible and strict-oracle-checked — unlike
    ``approx_count_distinct``, whose internals are engine-private (the
    gap ``kmv_distinct_users`` notes; this closes it for HLL too).

    Exactness: the rho CASE is integer thresholds; the harmonic
    denominator accumulates as Σ 2^(41−M_j) in BIGINT (≤ 256·2^41 ≪
    2^63 — EXACT, no float sum ordering anywhere); alpha·m²/Z is one
    shared-literal double expression; LN only in the small-range branch,
    ROUND(6) after.  Scale shape: one distinct shuffle with map-side
    combine, then 256 registers per group — mergeable (MAX commutes), a
    kilobyte of state per group at any data size; the exact count kept
    alongside is only the test's yardstick.
    """
    d = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    regs = hll_registers(d)
    buckets = spark.range(_HLL_M).select(F.col("id").alias("bucket"))
    grid = d.select("event_type").distinct().crossJoin(F.broadcast(buckets))
    full = grid.join(regs, ["event_type", "bucket"], "left").select(
        "event_type", F.coalesce("m_rho", F.lit(0)).alias("m0")
    )
    per = full.groupBy("event_type").agg(
        F.expr(
            f"CAST(SUM(CAST(POWER(CAST(2 AS DOUBLE), {_HLL_WBITS + 1} - m0)"
            " AS BIGINT)) AS BIGINT)"
        ).alias("zsum"),
        F.expr("CAST(SUM(CASE WHEN m0 = 0 THEN 1 ELSE 0 END) AS BIGINT)")
        .alias("v_zero"),
    )
    exact = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    raw = (
        f"CAST({_HLL_ALPHA!r} AS DOUBLE) * CAST({_HLL_M * _HLL_M} AS DOUBLE)"
        f" / (CAST(zsum AS DOUBLE) / CAST({1 << (_HLL_WBITS + 1)} AS DOUBLE))"
    )
    est = (
        f"CASE WHEN {raw} <= CAST({5 * _HLL_M // 2} AS DOUBLE) AND v_zero > 0"
        f" THEN ROUND(CAST({_HLL_M} AS DOUBLE)"
        f"      * LN(CAST({_HLL_M} AS DOUBLE) / CAST(v_zero AS DOUBLE)), 6)"
        f" ELSE ROUND({raw}, 6) END"
    )
    return (
        per.join(exact, "event_type")
        .select(
            "event_type",
            F.lit(_HLL_M).cast("bigint").alias("m"),
            "v_zero",
            "n_exact",
            F.expr(est).alias("hll_estimate"),
            F.expr(
                f"ROUND(({est} - CAST(n_exact AS DOUBLE))"
                " / CAST(n_exact AS DOUBLE), 6)"
            ).alias("rel_err"),
        )
    )


def _hll_oracle() -> str:
    raw = (
        f"CAST({_HLL_ALPHA!r} AS DOUBLE) * CAST({_HLL_M * _HLL_M} AS DOUBLE)"
        f" / (CAST(zsum AS DOUBLE) / CAST({1 << (_HLL_WBITS + 1)} AS DOUBLE))"
    )
    est = (
        f"CASE WHEN {raw} <= CAST({5 * _HLL_M // 2} AS DOUBLE) AND v_zero > 0"
        f" THEN ROUND(CAST({_HLL_M} AS DOUBLE)"
        f"      * LN(CAST({_HLL_M} AS DOUBLE) / CAST(v_zero AS DOUBLE)), 6)"
        f" ELSE ROUND({raw}, 6) END"
    )
    return f"""
WITH d AS (
  SELECT DISTINCT event_type, user_id FROM events
), hb AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h48
  FROM d
), split AS (
  SELECT event_type, h48 % {_HLL_M} AS bucket, h48 // {_HLL_M} AS w FROM hb
), regs AS (
  SELECT event_type, bucket, MAX({_rho_case('w')}) AS m_rho
  FROM split GROUP BY event_type, bucket
), grid AS (
  SELECT t.event_type, b.range AS bucket
  FROM (SELECT DISTINCT event_type FROM d) t, range({_HLL_M}) b
), filled AS (
  SELECT grid.event_type, COALESCE(regs.m_rho, 0) AS m0
  FROM grid LEFT JOIN regs
    ON grid.event_type = regs.event_type AND grid.bucket = regs.bucket
), per AS (
  SELECT event_type,
         CAST(SUM(CAST(POWER(CAST(2 AS DOUBLE), {_HLL_WBITS + 1} - m0)
                       AS BIGINT)) AS BIGINT) AS zsum,
         CAST(SUM(CASE WHEN m0 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero
  FROM filled GROUP BY event_type
), exact AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact FROM d GROUP BY event_type
)
SELECT per.event_type, CAST({_HLL_M} AS BIGINT) AS m, v_zero, n_exact,
       {est} AS hll_estimate,
       ROUND(({est} - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE), 6)
         AS rel_err
FROM per JOIN exact ON per.event_type = exact.event_type
"""


HLL_ORACLE = _hll_oracle()

# --------------------------------------------------------------------------
# Quantile normalization across event types (two distributed ranks)
# --------------------------------------------------------------------------


def event_value_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize ``events.value`` across event types: each
    value is replaced by the GLOBAL value at its within-type quantile,
    so every type ends up drawing from one shared reference distribution
    — the feature-preprocessing step (Bolstad et al. 2003, microarray
    normalization; standard for heterogeneous feature sources before
    training) that batch-corrects per-source scale drift.

    Both order statistics come from ``two_phase_rank`` — the per-type
    rank (types are few and large: exactly the skewed-partition shape a
    naive ``Window.partitionBy(type)`` serializes) and the global rank
    (the banned single-partition window).  The quantile→index map is
    pure integer arithmetic, ``i = ((2·r − 1)·N) DIV (2·n_t) + 1``
    (i.e. floor((r−½)/n_t · N) + 1 without ever touching a float), and
    the lookup is an equi-join against the global rank — keyed shuffles
    only, no sort-merge over the full data on one executor.  Output is
    the per-type summary of the normalized column (SUMs as ROUND(6) →
    DECIMAL so aggregation order can't drift)."""
    vals = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    per = two_phase_rank(
        vals, [("value", "asc"), ("event_id", "asc")], group_cols=["event_type"]
    ).select(
        "event_type",
        "value",
        F.col("__rn").alias("rt"),
        F.col("__grp_n").alias("nt"),
    )
    glob = two_phase_rank(vals, [("value", "asc"), ("event_id", "asc")]).select(
        F.col("__rn").alias("g"), F.col("value").alias("gval")
    )
    n_tot = vals.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    idx = per.crossJoin(F.broadcast(n_tot)).select(
        "event_type",
        "value",
        F.expr("((2 * rt - 1) * n_total) DIV (2 * nt) + 1").alias("i"),
    )
    joined = idx.join(glob, F.col("i") == F.col("g")).select(
        "event_type", "value", F.col("gval").alias("norm")
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("norm").alias("min_norm"),
        F.max("norm").alias("max_norm"),
        F.expr(
            "ROUND(CAST(SUM(CAST(ROUND(norm, 6) AS DECIMAL(28,6))) AS DOUBLE)"
            " / CAST(COUNT(*) AS DOUBLE), 6)"
        ).alias("mean_norm"),
        F.expr(
            "ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE)"
            " / CAST(COUNT(*) AS DOUBLE), 6)"
        ).alias("mean_raw"),
    )


QUANTILE_NORM_ORACLE = """
WITH vals AS (
  SELECT event_type, event_id, value FROM events
), per AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rt,
         COUNT(*) OVER (PARTITION BY event_type) AS nt
  FROM vals
), gl AS (
  SELECT value AS gval,
         row_number() OVER (ORDER BY value, event_id) AS g
  FROM vals
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM vals),
idx AS (
  SELECT event_type, value,
         ((2 * rt - 1) * n_total) // (2 * nt) + 1 AS i
  FROM per, n
), joined AS (
  SELECT idx.event_type, idx.value, gl.gval AS norm
  FROM idx JOIN gl ON idx.i = gl.g
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(norm) AS min_norm, MAX(norm) AS max_norm,
       ROUND(CAST(SUM(CAST(ROUND(norm, 6) AS DECIMAL(28,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_norm,
       ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_raw
FROM joined GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Synchronous label propagation (Raghavan et al. 2007) — communities
# --------------------------------------------------------------------------

_LPA_ITERS = 3


def part_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the part co-purchase graph by
    synchronous label propagation: every node starts labeled with its
    own id; each round it adopts the most frequent label among its
    neighbors, ties broken toward the SMALLEST label — the deterministic
    variant (plain LPA breaks ties randomly, which no oracle could
    replay).  Fixed ``_LPA_ITERS`` rounds, the same bounded-chain
    contract as ``part_pagerank``/``kcore``: an SQL oracle unrolls the
    exact same rounds step for step.

    Scale shape: one keyed join + one (node,label) count + one per-node
    argmax per round — every shuffle keyed on node id, per-round state
    is one label per node, and the edge frame is ``localCheckpoint``-ed
    once (it feeds every round).  The argmax is ``max_by(label,
    (cnt, −label))`` — a single-pass aggregate, no per-node window.
    Output: one row per surviving community with its size and part-id
    span, integer-only end to end."""
    from df_to_azure_spark.functions.graph import label_propagation
    from df_to_azure_spark.plans.pipeline2 import _part_edges

    edges = _part_edges(spark, sf_dir).localCheckpoint()
    labels = label_propagation(edges, _LPA_ITERS)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.min("node").cast("bigint").alias("min_part"),
            F.max("node").cast("bigint").alias("max_part"),
        )
    )


def _lpa_label_body() -> tuple[str, str]:
    """The WITH-body (edge build + unrolled LPA rounds) shared by the
    community query and ``pipeline6.lpa_modularity``; returns
    ``(body, final_label_cte_name)`` — ``edges`` is also in scope for
    consumers."""
    from df_to_azure_spark.plans.pipeline2 import _PR_MAX_BASKET, _PR_MIN_SUPPORT

    rounds = []
    prev = "l0"
    for i in range(1, _LPA_ITERS + 1):
        rounds.append(f"""
m{i} AS (
  SELECT e.dst AS node, l.label, COUNT(*) AS cnt
  FROM edges e JOIN {prev} l ON e.src = l.node
  GROUP BY e.dst, l.label
), p{i} AS (
  SELECT node, label,
         row_number() OVER (PARTITION BY node
                            ORDER BY cnt DESC, label ASC) AS rn
  FROM m{i}
), l{i} AS (
  SELECT l.node, COALESCE(p.label, l.label) AS label
  FROM {prev} l LEFT JOIN (SELECT node, label FROM p{i} WHERE rn = 1) p
    ON l.node = p.node
)""")
        prev = f"l{i}"
    body = f"""li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
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
), l0 AS (
  SELECT DISTINCT src AS node, src AS label FROM edges
),{",".join(rounds)}"""
    return body, prev


def _lpa_oracle() -> str:
    body, prev = _lpa_label_body()
    return f"""
WITH {body}
SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MIN(node) AS BIGINT) AS min_part,
       CAST(MAX(node) AS BIGINT) AS max_part
FROM {prev} GROUP BY label
"""


LPA_ORACLE = _lpa_oracle()


# --------------------------------------------------------------------------
# Truncated EWMA smoother over daily revenue
# --------------------------------------------------------------------------

_EWMA_K = 14
# alpha = 0.3: weight(g) = 3*7^g / 10^(g+1).  Scaled by 10^14 every weight
# is an EXACT integer (3*7^g*10^(13-g), <= 3e13), revenue scaled by 10^2 is
# exact cents -- so numerator, denominator AND the final rounding to cents
# are pure integer arithmetic; the one double cast at the end is of a small
# integer (exact in both engines).  No float op exists to drift.
_EWMA_WINTS = [3 * 7 ** g * 10 ** (13 - g) for g in range(_EWMA_K)]


def daily_revenue_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day truncated exponentially-weighted moving average of daily
    revenue -- the smoother behind every ops dashboard, in the
    gap-tolerant calendar form: weight ``alpha*(1-alpha)^g`` by CALENDAR
    day gap ``g``, renormalized over the days actually present in the
    window (so a missing day shifts no weight onto the wrong lag).

    The recursive EWMA is a sequential scan -- unshardable; truncating
    at K=14 days (residual weight 0.7^14 ~ 0.7 %) turns it into a
    bounded xK explode + keyed join, the same trick as
    ``rolling_7d_active_users``, fully parallel at any scale.
    Exactness: weights x10^14 and revenue x10^2 are integers, the
    weighted sum accumulates in DECIMAL(38,0), and the EWMA is rounded
    to exact cents by integer division ``(2*num + den) DIV (2*den)`` --
    the engines never touch a float until the final small-integer cast."""
    daily = _daily_revenue(spark, sf_dir)
    wf = spark.createDataFrame(
        [(g, w) for g, w in enumerate(_EWMA_WINTS)], "gap INT, wti BIGINT"
    )
    contrib = daily.crossJoin(F.broadcast(wf)).select(
        (F.col("d") + F.col("gap")).alias("d"),
        "wti",
        F.expr("CAST(rev * 100 AS DECIMAL(19,0))").alias("cents"),
    )
    hit = contrib.join(daily, "d")
    return (
        hit.groupBy("d")
        .agg(
            F.expr("CAST(MAX(rev) AS DOUBLE)").alias("revenue"),
            F.expr(
                "CAST(SUM(CAST(wti AS DECIMAL(19,0)) * cents) AS DECIMAL(38,0))"
            ).alias("num_i"),
            F.expr("CAST(SUM(wti) AS DECIMAL(38,0))").alias("den_i"),
            F.count(F.lit(1)).cast("bigint").alias("n_window"),
        )
        .select(
            "d",
            "revenue",
            "n_window",
            F.expr(
                "CAST((2 * num_i + den_i) DIV (2 * den_i) AS DOUBLE)"
                " / CAST(100 AS DOUBLE)"
            ).alias("ewma14"),
        )
    )


def _ewma_oracle() -> str:
    values = ", ".join(f"({g}, {w})" for g, w in enumerate(_EWMA_WINTS))
    return f"""
WITH daily AS ({_DAILY_SQL}),
wf(gap, wti) AS (VALUES {values}),
contrib AS (
  SELECT daily.d + wf.gap AS d, wf.wti,
         CAST(daily.rev * 100 AS DECIMAL(19,0)) AS cents
  FROM daily, wf
), hit AS (
  SELECT contrib.d, contrib.wti, contrib.cents, daily.rev
  FROM contrib JOIN daily ON contrib.d = daily.d
), agged AS (
  SELECT d, CAST(MAX(rev) AS DOUBLE) AS revenue,
         CAST(SUM(CAST(wti AS HUGEINT) * CAST(cents AS HUGEINT)) AS HUGEINT)
           AS num_i,
         CAST(SUM(CAST(wti AS HUGEINT)) AS HUGEINT) AS den_i,
         CAST(COUNT(*) AS BIGINT) AS n_window
  FROM hit GROUP BY d
)
SELECT d, revenue, n_window,
       CAST((2 * num_i + den_i) // (2 * den_i) AS DOUBLE)
         / CAST(100 AS DOUBLE) AS ewma14
FROM agged
"""


EWMA_ORACLE = _ewma_oracle()

# --------------------------------------------------------------------------
# HITS (Kleinberg 1999) over the bipartite customer→part purchase graph
# --------------------------------------------------------------------------

_HITS_ITERS = 2
_HITS_TOPK = 20


def part_hits_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``_HITS_TOPK`` authority parts by HITS over the bipartite
    customer→part purchase graph: a part is authoritative when bought by
    strong hub customers, a customer a strong hub when buying
    authoritative parts — the mutual-reinforcement ranking that, unlike
    raw purchase counts, discounts indiscriminate bulk buyers.

    Fixed ``_HITS_ITERS`` iterations (the ``pagerank``/``kcore``
    bounded-chain contract), L1-normalized each half-step so every score
    stays a probability-like weight — and, cross-engine, so each
    normalizer is an exact DECIMAL sum of ROUND(12) contributions with
    ONE double division after (the pagerank recipe).  Scale shape: the
    edge list is the distinct (customer, part) projection — built once,
    ``localCheckpoint``-ed, reused by all iterations; each half-step is
    one keyed join + one keyed sum, shuffles keyed on customer or part
    id only; the final top-k is a ``TakeOrderedAndProject``, never a
    global sort."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    edges = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint()
    )
    # h0 = 1 per customer; a1 ∝ in-degree
    auth = edges.groupBy("p").agg(
        F.expr("CAST(COUNT(*) AS DECIMAL(28,12))").alias("s")
    )
    for i in range(_HITS_ITERS):
        tot = auth.agg(F.expr("CAST(SUM(s) AS DECIMAL(38,12))").alias("t"))
        auth = auth.crossJoin(F.broadcast(tot)).select(
            "p",
            F.expr(
                "ROUND(CAST(s AS DOUBLE) / CAST(t AS DOUBLE), 12)"
            ).alias("a"),
        )
        if i == _HITS_ITERS - 1:
            break
        hub = (
            edges.join(auth, "p")
            .groupBy("c")
            .agg(
                F.expr(
                    "CAST(SUM(CAST(ROUND(a, 12) AS DECIMAL(28,12)))"
                    " AS DECIMAL(38,12))"
                ).alias("s")
            )
        )
        htot = hub.agg(F.expr("CAST(SUM(s) AS DECIMAL(38,12))").alias("t"))
        hub = hub.crossJoin(F.broadcast(htot)).select(
            "c",
            F.expr(
                "ROUND(CAST(s AS DOUBLE) / CAST(t AS DOUBLE), 12)"
            ).alias("h"),
        )
        auth = (
            edges.join(hub, "c")
            .groupBy("p")
            .agg(
                F.expr(
                    "CAST(SUM(CAST(ROUND(h, 12) AS DECIMAL(28,12)))"
                    " AS DECIMAL(38,12))"
                ).alias("s")
            )
        )
    deg = edges.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("n_buyers"))
    return (
        auth.join(deg, "p")
        .select(F.col("p").cast("bigint").alias("part_id"), "n_buyers",
                F.col("a").alias("authority"))
        .orderBy(F.col("authority").desc(), F.col("part_id").asc())
        .limit(_HITS_TOPK)
    )


def _hits_oracle() -> str:
    steps = []
    prev = "a1"
    for i in range(2, _HITS_ITERS + 1):
        steps.append(f"""
h{i} AS (
  SELECT e.c, CAST(SUM(CAST(ROUND(a.a, 12) AS DECIMAL(28,12)))
              AS DECIMAL(38,12)) AS s
  FROM edges e JOIN {prev} a ON e.p = a.p GROUP BY e.c
), hn{i} AS (
  SELECT c, ROUND(CAST(s AS DOUBLE)
        / CAST((SELECT CAST(SUM(s) AS DECIMAL(38,12)) FROM h{i}) AS DOUBLE), 12)
    AS h
  FROM h{i}
), a{i}raw AS (
  SELECT e.p, CAST(SUM(CAST(ROUND(h.h, 12) AS DECIMAL(28,12)))
              AS DECIMAL(38,12)) AS s
  FROM edges e JOIN hn{i} h ON e.c = h.c GROUP BY e.p
), a{i} AS (
  SELECT p, ROUND(CAST(s AS DOUBLE)
        / CAST((SELECT CAST(SUM(s) AS DECIMAL(38,12)) FROM a{i}raw) AS DOUBLE), 12)
    AS a
  FROM a{i}raw
)""")
        prev = f"a{i}"
    return f"""
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), a1raw AS (
  SELECT p, CAST(COUNT(*) AS DECIMAL(28,12)) AS s FROM edges GROUP BY p
), a1 AS (
  SELECT p, ROUND(CAST(s AS DOUBLE)
        / CAST((SELECT CAST(SUM(s) AS DECIMAL(38,12)) FROM a1raw) AS DOUBLE), 12)
    AS a
  FROM a1raw
),{",".join(steps)},
deg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n_buyers FROM edges GROUP BY p)
SELECT CAST(a.p AS BIGINT) AS part_id, deg.n_buyers, a.a AS authority
FROM {prev} a JOIN deg ON a.p = deg.p
ORDER BY a.a DESC, a.p ASC
LIMIT {_HITS_TOPK}
"""


HITS_ORACLE = _hits_oracle()


# --------------------------------------------------------------------------
# Degree assortativity (Newman 2002) of the part co-occurrence graph
# --------------------------------------------------------------------------


def part_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman's degree-assortativity coefficient of the part
    co-occurrence graph — Pearson correlation of (deg(src), deg(dst))
    over the directed edge list: positive when hubs link to hubs
    (assortative mixing), negative for hub-and-spoke.

    Every sufficient statistic (Σx, Σy, Σxy, Σx², Σy², n over the edge
    list) is an exact DECIMAL(38,0) integer sum; the correlation is one
    double expression ending in IEEE SQRT, ROUND(6).  Scale shape: one
    degree aggregation + two keyed joins decorating each edge with its
    endpoint degrees + one global scalar agg — nothing wider than the
    edge list ever shuffles."""
    from df_to_azure_spark.plans.pipeline2 import _part_edges

    edges = _part_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    decorated = (
        edges.join(deg.select(F.col("src"), F.col("deg").alias("dx")), "src")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("deg").alias("dy")),
            "dst",
        )
    )
    s = decorated.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.expr("CAST(SUM(CAST(dx AS DECIMAL(19,0))) AS DECIMAL(38,0))").alias("sx"),
        F.expr("CAST(SUM(CAST(dy AS DECIMAL(19,0))) AS DECIMAL(38,0))").alias("sy"),
        F.expr(
            "CAST(SUM(CAST(dx AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0)))"
            " AS DECIMAL(38,0))"
        ).alias("sxy"),
        F.expr(
            "CAST(SUM(CAST(dx AS DECIMAL(19,0)) * CAST(dx AS DECIMAL(19,0)))"
            " AS DECIMAL(38,0))"
        ).alias("sxx"),
        F.expr(
            "CAST(SUM(CAST(dy AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0)))"
            " AS DECIMAL(38,0))"
        ).alias("syy"),
    )
    nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    r = (
        "ROUND((CAST(n_edges AS DOUBLE) * CAST(sxy AS DOUBLE)"
        "       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        "  / SQRT((CAST(n_edges AS DOUBLE) * CAST(sxx AS DOUBLE)"
        "          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        "         * (CAST(n_edges AS DOUBLE) * CAST(syy AS DOUBLE)"
        "            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)"
    )
    return s.crossJoin(F.broadcast(nodes)).select(
        "n_nodes", "n_edges", F.expr(r).alias("assortativity")
    )


def _assort_oracle() -> str:
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
  SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src
), decorated AS (
  SELECT dx.deg AS dx, dy.deg AS dy
  FROM edges e JOIN deg dx ON e.src = dx.node JOIN deg dy ON e.dst = dy.node
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
         CAST(SUM(CAST(dx AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(dy AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(dx AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(dx AS DECIMAL(19,0)) * CAST(dx AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(dy AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS syy
  FROM decorated
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes, n_edges,
       ROUND((CAST(n_edges AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / SQRT((CAST(n_edges AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n_edges AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS assortativity
FROM s
"""


ASSORTATIVITY_ORACLE = _assort_oracle()


# --------------------------------------------------------------------------
# Weekday seasonal decomposition + anomaly days
# --------------------------------------------------------------------------

_WD_EPOCH_DOW = 2   # 1992-01-01 (day 0 of the series) was a Wednesday
_WD_TOPK = 10
_WD_NAMES = (
    "CASE dow WHEN 0 THEN 'Mon' WHEN 1 THEN 'Tue' WHEN 2 THEN 'Wed'"
    " WHEN 3 THEN 'Thu' WHEN 4 THEN 'Fri' WHEN 5 THEN 'Sat'"
    " ELSE 'Sun' END"
)


def weekday_revenue_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive anomaly screen on daily revenue: subtract each
    weekday's mean (the dominant retail seasonality) and surface the
    ``_WD_TOPK`` days with the largest absolute residual — the days a
    dashboard should flag AFTER accounting for ordinary
    weekend/weekday swing.

    Exactness: revenue in integer cents; each weekday mean is the
    half-up integer division ``(2·Σcents + n) DIV (2·n)`` (no decimal
    division, no float); residuals are integer cents, so the global
    top-k ORDERS ON INTEGERS with day-id tie-break — deterministic in
    any engine.  Scale shape: the series is day-domain-bounded; the
    weekday means are a 7-row broadcast; the top-k is one
    ``two_phase_rank`` pass (never a single-partition window) with the
    rank filter pushed before the final projection."""
    daily = _daily_revenue(spark, sf_dir).select(
        "d",
        F.expr(f"CAST((d + {_WD_EPOCH_DOW}) % 7 AS INT)").alias("dow"),
        F.expr("CAST(rev * 100 AS DECIMAL(19,0))").alias("cents"),
    )
    wd = daily.groupBy("dow").agg(
        F.expr(
            "CAST((2 * CAST(SUM(cents) AS DECIMAL(38,0)) + COUNT(*))"
            " DIV (2 * COUNT(*)) AS DECIMAL(19,0))"
        ).alias("wd_cents")
    )
    resid = daily.join(F.broadcast(wd), "dow").select(
        "d",
        "dow",
        "cents",
        "wd_cents",
        F.expr("CAST(cents - wd_cents AS DECIMAL(19,0))").alias("res_cents"),
    )
    ranked = two_phase_rank(
        resid.withColumn("abs_res", F.expr("ABS(res_cents)")),
        [("abs_res", "desc"), ("d", "asc")],
    )
    return (
        ranked.where(F.col("__rn") <= _WD_TOPK)
        .select(
            F.col("__rn").cast("bigint").alias("anomaly_rank"),
            "d",
            F.expr(_WD_NAMES).alias("weekday"),
            F.expr("CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE)").alias("revenue"),
            F.expr("CAST(wd_cents AS DOUBLE) / CAST(100 AS DOUBLE)").alias(
                "weekday_mean"
            ),
            F.expr("CAST(res_cents AS DOUBLE) / CAST(100 AS DOUBLE)").alias(
                "residual"
            ),
            F.expr(
                "CASE WHEN res_cents >= 0 THEN 'above' ELSE 'below' END"
            ).alias("direction"),
        )
    )


WEEKDAY_ANOMALY_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
cents AS (
  SELECT d, CAST((d + {_WD_EPOCH_DOW}) % 7 AS INT) AS dow,
         CAST(rev * 100 AS DECIMAL(19,0)) AS cents
  FROM daily
), wd AS (
  SELECT dow,
         CAST(CAST(2 * CAST(SUM(cents) AS DECIMAL(38,0)) + COUNT(*) AS HUGEINT)
              // CAST(2 * COUNT(*) AS HUGEINT) AS DECIMAL(19,0)) AS wd_cents
  FROM cents GROUP BY dow
), resid AS (
  SELECT c.d, c.dow, c.cents, wd.wd_cents,
         CAST(c.cents - wd.wd_cents AS DECIMAL(19,0)) AS res_cents
  FROM cents c JOIN wd ON c.dow = wd.dow
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY ABS(res_cents) DESC, d ASC) AS rn
  FROM resid
)
SELECT CAST(rn AS BIGINT) AS anomaly_rank, d,
       {_WD_NAMES} AS weekday,
       CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
       CAST(wd_cents AS DOUBLE) / CAST(100 AS DOUBLE) AS weekday_mean,
       CAST(res_cents AS DOUBLE) / CAST(100 AS DOUBLE) AS residual,
       CASE WHEN res_cents >= 0 THEN 'above' ELSE 'below' END AS direction
FROM ranked WHERE rn <= {_WD_TOPK}
"""

# --------------------------------------------------------------------------
# Portable Count-Min sketch (Cormode & Muthukrishnan 2005)
# --------------------------------------------------------------------------

_CMS_D = 4       # hash rows
_CMS_W = 64      # counters per row
_CMS_TOPK = 10


def cms_cells(events: DataFrame) -> DataFrame:
    """The ``_CMS_D × _CMS_W`` Count-Min counter frame for a
    ``user_id`` frame — shared by the batch query below and the
    streaming maintenance twin (``streaming.stateful.stream_cms_diff``),
    which builds the SAME cells incrementally and diffs them.  The hash
    rows come from an in-row explode (no join), so the expression works
    identically on a streaming DataFrame."""
    rows_arr = F.array([F.lit(i) for i in range(_CMS_D)])
    return (
        events.select("user_id", F.explode(rows_arr).alias("i"))
        .select(
            "i",
            F.expr(
                "CAST(conv(substring(md5(CONCAT(CAST(i AS STRING), ':',"
                " CAST(user_id AS STRING))), 1, 12), 16, 10) AS BIGINT)"
                f" % {_CMS_W}"
            ).alias("pos"),
        )
        .groupBy("i", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency estimates for the ``_CMS_TOPK`` most active
    users, next to their exact counts — the sketch a 100 TB pipeline
    keeps when the item domain (users, tokens, URLs) is too wide to
    count exactly, completing the portable-sketch family (Misra-Gries
    ``heavy_hitters_exact``, KMV, HLL): like those, every counter
    derives from engine-neutral md5 integer arithmetic, so the ESTIMATE
    ITSELF is strict-oracle-checked, not just sanity-ranged.

    Sketch: ``_CMS_D × _CMS_W`` counters; row ``i`` hashes each event's
    user to ``md5(i:user) % w`` and counts; the estimate is the MIN over
    the d row counters — always ≥ the true count (one-sided error, ≤
    2n/w with probability 1−2^−d; the ``overestimate`` column exhibits
    it).  Scale shape: the counter build is one groupBy over (d × rows)
    keys into a d·w-cell frame — constant size, mergeable by cell sum,
    broadcastable; the top-k exact pass is a keyed count +
    ``TakeOrderedAndProject``.  Integer-only end to end."""
    events = load_table(spark, sf_dir, "events").select("user_id")
    rows = spark.range(_CMS_D).select(F.col("id").cast("int").alias("i"))
    cells = cms_cells(events)
    top = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("user_id").asc())
        .limit(_CMS_TOPK)
    )
    probes = top.crossJoin(F.broadcast(rows)).select(
        "user_id",
        "n_exact",
        "i",
        F.expr(
            "CAST(conv(substring(md5(CONCAT(CAST(i AS STRING), ':',"
            " CAST(user_id AS STRING))), 1, 12), 16, 10) AS BIGINT)"
            f" % {_CMS_W}"
        ).alias("pos"),
    )
    return (
        probes.join(cells, ["i", "pos"])
        .groupBy("user_id", "n_exact")
        .agg(F.expr("CAST(MIN(cnt) AS BIGINT)").alias("cms_estimate"))
        .select(
            "user_id",
            "n_exact",
            "cms_estimate",
            F.expr("CAST(cms_estimate - n_exact AS BIGINT)").alias(
                "overestimate"
            ),
        )
    )


CMS_ORACLE = f"""
WITH ev AS (SELECT user_id FROM events),
rows_ AS (SELECT CAST(range AS INT) AS i FROM range({_CMS_D})),
cells AS (
  SELECT i,
         ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
                             CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
           % {_CMS_W} AS pos,
         COUNT(*) AS cnt
  FROM ev, rows_
  GROUP BY 1, 2
), top AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact
  FROM ev GROUP BY user_id
  ORDER BY n_exact DESC, user_id ASC LIMIT {_CMS_TOPK}
), probes AS (
  SELECT top.user_id, top.n_exact, rows_.i,
         ('0x' || substr(md5(CAST(rows_.i AS VARCHAR) || ':' ||
                             CAST(top.user_id AS VARCHAR)), 1, 12))::BIGINT
           % {_CMS_W} AS pos
  FROM top, rows_
)
SELECT p.user_id, p.n_exact,
       CAST(MIN(c.cnt) AS BIGINT) AS cms_estimate,
       CAST(MIN(c.cnt) - p.n_exact AS BIGINT) AS overestimate
FROM probes p JOIN cells c ON p.i = c.i AND p.pos = c.pos
GROUP BY p.user_id, p.n_exact
"""


# --------------------------------------------------------------------------
# Bloom-filter join prefilter (Bloom 1970) with measured FP rate
# --------------------------------------------------------------------------

_BLOOM_M = 4096   # bits
_BLOOM_K = 3      # hash functions


def bloom_join_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom-filter semi-join prefilter — THE shuffle-elimination
    device for 100 TB joins (ship a kilobyte bitset to the probe side
    instead of shuffling the probe table): build an
    ``m=_BLOOM_M``/``k=_BLOOM_K`` filter over the BUILDING-segment
    customer keys, probe every ordering customer, and measure the
    false-positive rate against the exact semi-join, next to the
    ``(1−e^{{−kn/m}})^k`` theoretical rate.

    Portable like the other sketches: bit positions are md5 integer
    arithmetic, the bitset is the ≤ m-row distinct position frame
    (broadcast — exactly how the prefilter deploys), membership is
    ``COUNT(matched positions) = k`` per probe key.  Exact integers
    until the two output rates (one division each; EXP only in the
    theoretical rate, ROUND(6))."""
    # NOT pinned (measured r14: localCheckpoint on these two distinct
    # key frames is 1.20x SLOWER at sf0.1 — the two eager pin jobs cost
    # more than the redundant warm scans their three consumers re-run;
    # at cluster scale the distinct frames are key-domain-sized and the
    # trade may flip, but the local default follows the measurement)
    build = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"))
        .distinct()
    )
    probe = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    ks = spark.range(_BLOOM_K).select(F.col("id").cast("int").alias("j"))
    pos_expr = (
        "CAST(conv(substring(md5(CONCAT(CAST(j AS STRING), '#',"
        " CAST(key AS STRING))), 1, 12), 16, 10) AS BIGINT)"
        f" % {_BLOOM_M}"
    )
    bits = (
        build.crossJoin(F.broadcast(ks))
        .select(F.expr(pos_expr).alias("pos"))
        .distinct()
    )
    probed = (
        probe.crossJoin(F.broadcast(ks))
        .select("key", F.expr(pos_expr).alias("pos"))
        .join(F.broadcast(bits), "pos")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("hits"))
        .where(F.col("hits") == _BLOOM_K)
        .select("key")
    )
    truth = probe.join(build, "key", "left_semi")
    n_build = build.agg(F.count(F.lit(1)).cast("bigint").alias("n_build"))
    n_bits = bits.agg(F.count(F.lit(1)).cast("bigint").alias("n_bits_set"))
    stats = (
        probe.agg(F.count(F.lit(1)).cast("bigint").alias("n_probe"))
        .crossJoin(F.broadcast(probed.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pass"))))
        .crossJoin(F.broadcast(truth.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_true"))))
        .crossJoin(F.broadcast(n_build))
        .crossJoin(F.broadcast(n_bits))
    )
    return stats.select(
        "n_build",
        "n_bits_set",
        "n_probe",
        "n_true",
        "n_pass",
        F.expr("CAST(n_pass - n_true AS BIGINT)").alias("n_false_pos"),
        F.expr(
            "CASE WHEN n_probe = n_true THEN CAST(0 AS DOUBLE)"
            " ELSE ROUND(CAST(n_pass - n_true AS DOUBLE)"
            "      / CAST(n_probe - n_true AS DOUBLE), 6) END"
        ).alias("fp_rate"),
        F.expr(
            f"ROUND(POWER(CAST(1 AS DOUBLE) - EXP(-CAST({_BLOOM_K} AS DOUBLE)"
            f" * CAST(n_build AS DOUBLE) / CAST({_BLOOM_M} AS DOUBLE)),"
            f" CAST({_BLOOM_K} AS DOUBLE)), 6)"
        ).alias("fp_theoretical"),
    )


BLOOM_ORACLE = f"""
WITH build AS (
  SELECT DISTINCT c_custkey AS key FROM customer
  WHERE c_mktsegment = 'BUILDING'
), probe AS (
  SELECT DISTINCT o_custkey AS key FROM orders
), ks AS (SELECT CAST(range AS INT) AS j FROM range({_BLOOM_K})),
bits AS (
  SELECT DISTINCT
         ('0x' || substr(md5(CAST(j AS VARCHAR) || '#' ||
                             CAST(key AS VARCHAR)), 1, 12))::BIGINT
           % {_BLOOM_M} AS pos
  FROM build, ks
), probed AS (
  SELECT p.key
  FROM (
    SELECT probe.key,
           ('0x' || substr(md5(CAST(ks.j AS VARCHAR) || '#' ||
                               CAST(probe.key AS VARCHAR)), 1, 12))::BIGINT
             % {_BLOOM_M} AS pos
    FROM probe, ks
  ) p JOIN bits ON p.pos = bits.pos
  GROUP BY p.key HAVING COUNT(*) = {_BLOOM_K}
), agg AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM build) AS n_build,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM probe) AS n_probe,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM probe p
            WHERE EXISTS (SELECT 1 FROM build b WHERE b.key = p.key))
           AS n_true,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM probed) AS n_pass
)
SELECT n_build, n_bits_set, n_probe, n_true, n_pass,
       CAST(n_pass - n_true AS BIGINT) AS n_false_pos,
       CASE WHEN n_probe = n_true THEN CAST(0 AS DOUBLE)
            ELSE ROUND(CAST(n_pass - n_true AS DOUBLE)
                 / CAST(n_probe - n_true AS DOUBLE), 6) END AS fp_rate,
       ROUND(POWER(CAST(1 AS DOUBLE) - EXP(-CAST({_BLOOM_K} AS DOUBLE)
             * CAST(n_build AS DOUBLE) / CAST({_BLOOM_M} AS DOUBLE)),
             CAST({_BLOOM_K} AS DOUBLE)), 6) AS fp_theoretical
FROM agg
"""

# --------------------------------------------------------------------------
# Population Stability Index — per-source drift vs the pooled corpus
# --------------------------------------------------------------------------

_PSI_BINS = 10


def source_psi_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each source's document-length
    distribution against the pooled corpus — the industry-standard model
    -monitoring drift score (banking scorecards; PSI > 0.1 moderate,
    > 0.2 major shift), completing the drift-screen family next to the
    KS (shape), MWU (location) and JSD (token-mix) matrices.

    Bins are the pooled corpus's exact deciles — one ``two_phase_rank``
    over (n_chars, doc_id) + the arithmetic ``ntile_from_rank`` (NO
    single-partition ntile window); expected/actual shares use +1
    Laplace smoothing so empty cells stay finite AND rational (exact
    integer counts, one double division each).  Per-bin terms
    ``(pa − pe)·ln(pa/pe)`` are ROUND(12) → DECIMAL before the 10-term
    sum (transcendental policy), PSI itself ROUND(6).  Scale shape: the
    rank is the distributed two-phase pass; everything after is
    (sources × 10) rows."""
    from df_to_azure_spark.functions.distrank import ntile_from_rank

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars", "doc_id"
    )
    ranked = two_phase_rank(docs, [("n_chars", "asc"), ("doc_id", "asc")])
    binned = ranked.select(
        "source",
        ntile_from_rank("__rn", "__grp_n", _PSI_BINS).cast("int").alias("bin"),
    )
    pooled = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("ce"))
    n_tot = binned.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    per_src = binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("ca")
    )
    src_tot = binned.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_src")
    )
    grid = src_tot.crossJoin(F.broadcast(pooled))
    cells = (
        grid.join(per_src, ["source", "bin"], "left")
        .fillna(0, ["ca"])
        .crossJoin(F.broadcast(n_tot))
    )
    term = (
        f"(CAST(ca + 1 AS DOUBLE) / CAST(n_src + {_PSI_BINS} AS DOUBLE)"
        f" - CAST(ce + 1 AS DOUBLE) / CAST(n_total + {_PSI_BINS} AS DOUBLE))"
        f" * LN((CAST(ca + 1 AS DOUBLE) / CAST(n_src + {_PSI_BINS} AS DOUBLE))"
        f" / (CAST(ce + 1 AS DOUBLE) / CAST(n_total + {_PSI_BINS} AS DOUBLE)))"
    )
    psi = (
        "ROUND(CAST(SUM(CAST(ROUND(" + term + ", 12) AS DECIMAL(28,12)))"
        " AS DOUBLE), 6)"
    )
    return (
        cells.groupBy("source")
        .agg(F.expr(psi).alias("psi"), F.max("n_src").alias("n_docs"))
        .select(
            "source",
            "n_docs",
            "psi",
            F.expr(
                "CASE WHEN psi > CAST(0.2 AS DOUBLE) THEN 'major'"
                " WHEN psi > CAST(0.1 AS DOUBLE) THEN 'moderate'"
                " ELSE 'stable' END"
            ).alias("drift"),
        )
    )


def _psi_oracle() -> str:
    b = _PSI_BINS
    term = (
        f"(CAST(ca + 1 AS DOUBLE) / CAST(n_src + {b} AS DOUBLE)"
        f" - CAST(ce + 1 AS DOUBLE) / CAST(n_total + {b} AS DOUBLE))"
        f" * LN((CAST(ca + 1 AS DOUBLE) / CAST(n_src + {b} AS DOUBLE))"
        f" / (CAST(ce + 1 AS DOUBLE) / CAST(n_total + {b} AS DOUBLE)))"
    )
    return f"""
WITH binned AS (
  SELECT source, ntile({b}) OVER (ORDER BY n_chars, doc_id) AS bin
  FROM documents
), pooled AS (
  SELECT bin, COUNT(*) AS ce FROM binned GROUP BY bin
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM binned),
per_src AS (
  SELECT source, bin, COUNT(*) AS ca FROM binned GROUP BY source, bin
), src_tot AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src FROM binned GROUP BY source
), cells AS (
  SELECT st.source, st.n_src, p.bin, p.ce, COALESCE(ps.ca, 0) AS ca, n.n_total
  FROM src_tot st CROSS JOIN pooled p
  LEFT JOIN per_src ps ON st.source = ps.source AND p.bin = ps.bin
  CROSS JOIN n
), scored AS (
  SELECT source, MAX(n_src) AS n_docs,
         ROUND(CAST(SUM(CAST(ROUND({term}, 12) AS DECIMAL(28,12)))
               AS DOUBLE), 6) AS psi
  FROM cells GROUP BY source
)
SELECT source, n_docs, psi,
       CASE WHEN psi > CAST(0.2 AS DOUBLE) THEN 'major'
            WHEN psi > CAST(0.1 AS DOUBLE) THEN 'moderate'
            ELSE 'stable' END AS drift
FROM scored
"""


PSI_ORACLE = _psi_oracle()

# --------------------------------------------------------------------------
# Target encoding with leave-one-fold-out leakage protection
# --------------------------------------------------------------------------

_TE_FOLDS = 5
_TE_SMOOTH = 20   # pseudo-observations of the global mean


def segment_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of customer market segment against order
    value, with K-fold leave-one-fold-out leakage protection — the
    categorical-feature encoder every tabular training pipeline ships
    (Micci-Barreca 2001): rows in fold ``f`` are encoded from the OTHER
    folds' statistics only, so the feature never sees its own label, and
    ``_TE_SMOOTH`` pseudo-observations of the global mean shrink
    small-cell estimates.

    Exactness: folds are md5 buckets of the order key (deterministic,
    partition-invariant); sums are integer cents; the global mean and
    every encoding round half-up by the exact integer division
    ``(2·num + den) DIV (2·den)`` — the engines never divide floats.
    Scale shape: one join + one (segment, fold) aggregation — segments ×
    folds cells of driver state, the data shuffles once."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    rows = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr(
            "CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 12),"
            f" 16, 10) AS BIGINT) % {_TE_FOLDS}"
        ).cast("int").alias("fold"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0))"
        ).alias("cents"),
    )
    cells = rows.groupBy("segment", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_f"),
        F.expr("CAST(SUM(cents) AS DECIMAL(38,0))").alias("sum_f"),
    )
    seg = cells.groupBy("segment").agg(
        F.expr("CAST(SUM(n_f) AS BIGINT)").alias("n_s"),
        F.expr("CAST(SUM(sum_f) AS DECIMAL(38,0))").alias("sum_s"),
    )
    glob_mean = cells.agg(
        F.expr(
            "CAST((2 * CAST(SUM(sum_f) AS DECIMAL(38,0)) + SUM(n_f))"
            " DIV (2 * SUM(n_f)) AS DECIMAL(19,0))"
        ).alias("gm_cents")
    )
    k = _TE_SMOOTH
    return (
        cells.join(seg, "segment")
        .crossJoin(F.broadcast(glob_mean))
        .select(
            "segment",
            "fold",
            F.col("n_f").alias("n_rows"),
            F.expr(
                "CAST(CAST((2 * (sum_s - sum_f + "
                f"{k} * gm_cents) + (n_s - n_f + {k}))"
                f" DIV (2 * (n_s - n_f + {k})) AS BIGINT) AS DOUBLE)"
                " / CAST(100 AS DOUBLE)"
            ).alias("encoding"),
            F.expr(
                "CAST(CAST((2 * sum_f + n_f) DIV (2 * n_f) AS BIGINT)"
                " AS DOUBLE) / CAST(100 AS DOUBLE)"
            ).alias("fold_mean"),
            F.expr(
                "CAST(CAST(gm_cents AS BIGINT) AS DOUBLE)"
                " / CAST(100 AS DOUBLE)"
            ).alias("global_mean"),
        )
    )


TARGET_ENCODING_ORACLE = f"""
WITH rows_ AS (
  SELECT c.c_mktsegment AS segment,
         CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 12))::BIGINT
              % {_TE_FOLDS} AS INT) AS fold,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0))
           AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), cells AS (
  SELECT segment, fold, CAST(COUNT(*) AS BIGINT) AS n_f,
         CAST(SUM(cents) AS DECIMAL(38,0)) AS sum_f
  FROM rows_ GROUP BY segment, fold
), seg AS (
  SELECT segment, CAST(SUM(n_f) AS BIGINT) AS n_s,
         CAST(SUM(sum_f) AS DECIMAL(38,0)) AS sum_s
  FROM cells GROUP BY segment
), gm AS (
  SELECT CAST(CAST(2 * CAST(SUM(sum_f) AS DECIMAL(38,0)) + SUM(n_f) AS HUGEINT)
              // CAST(2 * SUM(n_f) AS HUGEINT) AS DECIMAL(19,0)) AS gm_cents
  FROM cells
)
SELECT c.segment, c.fold, c.n_f AS n_rows,
       CAST(CAST(CAST(2 * (s.sum_s - c.sum_f + {_TE_SMOOTH} * gm.gm_cents)
                      + (s.n_s - c.n_f + {_TE_SMOOTH}) AS HUGEINT)
                 // CAST(2 * (s.n_s - c.n_f + {_TE_SMOOTH}) AS HUGEINT)
            AS BIGINT) AS DOUBLE) / CAST(100 AS DOUBLE) AS encoding,
       CAST(CAST(CAST(2 * c.sum_f + c.n_f AS HUGEINT)
                 // CAST(2 * c.n_f AS HUGEINT) AS BIGINT) AS DOUBLE)
         / CAST(100 AS DOUBLE) AS fold_mean,
       CAST(CAST(gm.gm_cents AS BIGINT) AS DOUBLE) / CAST(100 AS DOUBLE)
         AS global_mean
FROM cells c JOIN seg s ON c.segment = s.segment CROSS JOIN gm
"""


# --------------------------------------------------------------------------
# Feature hashing (Weinberger et al. 2009) — the hashing trick
# --------------------------------------------------------------------------

_FH_DIM = 256


def corpus_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick over the corpus vocabulary: every token maps to
    one of ``_FH_DIM`` feature indices by md5, with a second hash bit
    choosing ±1 sign (the signed construction that makes collisions
    cancel in expectation) — how a training pipeline gets fixed-width
    sparse features from an unbounded vocabulary with NO dictionary to
    build, ship, or keep consistent across workers.

    Output is the corpus-level hashed vector plus per-index collision
    statistics (distinct tokens sharing each index — the quantity that
    sizes the dimension), zero-filled over the full grid so the schema
    IS the feature space.  Exact integers end to end; one explode +
    one groupBy on a 256-key domain (map-side combine collapses each
    task to ≤ dim cells before the shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    from df_to_azure_spark.functions import text as TXT

    toks = docs.select(F.explode(TXT.tokens("text")).alias("tok"))
    hashed = toks.select(
        "tok",
        F.expr(
            "CAST(conv(substring(md5(CONCAT('f:', tok)), 1, 12), 16, 10)"
            f" AS BIGINT) % {_FH_DIM}"
        ).alias("idx"),
        F.expr(
            "CASE WHEN CAST(conv(substring(md5(CONCAT('s:', tok)), 1, 12),"
            " 16, 10) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END"
        ).alias("sign"),
    )
    agg = hashed.groupBy("idx").agg(
        F.expr("CAST(SUM(sign) AS BIGINT)").alias("signed_value"),
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.countDistinct("tok").cast("bigint").alias("n_distinct_tokens"),
    )
    grid = spark.range(_FH_DIM).select(F.col("id").alias("idx"))
    return (
        grid.join(agg, "idx", "left")
        .select(
            "idx",
            F.coalesce("signed_value", F.lit(0)).cast("bigint").alias(
                "signed_value"
            ),
            F.coalesce("n_occurrences", F.lit(0)).cast("bigint").alias(
                "n_occurrences"
            ),
            F.coalesce("n_distinct_tokens", F.lit(0)).cast("bigint").alias(
                "n_distinct_tokens"
            ),
        )
    )


def _fh_oracle() -> str:
    from df_to_azure_spark.plans.training_data import _TOKS

    return f"""
WITH toks AS (
  SELECT unnest({_TOKS}) AS tok FROM documents
), hashed AS (
  SELECT tok,
         ('0x' || substr(md5('f:' || tok), 1, 12))::BIGINT % {_FH_DIM} AS idx,
         CASE WHEN ('0x' || substr(md5('s:' || tok), 1, 12))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS sign
  FROM toks
), agg AS (
  SELECT idx, CAST(SUM(sign) AS BIGINT) AS signed_value,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_tokens
  FROM hashed GROUP BY idx
)
SELECT g.range AS idx,
       COALESCE(a.signed_value, 0) AS signed_value,
       COALESCE(a.n_occurrences, 0) AS n_occurrences,
       COALESCE(a.n_distinct_tokens, 0) AS n_distinct_tokens
FROM range({_FH_DIM}) g LEFT JOIN agg a ON g.range = a.idx
ORDER BY idx
"""


FEATURE_HASHING_ORACLE = _fh_oracle()

# --------------------------------------------------------------------------
# Cohort LTV curve — cumulative revenue per customer by cohort age
# --------------------------------------------------------------------------


def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime-value curve by acquisition cohort: customers grouped by
    the month of their FIRST order; for each cohort and every month of
    age since, the cumulative revenue per cohort customer — the curve a
    growth team reads LTV/CAC off.

    Exactness: months are pure integer arithmetic (y·12+m), revenue is
    integer cents, the running total is an exact decimal window sum over
    the (cohort, age) domain — bounded by the calendar² — and the
    per-customer division rounds half-up in integer space.  Scale shape:
    one min-aggregation for the cohort assignment, one keyed join back,
    one (cohort, age) aggregation, then a window over the
    calendar-bounded grid — the heavy shuffles are all keyed on customer
    or (cohort, age), never global."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "year(CAST(o_orderdate AS DATE)) * 12"
            " + month(CAST(o_orderdate AS DATE)) - 1"
        ).alias("ym"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0))"
        ).alias("cents"),
    )
    first = orders.groupBy("o_custkey").agg(F.min("ym").alias("ym0"))
    cohort_sizes = first.groupBy("ym0").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )
    aged = orders.join(first, "o_custkey").select(
        F.col("ym0").alias("cohort_ym"),
        (F.col("ym") - F.col("ym0")).cast("int").alias("age_months"),
        "cents",
    )
    cells = aged.groupBy("cohort_ym", "age_months").agg(
        F.expr("CAST(SUM(cents) AS DECIMAL(38,0))").alias("cents_m"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    from pyspark.sql import Window as W

    cum = cells.withColumn(
        "cum_cents",
        F.sum("cents_m")
        .over(
            W.partitionBy("cohort_ym")
            .orderBy("age_months")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .cast("decimal(38,0)"),
    )
    return (
        cum.join(
            cohort_sizes,
            cum.cohort_ym == cohort_sizes.ym0,
        )
        .select(
            F.expr(
                "CAST((cohort_ym DIV 12) * 100 + (cohort_ym % 12) + 1"
                " AS INT)"
            ).alias("cohort_month"),
            "age_months",
            "n_customers",
            "n_orders",
            F.expr(
                "CAST(CAST((2 * cum_cents + n_customers)"
                " DIV (2 * n_customers) AS BIGINT) AS DOUBLE)"
                " / CAST(100 AS DOUBLE)"
            ).alias("ltv_per_customer"),
        )
    )


COHORT_LTV_ORACLE = """
WITH orders_m AS (
  SELECT o_custkey,
         year(CAST(o_orderdate AS DATE)) * 12
           + month(CAST(o_orderdate AS DATE)) - 1 AS ym,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0))
           AS cents
  FROM orders
), first_m AS (
  SELECT o_custkey, MIN(ym) AS ym0 FROM orders_m GROUP BY o_custkey
), sizes AS (
  SELECT ym0, CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM first_m GROUP BY ym0
), aged AS (
  SELECT f.ym0 AS cohort_ym, CAST(o.ym - f.ym0 AS INT) AS age_months, o.cents
  FROM orders_m o JOIN first_m f ON o.o_custkey = f.o_custkey
), cells AS (
  SELECT cohort_ym, age_months,
         CAST(SUM(cents) AS DECIMAL(38,0)) AS cents_m,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM aged GROUP BY cohort_ym, age_months
), cum AS (
  SELECT *, CAST(SUM(cents_m) OVER (PARTITION BY cohort_ym ORDER BY age_months
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DECIMAL(38,0)) AS cum_cents
  FROM cells
)
SELECT CAST((cohort_ym // 12) * 100 + (cohort_ym % 12) + 1 AS INT)
         AS cohort_month,
       age_months, s.n_customers, n_orders,
       CAST(CAST(CAST(2 * cum_cents + s.n_customers AS HUGEINT)
                 // CAST(2 * s.n_customers AS HUGEINT) AS BIGINT) AS DOUBLE)
         / CAST(100 AS DOUBLE) AS ltv_per_customer
FROM cum JOIN sizes s ON cum.cohort_ym = s.ym0
"""


# --------------------------------------------------------------------------
# Two-regressor grouped OLS via closed-form normal equations
# --------------------------------------------------------------------------


def _ols2_beta_sql() -> tuple[str, str, str, str]:
    """Cramer's-rule SQL for y ~ 1 + x1 + x2 from exact sufficient sums
    (n, sx1, sx2, sx11, sx22, sx12, sy, sx1y, sx2y — all integers cast
    DOUBLE once).  The determinant expressions are FIXED trees of IEEE
    ops over identical operands, so both engines produce bit-identical
    doubles; only the final betas are rounded."""
    n, x1, x2 = "CAST(n AS DOUBLE)", "CAST(sx1 AS DOUBLE)", "CAST(sx2 AS DOUBLE)"
    x11, x22, x12 = (
        "CAST(sx11 AS DOUBLE)", "CAST(sx22 AS DOUBLE)", "CAST(sx12 AS DOUBLE)"
    )
    y, x1y, x2y = (
        "CAST(sy AS DOUBLE)", "CAST(sx1y AS DOUBLE)", "CAST(sx2y AS DOUBLE)"
    )

    def det(a, b, c, d, e, f, g, h, i):
        return (
            f"({a} * ({e} * {i} - {f} * {h})"
            f" - {b} * ({d} * {i} - {f} * {g})"
            f" + {c} * ({d} * {h} - {e} * {g}))"
        )

    dd = det(n, x1, x2, x1, x11, x12, x2, x12, x22)
    d0 = det(y, x1, x2, x1y, x11, x12, x2y, x12, x22)
    d1 = det(n, y, x2, x1, x1y, x12, x2, x2y, x22)
    d2 = det(n, x1, y, x1, x11, x1y, x2, x12, x2y)
    return dd, d0, d1, d2


def brand_price_ols2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand multiple regression — extended price (cents) on
    quantity and discount (percent points), solved in closed form from
    the normal equations: the grouped 2-regressor OLS every pricing
    analysis starts with, distributed as ONE aggregation of exact
    integer sufficient statistics per brand (the map-side-combinable
    shape: no per-group matrices ever leave the executors, just 10
    sums).

    Exactness: quantity is integral, discount is exact percent points
    (×100), price is cents — every sufficient statistic is an exact
    DECIMAL(38,0); Cramer's rule and R² are fixed double expression
    trees over identical operands (bit-identical cross-engine),
    ROUND(6) at output only."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("CAST(l_quantity AS DECIMAL(19,0))").alias("x1"),
        F.expr(
            "CAST(CAST(l_discount AS DECIMAL(8,2)) * 100 AS DECIMAL(19,0))"
        ).alias("x2"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100"
            " AS DECIMAL(19,0))"
        ).alias("yv"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rows = li.join(part, li.l_partkey == part.p_partkey)
    s = rows.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("CAST(SUM(x1) AS DECIMAL(38,0))").alias("sx1"),
        F.expr("CAST(SUM(x2) AS DECIMAL(38,0))").alias("sx2"),
        F.expr("CAST(SUM(x1 * x1) AS DECIMAL(38,0))").alias("sx11"),
        F.expr("CAST(SUM(x2 * x2) AS DECIMAL(38,0))").alias("sx22"),
        F.expr("CAST(SUM(x1 * x2) AS DECIMAL(38,0))").alias("sx12"),
        F.expr("CAST(SUM(yv) AS DECIMAL(38,0))").alias("sy"),
        F.expr("CAST(SUM(x1 * yv) AS DECIMAL(38,0))").alias("sx1y"),
        F.expr("CAST(SUM(x2 * yv) AS DECIMAL(38,0))").alias("sx2y"),
        F.expr("CAST(SUM(yv * yv) AS DECIMAL(38,0))").alias("syy"),
    )
    dd, d0, d1, d2 = _ols2_beta_sql()
    b0, b1, b2 = f"({d0} / {dd})", f"({d1} / {dd})", f"({d2} / {dd})"
    sse = (
        f"(CAST(syy AS DOUBLE) - ({b0} * CAST(sy AS DOUBLE)"
        f" + {b1} * CAST(sx1y AS DOUBLE) + {b2} * CAST(sx2y AS DOUBLE)))"
    )
    sst = (
        "(CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"
    )
    return s.select(
        "p_brand",
        "n",
        F.expr(f"ROUND({b0} / CAST(100 AS DOUBLE), 6)").alias("intercept"),
        F.expr(f"ROUND({b1} / CAST(100 AS DOUBLE), 6)").alias(
            "beta_qty"
        ),
        F.expr(f"ROUND({b2} / CAST(100 AS DOUBLE), 6)").alias(
            "beta_disc_pct"
        ),
        F.expr(f"ROUND(CAST(1 AS DOUBLE) - {sse} / {sst}, 6)").alias("r2"),
    )


def _ols2_oracle() -> str:
    dd, d0, d1, d2 = _ols2_beta_sql()
    b0, b1, b2 = f"({d0} / {dd})", f"({d1} / {dd})", f"({d2} / {dd})"
    sse = (
        f"(CAST(syy AS DOUBLE) - ({b0} * CAST(sy AS DOUBLE)"
        f" + {b1} * CAST(sx1y AS DOUBLE) + {b2} * CAST(sx2y AS DOUBLE)))"
    )
    sst = (
        "(CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"
    )
    return f"""
WITH rows_ AS (
  SELECT p.p_brand,
         CAST(l.l_quantity AS DECIMAL(19,0)) AS x1,
         CAST(CAST(l.l_discount AS DECIMAL(8,2)) * 100 AS DECIMAL(19,0)) AS x2,
         CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
              AS DECIMAL(19,0)) AS yv
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), s AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS DECIMAL(38,0)) AS sx1,
         CAST(SUM(x2) AS DECIMAL(38,0)) AS sx2,
         CAST(SUM(x1 * x1) AS DECIMAL(38,0)) AS sx11,
         CAST(SUM(x2 * x2) AS DECIMAL(38,0)) AS sx22,
         CAST(SUM(x1 * x2) AS DECIMAL(38,0)) AS sx12,
         CAST(SUM(yv) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(x1 * yv) AS DECIMAL(38,0)) AS sx1y,
         CAST(SUM(x2 * yv) AS DECIMAL(38,0)) AS sx2y,
         CAST(SUM(yv * yv) AS DECIMAL(38,0)) AS syy
  FROM rows_ GROUP BY p_brand
)
SELECT p_brand, n,
       ROUND({b0} / CAST(100 AS DOUBLE), 6) AS intercept,
       ROUND({b1} / CAST(100 AS DOUBLE), 6) AS beta_qty,
       ROUND({b2} / CAST(100 AS DOUBLE), 6) AS beta_disc_pct,
       ROUND(CAST(1 AS DOUBLE) - {sse} / {sst}, 6) AS r2
FROM s
"""


BRAND_OLS2_ORACLE = _ols2_oracle()

# --------------------------------------------------------------------------
# Clickstream path analysis — top session path signatures
# --------------------------------------------------------------------------

_PATH_GAP_MIN = 30
_PATH_LEN = 5
_PATH_TOPK = 10


def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``_PATH_TOPK`` session path signatures: each session's first
    ``_PATH_LEN`` event types joined in time order — the clickstream
    path analysis behind every "how do users actually move through the
    product" question, built on the same gap sessionization as
    ``sessionize_events``.

    Deterministic end to end: sessions come from the lag/cum-sum gap
    rule over the (ts, event_id) order; the path is an ORDERED list
    aggregation (struct-sorted collect, sliced, joined — DuckDB replays
    it as ``list(... ORDER BY ts, event_id)``); the top-k orders on
    (count DESC, path ASC) — strings and integers only.  Scale shape:
    the session windows partition by user (the sessionization shuffle),
    the path agg is keyed on (user, session), and the final top-k is a
    ``TakeOrderedAndProject`` over the bounded path-signature domain
    (≤ |event_types|^len)."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w_user = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = _PATH_GAP_MIN * 60 * 1_000_000
    flagged = events.withColumn(
        "new_session",
        F.when(
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w_user)))
            > gap_us,
            1,
        ).otherwise(0),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(w_user.rowsBetween(W.unboundedPreceding, 0)),
    )
    paths = flagged.groupBy("user_id", "session_seq").agg(
        F.expr(
            "array_join(slice(transform(array_sort(collect_list("
            "named_struct('ts', ts, 'event_id', event_id, 'et', event_type)"
            ")), x -> x.et), 1, " + str(_PATH_LEN) + "), '>')"
        ).alias("path"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(_PATH_TOPK)
    )


TOP_PATHS_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {_PATH_GAP_MIN * 60 * 1_000_000} THEN 1 ELSE 0 END
           AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), with_ids AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
), paths AS (
  SELECT user_id, session_seq,
         array_to_string(
           list_slice(list(event_type ORDER BY ts, event_id), 1, {_PATH_LEN}),
           '>') AS path
  FROM with_ids GROUP BY user_id, session_seq
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT {_PATH_TOPK}
"""

# --------------------------------------------------------------------------
# SLA latency percentiles — nearest-rank over session durations
# --------------------------------------------------------------------------

_SLA_PCTS = ((50, 1, 2), (90, 9, 10), (99, 99, 100))  # (label, num, den)

_SESSIONS_SQL = """
  SELECT user_id, session_seq,
         CAST(MIN(ts) AS TIMESTAMP) AS session_start,
         CAST(MAX(ts) AS TIMESTAMP) AS session_end
  FROM (
    SELECT user_id, ts,
      SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
    FROM (
      SELECT user_id, ts, event_id,
        CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
             (PARTITION BY user_id ORDER BY ts, event_id))
             > 1800000000 THEN 1 ELSE 0 END AS new_session
      FROM events
    )
  )
  GROUP BY user_id, session_seq
"""


def session_duration_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of user session durations — the SLA report every ops
    review opens with, computed as EXACT nearest-rank order statistics
    (``k = ceil(p·n)``, integer arithmetic) served by ``two_phase_rank``
    rather than a single-partition sort or an engine-private
    ``percentile_approx``.

    Durations are exact microsecond integers (epoch difference of the
    gap-sessionized bounds); the rank filter selects 3 rows total; the
    one double appears converting µs → seconds.  Scale shape: the
    sessionization windows shuffle on user_id; the global order
    statistic is the two-phase distributed rank."""
    from df_to_azure_spark.streaming.events import sessionize

    sessions = sessionize(load_table(spark, sf_dir, "events"), gap_minutes=30)
    durs = sessions.select(
        "user_id",
        "session_seq",
        F.expr(
            "CAST(unix_micros(session_end) - unix_micros(session_start)"
            " AS BIGINT)"
        ).alias("dur_us"),
    )
    ranked = two_phase_rank(
        durs, [("dur_us", "asc"), ("user_id", "asc"), ("session_seq", "asc")]
    )
    picks = None
    for label, num, den in _SLA_PCTS:
        sel = ranked.where(
            F.col("__rn")
            == F.expr(f"({num} * __grp_n + {den} - 1) DIV {den}")
        ).select(
            F.lit(f"p{label}").alias("percentile"),
            F.col("__rn").cast("bigint").alias("rank"),
            F.col("__grp_n").cast("bigint").alias("n_sessions"),
            F.col("dur_us").alias("duration_us"),
            F.expr(
                "CAST(dur_us AS DOUBLE) / CAST(1000000 AS DOUBLE)"
            ).alias("duration_sec"),
        )
        picks = sel if picks is None else picks.unionAll(sel)
    return picks


SLA_PERCENTILES_ORACLE = f"""
WITH sessions AS ({_SESSIONS_SQL}),
durs AS (
  SELECT user_id, session_seq,
         CAST(epoch_us(session_end) - epoch_us(session_start) AS BIGINT)
           AS dur_us
  FROM sessions
), ranked AS (
  SELECT dur_us,
         row_number() OVER (ORDER BY dur_us, user_id, session_seq) AS rn,
         COUNT(*) OVER () AS n
  FROM durs
)
{" UNION ALL ".join(
    f'''SELECT 'p{label}' AS percentile, CAST(rn AS BIGINT) AS rank,
       CAST(n AS BIGINT) AS n_sessions, dur_us AS duration_us,
       CAST(dur_us AS DOUBLE) / CAST(1000000 AS DOUBLE) AS duration_sec
FROM ranked WHERE rn = ({num} * n + {den} - 1) // {den}'''
    for label, num, den in _SLA_PCTS)}
"""


# --------------------------------------------------------------------------
# Exponential fit + dispersion of user inter-arrival times
# --------------------------------------------------------------------------


def user_interarrival_expfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are event arrivals Poisson?  Fit an exponential to per-user
    inter-arrival gaps by maximum likelihood (λ̂ = n/Σgaps — an exact
    integer ratio) and test it: the KS statistic of the empirical CDF
    against ``1 − e^{{−λx}}`` evaluated on the domain-bounded grid of
    DISTINCT observed gaps, plus the burstiness index
    ``B = (σ−μ)/(σ+μ)`` (Goh & Barabási 2008) from exact moment sums —
    the traffic-model sanity check run before any queueing or capacity
    math.

    Exactness: gaps are integer microseconds; n, Σx, Σx² are exact
    DECIMAL(38,0); the ECDF side of the KS comparison is integer counts
    over the distinct-gap grid; the model CDF is the one transcendental
    (EXP, ROUND(12) per grid point per policy); λ, B and the final max
    are fixed double expressions over identical operands.  Scale: the
    lag window shuffles on user_id; everything after collapses to the
    distinct-gap domain."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.withColumn(
            "gap_us",
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)),
        )
        .where(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
        .select("gap_us")
    )
    suff = gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("CAST(SUM(CAST(gap_us AS DECIMAL(19,0))) AS DECIMAL(38,0))")
        .alias("sx"),
        F.expr(
            "CAST(SUM(CAST(gap_us AS DECIMAL(19,0))"
            " * CAST(gap_us AS DECIMAL(19,0))) AS DECIMAL(38,0))"
        ).alias("sxx"),
    )
    # the ECDF running count is a GLOBAL prefix sum over the distinct-gap
    # grid -- at microsecond granularity nearly every gap is distinct, so
    # a bare Window.orderBy would move the whole grid to one partition;
    # two_phase_rank's exact running-sum path (range repartition + offset
    # collect) is the scale-safe form
    counts = gaps.groupBy("gap_us").agg(
        F.expr("CAST(COUNT(*) AS DECIMAL(19,0))").alias("c")
    )
    grid = two_phase_rank(
        counts, [("gap_us", "asc")], sum_col="c"
    ).select("gap_us", F.col("__cum").cast("bigint").alias("cum"))
    # lambda in events/second: n / (sx / 1e6)  (identical double ops)
    lam = (
        "(CAST(n AS DOUBLE)"
        " / (CAST(sx AS DOUBLE) / CAST(1000000 AS DOUBLE)))"
    )
    ks_term = (
        "ABS(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE)"
        f" - ROUND(CAST(1 AS DOUBLE) - EXP(-{lam}"
        " * (CAST(gap_us AS DOUBLE) / CAST(1000000 AS DOUBLE))), 12))"
    )
    ks = grid.crossJoin(F.broadcast(suff)).agg(
        F.expr(f"ROUND(MAX({ks_term}), 6)").alias("ks_stat")
    )
    mean = "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    var = (
        f"(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) - {mean} * {mean})"
    )
    burst = f"ROUND((SQRT({var}) - {mean}) / (SQRT({var}) + {mean}), 6)"
    return suff.crossJoin(F.broadcast(ks)).select(
        "n",
        F.expr(f"ROUND({lam}, 12)").alias("lambda_per_sec"),
        F.expr(
            f"ROUND({mean} / CAST(1000000 AS DOUBLE), 6)"
        ).alias("mean_gap_sec"),
        F.expr(burst).alias("burstiness"),
        "ks_stat",
        F.expr(
            "CASE WHEN ks_stat * SQRT(CAST(n AS DOUBLE))"
            " > CAST(1.358 AS DOUBLE) THEN 'reject_exponential'"
            " ELSE 'consistent' END"
        ).alias("verdict"),
    )


def _expfit_oracle() -> str:
    lam = (
        "(CAST(n AS DOUBLE)"
        " / (CAST(sx AS DOUBLE) / CAST(1000000 AS DOUBLE)))"
    )
    mean = "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    var = f"(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) - {mean} * {mean})"
    burst = f"ROUND((SQRT({var}) - {mean}) / (SQRT({var}) + {mean}), 6)"
    ks_term = (
        "ABS(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE)"
        f" - ROUND(CAST(1 AS DOUBLE) - EXP(-{lam}"
        " * (CAST(gap_us AS DOUBLE) / CAST(1000000 AS DOUBLE))), 12))"
    )
    return f"""
WITH gaps AS (
  SELECT CAST(epoch_us(ts) - epoch_us(lag(ts) OVER
              (PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT)
           AS gap_us
  FROM events
  QUALIFY gap_us IS NOT NULL AND gap_us > 0
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(gap_us AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(gap_us AS DECIMAL(19,0))
              * CAST(gap_us AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sxx
  FROM gaps
), grid AS (
  SELECT gap_us, COUNT(*) AS c,
         CAST(SUM(COUNT(*)) OVER (ORDER BY gap_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM gaps GROUP BY gap_us
), ks AS (
  SELECT ROUND(MAX({ks_term}), 6) AS ks_stat FROM grid, s
)
SELECT n, ROUND({lam}, 12) AS lambda_per_sec,
       ROUND({mean} / CAST(1000000 AS DOUBLE), 6) AS mean_gap_sec,
       {burst} AS burstiness, ks_stat,
       CASE WHEN ks_stat * SQRT(CAST(n AS DOUBLE))
            > CAST(1.358 AS DOUBLE) THEN 'reject_exponential'
            ELSE 'consistent' END AS verdict
FROM s, ks
"""


EXPFIT_ORACLE = _expfit_oracle()

# --------------------------------------------------------------------------
# Retrieval-quality metrics: recall / MRR / NDCG of LSH vs exact top-k
# --------------------------------------------------------------------------

_IR_K = 10


def lsh_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard IR evaluation of the approximate retrieval path:
    recall@10, MRR and NDCG@10 of the hyperplane-LSH ranking
    (``lsh_knn``) against the exact cosine top-10 (``knn_topk``) as
    ground truth — through the shared evaluator
    (``similarity.retrieval_metrics``; exactness contract and scale
    shape documented there).  ``ann_retrieval_matrix`` runs the same
    evaluator over multiple ANN variants at once."""
    from df_to_azure_spark.functions import similarity as SIM
    from df_to_azure_spark.plans.training_data import _lsh_knn_planes

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    truth = SIM.cosine_topk(queries, emb, k=_IR_K).select(
        "query_id", "neighbor_id"
    )
    cand = SIM.lsh_topk(queries, emb, _lsh_knn_planes(), k=_IR_K)
    return SIM.retrieval_metrics(truth, cand, k=_IR_K)


def _ir_metrics_oracle() -> str:
    from df_to_azure_spark.functions.similarity import retrieval_metrics_sql
    from df_to_azure_spark.plans.training_data import KNN_ORACLE, LSH_KNN_ORACLE

    return retrieval_metrics_sql(KNN_ORACLE, LSH_KNN_ORACLE, k=_IR_K)


IR_METRICS_ORACLE = _ir_metrics_oracle()


# --------------------------------------------------------------------------
# ANN index artifact store: build once, persist, evaluate from stored codes
# --------------------------------------------------------------------------

# bump when any artifact layout / encoding parameter changes: stale
# artifacts from an older engine version must never satisfy a read
_ANN_INDEX_VERSION = 1
_ANN_TABLES = ("lsh_index", "ivf_index", "pq_adc_codes", "pq_rerank_codes")


def _ann_index_root(sf_dir: str) -> str:
    """Scratch lake root for the ANN index artifacts of one dataset —
    keyed by the dataset's identity (path + embeddings file size/mtime)
    and the artifact version, so a data refresh or an encoder change
    invalidates the cache instead of serving stale codes.  Lives under
    the system temp dir: on a real cluster this would be a lake path;
    every artifact is rebuilt deterministically on a miss, so the store
    is a pure cache, never a source of truth."""
    import hashlib
    import os
    import tempfile

    ident = os.path.realpath(sf_dir)
    try:
        st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
        ident += f"|{st.st_size}|{int(st.st_mtime)}"
    except OSError:
        pass  # non-local sf_dir: path-only key (still version-scoped)
    key = hashlib.md5(
        f"{ident}|v{_ANN_INDEX_VERSION}".encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), "dfa_spark_ann_index", key)


def _build_ann_index(spark: SparkSession, sf_dir: str):
    """Build and persist ALL deployable ANN index artifacts for the
    embeddings table — the one-pass index builds whose outputs are what
    a production deployment stores and ships:

    - ``lsh_index``      (neighbor_id, bucket, cv)   ``similarity.lsh_index``
    - ``ivf_index``      (neighbor_id, cid, cv)      ``similarity.ivf_index``
    - ``pq_adc_codes``   (neighbor_id, code_0..3)    ``similarity.pq_codes`` M=4
    - ``pq_rerank_codes`` (neighbor_id, code_0..15)  ``similarity.pq_codes`` M=16

    Every artifact is a deterministic function of the data and the
    seeded model literals (planes/centroids/sampled codebooks), so a
    rebuild is bit-identical to a cached read — asserted in
    ``tests/test_pipeline5.py``.  A ``COMPLETE`` marker commits the set
    atomically-enough for the sequential driver: readers treat a
    markerless root as absent and rebuild."""
    import os

    from df_to_azure_spark.functions import similarity as SIM
    from df_to_azure_spark.operators.lake import ParquetLake
    from df_to_azure_spark.plans import training_data as TD
    from df_to_azure_spark.plans.training_data import (
        _ivf_centroids,
        _lsh_knn_planes,
    )

    from concurrent.futures import ThreadPoolExecutor

    root = _ann_index_root(sf_dir)
    lake = ParquetLake(spark, root)
    emb = load_table(spark, sf_dir, "embeddings")

    # the four builds are independent single-output jobs writing to
    # disjoint dirs; submitting them from threads lets the scheduler
    # overlap their stages (each leaves most of the cluster idle between
    # stage boundaries) — results are unaffected, only wall-clock.
    # The PQ codebook sampling (a small exemplar collect each) runs
    # INSIDE its build's thread (r14): serially on the driver it
    # delayed the whole pool by two round-trips; the sampled books are
    # deterministic, so artifacts are unchanged.
    def _pq_build(m: int, k: int, table: str):
        books = SIM.sample_codebooks(emb, m, k)
        lake.write(
            SIM.pq_codes(emb, books).withColumnRenamed(
                "vec_id", "neighbor_id"
            ),
            table,
            method="create",
        )

    tasks = [
        lambda: lake.write(
            SIM.lsh_index(emb, _lsh_knn_planes()), "lsh_index",
            method="create",
        ),
        lambda: lake.write(
            SIM.ivf_index(emb, _ivf_centroids()), "ivf_index",
            method="create",
        ),
        lambda: _pq_build(TD._PQ_M, TD._PQ_K, "pq_adc_codes"),
        lambda: _pq_build(
            TD._PQ_RERANK_M, TD._PQ_RERANK_K, "pq_rerank_codes"
        ),
    ]
    with ThreadPoolExecutor(max_workers=len(tasks)) as pool:
        futs = [pool.submit(t) for t in tasks]
        for f in futs:
            f.result()
    with open(os.path.join(root, "COMPLETE"), "w") as fh:
        fh.write(f"v{_ANN_INDEX_VERSION} tables={','.join(_ANN_TABLES)}\n")
    return lake


def _ensure_ann_index(spark: SparkSession, sf_dir: str):
    """Open the artifact store, building it on a miss (no marker).  The
    artifacts are deterministic, so build-on-miss and cached-read return
    identical contents — query results cannot depend on run order."""
    import os

    from df_to_azure_spark.operators.lake import ParquetLake

    root = _ann_index_root(sf_dir)
    if not os.path.exists(os.path.join(root, "COMPLETE")):
        return _build_ann_index(spark, sf_dir)
    return ParquetLake(spark, root)


def ann_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The paired BUILD query for ``ann_retrieval_matrix``: (re)build and
    persist every ANN index artifact, then summarize each STORED table —
    ``(variant, n_vectors, n_groups, code_checksum)`` where ``n_groups``
    counts distinct buckets / cells / code tuples and ``code_checksum``
    is an order-free integer fold of the stored codes.  The summary is
    computed from the parquet the build wrote (not the in-flight
    frames), so a green hash certifies the artifacts on disk; the DuckDB
    oracle replays bucket/assign/encode from the raw embeddings.

    This query carries the index-build cost explicitly (it always
    rebuilds); the matrix then scores from the stored artifacts — the
    build/search split that IS the production deployment shape
    (round-9 verdict task 1)."""
    from df_to_azure_spark.plans import training_data as TD

    lake = _build_ann_index(spark, sf_dir)

    def _summary(table: str, variant: str, group_cols, checksum) -> DataFrame:
        df = lake.read(table)
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.countDistinct(*group_cols).cast("bigint").alias("n_groups"),
            F.sum(checksum).cast("bigint").alias("code_checksum"),
        ).select(F.lit(variant).alias("variant"), "*")

    def _pq_checksum(m: int):
        cs = F.col("code_0").cast("bigint")
        for i in range(1, m):
            cs = cs + F.col(f"code_{i}").cast("bigint") * F.lit(i + 1)
        return cs

    out = _summary("lsh_index", "lsh", [F.col("bucket")], F.col("bucket"))
    out = out.unionByName(
        _summary("ivf_index", "ivf", [F.col("cid")], F.col("cid").cast("bigint"))
    )
    out = out.unionByName(
        _summary(
            "pq_adc_codes",
            "pq_adc",
            [F.col(f"code_{i}") for i in range(TD._PQ_M)],
            _pq_checksum(TD._PQ_M),
        )
    )
    return out.unionByName(
        _summary(
            "pq_rerank_codes",
            "pq_rerank",
            [F.col(f"code_{i}") for i in range(TD._PQ_RERANK_M)],
            _pq_checksum(TD._PQ_RERANK_M),
        )
    )


def _ann_build_oracle() -> str:
    """DuckDB twin of the build summary: replays the bucket / coarse
    assign / PQ encode from the raw embeddings via the SAME shared CTE
    text the search oracles use, then folds the identical summaries."""
    from df_to_azure_spark.plans.training_data import (
        _PQ_K,
        _PQ_M,
        _PQ_RERANK_K,
        _PQ_RERANK_M,
        _ivf_assign_ctes,
        _lsh_bucket_sql,
        _pq_ctes,
    )

    lsh = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
  FROM embeddings
), vb AS (
  SELECT vec_id, {_lsh_bucket_sql('ev')} AS bucket FROM v
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_groups,
       CAST(SUM(bucket) AS BIGINT) AS code_checksum
FROM vb"""
    ivf = f"""
WITH {_ivf_assign_ctes()}
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(COUNT(DISTINCT cid) AS BIGINT) AS n_groups,
       CAST(SUM(cid) AS BIGINT) AS code_checksum
FROM ca"""

    def _pq(m: int, k: int) -> str:
        tup = ", ".join(f"code_{i}" for i in range(m))
        cs = " + ".join(
            f"code_{i} * {i + 1}" if i else "code_0" for i in range(m)
        )
        return f"""
{_pq_ctes(m, k)}
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(COUNT(DISTINCT ({tup})) AS BIGINT) AS n_groups,
       CAST(SUM({cs}) AS BIGINT) AS code_checksum
FROM codes"""

    parts = [
        f"SELECT '{name}' AS variant, * FROM ({body}) b_{name}"
        for name, body in (
            ("lsh", lsh),
            ("ivf", ivf),
            ("pq_adc", _pq(_PQ_M, _PQ_K)),
            ("pq_rerank", _pq(_PQ_RERANK_M, _PQ_RERANK_K)),
        )
    ]
    return " UNION ALL ".join(parts)


ANN_BUILD_ORACLE = _ann_build_oracle()


def ann_retrieval_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One metrics sheet for the WHOLE ANN family: recall@10 / MRR /
    NDCG@10 of the hyperplane-LSH ranking, the IVF inverted-list ranking
    (nprobe=2), PQ asymmetric-distance (compressed domain), PQ
    shortlist+exact-rerank, and the hybrid RRF fusion of the two
    cheapest APPROXIMATE retrievers (LSH + IVF) — every deployable index
    variant scored per-query against the exact cosine top-10 through the
    shared evaluator (``similarity.retrieval_metrics``) — the audit
    table that tells a retrieval user which index to deploy.

    Round-9 verdict tasks 1+2: every leg now scores from the PERSISTED
    index artifacts (``_ensure_ann_index`` → ``*_from_index`` /
    ``*_from_codes`` search paths), so evaluation never rebuilds an
    index — ``ann_index_build`` is the paired query that carries the
    build cost — and the hybrid leg fuses two approximate retrievers
    instead of fusing the exact truth into its own candidate set (the
    round-9 self-referential-metrics wart).

    Scale shape: each candidate ranking is a query-batch-bounded frame
    (5 queries × k rows) produced by a stored-index search; each
    evaluation is a (queries × k)-row join + one aggregation, and the
    variant matrix is a union of query-batch-bounded frames.  The
    eager pins replay 50 stored rows instead of re-running each search
    under the evaluator's three joins."""
    from df_to_azure_spark.functions import similarity as SIM
    from df_to_azure_spark.plans import training_data as TD
    from df_to_azure_spark.plans.training_data import (
        _ivf_centroids,
        _lsh_knn_planes,
    )

    from concurrent.futures import ThreadPoolExecutor

    lake = _ensure_ann_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    # Each pin is an independent ~1 s search job over a stored artifact
    # (dominated by fixed scheduler overhead, not data); submitting the
    # five from threads overlaps them — pinned contents are unchanged.
    # The PQ codebook samplings run INSIDE their pin's thread (r14,
    # same overlap as _build_ann_index): serial driver collects here
    # delayed the whole pool by two job round-trips.
    pins = {
        "exact": lambda: SIM.cosine_topk(
            queries, emb, k=_IR_K
        ).localCheckpoint(),
        "lsh": lambda: SIM.lsh_topk_from_index(
            queries, lake.read("lsh_index"), _lsh_knn_planes(), k=_IR_K
        ).localCheckpoint(),
        "ivf": lambda: SIM.ivf_topk_from_index(
            queries,
            lake.read("ivf_index"),
            _ivf_centroids(),
            k=_IR_K,
            nprobe=2,
        ).localCheckpoint(),
        "pq_adc": lambda: SIM.pq_adc_topk_from_codes(
            queries,
            lake.read("pq_adc_codes"),
            SIM.sample_codebooks(emb, TD._PQ_M, TD._PQ_K),
            k=_IR_K,
        ).localCheckpoint(),
        "pq_rerank": lambda: SIM.pq_rerank_topk_from_codes(
            queries,
            lake.read("pq_rerank_codes"),
            emb,
            SIM.sample_codebooks(emb, TD._PQ_RERANK_M, TD._PQ_RERANK_K),
            k=_IR_K,
            shortlist=TD._PQ_RERANK_C,
        ).localCheckpoint(),
    }
    with ThreadPoolExecutor(max_workers=len(pins)) as pool:
        futs = {name: pool.submit(fn) for name, fn in pins.items()}
        pinned = {name: f.result() for name, f in futs.items()}
    truth = pinned["exact"].select("query_id", "neighbor_id")
    variants = [
        ("lsh", pinned["lsh"]),
        ("ivf", pinned["ivf"]),
        ("pq_adc", pinned["pq_adc"]),
        ("pq_rerank", pinned["pq_rerank"]),
        (
            "hybrid_rrf",
            SIM.rrf_fuse(
                [pinned["lsh"], pinned["ivf"]], k_const=60, topk=_IR_K
            ),
        ),
    ]
    # second wave: the five evaluations are again independent tiny jobs
    # (three joins over 50-row pinned frames each) — overlap and pin
    # them so the returned plan is a flat union of 5-row frames
    def _eval(name: str, cand: DataFrame) -> DataFrame:
        return (
            SIM.retrieval_metrics(truth, cand, k=_IR_K)
            .select(F.lit(name).alias("variant"), "*")
            .localCheckpoint()
        )

    with ThreadPoolExecutor(max_workers=len(variants)) as pool:
        evs = [pool.submit(_eval, name, cand) for name, cand in variants]
        frames = [f.result() for f in evs]
    out = frames[0]
    for m in frames[1:]:
        out = out.unionByName(m)
    return out


def _hybrid_lsh_ivf_oracle() -> str:
    """RRF fusion of the LSH and IVF rankings (both approximate — no leg
    of the fused candidate set contains the exact truth by construction);
    same decimal-summed reciprocal contributions as ``rrf_fuse``."""
    from df_to_azure_spark.plans.training_data import (
        IVF_KNN_ORACLE,
        LSH_KNN_ORACLE,
    )

    k_sql = "CAST(60 AS DOUBLE)"
    contrib = (
        f"CAST(ROUND(CAST(1 AS DOUBLE) / ({k_sql} + CAST(rank AS DOUBLE)), 12)"
        " AS DECIMAL(28,12))"
    )
    return f"""
WITH lsh_r AS ({LSH_KNN_ORACLE}),
ivf_r AS ({IVF_KNN_ORACLE}),
contrib AS (
  SELECT query_id, neighbor_id, {contrib} AS c FROM lsh_r
  UNION ALL
  SELECT query_id, neighbor_id, {contrib} AS c FROM ivf_r
), agg AS (
  SELECT query_id, neighbor_id,
         CAST(COUNT(*) AS BIGINT) AS n_lists,
         ROUND(CAST(SUM(c) AS DOUBLE), 8) AS rrf_score
  FROM contrib GROUP BY query_id, neighbor_id
)
SELECT query_id, rank, neighbor_id, n_lists, rrf_score
FROM (
  SELECT query_id, neighbor_id, n_lists, rrf_score,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY rrf_score DESC, neighbor_id)
              AS BIGINT) AS rank
  FROM agg
)
WHERE rank <= {_IR_K}
"""


def _ann_matrix_oracle() -> str:
    from df_to_azure_spark.functions.similarity import retrieval_metrics_sql
    from df_to_azure_spark.plans.training_data import (
        IVF_KNN_ORACLE,
        KNN_ORACLE,
        LSH_KNN_ORACLE,
        PQ_ADC_ORACLE,
        PQ_RERANK_ORACLE,
    )

    parts = [
        f"SELECT '{name}' AS variant, *"
        f" FROM ({retrieval_metrics_sql(KNN_ORACLE, cand, k=_IR_K)}) v_{name}"
        for name, cand in (
            ("lsh", LSH_KNN_ORACLE),
            ("ivf", IVF_KNN_ORACLE),
            ("pq_adc", PQ_ADC_ORACLE),
            ("pq_rerank", PQ_RERANK_ORACLE),
            ("hybrid_rrf", _hybrid_lsh_ivf_oracle()),
        )
    ]
    return " UNION ALL ".join(parts)


ANN_MATRIX_ORACLE = _ann_matrix_oracle()

# --------------------------------------------------------------------------
# Multi-touch attribution — linear and time-decay credit per channel
# --------------------------------------------------------------------------

_ATTR_WINDOW_DAYS = 7
_ATTR_HALFLIFE_DAYS = 3.5


def purchase_attribution_mta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution over the event stream: every purchase
    distributes one unit of conversion credit across the user's
    preceding touches (non-purchase events) inside a
    ``_ATTR_WINDOW_DAYS``-day lookback — LINEAR (equal split) and
    TIME-DECAY (half-life ``_ATTR_HALFLIFE_DAYS`` days, the standard
    marketing-analytics pair) — answering "which channels actually drive
    purchases" without last-click bias.

    Scale shape: one keyed self-join on user_id with the window
    predicate (touch volume bounded by the lookback, the same
    interval-join shape as the streaming attribution family); two
    aggregations — per-purchase normalizers, then per-channel credit.
    Exactness: the linear share is a ratio of integers; decay weights
    are the one transcendental (POWER, ROUND(12) per touch per policy);
    every credit sum is ROUND(12) → DECIMAL(28,12) before adding, so
    aggregation order cannot drift."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    touches = events.where(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("tu"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("tts"),
    )
    win_us = _ATTR_WINDOW_DAYS * 86_400 * 1_000_000
    pairs = purchases.join(
        touches,
        (F.col("pu") == F.col("tu"))
        & (F.col("tts") < F.col("pts"))
        & (F.expr(f"unix_micros(pts) - unix_micros(tts) <= {win_us}")),
    ).select(
        "purchase_id",
        "channel",
        F.expr(
            f"ROUND(POWER(CAST(0.5 AS DOUBLE),"
            f" CAST(unix_micros(pts) - unix_micros(tts) AS DOUBLE)"
            f" / CAST({int(_ATTR_HALFLIFE_DAYS * 86_400 * 1_000_000)}"
            " AS DOUBLE)), 12)"
        ).alias("w"),
    )
    norms = pairs.groupBy("purchase_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.expr(
            "CAST(SUM(CAST(w AS DECIMAL(14,12))) AS DECIMAL(38,12))"
        ).alias("w_sum"),
    )
    credited = pairs.join(norms, "purchase_id")
    return (
        credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.countDistinct("purchase_id").cast("bigint").alias(
                "n_purchases_touched"
            ),
            F.expr(
                "ROUND(CAST(SUM(CAST(ROUND(CAST(1 AS DOUBLE)"
                " / CAST(n_touches AS DOUBLE), 12) AS DECIMAL(28,12)))"
                " AS DOUBLE), 6)"
            ).alias("linear_credit"),
            F.expr(
                "ROUND(CAST(SUM(CAST(ROUND(w / CAST(w_sum AS DOUBLE), 12)"
                " AS DECIMAL(28,12))) AS DOUBLE), 6)"
            ).alias("decay_credit"),
        )
    )


PURCHASE_MTA_ORACLE = f"""
WITH purchases AS (
  SELECT user_id AS pu, event_id AS purchase_id, ts AS pts
  FROM events WHERE event_type = 'purchase'
), touches AS (
  SELECT user_id AS tu, event_type AS channel, ts AS tts
  FROM events WHERE event_type <> 'purchase'
), pairs AS (
  SELECT p.purchase_id, t.channel,
         ROUND(POWER(CAST(0.5 AS DOUBLE),
               CAST(epoch_us(p.pts) - epoch_us(t.tts) AS DOUBLE)
               / CAST({int(_ATTR_HALFLIFE_DAYS * 86_400 * 1_000_000)}
                 AS DOUBLE)), 12) AS w
  FROM purchases p JOIN touches t
    ON p.pu = t.tu AND t.tts < p.pts
   AND epoch_us(p.pts) - epoch_us(t.tts) <= {_ATTR_WINDOW_DAYS * 86_400 * 1_000_000}
), norms AS (
  SELECT purchase_id, CAST(COUNT(*) AS BIGINT) AS n_touches,
         CAST(SUM(CAST(w AS DECIMAL(14,12))) AS DECIMAL(38,12)) AS w_sum
  FROM pairs GROUP BY purchase_id
)
SELECT p.channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(COUNT(DISTINCT p.purchase_id) AS BIGINT) AS n_purchases_touched,
       ROUND(CAST(SUM(CAST(ROUND(CAST(1 AS DOUBLE)
             / CAST(n.n_touches AS DOUBLE), 12) AS DECIMAL(28,12)))
             AS DOUBLE), 6) AS linear_credit,
       ROUND(CAST(SUM(CAST(ROUND(p.w / CAST(n.w_sum AS DOUBLE), 12)
             AS DECIMAL(28,12))) AS DOUBLE), 6) AS decay_credit
FROM pairs p JOIN norms n ON p.purchase_id = n.purchase_id
GROUP BY p.channel
"""

# --------------------------------------------------------------------------
# Reconciliation audit — header total vs line-item roll-up
# --------------------------------------------------------------------------

_RECON_TOL_CENTS = 100  # flag mismatches beyond 1.00


def order_reconciliation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Financial reconciliation: roll every order's line items up as
    ``Σ extendedprice·(1−discount)·(1+tax)`` and compare against the
    header's ``o_totalprice`` — the header-vs-detail consistency audit
    every finance pipeline runs nightly, reported as a per-status
    summary (match rate, worst absolute gap, total absolute drift).

    Exactness: all money stays integer — extendedprice in cents,
    discount/tax in exact percent points, so each line contributes
    ``cents·(100−d)·(100+t)`` scaled by 10⁴, summed in DECIMAL(38,0),
    and the comparison rounds the roll-up to cents by half-up integer
    division.  One join + two aggregations, shuffles keyed on order
    key and status."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100"
            " AS DECIMAL(19,0))"
        ).alias("cents"),
        F.expr(
            "CAST(CAST(l_discount AS DECIMAL(8,2)) * 100 AS DECIMAL(19,0))"
        ).alias("d_pct"),
        F.expr(
            "CAST(CAST(l_tax AS DECIMAL(8,2)) * 100 AS DECIMAL(19,0))"
        ).alias("t_pct"),
    )
    rolled = li.groupBy("l_orderkey").agg(
        F.expr(
            "CAST(SUM(cents * (100 - d_pct) * (100 + t_pct))"
            " AS DECIMAL(38,0))"
        ).alias("scaled"),  # cents x 10^4
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    ).select(
        "l_orderkey",
        "n_lines",
        F.expr(
            "CAST((2 * scaled + 10000) DIV 20000 AS DECIMAL(19,0))"
        ).alias("rollup_cents"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0))"
        ).alias("header_cents"),
    )
    joined = orders.join(
        rolled, orders.o_orderkey == rolled.l_orderkey, "left"
    ).select(
        "o_orderstatus",
        F.expr("n_lines IS NULL").alias("no_lines"),
        F.expr(
            "CAST(ABS(header_cents - COALESCE(rollup_cents, 0))"
            " AS DECIMAL(19,0))"
        ).alias("gap_cents"),
    )
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.expr(
                "CAST(SUM(CASE WHEN no_lines THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_no_lines"),
            F.expr(
                f"CAST(SUM(CASE WHEN NOT no_lines AND gap_cents <= "
                f"{_RECON_TOL_CENTS} THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_reconciled"),
            F.expr("CAST(MAX(gap_cents) AS BIGINT)").alias("worst_gap_cents"),
            F.expr(
                "CAST(CAST(SUM(gap_cents) AS DECIMAL(38,0)) AS DOUBLE)"
                " / CAST(100 AS DOUBLE)"
            ).alias("total_abs_drift"),
        )
        .select(
            "o_orderstatus",
            "n_orders",
            "n_no_lines",
            "n_reconciled",
            F.expr(
                "ROUND(CAST(n_reconciled AS DOUBLE)"
                " / CAST(n_orders AS DOUBLE), 6)"
            ).alias("match_rate"),
            "worst_gap_cents",
            "total_abs_drift",
        )
    )


RECONCILIATION_ORACLE = f"""
WITH li AS (
  SELECT l_orderkey,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
              AS DECIMAL(19,0)) AS cents,
         CAST(CAST(l_discount AS DECIMAL(8,2)) * 100 AS DECIMAL(19,0)) AS d_pct,
         CAST(CAST(l_tax AS DECIMAL(8,2)) * 100 AS DECIMAL(19,0)) AS t_pct
  FROM lineitem
), rolled AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(CAST(2 * CAST(SUM(CAST(cents AS HUGEINT)
              * (100 - CAST(d_pct AS HUGEINT))
              * (100 + CAST(t_pct AS HUGEINT))) AS HUGEINT) + 10000
              AS HUGEINT) // 20000 AS DECIMAL(19,0)) AS rollup_cents
  FROM li GROUP BY l_orderkey
), joined AS (
  SELECT o.o_orderstatus,
         r.n_lines IS NULL AS no_lines,
         CAST(ABS(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
              AS DECIMAL(19,0)) - COALESCE(r.rollup_cents, 0))
              AS DECIMAL(19,0)) AS gap_cents
  FROM orders o LEFT JOIN rolled r ON o.o_orderkey = r.l_orderkey
)
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN no_lines THEN 1 ELSE 0 END) AS BIGINT) AS n_no_lines,
       CAST(SUM(CASE WHEN NOT no_lines AND gap_cents <= {_RECON_TOL_CENTS}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_reconciled,
       ROUND(CAST(SUM(CASE WHEN NOT no_lines AND gap_cents <= {_RECON_TOL_CENTS}
             THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS match_rate,
       CAST(MAX(gap_cents) AS BIGINT) AS worst_gap_cents,
       CAST(CAST(SUM(gap_cents) AS DECIMAL(38,0)) AS DOUBLE)
         / CAST(100 AS DOUBLE) AS total_abs_drift
FROM joined GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# Duplicate-payment screen — same customer, same amount, close in time
# --------------------------------------------------------------------------

_DUP_WINDOW_DAYS = 30


def duplicate_payment_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic AP fraud/error screen: pairs of orders by the SAME
    customer for the EXACT same amount within ``_DUP_WINDOW_DAYS`` days
    — the double-billing candidates an auditor reviews first.

    Scale shape: the self-join is an EQUI-join on (customer, amount) —
    the high-selectivity composite key that makes this screen cheap at
    any scale (only true duplicates collide) — with the time window as
    a residual predicate; output is the per-customer pair summary,
    capped deterministically to the top 20 customers by pair count.
    All integers (cents, day diffs); no floats anywhere."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0))"
        ).alias("cents"),
        F.expr("CAST(o_orderdate AS DATE)").alias("od"),
    )
    a = orders.select(
        F.col("o_custkey").alias("ck"), F.col("cents").alias("amt"),
        F.col("o_orderkey").alias("ka"), F.col("od").alias("da"),
    )
    b = orders.select(
        F.col("o_custkey").alias("ck"), F.col("cents").alias("amt"),
        F.col("o_orderkey").alias("kb"), F.col("od").alias("db"),
    )
    pairs = a.join(b, ["ck", "amt"]).where(
        (F.col("ka") < F.col("kb"))
        & (F.expr(f"ABS(datediff(db, da)) <= {_DUP_WINDOW_DAYS}"))
    )
    return (
        pairs.groupBy("ck")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.countDistinct("amt").cast("bigint").alias("n_amounts"),
            F.expr("CAST(MIN(ABS(datediff(db, da))) AS BIGINT)").alias(
                "closest_days"
            ),
            F.expr(
                "CAST(CAST(MAX(amt) AS BIGINT) AS DOUBLE)"
                " / CAST(100 AS DOUBLE)"
            ).alias("largest_amount"),
        )
        .select(
            F.col("ck").cast("bigint").alias("custkey"),
            "n_pairs",
            "n_amounts",
            "closest_days",
            "largest_amount",
        )
        .orderBy(F.col("n_pairs").desc(), F.col("custkey").asc())
        .limit(20)
    )


DUPLICATE_PAYMENT_ORACLE = f"""
WITH o AS (
  SELECT o_custkey AS ck, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0))
           AS amt,
         CAST(o_orderdate AS DATE) AS od
  FROM orders
), pairs AS (
  SELECT a.ck, a.amt, ABS(datediff('day', a.od, b.od)) AS dd
  FROM o a JOIN o b
    ON a.ck = b.ck AND a.amt = b.amt AND a.o_orderkey < b.o_orderkey
  WHERE ABS(datediff('day', a.od, b.od)) <= {_DUP_WINDOW_DAYS}
)
SELECT CAST(ck AS BIGINT) AS custkey,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT amt) AS BIGINT) AS n_amounts,
       CAST(MIN(dd) AS BIGINT) AS closest_days,
       CAST(CAST(MAX(amt) AS BIGINT) AS DOUBLE) / CAST(100 AS DOUBLE)
         AS largest_amount
FROM pairs GROUP BY ck
ORDER BY n_pairs DESC, custkey ASC
LIMIT 20
"""
