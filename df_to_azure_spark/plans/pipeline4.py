"""Round-7 closing wave: interval algebra (slice-clipped sweep-line
session concurrency), grouped exact OLS trend fitting, and the
deterministic training-shard manifest backing ``operators.shards``.

Every query is paired with a DuckDB oracle reproducing the result
bit-for-bit (same cross-engine policy as ``pipeline2``/``pipeline3``:
exact integer/decimal sums first, one ROUND()ed double division last).

Reference anchor: the reference pipeline (``/root/reference/df_to_azure``)
moves tables; these are the analytics a user of that pipeline runs AFTER
landing — the brief's "query and data-processing capabilities" surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from df_to_azure_spark.sources import load_table


# --------------------------------------------------------------------------
# Slice-clipped sweep-line: peak concurrent sessions per hour
# --------------------------------------------------------------------------


def session_concurrency_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of simultaneously-active user sessions per hour, via
    the classic sweep-line (+1 at start, −1 at end, running max) — made
    scale-safe by clipping every session interval to hour slices first.

    The naive sweep line needs ONE globally-ordered prefix sum — a
    single-partition window, the exact scale-killer the plan-lint bans.
    Clipping fixes it: each session [s, e] is exploded into per-hour
    segments [max(s, h), min(e, h+1h)] so a session active at an hour
    boundary re-arrives as a +1 at the hour start.  The count at any
    instant is then computable entirely WITHIN its hour slice, so the
    sweep window partitions by hour — bounded work per partition, and at
    100 TB the slice just narrows (minute, second) without changing the
    plan.  Ties process arrivals before departures (delta DESC), i.e.
    closed intervals: sessions touching at an instant overlap; equal
    deltas commute so the running max is order-independent.

    Output per hour: segments active, peak concurrency, exact busy
    microseconds (sum of clipped segment lengths).
    """
    from df_to_azure_spark.streaming.events import sessionize

    events = load_table(spark, sf_dir, "events")
    seg = (
        sessionize(events, gap_minutes=30)
        .select(
            "user_id",
            "session_seq",
            F.explode(
                F.sequence(
                    F.date_trunc("hour", F.col("session_start")),
                    F.date_trunc("hour", F.col("session_end")),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("hour"),
            "session_start",
            "session_end",
        )
        .select(
            "hour",
            "user_id",
            "session_seq",
            F.greatest("session_start", F.col("hour")).alias("seg_start"),
            F.least(
                "session_end", F.col("hour") + F.expr("INTERVAL 1 HOUR")
            ).alias("seg_end"),
        )
    )
    bounds = seg.select(
        "hour", F.col("seg_start").alias("ts"), F.lit(1).alias("delta")
    ).unionAll(
        seg.select("hour", F.col("seg_end").alias("ts"), F.lit(-1).alias("delta"))
    )
    sweep = W.partitionBy("hour").orderBy(
        F.asc("ts"), F.desc("delta")
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    peaks = bounds.withColumn("running", F.sum("delta").over(sweep)).groupBy(
        "hour"
    ).agg(F.max("running").cast("bigint").alias("peak_concurrency"))
    stats = seg.groupBy("hour").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum(
            F.unix_micros("seg_end") - F.unix_micros("seg_start")
        ).cast("bigint").alias("busy_us"),
    )
    return stats.join(peaks, "hour").select(
        "hour", "n_segments", "peak_concurrency", "busy_us"
    )


# DuckDB twin: identical sessionize CTE as SESSIONIZE_ORACLE, then the
# same clip → boundary → per-hour sweep.  generate_series is inclusive on
# both ends, matching Spark's sequence().
SESSION_CONCURRENCY_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
              > 1800000000 THEN 1 ELSE 0 END AS new_session
  FROM events
), with_ids AS (
  SELECT user_id, ts,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
), sessions AS (
  SELECT user_id, session_seq,
         MIN(ts) AS session_start, MAX(ts) AS session_end
  FROM with_ids GROUP BY user_id, session_seq
), seg AS (
  SELECT hour, user_id, session_seq,
         greatest(session_start, hour) AS seg_start,
         least(session_end, hour + INTERVAL 1 HOUR) AS seg_end
  FROM (
    SELECT user_id, session_seq, session_start, session_end,
           UNNEST(generate_series(date_trunc('hour', session_start),
                                  date_trunc('hour', session_end),
                                  INTERVAL 1 HOUR)) AS hour
    FROM sessions
  )
), bounds AS (
  SELECT hour, seg_start AS ts, 1 AS delta FROM seg
  UNION ALL
  SELECT hour, seg_end AS ts, -1 AS delta FROM seg
), swept AS (
  SELECT hour,
         SUM(delta) OVER (PARTITION BY hour ORDER BY ts, delta DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
  FROM bounds
), peaks AS (
  SELECT hour, CAST(MAX(running) AS BIGINT) AS peak_concurrency
  FROM swept GROUP BY hour
), stats AS (
  SELECT hour, CAST(COUNT(*) AS BIGINT) AS n_segments,
         CAST(SUM(epoch_us(seg_end) - epoch_us(seg_start)) AS BIGINT) AS busy_us
  FROM seg GROUP BY hour
)
SELECT stats.hour, n_segments, peak_concurrency, busy_us
FROM stats JOIN peaks USING (hour)
"""


# --------------------------------------------------------------------------
# Grouped exact OLS: monthly revenue trend slope per nation
# --------------------------------------------------------------------------


def nation_revenue_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation least-squares trend of monthly order revenue — the
    closed-form simple regression ``slope = (nΣxy − ΣxΣy) /
    (nΣx² − (Σx)²)`` computed from EXACT sums (x an integer month
    index, y an exact decimal monthly sum), with the two divisions the
    only double ops, ROUND(6)ed.  Distinct shape from
    ``quantity_price_correlation`` (one global Pearson r): this is a
    grouped model fit — one regression per key, two shuffles total
    (month agg → nation agg), nation dim broadcast.  At 100 TB the
    monthly pre-agg shrinks the data to |nations|×|months| rows before
    the moment sums, so the fit itself is metadata-sized.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    monthly = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name",
            F.expr(
                "CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS BIGINT)"
            ).alias("x"),
        )
        .agg(
            F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").alias("y")
        )
    )
    moments = monthly.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.expr("CAST(SUM(CAST(x AS BIGINT) * CAST(x AS BIGINT)) AS BIGINT)").alias("sxx"),
        F.expr("CAST(SUM(CAST(y AS DECIMAL(24,2))) AS DECIMAL(30,2))").alias("sy"),
        F.expr(
            "CAST(SUM(CAST(x AS DECIMAL(10,0)) * CAST(y AS DECIMAL(24,2))) AS DECIMAL(38,2))"
        ).alias("sxy"),
    )
    return moments.select(
        "n_name",
        "n",
        F.expr(
            "ROUND(CAST(n * sxy - sx * sy AS DOUBLE)"
            " / CAST(n * sxx - sx * sx AS DOUBLE), 6)"
        ).alias("slope"),
        F.expr(
            "ROUND((CAST(sy AS DOUBLE)"
            " - (CAST(n * sxy - sx * sy AS DOUBLE)"
            "    / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))"
            " / CAST(n AS DOUBLE), 6)"
        ).alias("intercept"),
    )


NATION_OLS_ORACLE = """
WITH monthly AS (
  SELECT n_name,
         CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS BIGINT) AS x,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, x
), moments AS (
  SELECT n_name,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(CAST(x AS BIGINT) * CAST(x AS BIGINT)) AS BIGINT) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(24,2))) AS DECIMAL(30,2)) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(10,0)) * CAST(y AS DECIMAL(24,2))) AS DECIMAL(38,2)) AS sxy
  FROM monthly GROUP BY n_name
)
SELECT n_name, n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
       ROUND((CAST(sy AS DOUBLE)
         - (CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE), 6) AS intercept
FROM moments
"""


# --------------------------------------------------------------------------
# Deterministic training-shard manifest
# --------------------------------------------------------------------------

_N_SHARDS = 16


def doc_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest of the deterministic training-shard layout produced by
    ``operators.shards.write_training_shards``: every document lands in
    ``first16bits(md5(doc_id)) % 16`` and is ordered within its shard by
    the full md5 (an engine-portable global shuffle — the training-order
    randomization every LLM data pipeline performs before export, with
    no RNG, reproducible on any engine).  Per shard: row count, exact
    char total, and the first/last ordering hash as the shard's
    manifest fingerprint.  One hash-agg, no window, no collect."""
    from df_to_azure_spark.functions.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            hash_bucket("doc_id", _N_SHARDS).alias("shard_id"),
            F.md5(F.col("doc_id").cast("string")).alias("h"),
            "n_chars",
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("h").alias("first_hash"),
            F.max("h").alias("last_hash"),
        )
    )


DOC_SHARD_MANIFEST_ORACLE = f"""
SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % {_N_SHARDS}
         AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(md5(CAST(doc_id AS VARCHAR))) AS first_hash,
       MAX(md5(CAST(doc_id AS VARCHAR))) AS last_hash
FROM documents
GROUP BY shard_id
"""


# --------------------------------------------------------------------------
# Exact trailing-window distinct actives (bounded-explode trick)
# --------------------------------------------------------------------------


def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-day distinct active users per day (WAU), plus
    same-day actives and the DAU/WAU stickiness ratio.

    Sliding-window COUNT DISTINCT is not window-expressible (distinct
    state can't be merged across frame slides); the scalable exact
    formulation explodes each (user, day) observation into the ≤7
    window-end days it contributes to, then distinct-counts per day —
    a bounded ×7 row multiplier instead of a global ordered state, so
    it shuffles on (user, day) keys only and survives any scale.  Days
    past the data's edge are trimmed by joining back to observed days.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    days = ud.select("d").distinct()
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias("day"),
    ).distinct()
    wau = contrib.join(days, contrib.day == days.d).groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("active_7d")
    )
    dau = ud.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("active_1d")
    )
    # date → NTZ timestamp at output: DuckDB DATE materializes as a
    # pandas datetime64 while Spark DATE stays datetime.date — the one
    # dtype the strict gate can't reconcile (same policy as the
    # retention queries' week columns)
    return (
        dau.join(wau, "day")
        .select(
            F.col("day").cast("timestamp_ntz").alias("day"),
            "active_1d",
            "active_7d",
            F.expr(
                "ROUND(CAST(active_1d AS DOUBLE) / CAST(active_7d AS DOUBLE), 6)"
            ).alias("stickiness"),
        )
    )


ROLLING_7D_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), days AS (
  SELECT DISTINCT d FROM ud
), contrib AS (
  SELECT DISTINCT user_id, CAST(day AS DATE) AS day FROM (
    SELECT user_id,
           UNNEST(generate_series(CAST(d AS TIMESTAMP),
                                  CAST(d + 6 AS TIMESTAMP),
                                  INTERVAL 1 DAY)) AS day
    FROM ud
  )
), wau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS active_7d
  FROM contrib JOIN days ON contrib.day = days.d
  GROUP BY day
), dau AS (
  SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS active_1d
  FROM ud GROUP BY d
)
SELECT CAST(day AS TIMESTAMP) AS day, active_1d, active_7d,
       ROUND(CAST(active_1d AS DOUBLE) / CAST(active_7d AS DOUBLE), 6)
         AS stickiness
FROM dau JOIN wau USING (day)
"""


# --------------------------------------------------------------------------
# Day-over-day active-set overlap / churn
# --------------------------------------------------------------------------


def dau_overlap_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day audience movement: for each day with an observed
    previous day, how many users were retained from yesterday, how many
    are new, how many churned, and the Jaccard overlap of the two
    active sets.  One full outer join of the distinct (user, day) frame
    against its day-shifted self — both sides shuffle on the natural
    (user, day) key; counts are exact integers, one ROUND(6)ed division.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    days = ud.select("d").distinct()
    prev = ud.select("user_id", F.date_add(F.col("d"), 1).alias("d"))
    f = ud.withColumn("in_cur", F.lit(1)).join(
        prev.withColumn("in_prev", F.lit(1)), ["user_id", "d"], "full_outer"
    )
    both_days = days.alias("a").join(
        days.select(F.date_add(F.col("d"), 1).alias("d")).alias("b"), "d"
    )
    # date → NTZ timestamp at output (same strict-gate dtype policy as
    # rolling_7d_active_users)
    return (
        f.join(both_days, "d")
        .groupBy(F.col("d").cast("timestamp_ntz").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("in_cur").isNotNull() & F.col("in_prev").isNotNull(), 1).otherwise(0)
            ).cast("bigint").alias("retained"),
            F.sum(
                F.when(F.col("in_cur").isNotNull() & F.col("in_prev").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("new_users"),
            F.sum(
                F.when(F.col("in_cur").isNull() & F.col("in_prev").isNotNull(), 1).otherwise(0)
            ).cast("bigint").alias("churned"),
        )
        .withColumn(
            "jaccard",
            F.expr(
                "ROUND(CAST(retained AS DOUBLE)"
                " / CAST(retained + new_users + churned AS DOUBLE), 6)"
            ),
        )
    )


DAU_OVERLAP_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), days AS (
  SELECT DISTINCT d FROM ud
), prev AS (
  SELECT user_id, d + 1 AS d FROM ud
), f AS (
  SELECT COALESCE(ud.user_id, prev.user_id) AS user_id,
         COALESCE(ud.d, prev.d) AS d,
         ud.user_id IS NOT NULL AS in_cur,
         prev.user_id IS NOT NULL AS in_prev
  FROM ud FULL OUTER JOIN prev USING (user_id, d)
), both_days AS (
  SELECT a.d FROM days a JOIN (SELECT d + 1 AS d FROM days) b USING (d)
)
SELECT CAST(d AS TIMESTAMP) AS day,
       CAST(SUM(CASE WHEN in_cur AND in_prev THEN 1 ELSE 0 END) AS BIGINT) AS retained,
       CAST(SUM(CASE WHEN in_cur AND NOT in_prev THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
       CAST(SUM(CASE WHEN NOT in_cur AND in_prev THEN 1 ELSE 0 END) AS BIGINT) AS churned,
       ROUND(CAST(SUM(CASE WHEN in_cur AND in_prev THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS jaccard
FROM f JOIN both_days USING (d)
GROUP BY d
"""


# --------------------------------------------------------------------------
# Exact two-sample Kolmogorov–Smirnov matrix (integer arithmetic)
# --------------------------------------------------------------------------


def source_ks_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D statistic for every pair of
    document sources over the length (``n_chars``) distribution — the
    exact nonparametric drift test complementing the binned
    ``source_js_divergence`` screen.

    D = max over the value grid of |ECDF_a − ECDF_b|.  The naive form
    needs a globally ordered merge of both samples; the scalable exact
    form evaluates both ECDFs on the shared grid of DISTINCT observed
    values — bounded by the value domain, not the row count — via a
    per-source cumulative window (partitioned by source, never global).
    All comparisons stay in integer space (|cum_a·n_b − cum_b·n_a| as
    DECIMAL(38,0) — overflow-safe at 1e10-row samples); the single
    double division happens at output, ROUND(6)ed.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    grid = docs.select(F.col("n_chars").alias("v")).distinct()
    full = (
        totals.select("source")
        .crossJoin(F.broadcast(grid))
        .join(counts, ["source", "v"], "left")
        .fillna(0, ["c"])
    )
    cum = full.withColumn(
        "cum",
        F.sum("c").over(
            W.partitionBy("source").orderBy("v").rowsBetween(
                W.unboundedPreceding, W.currentRow
            )
        ),
    ).select("source", "v", "cum")
    a = cum.alias("a").join(F.broadcast(totals).alias("na"), "source").select(
        F.col("source").alias("source_a"), "v",
        F.col("cum").alias("cum_a"), F.col("n").alias("n_a"),
    )
    b = cum.alias("b").join(F.broadcast(totals).alias("nb"), "source").select(
        F.col("source").alias("source_b"), F.col("v").alias("vb"),
        F.col("cum").alias("cum_b"), F.col("n").alias("n_b"),
    )
    pairs = a.join(
        b, (F.col("v") == F.col("vb")) & (F.col("source_a") < F.col("source_b"))
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.max(
                F.expr(
                    "ABS(CAST(cum_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0))"
                    " - CAST(cum_b AS DECIMAL(19,0)) * CAST(n_a AS DECIMAL(19,0)))"
                )
            ).alias("d_num"),
            F.max("n_a").cast("bigint").alias("n_a"),
            F.max("n_b").cast("bigint").alias("n_b"),
        )
        .select(
            "source_a", "source_b", "n_a", "n_b",
            F.expr(
                "ROUND(CAST(d_num AS DOUBLE)"
                " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)"
            ).alias("ks_d"),
        )
    )


SOURCE_KS_ORACLE = """
WITH counts AS (
  SELECT source, n_chars AS v, COUNT(*) AS c
  FROM documents GROUP BY source, n_chars
), totals AS (
  SELECT source, COUNT(*) AS n FROM documents GROUP BY source
), grid AS (
  SELECT DISTINCT n_chars AS v FROM documents
), full_grid AS (
  SELECT t.source, g.v, COALESCE(c.c, 0) AS c
  FROM (SELECT source FROM totals) t
  CROSS JOIN grid g
  LEFT JOIN counts c ON c.source = t.source AND c.v = g.v
), cum AS (
  SELECT source, v,
         SUM(c) OVER (PARTITION BY source ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM full_grid
), joined AS (
  SELECT a.source AS source_a, b.source AS source_b, a.v,
         a.cum AS cum_a, b.cum AS cum_b, ta.n AS n_a, tb.n AS n_b
  FROM cum a
  JOIN cum b ON a.v = b.v AND a.source < b.source
  JOIN totals ta ON ta.source = a.source
  JOIN totals tb ON tb.source = b.source
)
SELECT source_a, source_b,
       CAST(MAX(n_a) AS BIGINT) AS n_a, CAST(MAX(n_b) AS BIGINT) AS n_b,
       ROUND(CAST(MAX(ABS(CAST(cum_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0))
                          - CAST(cum_b AS DECIMAL(19,0)) * CAST(n_a AS DECIMAL(19,0)))) AS DOUBLE)
             / (CAST(MAX(n_a) AS DOUBLE) * CAST(MAX(n_b) AS DOUBLE)), 6) AS ks_d
FROM joined
GROUP BY source_a, source_b
"""
