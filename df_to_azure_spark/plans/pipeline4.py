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
    return hourly_concurrency(sessionize(events, gap_minutes=30))


def hourly_concurrency(sessions: DataFrame) -> DataFrame:
    """The slice-clipped sweep over any (session_start, session_end)
    interval frame — shared by the batch query above and the streaming
    equivalence diff (``streaming.stateful.stream_concurrency_diff``),
    which feeds it sessions emitted by the stateful sessionizer."""
    seg = (
        sessions
        .select(
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
            F.greatest("session_start", F.col("hour")).alias("seg_start"),
            F.least(
                "session_end", F.col("hour") + F.expr("INTERVAL 1 HOUR")
            ).alias("seg_end"),
        )
    )
    # pin the clipped segments: three consumers (both sweep-line union
    # legs + the per-hour stats agg) would otherwise each re-run the
    # sessionize window chain upstream; the pinned frame is 3 narrow
    # columns over rows every consumer already shuffles by hour
    if not seg.isStreaming:
        seg = seg.localCheckpoint()
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


# --------------------------------------------------------------------------
# Gini concentration per nation (grouped two-phase rank)
# --------------------------------------------------------------------------


def customer_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration within each
    nation — the inequality measure over ordered customers:
    ``G = 2·Σ(i·yᵢ) / (n·Σy) − (n+1)/n`` with customers ranked by total
    revenue ascending (custkey tie-break; tied blocks are
    permutation-invariant in the Σ i·yᵢ term).

    The global ordering problem is solved by the grouped two-phase rank
    (``functions.distrank`` — range repartition + bounded offset
    collect), so no single-partition window exists anywhere; the moment
    Σ i·yᵢ is an exact DECIMAL product sum and the two divisions happen
    at output, ROUND(6)ed.  Covers customers with ≥1 order (inner join
    semantics, both engines)."""
    from df_to_azure_spark.functions.distrank import two_phase_rank

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").alias("rev"))
        .join(customer, F.col("o_custkey") == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("n_name", "o_custkey", F.expr("CAST(rev AS DECIMAL(24,2))").alias("rev"))
    )
    ranked = two_phase_rank(
        rev,
        order_by=[("rev", "asc"), ("o_custkey", "asc")],
        group_cols=["n_name"],
    )
    return (
        ranked.groupBy("n_name")
        .agg(
            F.max("__grp_n").cast("bigint").alias("n_customers"),
            F.expr(
                "CAST(SUM(CAST(__rn AS DECIMAL(19,0)) * rev) AS DECIMAL(38,2))"
            ).alias("iy"),
            F.expr("CAST(SUM(rev) AS DECIMAL(38,2))").alias("total_rev"),
        )
        .select(
            "n_name",
            "n_customers",
            F.expr("CAST(total_rev AS DOUBLE)").alias("total_rev"),
            F.expr(
                "ROUND(2.0 * CAST(iy AS DOUBLE)"
                " / (CAST(n_customers AS DOUBLE) * CAST(total_rev AS DOUBLE))"
                " - (CAST(n_customers AS DOUBLE) + 1.0)"
                " / CAST(n_customers AS DOUBLE), 6)"
            ).alias("gini"),
        )
    )


CUSTOMER_GINI_ORACLE = """
WITH rev AS (
  SELECT n_name, o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2)) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, o_custkey
), ranked AS (
  SELECT n_name, rev,
         row_number() OVER (PARTITION BY n_name ORDER BY rev, o_custkey) AS rn
  FROM rev
), agg AS (
  SELECT n_name,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CAST(rn AS DECIMAL(19,0)) * rev) AS DECIMAL(38,2)) AS iy,
         CAST(SUM(rev) AS DECIMAL(38,2)) AS total_rev
  FROM ranked GROUP BY n_name
)
SELECT n_name, n_customers,
       CAST(total_rev AS DOUBLE) AS total_rev,
       ROUND(2.0 * CAST(iy AS DOUBLE)
         / (CAST(n_customers AS DOUBLE) * CAST(total_rev AS DOUBLE))
         - (CAST(n_customers AS DOUBLE) + 1.0) / CAST(n_customers AS DOUBLE), 6)
         AS gini
FROM agg
"""


# --------------------------------------------------------------------------
# CUSUM changepoint over the daily revenue series
# --------------------------------------------------------------------------


def revenue_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most likely level-shift point in the daily order-revenue series
    by the CUSUM statistic: the day t maximizing |Σ_{i≤t}(dᵢ − mean)|.

    Exactness + scale: the mean never materializes — the statistic is
    rescaled to ``S_t = n·cum_t − t·total`` (all exact integers/decimals;
    S_t = n·Σ_{i≤t}(dᵢ − mean)).  The daily pre-agg collapses the data
    to the bounded day domain, and the running sum cum_t comes from the
    two-phase rank's offset pass (``sum_col``) — no global window.  The
    argmax tie-breaks to the earliest day via a 1-row max broadcast +
    min-day filter.  Output: changepoint day, series length, and the
    CUSUM peak in revenue units (|S|/n), the only double op."""
    from df_to_azure_spark.functions.distrank import two_phase_rank

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.expr("CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP_NTZ)").alias("day")
    ).agg(F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").alias("d_rev"))
    ranked = two_phase_rank(
        daily,
        order_by=[("day", "asc")],
        sum_col="d_rev",
    )
    s = ranked.select(
        "day",
        "__grp_n",
        F.expr(
            "ABS(CAST(__grp_n AS DECIMAL(19,0)) * CAST(__cum AS DECIMAL(30,2))"
            " - CAST(__rn AS DECIMAL(19,0)) * CAST(__grp_sum AS DECIMAL(30,2)))"
        ).alias("abs_s"),
    )
    mx = s.agg(F.max("abs_s").alias("mx"))
    return (
        s.join(F.broadcast(mx), s.abs_s == mx.mx)
        .groupBy()
        .agg(
            F.min("day").alias("changepoint_day"),
            F.max("__grp_n").cast("bigint").alias("n_days"),
            F.expr(
                "ROUND(CAST(MAX(abs_s) AS DOUBLE) / CAST(MAX(__grp_n) AS DOUBLE), 6)"
            ).alias("cusum_peak"),
        )
    )


REVENUE_CUSUM_ORACLE = """
WITH daily AS (
  SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS d_rev
  FROM orders GROUP BY 1
), ranked AS (
  SELECT day,
         row_number() OVER (ORDER BY day) AS rn,
         SUM(d_rev) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         COUNT(*) OVER () AS n,
         SUM(d_rev) OVER () AS total
  FROM daily
), s AS (
  SELECT day, n,
         ABS(CAST(n AS DECIMAL(19,0)) * CAST(cum AS DECIMAL(30,2))
             - CAST(rn AS DECIMAL(19,0)) * CAST(total AS DECIMAL(30,2))) AS abs_s
  FROM ranked
)
SELECT MIN(day) AS changepoint_day,
       CAST(MAX(n) AS BIGINT) AS n_days,
       ROUND(CAST(MAX(abs_s) AS DOUBLE) / CAST(MAX(n) AS DOUBLE), 6) AS cusum_peak
FROM s
WHERE abs_s = (SELECT MAX(abs_s) FROM s)
"""


# --------------------------------------------------------------------------
# Benford first-digit conformance
# --------------------------------------------------------------------------

# log10(1 + 1/d) as shared double literals: computing log10 in each
# engine would tie exactness to two libm implementations; literals make
# the per-row double math identical by construction.
_BENFORD = {
    1: "0.3010299956639812", 2: "0.17609125905568124", 3: "0.12493873660829992",
    4: "0.09691001300805642", 5: "0.07918124604762482", 6: "0.06694678963061322",
    7: "0.05799194697768673", 8: "0.05115252244738129", 9: "0.04575749056067514",
}


def totalprice_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs Benford's
    law — the classic bulk data-forgery screen.  The digit is the first
    character of the DECIMAL(18,2) string form (identical formatting in
    both engines for values ≥ 1; TPC-H prices are ≥ 800), counts are
    exact, and each digit row carries its own ROUND(6)ed observed share
    and deviation — per-digit output, so no cross-row double summation
    order exists anywhere.  One scan, one 9-group agg, one 1-row total
    broadcast."""
    case = " ".join(
        f"WHEN digit = {d} THEN CAST({lit} AS DOUBLE)"
        for d, lit in _BENFORD.items()
    )
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.select(
        F.expr(
            "CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING), 1, 1) AS INT)"
        ).alias("digit")
    ).groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    total = digits.agg(F.sum("n_obs").cast("bigint").alias("n_total"))
    return (
        digits.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_obs",
            F.expr(
                "ROUND(CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE), 6)"
            ).alias("obs_share"),
            F.expr(f"CASE {case} END").alias("benford_share"),
            F.expr(
                "ROUND(ABS(CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE)"
                f" - CASE {case} END), 6)"
            ).alias("abs_dev"),
        )
    )


_BENFORD_CASE_SQL = " ".join(
    f"WHEN digit = {d} THEN CAST({lit} AS DOUBLE)" for d, lit in _BENFORD.items()
)

TOTALPRICE_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS INTEGER)
           AS digit,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM orders GROUP BY 1
), total AS (
  SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM digits
)
SELECT digit, n_obs,
       ROUND(CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS obs_share,
       CASE {_BENFORD_CASE_SQL} END AS benford_share,
       ROUND(ABS(CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE)
                 - CASE {_BENFORD_CASE_SQL} END), 6) AS abs_dev
FROM digits CROSS JOIN total
"""


# --------------------------------------------------------------------------
# Directional association rules over the brand basket domain
# --------------------------------------------------------------------------


def brand_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules brand_a → brand_b with the full
    support / confidence / lift triple — the directional step past
    ``part_cooccurrence``'s support-only pairs, computed over the
    bounded brand domain so the rule set is |brands|² regardless of
    data size.

    Plan: distinct (order, brand) baskets → self equi-join on the order
    key (pair expansion bounded by the ≤|brands| basket width) → one
    pair agg; marginals and the basket total are domain-bounded/1-row
    broadcasts.  All counts exact integers; the three ratios are
    ROUND(6) double divisions at output."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .dropDuplicates()
    )
    n_baskets = ob.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_baskets")
    )
    marg = ob.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_brand")
    )
    a = ob.select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, "okey")
        .where(F.col("brand_a") != F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    return (
        pairs.join(
            F.broadcast(marg).withColumnRenamed("brand", "brand_a")
            .withColumnRenamed("n_brand", "n_a"),
            "brand_a",
        )
        .join(
            F.broadcast(marg).withColumnRenamed("brand", "brand_b")
            .withColumnRenamed("n_brand", "n_b"),
            "brand_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            F.expr(
                "ROUND(CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6)"
            ).alias("support"),
            F.expr(
                "ROUND(CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE), 6)"
            ).alias("confidence"),
            F.expr(
                "ROUND(CAST(n_ab AS DOUBLE) * CAST(n_baskets AS DOUBLE)"
                " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)"
            ).alias("lift"),
        )
    )


BRAND_RULES_ORACLE = """
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
), n_baskets AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM ob
), marg AS (
  SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n_brand
  FROM ob GROUP BY p_brand
), pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand <> b.p_brand
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, n_ab,
       ROUND(CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6) AS support,
       ROUND(CAST(n_ab AS DOUBLE) / CAST(ma.n_brand AS DOUBLE), 6) AS confidence,
       ROUND(CAST(n_ab AS DOUBLE) * CAST(n_baskets AS DOUBLE)
             / (CAST(ma.n_brand AS DOUBLE) * CAST(mb.n_brand AS DOUBLE)), 6) AS lift
FROM pairs
JOIN marg ma ON ma.brand = brand_a
JOIN marg mb ON mb.brand = brand_b
CROSS JOIN n_baskets
"""


# --------------------------------------------------------------------------
# Autocorrelation of the daily revenue series (lags 1..7)
# --------------------------------------------------------------------------


def daily_revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation (k = 1..7) of daily order revenue — the
    seasonality screen run before fitting any time-series model.  Pearson
    r between the series and its k-shifted self, from the same exact-sums
    policy as ``quantity_price_correlation``: the daily pre-agg collapses
    to the bounded day domain, a 7-row lag frame explodes each day into
    its lag pairings, the five sufficient sums accumulate as exact
    DECIMALs per lag, and the one double expression per output row ends
    in IEEE-correctly-rounded SQRT, ROUND(6)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') AS BIGINT)").alias("d")
    ).agg(F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2))").alias("rev"))
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    shifted = daily.crossJoin(F.broadcast(lags)).select(
        (F.col("d") + F.col("lag")).alias("d"), "lag", F.col("rev").alias("x")
    )
    pairs = shifted.join(
        daily.select("d", F.col("rev").alias("y")), "d"
    )
    s = pairs.groupBy("lag").agg(
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
    return s.select("lag", "n", F.expr(corr).alias("acf"))


DAILY_ACF_ORACLE = """
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2)) AS rev
  FROM orders GROUP BY 1
), lags AS (
  SELECT CAST(UNNEST(generate_series(1, 7)) AS INTEGER) AS lag
), pairs AS (
  SELECT sh.lag, sh.x, dy.rev AS y
  FROM (SELECT d + lag AS d, lag, rev AS x FROM daily CROSS JOIN lags) sh
  JOIN daily dy ON sh.d = dy.d
), s AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(x * y AS DECIMAL(38,4))) AS sxy,
         SUM(CAST(x * x AS DECIMAL(38,4))) AS sxx,
         SUM(CAST(y * y AS DECIMAL(38,4))) AS syy
  FROM pairs GROUP BY lag
)
SELECT lag, n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS acf
FROM s
"""


# --------------------------------------------------------------------------
# Grouped-agg pandas UDAF: trimmed mean per event type
# --------------------------------------------------------------------------

_TRIM_PCT = 10


def event_value_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% symmetric trimmed mean of event value per event type — the
    fully-distributed exact formulation: a grouped ``two_phase_rank``
    over integer cents gives every row its within-group rank and the
    group size WITHOUT a single-partition window, the positional trim
    is then a plain filter on the rank bounds, and the mean is a
    codegen'd exact-integer SUM with ONE double division at the end.

    Every stage has map-side partials; no group's value set ever
    lands on one worker.  The Arrow GROUPED_AGG ``pandas_udf``
    formulation (``functions.outliers.trimmed_mean_udaf``) computes the
    identical answer and remains the API-surface demo in tests, but it
    has NO partial aggregation — each group's complete value column
    ships to a single Python worker, which is the wrong shape for
    data-sized groups like an event type at 100 TB (round-7 verdict).

    Trimming is positional on the sorted cents; tied values are
    interchangeable (equal cents contribute equally to the kept sum),
    so the ``event_id`` tie-break only serves the total order that
    ``two_phase_rank`` requires — the result is tie-break-invariant
    and matches the oracle's ``row_number() OVER (ORDER BY value)``
    bit-for-bit."""
    from df_to_azure_spark.functions.distrank import two_phase_rank

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("cents"),
    )
    ranked = two_phase_rank(
        ev,
        order_by=[("cents", "asc"), ("event_id", "asc")],
        group_cols=["event_type"],
    )
    k = f"(__grp_n * {_TRIM_PCT}) DIV 100"
    kept = ranked.where(F.expr(f"__rn > {k} AND __rn <= __grp_n - ({k})"))
    return kept.groupBy("event_type").agg(
        F.max("__grp_n").cast("bigint").alias("n"),
        F.expr(
            "ROUND(CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE)"
            " / (CAST(100 AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)), 6)"
        ).alias("trimmed_mean"),
    )


EVENT_TRIMMED_MEAN_ORACLE = f"""
WITH ranked AS (
  SELECT event_type,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
), kept AS (
  SELECT event_type, cents, n
  FROM ranked
  WHERE rk > (n * {_TRIM_PCT}) // 100
    AND rk <= n - (n * {_TRIM_PCT}) // 100
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       ROUND(CAST(SUM(cents) AS DOUBLE)
             / (CAST(100 AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)), 6)
         AS trimmed_mean
FROM kept GROUP BY event_type
"""


# --------------------------------------------------------------------------
# VARIANT semi-structured path (Spark 4 parse_json / variant_get)
# --------------------------------------------------------------------------


def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern semi-structured path over the ``props`` JSON column:
    ``parse_json`` → VARIANT, typed ``variant_get`` extraction, absent
    paths yielding NULL, and a schema-conformance count via
    ``schema_of_variant`` against the canonical shape — the Spark-4
    binary-encoded twin of ``events_json_props``'s string-functions
    formulation (single scan either way; VARIANT decodes once instead of
    re-parsing the JSON text per extraction).

    The conformance predicate compares each engine's OWN canonical
    schema rendering (Spark ``OBJECT<k: BIGINT>``, DuckDB
    ``{"k":"UBIGINT"}``) — the semantic, "every row matches the corpus
    shape", is engine-independent even though the literals differ."""
    events = load_table(spark, sf_dir, "events")
    v = F.expr("parse_json(props)")
    return (
        events.select(
            "event_type",
            F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("k"),
            F.expr("variant_get(parse_json(props), '$.absent', 'long')").alias("miss"),
            (
                F.expr("schema_of_variant(parse_json(props))")
                == F.lit("OBJECT<k: BIGINT>")
            ).cast("int").alias("conforms"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.sum(F.when(F.col("miss").isNull(), 1).otherwise(0))
            .cast("bigint").alias("n_absent"),
            F.sum("conforms").cast("bigint").alias("n_conforming"),
        )
    )


EVENTS_VARIANT_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CASE WHEN json_extract_string(props, '$.absent') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_absent,
       CAST(SUM(CASE WHEN json_structure(props) = '{"k":"UBIGINT"}'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_conforming
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Exact Mann–Whitney U matrix (tie-aware, integer arithmetic)
# --------------------------------------------------------------------------


def source_mwu_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-aware two-sample Mann–Whitney U for every source pair over
    the document length distribution — the location-shift companion to
    ``source_ks_matrix``'s shape test, on the same scalable
    domain-bounded grid.

    The textbook U needs joint ranks over the merged samples (a global
    sort); the grid identity avoids it entirely:
    ``2·U_a = Σ_v c_a(v)·(2·cum_b(v) − c_b(v))`` (each a-observation
    contributes 2 per smaller b, 1 per tied b — verified against the
    quadratic definition in tests), where the per-source cumulative
    counts come from a source-partitioned window over the DISTINCT value
    grid.  Everything stays integer in DECIMAL(38,0) until the
    rank-biserial effect size ``r_a = 1 − 2U_a/(n_a·n_b)``, the one
    ROUND(6) double division.  ``2U_a + 2U_b = 2·n_a·n_b`` (checked in
    tests), so only the a-side is emitted."""
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
    ).select("source", "v", "c", "cum")
    a = cum.join(F.broadcast(totals), "source").select(
        F.col("source").alias("source_a"), "v",
        F.col("c").alias("c_a"), F.col("n").alias("n_a"),
    )
    b = cum.join(F.broadcast(totals), "source").select(
        F.col("source").alias("source_b"), F.col("v").alias("vb"),
        F.col("c").alias("c_b"), F.col("cum").alias("cum_b"),
        F.col("n").alias("n_b"),
    )
    pairs = a.join(
        b, (F.col("v") == F.col("vb")) & (F.col("source_a") < F.col("source_b"))
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.max("n_a").cast("bigint").alias("n_a"),
            F.max("n_b").cast("bigint").alias("n_b"),
            F.expr(
                "CAST(SUM(CAST(c_a AS DECIMAL(19,0))"
                " * (2 * CAST(cum_b AS DECIMAL(19,0)) - CAST(c_b AS DECIMAL(19,0))))"
                " AS DECIMAL(38,0))"
            ).alias("two_u_a"),
        )
        .select(
            "source_a", "source_b", "n_a", "n_b",
            F.expr("CAST(two_u_a AS DOUBLE) / 2.0").alias("u_a"),
            F.expr(
                "ROUND(1.0 - CAST(two_u_a AS DOUBLE)"
                " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)"
            ).alias("rank_biserial_a"),
        )
    )


SOURCE_MWU_ORACLE = """
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
  SELECT source, v, c,
         SUM(c) OVER (PARTITION BY source ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM full_grid
), agg AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(MAX(ta.n) AS BIGINT) AS n_a, CAST(MAX(tb.n) AS BIGINT) AS n_b,
         CAST(SUM(CAST(a.c AS DECIMAL(19,0))
              * (2 * CAST(b.cum AS DECIMAL(19,0)) - CAST(b.c AS DECIMAL(19,0))))
           AS DECIMAL(38,0)) AS two_u_a
  FROM cum a
  JOIN cum b ON a.v = b.v AND a.source < b.source
  JOIN totals ta ON ta.source = a.source
  JOIN totals tb ON tb.source = b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_a, n_b,
       CAST(two_u_a AS DOUBLE) / 2.0 AS u_a,
       ROUND(1.0 - CAST(two_u_a AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS rank_biserial_a
FROM agg
"""


# --------------------------------------------------------------------------
# Kaplan–Meier survival over customer reorder gaps
# --------------------------------------------------------------------------


def reorder_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier estimate of the customer reorder-time survival
    curve ``S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ)`` with right censoring — the
    duration from each order to the customer's next order is an
    observed event; the gap from the last order to the corpus end date
    is censored (the reorder hadn't happened yet).  THE survival
    operator a retention team runs.

    Scale + exactness: per-customer ``lead`` builds durations (keyed
    window); the analysis then collapses to the DISTINCT day-duration
    grid — bounded by the day domain, so the two ordered windows over it
    (cumulative at-risk and the cumulative product) are bounded-domain
    windows, the ``documents_dataset_card`` precedent, never data-sized.
    The product is evaluated as the established transcendental ladder:
    dᵢ, nᵢ exact integers → ``ROUND(LN((n−d)/n), 12)`` per step →
    DECIMAL(28,12) running sum (order-independent) → one
    ``ROUND(EXP(·), 6)``.  A step with d = n (everyone at risk exits —
    only possible at the last event time) pins survival to exactly 0 via
    a cumulative flag rather than feeding LN(0)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = orders.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d0"),
        F.lead(F.col("o_orderdate").cast("date")).over(w).alias("d1"),
    )
    mx = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("dmax"))
    durs = nxt.crossJoin(F.broadcast(mx)).select(
        F.expr(
            "CAST(CASE WHEN d1 IS NOT NULL THEN datediff(d1, d0)"
            " ELSE datediff(dmax, d0) END AS BIGINT)"
        ).alias("t"),
        F.expr("CASE WHEN d1 IS NOT NULL THEN 1 ELSE 0 END").alias("e"),
    )
    grid = durs.groupBy("t").agg(
        F.sum("e").cast("bigint").alias("d_events"),
        F.sum(F.expr("1 - e")).cast("bigint").alias("c_censored"),
        F.count(F.lit(1)).cast("bigint").alias("total"),
    )
    ow = W.partitionBy(F.lit(1)).orderBy("t").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    aw = W.partitionBy(F.lit(1)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    stepped = grid.select(
        "t", "d_events", "c_censored",
        (
            F.sum("total").over(aw) - (F.sum("total").over(ow) - F.col("total"))
        ).cast("bigint").alias("n_at_risk"),
    ).select(
        "t", "d_events", "c_censored", "n_at_risk",
        F.expr(
            "CASE WHEN d_events < n_at_risk THEN"
            " CAST(ROUND(LN(CAST(n_at_risk - d_events AS DOUBLE)"
            "            / CAST(n_at_risk AS DOUBLE)), 12) AS DECIMAL(28,12))"
            " ELSE CAST(0 AS DECIMAL(28,12)) END"
        ).alias("lnterm"),
        F.expr("CASE WHEN d_events >= n_at_risk THEN 1 ELSE 0 END").alias("dead"),
    )
    return stepped.select(
        "t", "n_at_risk", "d_events", "c_censored",
        F.expr(
            "CASE WHEN SUM(dead) OVER (PARTITION BY 1 ORDER BY t"
            "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0"
            " THEN CAST(0.0 AS DOUBLE)"
            " ELSE ROUND(EXP(CAST(SUM(lnterm) OVER (PARTITION BY 1 ORDER BY t"
            "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 6)"
            " END"
        ).alias("survival"),
    )


REORDER_KM_ORACLE = """
WITH nxt AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d0,
         lead(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS d1
  FROM orders
), mx AS (
  SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax FROM orders
), durs AS (
  SELECT CAST(CASE WHEN d1 IS NOT NULL THEN date_diff('day', d0, d1)
              ELSE date_diff('day', d0, dmax) END AS BIGINT) AS t,
         CASE WHEN d1 IS NOT NULL THEN 1 ELSE 0 END AS e
  FROM nxt CROSS JOIN mx
), grid AS (
  SELECT t, CAST(SUM(e) AS BIGINT) AS d_events,
         CAST(SUM(1 - e) AS BIGINT) AS c_censored,
         CAST(COUNT(*) AS BIGINT) AS total
  FROM durs GROUP BY t
), stepped AS (
  SELECT t, d_events, c_censored,
         CAST(SUM(total) OVER ()
              - (SUM(total) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - total)
           AS BIGINT) AS n_at_risk
  FROM grid
), terms AS (
  SELECT t, d_events, c_censored, n_at_risk,
         CASE WHEN d_events < n_at_risk THEN
           CAST(ROUND(LN(CAST(n_at_risk - d_events AS DOUBLE)
                      / CAST(n_at_risk AS DOUBLE)), 12) AS DECIMAL(28,12))
         ELSE CAST(0 AS DECIMAL(28,12)) END AS lnterm,
         CASE WHEN d_events >= n_at_risk THEN 1 ELSE 0 END AS dead
  FROM stepped
)
SELECT t, n_at_risk, d_events, c_censored,
       CASE WHEN SUM(dead) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0
            THEN CAST(0.0 AS DOUBLE)
            ELSE ROUND(EXP(CAST(SUM(lnterm) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 6)
       END AS survival
FROM terms
"""


# --------------------------------------------------------------------------
# Log-rank test between customer segments
# --------------------------------------------------------------------------


def segment_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing the reorder-time survival of BUILDING-
    segment customers against everyone else — the hypothesis test that
    goes with ``reorder_survival_km``'s curve: under H₀ (same hazard)
    the statistic ``(Σ(d₁ₜ − e₁ₜ))² / Σvarₜ`` is χ²(1), with
    ``e₁ₜ = dₜ·n₁ₜ/nₜ`` and the standard hypergeometric variance.

    Same machinery as the KM estimator: keyed lead-window durations, a
    bounded day-duration grid, cumulative at-risk counts per group over
    the grid (bounded-domain windows).  Exactness: every count is an
    integer; each time point's (d₁−e₁) and variance terms are doubles
    ROUND(12)ed into DECIMAL(28,12) sums — order-independent — and the
    final χ² is one ROUND(6) double expression."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = (
        orders.join(
            customer.select(
                "c_custkey",
                F.expr(
                    "CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END"
                ).alias("g"),
            ),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select(
            "o_custkey", "g",
            F.col("o_orderdate").cast("date").alias("d0"),
            F.lead(F.col("o_orderdate").cast("date")).over(w).alias("d1"),
        )
    )
    mx = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("dmax"))
    durs = nxt.crossJoin(F.broadcast(mx)).select(
        "g",
        F.expr(
            "CAST(CASE WHEN d1 IS NOT NULL THEN datediff(d1, d0)"
            " ELSE datediff(dmax, d0) END AS BIGINT)"
        ).alias("t"),
        F.expr("CASE WHEN d1 IS NOT NULL THEN 1 ELSE 0 END").alias("e"),
    )
    grid = durs.groupBy("t").agg(
        F.sum("e").cast("bigint").alias("d_all"),
        F.sum(F.expr("e * g")).cast("bigint").alias("d1"),
        F.count(F.lit(1)).cast("bigint").alias("tot_all"),
        F.sum("g").cast("bigint").alias("tot1"),
    )
    ow = W.partitionBy(F.lit(1)).orderBy("t").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    aw = W.partitionBy(F.lit(1)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    risk = grid.select(
        "t", "d_all", "d1",
        (F.sum("tot_all").over(aw) - (F.sum("tot_all").over(ow) - F.col("tot_all")))
        .cast("bigint").alias("n_all"),
        (F.sum("tot1").over(aw) - (F.sum("tot1").over(ow) - F.col("tot1")))
        .cast("bigint").alias("n1"),
    )
    terms = risk.select(
        F.expr(
            "CAST(ROUND(CAST(d1 AS DOUBLE) - CAST(d_all AS DOUBLE)"
            " * CAST(n1 AS DOUBLE) / CAST(n_all AS DOUBLE), 12)"
            " AS DECIMAL(28,12))"
        ).alias("omE"),
        F.expr(
            "CASE WHEN n_all > 1 THEN"
            " CAST(ROUND(CAST(d_all AS DOUBLE)"
            "  * (CAST(n1 AS DOUBLE) / CAST(n_all AS DOUBLE))"
            "  * (1.0 - CAST(n1 AS DOUBLE) / CAST(n_all AS DOUBLE))"
            "  * (CAST(n_all AS DOUBLE) - CAST(d_all AS DOUBLE))"
            "  / (CAST(n_all AS DOUBLE) - 1.0), 12) AS DECIMAL(28,12))"
            " ELSE CAST(0 AS DECIMAL(28,12)) END"
        ).alias("var_t"),
    )
    return terms.agg(
        F.expr("CAST(SUM(omE) AS DOUBLE)").alias("obs_minus_exp"),
        F.expr("CAST(SUM(var_t) AS DOUBLE)").alias("variance"),
        F.expr(
            "ROUND(CAST(SUM(omE) AS DOUBLE) * CAST(SUM(omE) AS DOUBLE)"
            " / CAST(SUM(var_t) AS DOUBLE), 6)"
        ).alias("chi2"),
    )


SEGMENT_LOGRANK_ORACLE = """
WITH nxt AS (
  SELECT o_custkey,
         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
         CAST(o_orderdate AS DATE) AS d0,
         lead(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS d1
  FROM orders JOIN customer ON o_custkey = c_custkey
), mx AS (
  SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax FROM orders
), durs AS (
  SELECT g,
         CAST(CASE WHEN d1 IS NOT NULL THEN date_diff('day', d0, d1)
              ELSE date_diff('day', d0, dmax) END AS BIGINT) AS t,
         CASE WHEN d1 IS NOT NULL THEN 1 ELSE 0 END AS e
  FROM nxt CROSS JOIN mx
), grid AS (
  SELECT t, CAST(SUM(e) AS BIGINT) AS d_all,
         CAST(SUM(e * g) AS BIGINT) AS d1,
         CAST(COUNT(*) AS BIGINT) AS tot_all,
         CAST(SUM(g) AS BIGINT) AS tot1
  FROM durs GROUP BY t
), risk AS (
  SELECT t, d_all, d1,
         CAST(SUM(tot_all) OVER ()
              - (SUM(tot_all) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tot_all)
           AS BIGINT) AS n_all,
         CAST(SUM(tot1) OVER ()
              - (SUM(tot1) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tot1)
           AS BIGINT) AS n1
  FROM grid
), terms AS (
  SELECT CAST(ROUND(CAST(d1 AS DOUBLE) - CAST(d_all AS DOUBLE)
              * CAST(n1 AS DOUBLE) / CAST(n_all AS DOUBLE), 12)
          AS DECIMAL(28,12)) AS omE,
         CASE WHEN n_all > 1 THEN
           CAST(ROUND(CAST(d_all AS DOUBLE)
             * (CAST(n1 AS DOUBLE) / CAST(n_all AS DOUBLE))
             * (1.0 - CAST(n1 AS DOUBLE) / CAST(n_all AS DOUBLE))
             * (CAST(n_all AS DOUBLE) - CAST(d_all AS DOUBLE))
             / (CAST(n_all AS DOUBLE) - 1.0), 12) AS DECIMAL(28,12))
         ELSE CAST(0 AS DECIMAL(28,12)) END AS var_t
  FROM risk
)
SELECT CAST(SUM(omE) AS DOUBLE) AS obs_minus_exp,
       CAST(SUM(var_t) AS DOUBLE) AS variance,
       ROUND(CAST(SUM(omE) AS DOUBLE) * CAST(SUM(omE) AS DOUBLE)
             / CAST(SUM(var_t) AS DOUBLE), 6) AS chi2
FROM terms
"""
