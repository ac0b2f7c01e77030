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
