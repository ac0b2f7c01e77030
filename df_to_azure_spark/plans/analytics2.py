"""Second wave of the analytics surface: pivot/unpivot, cube, grouping
sets, exact distinct aggregation, set operations, range (band) join,
as-of join, lag deltas, argmax aggregation.  Same exact-arithmetic oracle
policy as plans.analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from df_to_azure_spark.operators.asof import asof_join
from df_to_azure_spark.sources import load_table

DEC_PRICE2 = "CAST(o_totalprice AS DECIMAL(18,2))"


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per status with one column per priority class.
    Explicit pivot values keep the plan single-pass (no distinct scan)."""
    orders = load_table(spark, sf_dir, "orders")
    pri = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    out = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", pri)
        .agg(F.count(F.lit(1)))
    )
    # stable snake_case names shared with the oracle
    for p in pri:
        out = out.withColumnRenamed(p, f"n_{p[0]}")
    return out.na.fill(0, [f"n_{p[0]}" for p in pri])


PIVOT_ORACLE = """
SELECT o_orderstatus,
  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_1,
  COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_2,
  COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_3,
  COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_4,
  COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_5
FROM orders GROUP BY o_orderstatus
"""


def cube_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (brand, size-class): all 4 grouping combinations."""
    part = load_table(spark, sf_dir, "part")
    with_class = part.withColumn(
        "size_class", F.when(F.col("p_size") < 25, "small").otherwise("large")
    )
    return with_class.cube("p_brand", "size_class").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)").alias(
            "total_price"
        ),
    )


CUBE_ORACLE = """
SELECT p_brand, size_class, COUNT(*) AS n,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM (SELECT p_brand, CASE WHEN p_size < 25 THEN 'small' ELSE 'large' END AS size_class,
             p_retailprice FROM part)
GROUP BY CUBE (p_brand, size_class)
"""


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: (status), (priority), () — the shape
    rollup/cube cannot express."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("v_orders_gs")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM({DEC_PRICE2}) AS DOUBLE) AS total_price
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


GROUPING_SETS_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM({DEC_PRICE2}) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def distinct_customers_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) alongside plain counts (expand-based
    two-phase distinct aggregation in Spark)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


DISTINCT_ORACLE = """
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


def building_and_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: BUILDING-segment customers who also placed an urgent
    order; EXCEPT would be the anti form (covered by
    customers_without_orders)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = customer.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return building.intersect(urgent)


INTERSECT_ORACLE = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


PRICE_BANDS = [(0.0, 500.0, "budget"), (500.0, 1000.0, "mid"), (1000.0, 1e9, "premium")]


def price_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: parts against price bands.  The band table is
    tiny → broadcast nested-loop, which is the right plan; at scale with
    a large band table you'd bucketize the range key first."""
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(PRICE_BANDS, "lo double, hi double, band string")
    joined = part.join(
        F.broadcast(bands),
        (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.expr("CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)").alias(
            "total_price"
        ),
    )


PRICE_BAND_ORACLE = """
WITH bands(lo, hi, band) AS (
  VALUES (CAST(0.0 AS DOUBLE), CAST(500.0 AS DOUBLE), 'budget'),
         (CAST(500.0 AS DOUBLE), CAST(1000.0 AS DOUBLE), 'mid'),
         (CAST(1000.0 AS DOUBLE), CAST(1e9 AS DOUBLE), 'premium')
)
SELECT band, COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
"""


def purchases_asof_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event matched to the user's latest
    preceding (or simultaneous) view event.  Union+window formulation —
    see operators.asof."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id")
    )
    out = asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["view_event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("view_event_id_asof").alias("view_event_id"),
        F.col("ts_asof").alias("view_ts"),
    )


ASOF_ORACLE = """
SELECT p.event_id, p.user_id, p.ts,
       v.event_id AS view_event_id, v.ts AS view_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


def events_value_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): per-user change in event value over time."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
    )


VALUE_DELTA_ORACLE = """
SELECT event_id, user_id,
       value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_delta
FROM events
"""


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax aggregation: each user's most recent event type/value
    (max_by — single-pass, no window, no self-join)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.expr("max_by(event_type, ts)").alias("last_event_type"),
        F.expr("max_by(value, ts)").alias("last_value"),
        F.max("ts").alias("last_ts"),
    )


LATEST_EVENT_ORACLE = """
SELECT user_id, arg_max(event_type, ts) AS last_event_type,
       arg_max(value, ts) AS last_value, MAX(ts) AS last_ts
FROM events GROUP BY user_id
"""


def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide per-status totals to (status, measure, value)
    long form via stack()."""
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderstatus").agg(
        F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").alias("total"),
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
    )
    return wide.selectExpr(
        "o_orderstatus",
        "stack(2, 'total', total, 'n', n) AS (measure, value)",
    )


UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT o_orderstatus,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, 'total' AS measure, total AS value FROM wide
UNION ALL
SELECT o_orderstatus, 'n', n FROM wide
"""


def building_never_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: BUILDING-segment customers minus those with urgent orders."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = customer.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return building.exceptAll(urgent).distinct()


EXCEPT_ORACLE = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions over the semi-structured props column:
    extract, cast, aggregate."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.expr("ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(*), 6)").alias("avg_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


EVENTS_JSON_ORACLE = """
SELECT event_type, CAST(SUM(k) AS BIGINT) AS sum_k,
       ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(*), 6) AS avg_k, COUNT(*) AS n
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
"""


def order_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window distribution functions: ntile quartile + percent_rank per
    status, deterministic ordering on (price, key).  ``o_orderstatus``
    has 3 values, so a plain partitioned window funnels a third of all
    orders through one task; instead the exact two-phase distributed
    rank (``functions.distrank``) range-partitions on (status, price,
    key) and derives both ntile and percent_rank arithmetically from
    ``(global_rank, group_total)`` — bit-identical, fully parallel.
    percent_rank over a unique ordering is ``(rn-1)/(n-1)`` (0.0 for a
    1-row group, Spark's own convention)."""
    from df_to_azure_spark.functions import distrank as DR

    orders = load_table(spark, sf_dir, "orders")
    ranked = DR.two_phase_rank(
        orders.select("o_orderkey", "o_orderstatus", "o_totalprice"),
        [("o_totalprice", "asc"), ("o_orderkey", "asc")],
        group_cols=["o_orderstatus"],
    )
    pct = F.when(F.col("__grp_n") == 1, F.lit(0.0)).otherwise(
        (F.col("__rn") - 1).cast("double") / (F.col("__grp_n") - 1).cast("double")
    )
    return ranked.select(
        "o_orderkey",
        "o_orderstatus",
        DR.ntile_from_rank("__rn", "__grp_n", 4).cast("long").alias("quartile"),
        F.round(pct, 6).alias("pct_rank"),
    )


QUARTILES_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
"""


def quantity_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full SQL rank family — ``rank()``, ``percent_rank()``,
    ``cume_dist()`` — over a GLOBAL ordering of ``l_quantity``, a
    heavy-ties key (~50 distinct values across all of lineitem), without
    any unpartitioned window: ``distrank.two_phase_rank`` gives the
    exact global row number, and ``with_rank_family`` recovers the
    tie-aware functions from one peer aggregation keyed on the weak key
    (peer groups span range partitions, so this is the piece
    ``row_number`` arithmetic alone cannot express).  Output is the
    distinct per-value profile; the per-row columns are exercised and
    then collapsed, keeping the result row-count bounded."""
    from df_to_azure_spark.functions import distrank as DR

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    ranked = DR.two_phase_rank(
        li,
        [("l_quantity", "asc"), ("l_orderkey", "asc"), ("l_linenumber", "asc")],
    )
    fam = DR.with_rank_family(ranked, ["l_quantity"])
    return (
        fam.select(
            F.col("l_quantity").alias("quantity"),
            F.col("__rank").alias("rnk"),
            F.round("__pct_rank", 8).alias("pct_rank"),
            F.round("__cume_dist", 8).alias("cume"),
        )
        .distinct()
    )


QUANTITY_RANK_ORACLE = """
SELECT DISTINCT l_quantity AS quantity,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       round(CAST(percent_rank() OVER w AS DOUBLE), 8) AS pct_rank,
       round(CAST(cume_dist() OVER w AS DOUBLE), 8) AS cume
FROM lineitem
WINDOW w AS (ORDER BY l_quantity)
"""


def supplier_name_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions: case, trim/pad, substring, replace,
    concat — identical semantics in both engines."""
    supplier = load_table(spark, sf_dir, "supplier")
    return supplier.select(
        "s_suppkey",
        F.upper(F.col("s_name")).alias("name_upper"),
        F.expr("substr(s_name, 1, 8)").alias("name_prefix"),
        F.expr("replace(s_name, '#', '-')").alias("name_dashed"),
        F.expr("lpad(CAST(s_suppkey AS STRING), 8, '0')").alias("padded_key"),
        F.length("s_name").cast("long").alias("name_len"),
    )


NAME_NORMALIZE_ORACLE = """
SELECT s_suppkey,
       upper(s_name) AS name_upper,
       substr(s_name, 1, 8) AS name_prefix,
       replace(s_name, '#', '-') AS name_dashed,
       lpad(CAST(s_suppkey AS VARCHAR), 8, '0') AS padded_key,
       CAST(length(s_name) AS BIGINT) AS name_len
FROM supplier
"""


_AES_K_DISTINCT = 128  # KMV bottom-k size for the distinct-user estimate
_AES_K_SAMPLE = 512  # hash-sample size for the quantile estimates
_AES_SALTS = 32  # phase-1 fan-out of the two-phase bottom-k


def _bottom_k_by_hash(
    df: DataFrame, k: int, order_cols: list, salt_col
) -> DataFrame:
    """Deterministic per-event_type bottom-k without a giant per-group
    sort: phase 1 keeps the k smallest rows inside each of the
    ``_AES_SALTS`` salted cells (windows over (event_type, salt) —
    partition count scales with salts × groups, each cell's sort is
    1/salts of the group), phase 2 takes the exact global bottom-k from
    the ≤ salts × k survivors per group.  Composition is identical to a
    single global bottom-k (each salt cell forwards at least its share
    of the true bottom-k), so the SQL oracle can use the one-window
    form while this stays skew-safe at 100 TB."""
    w1 = W.partitionBy("event_type", salt_col).orderBy(*order_cols)
    cand = (
        df.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .drop("__r1")
    )
    w2 = W.partitionBy("event_type").orderBy(*order_cols)
    return (
        cand.withColumn("__rk", F.row_number().over(w2))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def approx_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregation surface — deterministic sketches, so the
    ESTIMATES themselves hash-match the SQL oracle (closing the one
    rows-only registry entry that `approx_count_distinct` /
    `percentile_approx` internals forced; those engine-private built-ins
    remain exercised and error-bound-gated by
    ``approx_stats_error_check``).

    Per event type:

    - ``approx_users``: KMV distinct-count estimate (Bar-Yossef et al.)
      over the k=128 smallest 48-bit md5 user hashes — exact below k,
      ``(k-1)/h_k`` at or above (same estimator as
      ``kmv_distinct_users``, which documents the sketch algebra).
    - ``p50_approx`` / ``p95_approx``: nearest-rank quantiles of a
      deterministic k=512 uniform sample (the rows with the smallest
      md5(event_id) — bottom-k hash sampling, the mergeable form of
      reservoir sampling).

    Scale shape: both bottom-k passes run salted two-phase windows
    (``_bottom_k_by_hash``) — no single giant per-group sort; phase-2
    state is ≤ salts × k rows per group regardless of data size."""
    events = load_table(spark, sf_dir, "events")
    h48 = float(1 << 48)

    # --- KMV distinct users: bottom-128 user hashes per group
    d = events.select("event_type", "user_id").distinct()
    uh = d.select(
        "event_type",
        "user_id",
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 12),"
            " 16, 10) AS BIGINT) AS hi"
        ),
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 13, 2),"
            f" 16, 10) AS INT) % {_AES_SALTS} AS salt"
        ),
    )
    ubot = _bottom_k_by_hash(
        uh, _AES_K_DISTINCT, [F.asc("hi"), F.asc("user_id")], "salt"
    )
    users = ubot.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_bot"),
        F.max("hi").alias("hi_k"),
    ).select(
        "event_type",
        F.when(
            F.col("n_bot") < _AES_K_DISTINCT, F.col("n_bot").cast("double")
        )
        .otherwise(
            F.round(
                F.lit(float(_AES_K_DISTINCT - 1))
                / (F.col("hi_k").cast("double") / F.lit(h48)),
                6,
            )
        )
        .alias("approx_users"),
    )

    # --- quantiles of the deterministic bottom-512 hash sample
    sh = events.select(
        "event_type",
        "value",
        "event_id",
        F.expr(
            "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 12),"
            " 16, 10) AS BIGINT) AS hi"
        ),
        F.expr(
            "CAST(conv(substring(md5(CAST(event_id AS STRING)), 13, 2),"
            f" 16, 10) AS INT) % {_AES_SALTS} AS salt"
        ),
    )
    samp = _bottom_k_by_hash(
        sh, _AES_K_SAMPLE, [F.asc("hi"), F.asc("event_id")], "salt"
    ).select("event_type", "value")
    ns = samp.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_s")
    )
    q = samp.withColumn(
        "vrn", F.row_number().over(W.partitionBy("event_type").orderBy("value"))
    )
    quant = (
        q.join(ns, "event_type")
        .groupBy("event_type")
        .agg(
            F.expr(
                "CAST(MAX(CASE WHEN vrn = (n_s + 1) DIV 2 THEN value END)"
                " AS DOUBLE) AS p50_approx"
            ),
            F.expr(
                "CAST(MAX(CASE WHEN vrn = (19 * n_s + 19) DIV 20 THEN value"
                " END) AS DOUBLE) AS p95_approx"
            ),
        )
    )
    return users.join(quant, "event_type").select(
        "event_type", "approx_users", "p50_approx", "p95_approx"
    )


APPROX_EVENT_STATS_ORACLE = f"""
WITH d AS (
  SELECT DISTINCT event_type, user_id FROM events
), uh AS (
  SELECT event_type, user_id,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS hi
  FROM d
), ub AS (
  SELECT event_type, hi,
         row_number() OVER (PARTITION BY event_type ORDER BY hi, user_id) AS rn
  FROM uh
), users AS (
  SELECT event_type,
         CASE WHEN COUNT(*) < {_AES_K_DISTINCT} THEN CAST(COUNT(*) AS DOUBLE)
              ELSE round({float(_AES_K_DISTINCT - 1)}
                         / (CAST(MAX(hi) AS DOUBLE) / {float(1 << 48)}), 6)
         END AS approx_users
  FROM ub WHERE rn <= {_AES_K_DISTINCT} GROUP BY event_type
), sh AS (
  SELECT event_type, value, event_id,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT AS hi
  FROM events
), sb AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY hi, event_id) AS rn
  FROM sh
), samp AS (
  SELECT event_type, value FROM sb WHERE rn <= {_AES_K_SAMPLE}
), ns AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_s FROM samp GROUP BY 1
), q AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS vrn
  FROM samp
)
SELECT event_type, approx_users,
       CAST(MAX(CASE WHEN vrn = (n_s + 1) // 2 THEN value END) AS DOUBLE)
         AS p50_approx,
       CAST(MAX(CASE WHEN vrn = (19 * n_s + 19) // 20 THEN value END)
            AS DOUBLE) AS p95_approx
FROM q JOIN ns USING (event_type) JOIN users USING (event_type)
GROUP BY event_type, approx_users
"""


def events_rolling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (vs the ROWS frames used elsewhere): per-user
    rolling 1-hour event count and value sum, anchored on the event
    timestamp in microseconds.  One shuffle on user_id; the frame scan is
    per-partition and never materializes the window."""
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER ("
            "PARTITION BY user_id ORDER BY unix_micros(ts) "
            "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)"
        ).alias("value_last_hour"),
    )


ROLLING_HOUR_ORACLE = """
SELECT user_id, event_id,
  COUNT(*) OVER w AS n_last_hour,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS value_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width binning (histogram shape): events bucketed by
    floor(value / 100), counts + exact-decimal sums per bin.  One agg
    shuffle; binning is a pure projection so the combiner sees final
    bins."""
    events = load_table(spark, sf_dir, "events")
    bin_col = F.floor(F.col("value") / 100).cast("long")
    return events.groupBy(bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)").alias("total"),
    )


VALUE_HISTOGRAM_ORACLE = """
SELECT CAST(floor(value / 100) AS BIGINT) AS bin, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM events GROUP BY 1
"""


def order_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates done EXACTLY: variance/stddev derived from
    exact decimal power sums — sum(x), sum(x²), n — instead of the
    engines' floating co-moment accumulators, whose results depend on
    partition merge order and can never hash-match across engines.
    Decimal sums are associative and exact, so this is deterministic at
    any parallelism."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").alias("s1"),
        F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)))").alias("s2"),
    )
    var = (
        F.col("s2").cast("double") / F.col("n")
        - (F.col("s1").cast("double") / F.col("n")) ** 2
    )
    return agg.select(
        "o_orderstatus",
        "n",
        F.round(F.col("s1").cast("double") / F.col("n"), 4).alias("mean_price"),
        F.round(F.sqrt(var), 4).alias("stddev_price"),
    )


DISPERSION_ORACLE = """
SELECT o_orderstatus, n,
       round(CAST(s1 AS DOUBLE) / n, 4) AS mean_price,
       round(sqrt(CAST(s2 AS DOUBLE) / n - pow(CAST(s1 AS DOUBLE) / n, 2)), 4)
         AS stddev_price
FROM (
  SELECT o_orderstatus, COUNT(*) AS n,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s1,
         SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS s2
  FROM orders GROUP BY o_orderstatus
)
"""


def funnel_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel aggregation: per user, did a view precede a purchase?
    Conditional min/max timestamps per user (one shuffle), then a global
    rollup of the stage counts.  Timestamp comparisons stay internal —
    only counts are emitted, so nanosecond-vs-microsecond representation
    differences cannot leak into the hash check."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "last_purchase"
        ),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_view").alias("n_viewers"),
        F.count("last_purchase").alias("n_purchasers"),
        F.sum(
            F.when(
                (F.col("first_view").isNotNull())
                & (F.col("last_purchase") > F.col("first_view")),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_converted"),
    )


FUNNEL_ORACLE = """
SELECT COUNT(*) AS n_users,
       COUNT(first_view) AS n_viewers,
       COUNT(last_purchase) AS n_purchasers,
       CAST(SUM(CASE WHEN first_view IS NOT NULL AND last_purchase > first_view
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
  FROM events GROUP BY user_id
)
"""


def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch per event type — the
    PORTABLE approximate-counting companion to ``approx_event_stats``:
    where ``approx_count_distinct``'s HLL internals are engine-private
    (rows-only forever), KMV is order statistics over a deterministic
    hash, so the ESTIMATE ITSELF is bit-reproducible in any engine and
    hash-checked here (``pipeline5.hll_distinct_users`` does the same
    for register-level HLL).

    Sketch: normalize a 48-bit md5-prefix hash of each distinct user to
    (0, 1]; with h_k the k-th smallest hash, distinct ≈ (k-1)/h_k
    (Bar-Yossef et al.; the standard KMV estimator).  Groups with fewer
    than k distinct users report the exact count (the sketch is exact
    below k by construction).

    Scale shape: one distinct shuffle on (group, user) with map-side
    combine, one rank window per group; state per group is k hashes —
    the same mergeability story a production sketch needs (union of
    bottom-k sets = bottom-k of union)."""
    k = 64
    events = load_table(spark, sf_dir, "events")
    d = events.select("event_type", "user_id").distinct()
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
        .cast("double")
        / F.lit(float(1 << 48))
    ).alias("h")
    ranked = d.select("event_type", h).withColumn(
        "rn", F.row_number().over(W.partitionBy("event_type").orderBy("h"))
    )
    per_group = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("h_k"),
    )
    est = F.when(
        F.col("n_exact") >= k, F.round(F.lit(float(k - 1)) / F.col("h_k"), 6)
    ).otherwise(F.col("n_exact").cast("double"))
    return per_group.select(
        "event_type", F.col("n_exact").cast("bigint").alias("n_exact"),
        est.alias("kmv_estimate"),
    )


KMV_ORACLE = f"""
WITH d AS (
  SELECT DISTINCT event_type, user_id FROM events
), h AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
           / CAST({float(1 << 48)} AS DOUBLE) AS h
  FROM d
), ranked AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
), per_group AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact,
         MAX(CASE WHEN rn = 64 THEN h END) AS h_k
  FROM ranked GROUP BY event_type
)
SELECT event_type, n_exact,
       CASE WHEN n_exact >= 64 THEN round(63.0 / h_k, 6)
            ELSE CAST(n_exact AS DOUBLE) END AS kmv_estimate
FROM per_group
"""
