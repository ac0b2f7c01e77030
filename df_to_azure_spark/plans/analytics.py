"""TPC-H-style analytics over the driver's star schema (SURVEY §2.7 —
the reference has no relational operators, so this is the thin
Spark-native surface the engine exposes for real queries: joins, aggs,
windows, rollups, set ops).

Numeric policy shared with the DuckDB oracle: the money/rate columns are
2-decimal values stored as doubles, so every aggregate casts them to
exact DECIMAL first, does exact decimal arithmetic with operand precisions
kept small enough that NEITHER engine ever rounds (Spark rounds HALF_UP,
DuckDB HALF_EVEN — any real rounding would diverge), and casts the final
result to DOUBLE.  The shared expression fragments below are valid in both
Spark SQL and DuckDB; the Spark side consumes them via ``F.expr`` so the
semantics are textually identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from df_to_azure_spark.operators.partitioning import spread
from df_to_azure_spark.sources import load_table

# exact-decimal fragments (valid in Spark SQL and DuckDB):
DEC_QTY = "CAST(l_quantity AS DECIMAL(18,2))"
DEC_PRICE = "CAST(l_extendedprice AS DECIMAL(18,2))"
DISC_PRICE = (
    "(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2)))"
)
CHARGE = (
    f"(CAST({DISC_PRICE} AS DECIMAL(24,4))"
    " * CAST(1 + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(4,2)))"
)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter → 8-agg groupBy.  Catalyst pushes the
    shipdate filter into the parquet scan; partial aggregation makes the
    shuffle carry ≤ |groups| rows per task."""
    l = load_table(spark, sf_dir, "lineitem").where(
        F.expr("l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'")
    )
    # single-row-group local files scan as one partition; widen so the
    # decimal partial-agg uses every core (no-op on a real multi-split table)
    l = spread(l)
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(f"CAST(SUM({DEC_QTY}) AS DOUBLE)").alias("sum_qty"),
            F.expr(f"CAST(SUM({DEC_PRICE}) AS DOUBLE)").alias("sum_base_price"),
            F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE)").alias("sum_disc_price"),
            F.expr(f"CAST(SUM({CHARGE}) AS DOUBLE)").alias("sum_charge"),
            F.expr(f"ROUND(CAST(SUM({DEC_QTY}) AS DOUBLE) / COUNT(*), 6)").alias("avg_qty"),
            F.expr(f"ROUND(CAST(SUM({DEC_PRICE}) AS DOUBLE) / COUNT(*), 6)").alias("avg_price"),
            F.expr(
                "ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)"
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM({DEC_QTY}) AS DOUBLE) AS sum_qty,
  CAST(SUM({DEC_PRICE}) AS DOUBLE) AS sum_base_price,
  CAST(SUM({DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
  CAST(SUM({CHARGE}) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM({DEC_QTY}) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
  ROUND(CAST(SUM({DEC_PRICE}) AS DOUBLE) / COUNT(*), 6) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join customer⋈orders⋈lineitem, revenue per order, top-10.  No
    broadcast hint: customer scales linearly with data size, so the plan
    must stay shuffle-join-safe at 100 TB — AQE picks broadcast at small
    SF automatically.  Top-k selection happens on the exact decimal
    revenue so the set is deterministic."""
    customer = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.expr("o_orderdate < TIMESTAMP_NTZ '1996-03-15 00:00:00'")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        F.expr("l_shipdate > TIMESTAMP_NTZ '1996-03-15 00:00:00'")
    )
    joined = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).join(customer, orders.o_custkey == customer.c_custkey)
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.expr(f"SUM({DISC_PRICE})").alias("rev_dec")
    )
    return (
        agg.orderBy(F.desc("rev_dec"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.col("rev_dec").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


Q3_ORACLE = f"""
SELECT l_orderkey, CAST(rev_dec AS DOUBLE) AS revenue, o_orderdate, o_orderpriority
FROM (
  SELECT l_orderkey, o_orderdate, o_orderpriority, SUM({DISC_PRICE}) AS rev_dec
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1996-03-15'
    AND l_shipdate > TIMESTAMP '1996-03-15'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
ORDER BY rev_dec DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table join.  Only the genuinely bounded dims are broadcast:
    nation (25 rows) ⋈ region (5 rows) collapse to a ≤25-row frame that
    pre-filters customer and supplier via broadcast joins (no shuffle).
    customer/supplier scale linearly with data size, so their joins to
    the fact tables shuffle on their keys — AQE upgrades them to
    broadcast automatically at small SF.  The locality constraint
    c_nationkey = s_nationkey rides the supplier join as a second
    equi-key, so it prunes during the join instead of after."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.expr(
            "o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00' AND "
            "o_orderdate < TIMESTAMP_NTZ '1997-01-01 00:00:00'"
        )
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")

    # bounded: at most 25 rows, independent of data scale
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")

    cust = customer.join(
        F.broadcast(asia_nations),
        customer.c_nationkey == asia_nations.n_nationkey,
    ).select("c_custkey", "c_nationkey")
    supp = supplier.join(
        F.broadcast(asia_nations),
        supplier.s_nationkey == asia_nations.n_nationkey,
    ).select("s_suppkey", "s_nationkey", "n_name")

    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .join(
            supp,
            (lineitem.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
    )
    return joined.groupBy("n_name").agg(
        F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE)").alias("revenue")
    )


Q5_ORACLE = f"""
SELECT n_name, CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-filter-sum: every predicate pushes to the parquet reader."""
    l = load_table(spark, sf_dir, "lineitem")
    return spread(
        l.where(
            F.expr(
                "l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00' AND "
                "l_shipdate < TIMESTAMP_NTZ '1997-01-01 00:00:00' AND "
                "l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"
            )
        )
    ).agg(
        F.expr(
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)"
        ).alias("revenue")
    )


Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
  * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: rank window partitioned by brand, deterministic
    tie-break on part key."""
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("p_brand", F.col("rn").cast("long").alias("rn"), "p_partkey", "p_retailprice")
    )


TOP3_ORACLE = """
SELECT p_brand, CAST(rn AS BIGINT) AS rn, p_partkey, p_retailprice
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
)
WHERE rn <= 3
"""


def rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals: GROUP BY ROLLUP(status, priority)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").alias(
            "total_price"
        ),
    )


ROLLUP_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: customers that never ordered, counted per nation.  The
    anti probe uses only the key column of orders (column-pruned scan)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    no_orders = customer.join(
        orders.select("o_custkey"),
        customer.c_custkey == orders.o_custkey,
        "left_anti",
    )
    return (
        no_orders.join(F.broadcast(nation), no_orders.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


NO_ORDERS_ORACLE = """
SELECT n_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
"""


def urgent_customers_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join: customers with ≥1 urgent order, counted per segment."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        customer.join(
            urgent.select("o_custkey"),
            customer.c_custkey == urgent.o_custkey,
            "left_semi",
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


URGENT_SEGMENT_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


def running_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer (analytic window).  Summed in exact
    decimal so the running values are partition-order independent."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.expr("CAST(o_totalprice AS DECIMAL(18,2))"))
        .over(w)
        .cast("double")
        .alias("cum_spend"),
    )


RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend
FROM orders
"""


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling one-hour rollup of the event stream (batch form; the
    streaming twin is ``streaming.events.windowed_counts_stream``)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)").alias("total_value"),
    )


EVENTS_HOURLY_ORACLE = """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) — see streaming.events."""
    from df_to_azure_spark.streaming.events import sessionize

    events = load_table(spark, sf_dir, "events")
    return sessionize(events, gap_minutes=30)


SESSIONIZE_ORACLE = """
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
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, COUNT(*) AS n_events,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(MAX(ts) AS TIMESTAMP) AS session_end
FROM with_ids
GROUP BY user_id, session_seq
"""


def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` operator (Spark's built-in gap-based
    session assignment — a different engine path than the manual
    lag + running-sum in ``sessionize_events``): per-user 30-minute-gap
    sessions with event counts.  The window END is last-event + gap by
    definition, which the oracle mirrors."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


SESSION_WINDOW_ORACLE = """
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
)
SELECT user_id,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(MAX(ts) AS TIMESTAMP) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM with_ids
GROUP BY user_id, session_seq
"""
