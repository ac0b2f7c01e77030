"""Fourth analytics wave — the TPC-H shapes still missing from the
registry: role-played dimension joins (Q7), market-share conditional
aggregation over a 6-way join (Q8), multi-way profit expression (Q9),
group-by-then-top-k revenue (Q10), and the partsupp-family shapes (Q2,
Q11, Q16, Q20) re-derived through lineitem as the part↔supplier bridge
(the driver's star schema has no partsupp table, so "offers"/"stock"
become shipped-lineitem facts — the join/agg/subquery SHAPES are
preserved exactly).

Numeric policy shared with plans.analytics: exact decimal arithmetic
sized so neither engine rounds mid-plan (Spark HALF_UP vs DuckDB
HALF_EVEN would diverge), DOUBLE only in the final projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from df_to_azure_spark.plans.analytics import DEC_PRICE, DEC_QTY, DISC_PRICE
from df_to_azure_spark.sources import load_table

YR_SHIP = "CAST(YEAR(l_shipdate) AS BIGINT)"
YR_ORDER = "CAST(YEAR(o_orderdate) AS BIGINT)"


def _supplier_with_nation(spark, sf_dir, names=None):
    """supplier ⋈ nation (25 rows — auto-broadcast by size estimate; no
    static hint needed, and supplier itself scales so it must not get one)."""
    nation = load_table(spark, sf_dir, "nation")
    if names:
        nation = nation.where(F.col("n_name").isin(*names))
    supplier = load_table(spark, sf_dir, "supplier")
    return supplier.join(
        nation.select(
            F.col("n_nationkey").alias("s_nationkey"),
            F.col("n_name").alias("supp_nation"),
        ),
        "s_nationkey",
    )


def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: the SAME dimension role-played twice (supplier's nation
    vs customer's nation) with a disjunctive pair predicate, grouped by
    both roles and shipping year.  Nation is pre-filtered to the two
    trade partners BEFORE the joins, so the fact tables are pruned by
    two broadcast-size dims instead of filtered after a wide join."""
    pair = ("NATION_1", "NATION_2")
    supp = _supplier_with_nation(spark, sf_dir, pair).select("s_suppkey", "supp_nation")
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair))
    customer = load_table(spark, sf_dir, "customer").join(
        nation.select(
            F.col("n_nationkey").alias("c_nationkey"),
            F.col("n_name").alias("cust_nation"),
        ),
        "c_nationkey",
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem")
    joined = (
        lineitem.join(supp, lineitem.l_suppkey == supp.s_suppkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.expr(YR_SHIP).alias("yr")
    ).agg(
        F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE)").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, yr,
       CAST(SUM(disc) AS DOUBLE) AS revenue, COUNT(*) AS n_items
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         {YR_SHIP} AS yr, {DISC_PRICE} AS disc
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
     OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, yr
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of a region's market per order year —
    conditional aggregation over a 6-way join.  The share division is
    the ONLY double arithmetic (exact decimal sums divided at the end);
    region/nation prune customer rows before the fact join."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            nation.join(
                region, nation.n_regionkey == region.r_regionkey
            ).select(F.col("n_nationkey").alias("c_nationkey")),
            "c_nationkey",
        )
        .select("c_custkey")
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    supp = _supplier_with_nation(spark, sf_dir).select("s_suppkey", "supp_nation")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    joined = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(asia_cust, orders.o_custkey == asia_cust.c_custkey, "left_semi")
        .join(supp, lineitem.l_suppkey == supp.s_suppkey)
    )
    return joined.groupBy(F.expr(YR_ORDER).alias("yr")).agg(
        F.expr(
            "ROUND(100.0 * CAST(SUM(CASE WHEN supp_nation = 'NATION_3'"
            f" THEN {DISC_PRICE} END) AS DOUBLE)"
            f" / CAST(SUM({DISC_PRICE}) AS DOUBLE), 6)"
        ).alias("share_pct")
    )


Q8_ORACLE = f"""
SELECT {YR_ORDER} AS yr,
       ROUND(100.0 * CAST(SUM(CASE WHEN ns.n_name = 'NATION_3'
                                   THEN {DISC_PRICE} END) AS DOUBLE)
             / CAST(SUM({DISC_PRICE}) AS DOUBLE), 6) AS share_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE p_type = 'ECONOMY'
  AND o_custkey IN (SELECT c_custkey FROM customer
                    JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
                    WHERE r_name = 'ASIA')
GROUP BY yr
"""

# Q9's profit needs a unit cost; without partsupp.ps_supplycost the
# engine-portable stand-in is 60% of the part's retail price.  Operand
# precisions sized so no engine rounds: (12,2)*(8,2)→(21,4), *(2,1)→(24,5),
# and (24,4)-(24,5) widens to scale 5 without rounding.
PROFIT = (
    f"(CAST({DISC_PRICE} AS DECIMAL(24,4))"
    " - CAST(p_retailprice AS DECIMAL(12,2))"
    "   * CAST(l_quantity AS DECIMAL(8,2))"
    "   * CAST(0.6 AS DECIMAL(2,1)))"
)


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit (revenue minus cost expression spanning BOTH join
    sides) per supplier nation per order year, for a part-name pattern.
    The LIKE filter prunes part before the join; profit stays exact
    decimal until the final cast."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    supp = _supplier_with_nation(spark, sf_dir).select("s_suppkey", "supp_nation")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lineitem = load_table(spark, sf_dir, "lineitem")
    joined = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(supp, lineitem.l_suppkey == supp.s_suppkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
    )
    return joined.groupBy(
        F.col("supp_nation").alias("nation"), F.expr(YR_ORDER).alias("yr")
    ).agg(F.expr(f"CAST(SUM({PROFIT}) AS DOUBLE)").alias("profit"))


Q9_ORACLE = f"""
SELECT n_name AS nation, {YR_ORDER} AS yr, CAST(SUM({PROFIT}) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, yr
"""


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: revenue lost to returns per customer over one half-year,
    top 20.  Aggregates to |customers| rows BEFORE joining the nation
    name; ordering ties broken by key so the top-k is engine-deterministic."""
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.expr(
            "o_orderdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00' AND "
            "o_orderdate < TIMESTAMP_NTZ '1997-07-01 00:00:00'"
        )
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name", "c_nationkey")
        .agg(F.expr(f"SUM({DISC_PRICE})").alias("rev_dec"))
    )
    return (
        per_cust.join(
            nation.select(
                F.col("n_nationkey").alias("c_nationkey"), "n_name"
            ),
            "c_nationkey",
        )
        .orderBy(F.desc("rev_dec"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("rev_dec").cast("double").alias("revenue"),
        )
    )


Q10_ORACLE = f"""
SELECT c_custkey, c_name, n_name, CAST(rev_dec AS DOUBLE) AS revenue
FROM (
  SELECT c_custkey, c_name, c_nationkey, SUM({DISC_PRICE}) AS rev_dec
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1997-07-01'
  GROUP BY c_custkey, c_name, c_nationkey
)
JOIN nation ON c_nationkey = n_nationkey
ORDER BY rev_dec DESC, c_custkey
LIMIT 20
"""


def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each qualifying part, the supplier(s) offering the
    minimum price within one region — the correlated-MIN subquery,
    decorrelated into a per-part window MIN (no second scan, no
    self-join).  "Offer" = the supplier's cheapest shipped price for the
    part (partsupp stand-in).  Ties keep every minimal supplier, which
    both engines resolve identically."""
    supp = _supplier_with_nation(spark, sf_dir)
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation")
    europe_supp = supp.join(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            F.col("n_nationkey").alias("s_nationkey")
        ),
        "s_nationkey",
        "left_semi",
    ).select("s_suppkey", "supp_nation")
    lineitem = load_table(spark, sf_dir, "lineitem")
    offers = (
        lineitem.join(europe_supp, lineitem.l_suppkey == europe_supp.s_suppkey)
        .groupBy("l_partkey", "l_suppkey", "supp_nation")
        .agg(F.expr(f"MIN({DEC_PRICE})").alias("offer_dec"))
    )
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    w = W.partitionBy("l_partkey")
    return (
        offers.join(part, offers.l_partkey == part.p_partkey)
        .withColumn("best_dec", F.min("offer_dec").over(w))
        .where(F.col("offer_dec") == F.col("best_dec"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            F.col("l_suppkey").alias("s_suppkey"),
            "supp_nation",
            F.col("offer_dec").cast("double").alias("best_price"),
        )
    )


Q2_ORACLE = f"""
WITH offers AS (
  SELECT l_partkey, l_suppkey, n_name AS supp_nation,
         MIN({DEC_PRICE}) AS offer_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey, l_suppkey, n_name
),
best AS (SELECT l_partkey, MIN(offer_dec) AS best_dec FROM offers GROUP BY l_partkey)
SELECT o.l_partkey AS p_partkey, p_name, o.l_suppkey AS s_suppkey, supp_nation,
       CAST(offer_dec AS DOUBLE) AS best_price
FROM offers o
JOIN best b ON o.l_partkey = b.l_partkey
JOIN part ON o.l_partkey = p_partkey
WHERE p_size = 15 AND p_type = 'STANDARD' AND offer_dec = best_dec
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-group value with a HAVING threshold derived from a
    GLOBAL scalar subquery (fraction of the grand total).  The grand
    total is a 1-row aggregate broadcast into the filter; the fraction
    compare is exact-integer-scaled decimal, so neither engine divides.
    "Stock value" = shipped value by NATION_5's suppliers (partsupp
    stand-in)."""
    supp = _supplier_with_nation(spark, sf_dir, ["NATION_5"]).select("s_suppkey")
    lineitem = load_table(spark, sf_dir, "lineitem")
    pv = (
        lineitem.join(supp, lineitem.l_suppkey == supp.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(F.expr(f"SUM({DISC_PRICE})").alias("val_dec"))
    )
    total_value = pv.agg(
        F.expr("CAST(SUM(val_dec) AS DECIMAL(28,4))").alias("total_dec")
    )
    return (
        pv.crossJoin(F.broadcast(total_value))
        .where(F.expr("CAST(val_dec AS DECIMAL(18,4)) * 10000 > total_dec"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.expr("CAST(val_dec AS DOUBLE)").alias("stock_value"),
        )
    )


Q11_ORACLE = f"""
WITH pv AS (
  SELECT l_partkey, SUM({DISC_PRICE}) AS val_dec
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                      JOIN nation ON s_nationkey = n_nationkey
                      WHERE n_name = 'NATION_5')
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(val_dec AS DOUBLE) AS stock_value
FROM pv
WHERE CAST(val_dec AS DECIMAL(18,4)) * 10000 >
      (SELECT CAST(SUM(val_dec) AS DECIMAL(28,4)) FROM pv)
"""


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: COUNT(DISTINCT supplier) per part attribute bucket,
    minus an excluded supplier set (the NOT IN leg, here a key-only
    anti-join).  The part↔supplier bridge is lineitem deduplicated to
    bare (partkey, suppkey) pairs BEFORE the distinct-count shuffle, so
    the heavy aggregation carries two bigints per row regardless of
    fact-table width."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") != "PROMO") & F.col("p_size").isin(5, 10, 15, 20, 25)
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_name").like("%7"))
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .dropDuplicates()
        .join(excluded, "l_suppkey", "left_anti")
    )
    return (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_ORACLE = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) li
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO' AND p_size IN (5, 10, 15, 20, 25)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
GROUP BY p_brand, p_size
"""


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested aggregate threshold (pair-level sum vs 20% of the
    part-level sum) followed by a semi-join back to the supplier
    dimension.  The share compare is integer-scaled exact decimal; both
    aggregates reuse ONE shuffle on l_partkey (the part total is a
    window over the pair aggregate, not a second scan)."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    lineitem = load_table(spark, sf_dir, "lineitem")
    pairs = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.expr(f"SUM({DEC_QTY})").alias("q_dec"))
    )
    w = W.partitionBy("l_partkey")
    dominant = pairs.withColumn(
        "tq_dec", F.sum("q_dec").over(w).cast("decimal(18,2)")
    ).where(F.expr("CAST(q_dec AS DECIMAL(18,2)) * 5 > tq_dec"))
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        supplier.join(
            dominant.select(F.col("l_suppkey").alias("s_suppkey")),
            "s_suppkey",
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )


def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification: the hourly rollup re-expressed on a
    COMPLETE hour grid (every hour × every event type), zero-filling
    hours with no events — the resample/gap-fill shape dashboards and
    downstream window functions need (a sparse rollup silently breaks
    moving averages).  The grid is generated (``sequence`` + explode)
    from a 1-row bounds aggregate, so grid size is |hours| × |types|
    regardless of event volume; the event rollup joins onto it by key.
    At 100 TB the heavy side is aggregated BEFORE the join and the tiny
    type dim is the only broadcast."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("SUM(CAST(value AS DECIMAL(18,4)))").alias("tot_dec"),
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.expr("sequence(lo, hi, INTERVAL 1 HOUR)")).alias("hour")
    )
    event_types = events.select("event_type").distinct()
    full = grid.join(F.broadcast(event_types))
    return full.join(hourly, ["hour", "event_type"], "left").select(
        "hour",
        "event_type",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.expr(
            "CAST(COALESCE(tot_dec, CAST(0 AS DECIMAL(18,4))) AS DOUBLE)"
        ).alias("total_value"),
    )


def events_value_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill imputation: values on every 3rd event are nulled
    (deterministically, so both engines blank the same cells) and then
    repaired with the last non-null value per user in time order — the
    LAST ... IGNORE NULLS window, the idiomatic distributed ffill (one
    shuffle on user_id; no self-join, no Python).  Leading nulls stay
    null, which the COALESCE-free form preserves honestly."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    holey = events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_id") % 3 != 0, F.col("value")).alias("value_holey"),
    )
    return holey.withColumn(
        "value_filled", F.last("value_holey", ignorenulls=True).over(w)
    ).select("user_id", "event_id", "value_holey", "value_filled")


FFILL_ORACLE = """
SELECT user_id, event_id, value_holey,
       LAST_VALUE(value_holey IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING
       ) AS value_filled
FROM (SELECT user_id, event_id, ts,
             CASE WHEN event_id % 3 <> 0 THEN value END AS value_holey
      FROM events)
"""


GAPFILL_ORACLE = """
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,4))) AS tot_dec
  FROM events GROUP BY 1, 2
)
SELECT g.hour, t.event_type, COALESCE(h.n, 0) AS n,
       CAST(COALESCE(h.tot_dec, CAST(0 AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM grid g
CROSS JOIN types t
LEFT JOIN hourly h ON h.hour = g.hour AND h.event_type = t.event_type
"""


Q20_ORACLE = """
WITH pairs AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q_dec
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY l_partkey, l_suppkey
),
tot AS (SELECT l_partkey, CAST(SUM(q_dec) AS DECIMAL(18,2)) AS tq_dec
        FROM pairs GROUP BY l_partkey)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM pairs JOIN tot USING (l_partkey)
  WHERE CAST(q_dec AS DECIMAL(18,2)) * 5 > tq_dec
)
"""

def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention analysis: users grouped by first-activity week
    (the cohort), counted as retained in each subsequent week they were
    active — the standard product-analytics triangle.

    Plan: per-user MIN(ts) aggregate (map-side partial, one shuffle on
    user_id) → join activity weeks back on user_id (AQE broadcasts the
    cohort side when it fits; at 100 TB both sides shuffle on user_id,
    the natural key) → distinct-user count per (cohort_week, offset).
    The week offset is exact integer day arithmetic (``datediff div 7``)
    so both engines bucket identically; DISTINCT collapses repeat
    activity inside a week before the final count."""
    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).dropDuplicates()
    return (
        act.join(first, "user_id")
        .withColumn(
            "week_offset",
            F.expr("CAST(datediff(week, cohort_week) div 7 AS BIGINT)"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


RETENTION_ORACLE = """
WITH first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT) AS week_offset,
       COUNT(DISTINCT user_id) AS n_users
FROM act JOIN first USING (user_id)
GROUP BY 1, 2
"""

def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the event value per user — the
    time-series mean that weights each reading by how long it was the
    current one (sensor/metric semantics), not the naive row mean.

    Plan: one window (lead of the epoch-microsecond timestamp) on the
    user key, then a plain aggregate.  Exactness: durations are integer
    microseconds, values are cast to exact DECIMAL(18,6) before the
    weighted sum, so the aggregate is order-independent and the single
    double division happens once, at output.  Deterministic ordering tie
    break on event_id for equal timestamps."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.withColumn("t_us", F.expr("unix_micros(ts)"))
        .withColumn("next_us", F.lead("t_us").over(w))
        .where(F.col("next_us").isNotNull())
        .select(
            "user_id",
            (F.col("next_us") - F.col("t_us")).alias("dur_us"),
            F.expr("CAST(value AS DECIMAL(18,6))").alias("v"),
        )
    )
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.expr("CAST(SUM(dur_us) AS BIGINT)").alias("total_dur_us"),
        F.expr(
            "ROUND(CAST(SUM(v * dur_us) AS DOUBLE) / CAST(SUM(dur_us) AS DOUBLE), 6)"
        ).alias("twa_value"),
    )


TWA_ORACLE = """
WITH seq AS (
  SELECT user_id,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - epoch_us(ts) AS dur_us,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events
)
SELECT user_id, COUNT(*) AS n_intervals,
       CAST(SUM(dur_us) AS BIGINT) AS total_dur_us,
       ROUND(CAST(SUM(v * dur_us) AS DOUBLE) / CAST(SUM(dur_us) AS DOUBLE), 6)
         AS twa_value
FROM seq WHERE dur_us IS NOT NULL
GROUP BY user_id
"""

def user_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: counts and probabilities of event_type → next event_type
    — the sequence statistic behind session modeling and next-event
    prediction features.

    Plan: one lead() window on the user key (tie-broken on event_id for
    determinism), then an aggregate on the bounded type×type domain; the
    row-probability denominator rides a second window over the ≤|types|²
    aggregate, not the raw events."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("to_type", F.lead("event_type").over(w)).where(
        F.col("to_type").isNotNull()
    )
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.expr("ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type), 6)").alias(
            "p"
        ),
    )


TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type), 6) AS p
FROM counts
"""

def order_price_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of order totals — the data-profiling
    binning that adapts to the distribution, unlike the fixed-width
    ``events_value_histogram``.

    Scale-safe formulation: NOT a global ``ntile`` (a single-partition
    window sort of the whole table); instead the 9 interior boundaries
    come from ``percentile_disc`` — one aggregate — and the bucket id is
    a flat comparison sum against the broadcast 1-row boundary frame.
    ``percentile_disc`` returns ACTUAL data values (exact DECIMAL cents,
    no interpolation), so cross-engine bucket edges are bit-identical —
    interpolated ``percentile_cont`` boundaries would round differently
    than the data they are compared against."""
    orders = load_table(spark, sf_dir, "orders")
    v = "CAST(o_totalprice AS DECIMAL(18,2))"
    qs = [i / 10 for i in range(1, 10)]
    bounds = orders.agg(
        *[
            F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY {v})").alias(
                f"b{int(p * 10)}"
            )
            for p in qs
        ]
    )
    bucket = sum(
        F.when(F.expr(f"{v} > b{i}"), 1).otherwise(0) for i in range(1, 10)
    ) + F.lit(1)
    return (
        orders.crossJoin(F.broadcast(bounds))
        .select(bucket.cast("long").alias("decile"), F.expr(f"{v}").alias("p"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr("CAST(MIN(p) AS DOUBLE)").alias("lo"),
            F.expr("CAST(MAX(p) AS DOUBLE)").alias("hi"),
        )
    )


EQUIDEPTH_ORACLE = """
WITH bounds AS (
  SELECT quantile_disc(CAST(o_totalprice AS DECIMAL(18,2)), 0.1) AS b1,
         quantile_disc(CAST(o_totalprice AS DECIMAL(18,2)), 0.2) AS b2,
         quantile_disc(CAST(o_totalprice AS DECIMAL(18,2)), 0.3) AS b3,
         quantile_disc(CAST(o_totalprice AS DECIMAL(18,2)), 0.4) AS b4,
         quantile_disc(CAST(o_totalprice AS DECIMAL(18,2)), 0.5) AS b5,
         quantile_disc(CAST(o_totalprice AS DECIMAL(18,2)), 0.6) AS b6,
         quantile_disc(CAST(o_totalprice AS DECIMAL(18,2)), 0.7) AS b7,
         quantile_disc(CAST(o_totalprice AS DECIMAL(18,2)), 0.8) AS b8,
         quantile_disc(CAST(o_totalprice AS DECIMAL(18,2)), 0.9) AS b9
  FROM orders
)
SELECT CAST(1 + (p > b1)::INT + (p > b2)::INT + (p > b3)::INT + (p > b4)::INT
          + (p > b5)::INT + (p > b6)::INT + (p > b7)::INT + (p > b8)::INT
          + (p > b9)::INT AS BIGINT) AS decile,
       COUNT(*) AS n_orders,
       CAST(MIN(p) AS DOUBLE) AS lo,
       CAST(MAX(p) AS DOUBLE) AS hi
FROM (SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders)
CROSS JOIN bounds
GROUP BY 1
"""


def funnel_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion latency: per user, the time from the
    FIRST view to the first purchase AFTER it; reported as conversion
    counts plus exact p50/p90 latency.  The percentiles run on integer
    microseconds via ``percentile_disc`` (actual data values — exact and
    engine-identical; a continuous percentile would interpolate doubles).
    Plan: two key-only aggregates on user_id + one join — no windows over
    raw events."""
    ev = load_table(spark, sf_dir, "events")
    first_view = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.expr("MIN(unix_micros(ts))").alias("view_us"))
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.expr("unix_micros(ts)").alias("p_us")
    )
    conv = (
        purch.join(first_view, "user_id")
        .where(F.col("p_us") > F.col("view_us"))
        .groupBy("user_id", "view_us")
        .agg(F.min("p_us").alias("first_purchase_us"))
        .select((F.col("first_purchase_us") - F.col("view_us")).alias("lat_us"))
    )
    n_viewers = first_view.agg(F.count(F.lit(1)).alias("n_viewers"))
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY lat_us) AS BIGINT)"
        ).alias("p50_latency_us"),
        F.expr(
            "CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY lat_us) AS BIGINT)"
        ).alias("p90_latency_us"),
    ).crossJoin(F.broadcast(n_viewers))


FUNNEL_LATENCY_ORACLE = """
WITH first_view AS (
  SELECT user_id, MIN(epoch_us(ts)) AS view_us
  FROM events WHERE event_type = 'view' GROUP BY user_id
), conv AS (
  SELECT e.user_id, MIN(epoch_us(ts)) - ANY_VALUE(view_us) AS lat_us
  FROM events e JOIN first_view fv
    ON e.user_id = fv.user_id AND epoch_us(e.ts) > fv.view_us
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id
)
SELECT COUNT(*) AS n_converted,
       quantile_disc(lat_us, 0.5) AS p50_latency_us,
       quantile_disc(lat_us, 0.9) AS p90_latency_us,
       (SELECT COUNT(*) FROM first_view) AS n_viewers
FROM conv
"""

def customer_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate pairs: customers in the SAME nation
    whose names are within Levenshtein distance 2, reported as a
    per-(nation, distance) histogram.  The classic fuzzy-dedup shape:
    BLOCK on a stable attribute (nation), prune candidates with a cheap
    length filter, run the expensive edit distance only inside blocks —
    never all-pairs.  Both engines implement unit-cost Levenshtein, so
    the histogram is exactly oracle-checked.

    Scale: block sizes are |customers|/|nations|; the quadratic term is
    per-block, and the length pre-filter (|len_a − len_b| ≤ 2 is a
    necessary condition for distance ≤ 2) cuts candidates before any
    distance is computed.  A skewed block (one giant nation) would call
    for sub-blocking on a name prefix — the same salting idea as
    ``salted_join``."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    a = cust.select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
    )
    b = cust.select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
    )
    pairs = (
        a.join(b, "nk")
        .where(F.col("key_a") < F.col("key_b"))
        .where(
            F.abs(F.length("name_a") - F.length("name_b")) <= 2
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .where(F.col("dist") <= 2)
    )
    return pairs.groupBy(F.col("nk").alias("nationkey"), "dist").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


FUZZY_NAME_ORACLE = """
SELECT a.c_nationkey AS nationkey,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist,
       COUNT(*) AS n_pairs
FROM customer a
JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_custkey < b.c_custkey
 AND abs(length(a.c_name) - length(b.c_name)) <= 2
WHERE levenshtein(a.c_name, b.c_name) <= 2
GROUP BY 1, 2
"""

def winsorized_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type value statistics: mean before and after
    winsorizing at the exact p01/p99 — the standard tail-clipping that
    keeps a few broken readings from dragging a metric.  Clip bounds
    come from ``percentile_disc`` (actual data values, engine-exact;
    see ``order_price_equidepth``); the bounded per-type frame joins
    back broadcast-size, and both means aggregate as exact DECIMAL so
    results are partition-order-independent."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    v = "CAST(value AS DECIMAL(18,6))"
    bounds = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.expr(f"percentile_disc(0.01) WITHIN GROUP (ORDER BY {v})").alias("lo"),
        F.expr(f"percentile_disc(0.99) WITHIN GROUP (ORDER BY {v})").alias("hi"),
    )
    clipped = ev.join(
        F.broadcast(bounds), ev.event_type == bounds.et
    ).select(
        "event_type",
        F.expr(v).alias("vd"),
        F.expr(f"LEAST(GREATEST({v}, lo), hi)").alias("vw"),
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("ROUND(CAST(SUM(vd) AS DOUBLE) / COUNT(*), 6)").alias("mean_raw"),
        F.expr("ROUND(CAST(SUM(vw) AS DOUBLE) / COUNT(*), 6)").alias(
            "mean_winsorized"
        ),
    )


WINSORIZED_ORACLE = """
WITH bounds AS (
  SELECT event_type AS et,
         quantile_disc(CAST(value AS DECIMAL(18,6)), 0.01) AS lo,
         quantile_disc(CAST(value AS DECIMAL(18,6)), 0.99) AS hi
  FROM events GROUP BY event_type
)
SELECT event_type, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS mean_raw,
       ROUND(CAST(SUM(LEAST(GREATEST(CAST(value AS DECIMAL(18,6)), lo), hi))
                  AS DOUBLE) / COUNT(*), 6) AS mean_winsorized
FROM events JOIN bounds ON event_type = et
GROUP BY event_type
"""


def user_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching over per-user event streams — the
    MATCH_RECOGNIZE stand-in: each user's time-ordered events collapse to
    a character sequence (one char per event type; the five types have
    distinct initials), and patterns become regular expressions over that
    string.  Counted here: completed view→click→purchase funnels with no
    intervening purchase (``v[^p]*c[^p]*p``, leftmost non-overlapping —
    identical semantics in Java regex and RE2), plus whether the user ever
    hit an error.

    Scale shape: ONE shuffle on user_id (the collect_list agg with
    map-side partials), per-user state = the user's own event count; the
    regex runs once per user, not per event.  A degenerate mega-user
    (bot traffic) would fatten one row and one task at 100 TB, so users
    above ``max_seq_events`` are excluded up front — the same
    ``max_basket`` guard as ``part_cooccurrence``, mirrored in the
    oracle.  For legitimate power users, window the sequence by
    day/session before collapsing (same operator, composed with the
    sessionizer)."""
    max_seq_events = 10_000
    ev = load_table(spark, sf_dir, "events")
    eligible = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_ev"))
        .where(F.col("n_ev") <= max_seq_events)
        .select("user_id")
    )
    ev = ev.join(eligible, "user_id", "left_semi")
    r = F.struct(
        F.col("ts"), F.col("event_id"), F.substring("event_type", 1, 1).alias("ch")
    )
    seqs = (
        ev.select("user_id", r.alias("r"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("r")), lambda x: x["ch"]),
                "",
            ).alias("seq")
        )
    )
    return seqs.select(
        "user_id",
        F.length("seq").cast("bigint").alias("n_events"),
        F.size(F.expr("regexp_extract_all(seq, 'v[^p]*c[^p]*p', 0)"))
        .cast("bigint")
        .alias("n_funnels"),
        (F.instr("seq", "e") > 0).alias("has_error"),
    )


EVENT_PATTERN_ORACLE = """
WITH eligible AS (
  SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) <= 10000
), seqs AS (
  SELECT user_id,
         string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events
  WHERE user_id IN (SELECT user_id FROM eligible)
  GROUP BY user_id
)
SELECT user_id,
       CAST(length(seq) AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(seq, 'v[^p]*c[^p]*p')) AS BIGINT) AS n_funnels,
       contains(seq, 'e') AS has_error
FROM seqs
"""
