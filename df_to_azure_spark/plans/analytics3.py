"""Third analytics wave — the remaining distinct TPC-H query *shapes*:
non-equi EXISTS, outer-join histogram, conditional-aggregate share,
max-over-aggregate, HAVING + semi-join-back, disjunctive predicates.
Same exact-decimal oracle policy as plans.analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from df_to_azure_spark.plans.analytics import DISC_PRICE
from df_to_azure_spark.sources import load_table


def q4_late_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS with a non-equi condition — orders having at
    least one lineitem shipped >30 days after the order date, counted per
    priority.  The semi-join carries the extra range predicate alongside
    the key equality."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        lineitem,
        (orders.o_orderkey == lineitem.l_orderkey)
        & F.expr("l_shipdate > o_orderdate + INTERVAL 30 DAYS"),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


def q12_returnflag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: IN-list + range filter on the fact side, join to the
    header, then conditional CASE aggregation splitting a priority column
    into high/low counts.  (The test data has no ``l_shipmode`` or
    ``l_receiptdate``, so ``l_returnflag`` plays the ship-mode role and
    ``l_shipdate`` the receipt-date role — the plan shape is identical:
    both the IN-list and the range predicate are pushed to the lineitem
    scan, the join shuffles only the two surviving columns + key, and the
    CASE folds into the partial aggregate map-side.)"""
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("A", "R")
        & F.expr(
            "l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP_NTZ '1997-01-01 00:00:00'"
        )
    ).select("l_orderkey", "l_returnflag")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
    return joined.groupBy("l_returnflag").agg(
        F.expr(
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("high_line_count"),
        F.expr(
            "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("low_line_count"),
    )


Q12_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_returnflag IN ('A', 'R')
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: LEFT OUTER join + double aggregation — histogram of
    customers by their order count, zero-order customers included."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


Q13_ORACLE = """
SELECT n_orders, COUNT(*) AS n_customers
FROM (SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
GROUP BY n_orders
"""


def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional aggregation — promo revenue share over a
    shipping year.  NULL-else CASE so both engines skip non-promo rows in
    the numerator sum identically."""
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        F.expr(
            "l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP_NTZ '1997-01-01 00:00:00'"
        )
    )
    part = load_table(spark, sf_dir, "part")
    joined = lineitem.join(part, lineitem.l_partkey == part.p_partkey)
    return joined.agg(
        F.expr(
            f"ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {DISC_PRICE} END) AS DOUBLE)"
            f" / CAST(SUM({DISC_PRICE}) AS DOUBLE), 6)"
        ).alias("promo_share_pct")
    )


Q14_ORACLE = f"""
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {DISC_PRICE} END) AS DOUBLE)
             / CAST(SUM({DISC_PRICE}) AS DOUBLE), 6) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: aggregate, then filter to the max of the aggregate via
    a 1-row max aggregate broadcast back onto the grouped frame — the
    partial/final agg is parallel, the broadcast is one row; no
    single-partition window stage anywhere (the former empty-frame
    window funneled every supplier group through one task)."""
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        F.expr(
            "l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP_NTZ '1996-04-01 00:00:00'"
        )
    )
    rev = lineitem.groupBy("l_suppkey").agg(
        F.expr(f"SUM({DISC_PRICE})").alias("rev_dec")
    )
    max_rev = rev.agg(F.max("rev_dec").alias("max_rev"))
    return (
        rev.join(F.broadcast(max_rev), rev.rev_dec == max_rev.max_rev)
        .select("l_suppkey", F.col("rev_dec").cast("double").alias("total_revenue"))
    )


Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({DISC_PRICE}) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT l_suppkey, CAST(rev_dec AS DOUBLE) AS total_revenue
FROM rev WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)
"""


def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING on a grouped sum, then join back for the order
    header.  The qualifying key set is small but data-dependent, so no
    static broadcast hint — AQE broadcasts it at runtime when it fits."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.expr("SUM(CAST(l_quantity AS DECIMAL(18,2)))").alias("qty_dec"))
        .where(F.col("qty_dec") > 150)
    )
    return (
        orders.join(
            big, orders.o_orderkey == big.l_orderkey
        ).select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
    )


Q18_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderdate, CAST(qty_dec AS DOUBLE) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150) big
  ON o_orderkey = big.l_orderkey
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs across both join sides — exercises predicate
    normalization and partial pushdown (the per-table conjuncts Catalyst
    can factor out still reach the scans)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = lineitem.join(part, lineitem.l_partkey == part.p_partkey)
    cond = F.expr(
        "(p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 1 AND l_quantity <= 20)"
        " OR (p_brand = 'Brand#5' AND p_size <= 20 AND l_quantity >= 10 AND l_quantity <= 30)"
        " OR (p_type = 'PROMO' AND l_quantity >= 20)"
    )
    return joined.where(cond).agg(
        F.expr(f"CAST(SUM({DISC_PRICE}) AS DOUBLE)").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q19_ORACLE = f"""
SELECT CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#5' AND p_size <= 20 AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_type = 'PROMO' AND l_quantity >= 20)
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated aggregate subquery — lineitems whose
    quantity is below 20% of their part's average quantity.  Decorrelated
    the way Catalyst would: per-part averages via one groupBy, joined
    back on the part key (shuffle on l_partkey both sides, AQE handles
    the rest).  The threshold comparison uses exact decimal arithmetic so
    both engines select the identical row set."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = lineitem.groupBy("l_partkey").agg(
        F.expr("AVG(CAST(l_quantity AS DECIMAL(18,2)))").alias("avg_qty")
    )
    joined = lineitem.join(per_part, "l_partkey")
    # the 0.2*avg product stays exact decimal (scale widens, no mid-plan
    # rounding cast — Spark rounds HALF_UP, DuckDB HALF_EVEN, so any real
    # rounding here would diverge between engine and oracle)
    small = joined.where(
        F.expr("CAST(l_quantity AS DECIMAL(18,2)) < 0.2 * avg_qty")
    )
    return small.agg(
        F.expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)").alias(
            "small_qty_revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


Q17_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN (SELECT l_partkey, AVG(CAST(l_quantity AS DECIMAL(18,2))) AS avg_qty
      FROM lineitem GROUP BY l_partkey) p
  ON l.l_partkey = p.l_partkey
WHERE CAST(l.l_quantity AS DECIMAL(18,2)) < 0.2 * p.avg_qty
"""


def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: global scalar subquery + anti join — customers with an
    above-average positive balance and NO orders, counted per country
    prefix.  The global average is one tiny aggregate broadcast into the
    filter (Spark evaluates the scalar subquery as a separate job and
    folds the value in — equivalent to a cross join with a 1-row frame);
    the no-orders test is a left-anti shuffle join on the customer key."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    positive = customer.where(F.expr("CAST(c_acctbal AS DECIMAL(18,2)) > 0"))
    avg_bal = positive.agg(
        F.expr("AVG(CAST(c_acctbal AS DECIMAL(18,2)))").alias("avg_bal")
    )
    rich = positive.crossJoin(F.broadcast(avg_bal)).where(
        F.expr("CAST(c_acctbal AS DECIMAL(18,2)) > avg_bal")
    )
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return idle.groupBy((F.col("c_nationkey") % 10).alias("cntry_bucket")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)").alias(
            "total_balance"
        ),
    )


Q22_ORACLE = """
SELECT c_nationkey % 10 AS cntry_bucket, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer
WHERE CAST(c_acctbal AS DECIMAL(18,2)) >
      (SELECT AVG(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer
       WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey % 10
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: EXISTS and NOT EXISTS correlated on the SAME table with
    different predicates — suppliers who were the sole late shipper in a
    multi-supplier order.  Decorrelated as one semi-join (some other
    supplier participated) then one anti-join (no other supplier was
    late) on the order key; all three legs prune to (orderkey, suppkey)
    pairs before shuffling, so the joins carry two columns regardless of
    lineitem width."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    li = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        F.expr("l_shipdate > o_orderdate + INTERVAL 30 DAYS").alias("late"),
    )
    late = li.where("late").select("l_orderkey", "l_suppkey").dropDuplicates()
    others = li.select("l_orderkey", F.col("l_suppkey").alias("o_supp")).dropDuplicates()
    late_others = late.select(
        "l_orderkey", F.col("l_suppkey").alias("o_supp")
    )

    multi = late.join(
        others,
        (late.l_orderkey == others.l_orderkey) & (late.l_suppkey != others.o_supp),
        "left_semi",
    )
    sole = multi.join(
        late_others,
        (multi.l_orderkey == late_others.l_orderkey)
        & (multi.l_suppkey != late_others.o_supp),
        "left_anti",
    )
    return (
        sole.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_waiting_orders"))
        .orderBy(F.desc("n_waiting_orders"), F.asc("l_suppkey"))
        .limit(10)
    )


Q21_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 30 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE late)
SELECT l_suppkey, COUNT(*) AS n_waiting_orders
FROM late l1
WHERE EXISTS (SELECT 1 FROM li l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY l_suppkey
ORDER BY n_waiting_orders DESC, l_suppkey
LIMIT 10
"""


def fk_orphan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: child keys
    with no parent row, per relationship.  Key-only anti-joins (two
    columns shuffled per leg); a healthy warehouse returns zero rows, so
    the oracle is the empty set — same inverted-contract pattern as the
    bounded-error checks."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    def orphans(child, key, parent, pkey, rel):
        return (
            child.select(F.col(key).alias("child_key"))
            .distinct()
            .join(
                parent.select(F.col(pkey).alias("child_key")),
                "child_key",
                "left_anti",
            )
            .select(F.lit(rel).alias("relationship"), "child_key")
        )

    return (
        orphans(lineitem, "l_orderkey", orders, "o_orderkey", "lineitem->orders")
        .unionByName(
            orphans(orders, "o_custkey", customer, "c_custkey", "orders->customer")
        )
        .unionByName(
            orphans(lineitem, "l_suppkey", supplier, "s_suppkey", "lineitem->supplier")
        )
        .unionByName(
            orphans(customer, "c_nationkey", nation, "n_nationkey", "customer->nation")
        )
    )


FK_ORPHAN_ORACLE = """
SELECT CAST(NULL AS VARCHAR) AS relationship, CAST(NULL AS BIGINT) AS child_key
WHERE 1 = 0
"""


def order_price_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped median/quartiles via Spark's `percentile` (full sort
    within group, linear interpolation) — the exact counterpart of the
    approx sketch in `approx_event_stats`.  Both engines interpolate on
    the same sorted doubles, so the result is engine-reproducible."""
    orders = load_table(spark, sf_dir, "orders")
    v = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)"
    return orders.groupBy("o_orderstatus").agg(
        F.expr(f"ROUND(percentile({v}, 0.25), 4)").alias("p25"),
        F.expr(f"ROUND(percentile({v}, 0.5), 4)").alias("median"),
        F.expr(f"ROUND(percentile({v}, 0.75), 4)").alias("p75"),
    )


MEDIAN_ORACLE = """
SELECT o_orderstatus,
  round(quantile_cont(v, 0.25), 4) AS p25,
  round(quantile_cont(v, 0.5), 4) AS median,
  round(quantile_cont(v, 0.75), 4) AS p75
FROM (SELECT o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS v
      FROM orders)
GROUP BY o_orderstatus
"""


def nation_account_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join shape: per-nation customer balance totals against
    supplier balance totals — either side may be absent, coalesced to
    zero.  Both inputs are pre-aggregated to ≤|nations| rows BEFORE the
    join, so the outer join is trivially small no matter the data
    scale (aggregate-then-join, never join-then-aggregate)."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)").alias(
            "cust_balance"
        )
    )
    s = supplier.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.expr("CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)").alias(
            "supp_balance"
        )
    )
    return c.join(s, "nationkey", "full_outer").select(
        "nationkey",
        F.coalesce("cust_balance", F.lit(0.0)).alias("cust_balance"),
        F.coalesce("supp_balance", F.lit(0.0)).alias("supp_balance"),
    )


FULL_OUTER_ORACLE = """
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(cust_balance, 0.0) AS cust_balance,
       COALESCE(supp_balance, 0.0) AS supp_balance
FROM (SELECT c_nationkey AS nationkey,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS cust_balance
      FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN
     (SELECT s_nationkey AS nationkey,
             CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS supp_balance
      FROM supplier GROUP BY s_nationkey) s
  ON c.nationkey = s.nationkey
"""


def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join surfaced in the oracle-checked set: orders ⋈
    customer through ``salted_join`` (hot keys spread over salt buckets),
    aggregated per market segment.  The oracle is the PLAIN join — the
    salting must be row-identical, making the rewrite's correctness a
    hash-checked contract rather than a unit-test claim."""
    from df_to_azure_spark.operators.partitioning import salted_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).withColumnRenamed("o_custkey", "c_custkey")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_join(orders, customer, "c_custkey", salt_buckets=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").alias(
            "total_price"
        ),
    )


SALTED_JOIN_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def customers_outside_asia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (subquery) — the NULL-AWARE anti-join shape, a different
    physical operator than ``left_anti`` (which treats NULL keys as
    non-matching; NOT IN must return nothing if the subquery yields any
    NULL).  Expressed in SQL so Catalyst plans its null-aware variant."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_cust_nia")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("v_nat_nia")
    load_table(spark, sf_dir, "region").createOrReplaceTempView("v_reg_nia")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM v_cust_nia
        WHERE c_nationkey NOT IN (
          SELECT n_nationkey FROM v_nat_nia
          JOIN v_reg_nia ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
        )
        GROUP BY c_mktsegment
        """
    )


NOT_IN_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE c_nationkey NOT IN (
  SELECT n_nationkey FROM nation
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
)
GROUP BY c_mktsegment
"""
