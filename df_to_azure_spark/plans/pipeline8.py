"""Round-9 extension wave: sufficient-statistics ML (ridge regression by
normal equations — the one-pass distributed closed-form fit), inequality
measurement (Gini over the two_phase_rank distributed ranking),
time-to-event analytics (Kaplan-Meier churn curve with right-censoring),
and per-document lexical-richness stats (type-token ratio + hapax
share), among others added through the round.

Cross-engine policy unchanged: money and quantities integerize through
the DECIMAL cents device before any aggregation, every sum is
DECIMAL(38,x) (aggregation-order-free), transcendentals (LN here) follow
the ROUND(·,12)-per-row policy the Zipf/attribution queries established,
ratios are emitted by the exact half-up integer-division device, and the
Cramer-rule determinants are generated ONCE as shared expression text so
Spark and the DuckDB oracle evaluate the identical IEEE tree.  No
counterpart exists in the reference (zypp-io/df_to_azure is pandas + ADF
orchestration, `/root/reference/df_to_azure/export.py`); engine-extension
per the training-data brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from df_to_azure_spark.functions.distrank import two_phase_rank
from df_to_azure_spark.operators.partitioning import spread
from df_to_azure_spark.sources import load_table

# --------------------------------------------------------------------------
# Ridge regression via normal equations (sufficient statistics, one pass)
# --------------------------------------------------------------------------

_RIDGE_LAMBDA = 1000.0  # literal; on the non-intercept diagonal only


def _ridge_formulas() -> dict[str, str]:
    """Cramer-rule expression text for the 3×3 ridge system, generated
    once and shared verbatim by the Spark plan and the DuckDB oracle:
    identical expression trees over identical DOUBLE inputs evaluate
    bit-identically (IEEE 754 is deterministic; only DIFFERING
    association orders drift), so the betas need no tolerance.

    System: (XᵀX + λ·diag(0,1,1)) β = Xᵀy with X = [1, x1, x2], built
    from the nine exact DECIMAL sufficient statistics n, sx1, sx2, s11,
    s22, s12, sy, s1y, s2y."""
    lam = f"CAST({_RIDGE_LAMBDA!r} AS DOUBLE)"
    a11 = "CAST(n AS DOUBLE)"
    a12 = "CAST(sx1 AS DOUBLE)"
    a13 = "CAST(sx2 AS DOUBLE)"
    a22 = f"(CAST(s11 AS DOUBLE) + {lam})"
    a23 = "CAST(s12 AS DOUBLE)"
    a33 = f"(CAST(s22 AS DOUBLE) + {lam})"
    b1 = "CAST(sy AS DOUBLE)"
    b2 = "CAST(s1y AS DOUBLE)"
    b3 = "CAST(s2y AS DOUBLE)"

    def det3(r1, r2, r3):
        (x1, x2, x3), (y1, y2, y3), (z1, z2, z3) = r1, r2, r3
        return (
            f"({x1} * ({y2} * {z3} - {y3} * {z2})"
            f" - {x2} * ({y1} * {z3} - {y3} * {z1})"
            f" + {x3} * ({y1} * {z2} - {y2} * {z1}))"
        )

    a_rows = [(a11, a12, a13), (a12, a22, a23), (a13, a23, a33)]
    det_a = det3(*a_rows)

    def replaced(col_i):
        b = (b1, b2, b3)
        return [
            tuple(b[r] if c == col_i else a_rows[r][c] for c in range(3))
            for r in range(3)
        ]

    return {
        "det": det_a,
        "beta0": f"ROUND({det3(*replaced(0))} / {det_a}, 10)",
        "beta1": f"ROUND({det3(*replaced(1))} / {det_a}, 10)",
        "beta2": f"ROUND({det3(*replaced(2))} / {det_a}, 10)",
    }


def ridge_regression_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed ridge regression fit in ONE pass: predict the line
    revenue (cents) from quantity and discount over the whole lineitem
    table by aggregating the nine sufficient statistics of the normal
    equations (n, Σx, Σx², Σxy — all exact DECIMAL(38,0) sums of
    integerized features), then solving the 3×3 system (XᵀX + λI')β =
    Xᵀy on the driver row via Cramer's rule.  This is how linear models
    actually train at 100 TB — the data pass is a single fused
    aggregation (map-side partial, one shuffle to one row); the solve is
    O(1).  λ = 1000 on the non-intercept diagonal (plain ridge).

    Exactness: features integerize exactly (cents / hundredths), sums
    are DECIMAL (order-free), and the determinant formulas are the SAME
    generated expression text in Spark and the oracle, so the DOUBLE
    arithmetic trees match bit for bit.  Returns one row:
    ``(n, beta0, beta1, beta2)`` with betas ROUND(10)."""
    li = load_table(spark, sf_dir, "lineitem")
    feats = li.select(
        F.expr(
            "CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100"
            " AS DECIMAL(19,0))"
        ).alias("x1"),
        F.expr(
            "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100"
            " AS DECIMAL(19,0))"
        ).alias("x2"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100"
            " AS DECIMAL(19,0))"
        ).alias("y"),
    )
    suff = feats.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("CAST(SUM(x1) AS DECIMAL(38,0))").alias("sx1"),
        F.expr("CAST(SUM(x2) AS DECIMAL(38,0))").alias("sx2"),
        F.expr("CAST(SUM(x1 * x1) AS DECIMAL(38,0))").alias("s11"),
        F.expr("CAST(SUM(x2 * x2) AS DECIMAL(38,0))").alias("s22"),
        F.expr("CAST(SUM(x1 * x2) AS DECIMAL(38,0))").alias("s12"),
        F.expr("CAST(SUM(y) AS DECIMAL(38,0))").alias("sy"),
        F.expr("CAST(SUM(x1 * y) AS DECIMAL(38,0))").alias("s1y"),
        F.expr("CAST(SUM(x2 * y) AS DECIMAL(38,0))").alias("s2y"),
    )
    fm = _ridge_formulas()
    return suff.selectExpr(
        "n",
        f"{fm['beta0']} AS beta0",
        f"{fm['beta1']} AS beta1",
        f"{fm['beta2']} AS beta2",
    )


def _ridge_oracle() -> str:
    fm = _ridge_formulas()
    return f"""
WITH feats AS (
  SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) AS x1,
         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) AS x2,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
              AS DECIMAL(19,0)) AS y
  FROM lineitem
), suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS DECIMAL(38,0)) AS sx1,
         CAST(SUM(x2) AS DECIMAL(38,0)) AS sx2,
         CAST(SUM(x1 * x1) AS DECIMAL(38,0)) AS s11,
         CAST(SUM(x2 * x2) AS DECIMAL(38,0)) AS s22,
         CAST(SUM(x1 * x2) AS DECIMAL(38,0)) AS s12,
         CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(x1 * y) AS DECIMAL(38,0)) AS s1y,
         CAST(SUM(x2 * y) AS DECIMAL(38,0)) AS s2y
  FROM feats
)
SELECT n,
       {fm['beta0']} AS beta0,
       {fm['beta1']} AS beta1,
       {fm['beta2']} AS beta2
FROM suff
"""


RIDGE_ORACLE = _ridge_oracle()


# --------------------------------------------------------------------------
# Gini coefficient of customer revenue (distributed ranking, exact integers)
# --------------------------------------------------------------------------


def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL Gini coefficient of lifetime revenue across all ordering
    customers — the corpus-level companion to the per-nation
    ``customer_gini_by_nation`` (pipeline4) and to
    ``part_abc_classification``'s cumulative-share table; the
    ``revenue_lorenz_deciles`` query plots this number's curve.  Uses
    the rank formula
    ``G = (2·Σi·yᵢ − (n+1)·Σyᵢ) / (n·Σyᵢ)`` over revenues sorted
    ascending with (revenue, custkey) tie-break — every term an exact
    integer, so the coefficient is engine-exact via the half-up
    integer-division device (scale 1e6).

    Scale shape: one groupBy for per-customer cents, the distributed
    ``two_phase_rank`` for the global ascending rank (range partition +
    per-partition offsets — never a single-partition window), one fused
    final aggregation.  Customers with no orders are out of scope by
    construction (revenue undefined vs zero is a policy choice;
    documented, matched by the oracle)."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.expr(
            "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
            " AS DECIMAL(19,0))) AS DECIMAL(19,0))"
        ).alias("rev_cents")
    )
    ranked = two_phase_rank(
        rev,
        order_by=[("rev_cents", "asc"), ("o_custkey", "asc")],
        rank_col="rk",
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.expr("CAST(SUM(rev_cents) AS DECIMAL(38,0))").alias("total_cents"),
        F.expr(
            "CAST(SUM(CAST(rk AS DECIMAL(19,0)) * rev_cents)"
            " AS DECIMAL(38,0))"
        ).alias("s_iy"),
    ).selectExpr(
        "n_customers",
        "CAST(total_cents AS BIGINT) AS total_cents",
        # G = (2*s_iy - (n+1)*total) / (n*total), exact half-up at 1e6
        "CAST((2000000 * (2 * s_iy - (n_customers + 1) * total_cents)"
        " + (n_customers * total_cents))"
        " DIV (2 * (n_customers * total_cents)) AS DOUBLE)"
        " / CAST(1000000 AS DOUBLE) AS gini",
    )


GINI_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
              AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS rev_cents
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT rev_cents,
         CAST(row_number() OVER (ORDER BY rev_cents, o_custkey)
              AS DECIMAL(19,0)) AS rk
  FROM rev
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(rev_cents) AS BIGINT) AS total_cents,
       CAST((2000000 * (2 * CAST(SUM(rk * rev_cents) AS HUGEINT)
             - (COUNT(*) + 1) * CAST(SUM(rev_cents) AS HUGEINT))
             + (COUNT(*) * CAST(SUM(rev_cents) AS HUGEINT)))
            // (2 * (COUNT(*) * CAST(SUM(rev_cents) AS HUGEINT)))
            AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS gini
FROM ranked
"""


# --------------------------------------------------------------------------
# Kaplan-Meier time-to-churn curve (right-censored survival analysis)
# --------------------------------------------------------------------------

_KM_CENSOR_DAYS = 7  # active within the last week of data = censored


def event_user_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier estimate of user lifetime (days from first to last
    event): users whose last event falls within ``_KM_CENSOR_DAYS`` of
    the corpus's final day are RIGHT-CENSORED (still active — their true
    lifetime is only known to exceed the observed one); everyone else
    "churned" at their observed duration.  Output: one row per distinct
    observed duration with the risk set, churn/censor counts, the
    KM survival estimate, and its exact log form — the
    retention curve product analytics reads off for "how long does a
    user live".

    Exactness: per-step factors (n_risk − d)/n_risk are exact-integer
    quotients; each step contributes ``ROUND(LN(factor), 12)`` (the
    Zipf/attribution transcendental policy) into a DECIMAL(38,12)
    cumulative sum — aggregation-order-free — and the final
    ``km_survival = ROUND(EXP(log_survival), 6)`` is one transcendental
    over a bit-identical input.  Censored rows enter the risk set at
    their duration but contribute no factor (standard KM convention:
    censoring removes AFTER the time point).

    Scale shape: the per-user pass is one groupBy; everything after
    runs on the per-duration frame, bounded by the CALENDAR (distinct
    day-counts), not the user count — so the cumulative windows are
    bounded by construction."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.expr("MIN(CAST(ts AS DATE))").alias("d0"),
        F.expr("MAX(CAST(ts AS DATE))").alias("d1"),
    )
    gmax = ev.agg(F.expr("MAX(CAST(ts AS DATE))").alias("dmax"))
    lifetimes = per_user.crossJoin(F.broadcast(gmax)).select(
        F.expr("CAST(datediff(d1, d0) AS BIGINT)").alias("dur"),
        F.expr(
            f"CASE WHEN datediff(dmax, d1) < {_KM_CENSOR_DAYS}"
            " THEN 1 ELSE 0 END"
        ).alias("censored"),
    )
    per_dur = lifetimes.groupBy("dur").agg(
        F.expr("CAST(SUM(1 - censored) AS BIGINT)").alias("n_churned"),
        F.expr("CAST(SUM(censored) AS BIGINT)").alias("n_censored"),
    )
    n_tot = lifetimes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    from pyspark.sql import Window as W

    # bounded: per-duration frame, ≤ |calendar days| rows by construction
    w_excl = W.orderBy(F.asc("dur")).rowsBetween(W.unboundedPreceding, -1)
    # bounded: same ≤ |calendar days| frame (inclusive prefix)
    w_prev = W.orderBy(F.asc("dur")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    stepped = (
        per_dur.withColumn(
            "n_removed_before",
            F.coalesce(
                F.sum(F.col("n_churned") + F.col("n_censored")).over(w_excl),
                F.lit(0),
            ),
        )
        .crossJoin(F.broadcast(n_tot))
        .withColumn("n_risk", F.expr("n_total - n_removed_before"))
        .withColumn(
            "log_step",
            F.expr(
                "CASE WHEN n_churned = 0 THEN CAST(0 AS DECIMAL(18,12))"
                " ELSE CAST(ROUND(LN(CAST(n_risk - n_churned AS DOUBLE)"
                " / CAST(n_risk AS DOUBLE)), 12) AS DECIMAL(18,12)) END"
            ),
        )
        # Nelson-Aalen increment d/n — the cumulative-hazard twin
        # estimator, same ROUND(12)-per-step policy
        .withColumn(
            "haz_step",
            F.expr(
                "CAST(ROUND(CAST(n_churned AS DOUBLE)"
                " / CAST(n_risk AS DOUBLE), 12) AS DECIMAL(18,12))"
            ),
        )
    )
    return (
        stepped.withColumn("log_surv_dec", F.sum("log_step").over(w_prev))
        .withColumn("cumhaz_dec", F.sum("haz_step").over(w_prev))
        .selectExpr(
            "dur AS duration_days",
            "n_risk",
            "n_churned",
            "n_censored",
            "CAST(log_surv_dec AS DOUBLE) AS log_survival",
            "ROUND(EXP(CAST(log_surv_dec AS DOUBLE)), 6) AS km_survival",
            "CAST(cumhaz_dec AS DOUBLE) AS nelson_aalen_cumhaz",
        )
    )


KM_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
  FROM events GROUP BY user_id
), gmax AS (
  SELECT MAX(CAST(ts AS DATE)) AS dmax FROM events
), lifetimes AS (
  SELECT CAST(date_diff('day', d0, d1) AS BIGINT) AS dur,
         CASE WHEN date_diff('day', d1, dmax) < {_KM_CENSOR_DAYS}
              THEN 1 ELSE 0 END AS censored
  FROM per_user CROSS JOIN gmax
), per_dur AS (
  SELECT dur,
         CAST(SUM(1 - censored) AS BIGINT) AS n_churned,
         CAST(SUM(censored) AS BIGINT) AS n_censored
  FROM lifetimes GROUP BY dur
), stepped AS (
  SELECT dur, n_churned, n_censored,
         (SELECT COUNT(*) FROM lifetimes)
           - COALESCE(SUM(n_churned + n_censored) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS n_risk
  FROM per_dur
), logged AS (
  SELECT dur, n_risk, n_churned, n_censored,
         CASE WHEN n_churned = 0 THEN CAST(0 AS DECIMAL(18,12))
              ELSE CAST(ROUND(LN(CAST(n_risk - n_churned AS DOUBLE)
                   / CAST(n_risk AS DOUBLE)), 12) AS DECIMAL(18,12)) END
           AS log_step,
         CAST(ROUND(CAST(n_churned AS DOUBLE)
              / CAST(n_risk AS DOUBLE), 12) AS DECIMAL(18,12)) AS haz_step
  FROM stepped
)
SELECT dur AS duration_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       n_churned, n_censored,
       CAST(CAST(SUM(log_step) OVER (
             ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DECIMAL(38,12)) AS DOUBLE) AS log_survival,
       ROUND(EXP(CAST(CAST(SUM(log_step) OVER (
             ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DECIMAL(38,12)) AS DOUBLE)), 6) AS km_survival,
       CAST(CAST(SUM(haz_step) OVER (
             ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DECIMAL(38,12)) AS DOUBLE) AS nelson_aalen_cumhaz
FROM logged
"""


# --------------------------------------------------------------------------
# Per-document lexical richness: type-token ratio + hapax share
# --------------------------------------------------------------------------


def doc_ttr_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-richness profile per document: token count, distinct-type
    count, type-token ratio, and the hapax-legomena share (fraction of
    types occurring exactly once IN THE DOCUMENT) — the vocabulary-
    diversity features a data-quality model sits next to the Gopher
    ratios (low TTR ⟹ boilerplate/repetition; high hapax on long docs ⟹
    OCR noise or codewords).  Ratios via the exact half-up device.

    Scale shape: one explode + (doc, token) count + per-doc fused
    aggregate — two keyed shuffles, both on the doc axis; nothing
    corpus-global."""
    from df_to_azure_spark.functions import text as TXT

    docs = load_table(spark, sf_dir, "documents")
    per_tok = (
        docs.select(
            "doc_id", F.explode(TXT.tokens("text")).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_tok.groupBy("doc_id").agg(
        F.expr("CAST(SUM(n) AS BIGINT)").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.expr(
            "CAST((2000000 * COUNT(*) + SUM(n)) DIV (2 * SUM(n)) AS DOUBLE)"
            " / CAST(1000000 AS DOUBLE)"
        ).alias("type_token_ratio"),
        F.expr(
            "CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_hapax"),
        F.expr(
            "CAST((2000000 * SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)"
            " + COUNT(*)) DIV (2 * COUNT(*)) AS DOUBLE)"
            " / CAST(1000000 AS DOUBLE)"
        ).alias("hapax_share"),
    )


_TOKS8 = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"

TTR_ORACLE = f"""
WITH per_tok AS (
  SELECT doc_id, tok, COUNT(*) AS n
  FROM (SELECT doc_id, unnest({_TOKS8}) AS tok FROM documents)
  GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST((2000000 * COUNT(*) + SUM(n)) // (2 * SUM(n)) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS type_token_ratio,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST((2000000 * SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
             + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS hapax_share
FROM per_tok GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Lorenz curve deciles (companion table to the Gini coefficient)
# --------------------------------------------------------------------------


def revenue_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lorenz table behind ``customer_revenue_gini``: customers
    sorted ascending by lifetime revenue, cut into 10 rank deciles
    (``decile = (rk−1)·10 DIV n + 1`` — deterministic, sizes differ by
    at most one), each reporting its customer count, its revenue, its
    share of total revenue, and the CUMULATIVE share at the decile's
    upper edge — the curve a revenue-concentration chart plots ("the
    top decile carries X% of revenue").

    Scale shape: ``two_phase_rank`` supplies the global ascending rank
    AND the exact running revenue sum in the same distributed pass
    (range partition + per-partition offsets); the decile fold is one
    10-group aggregation.  All shares via the half-up device over exact
    DECIMAL sums."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.expr(
            "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
            " AS DECIMAL(19,0))) AS DECIMAL(19,0))"
        ).alias("rev_cents")
    )
    ranked = two_phase_rank(
        rev,
        order_by=[("rev_cents", "asc"), ("o_custkey", "asc")],
        sum_col="rev_cents",
        rank_col="rk",
        total_col="n_all",
        cum_col="cum_cents",
        sum_total_col="total_cents",
    )
    return (
        ranked.withColumn(
            "decile", F.expr("CAST((rk - 1) * 10 DIV n_all AS INT) + 1")
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.expr("CAST(SUM(rev_cents) AS BIGINT)").alias("decile_cents"),
            F.expr(
                "CAST((2000000 * CAST(SUM(rev_cents) AS DECIMAL(38,0))"
                " + MAX(total_cents)) DIV (2 * MAX(total_cents)) AS DOUBLE)"
                " / CAST(1000000 AS DOUBLE)"
            ).alias("revenue_share"),
            F.expr(
                "CAST((2000000 * MAX(cum_cents) + MAX(total_cents))"
                " DIV (2 * MAX(total_cents)) AS DOUBLE)"
                " / CAST(1000000 AS DOUBLE)"
            ).alias("cum_share"),
        )
    )


LORENZ_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
              AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS rev_cents
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT rev_cents,
         row_number() OVER (ORDER BY rev_cents, o_custkey) AS rk,
         COUNT(*) OVER () AS n_all,
         CAST(SUM(rev_cents) OVER (ORDER BY rev_cents, o_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DECIMAL(38,0)) AS cum_cents,
         CAST(SUM(rev_cents) OVER () AS DECIMAL(38,0)) AS total_cents
  FROM rev
)
SELECT CAST((rk - 1) * 10 // n_all AS INT) + 1 AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(rev_cents) AS BIGINT) AS decile_cents,
       CAST((2000000 * CAST(SUM(rev_cents) AS HUGEINT)
             + CAST(MAX(total_cents) AS HUGEINT))
            // (2 * CAST(MAX(total_cents) AS HUGEINT)) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS revenue_share,
       CAST((2000000 * CAST(MAX(cum_cents) AS HUGEINT)
             + CAST(MAX(total_cents) AS HUGEINT))
            // (2 * CAST(MAX(total_cents) AS HUGEINT)) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS cum_share
FROM ranked GROUP BY 1
"""


# --------------------------------------------------------------------------
# Chi-square independence test: document language × source
# --------------------------------------------------------------------------


def lang_source_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² independence audit of the documents' language ×
    source contingency table — "does source composition differ by
    language" (the companion hypothesis test to
    ``priority_status_mutual_info``'s information-theoretic view).  One
    row per observed cell: observed count, expected count under
    independence (row·col/n — exact integers until the final division),
    and the χ² contribution ``(obs − exp)²/exp``, ROUND(6) over
    bit-identical DOUBLE inputs.

    Scale shape: one (lang, source) aggregation (domain-bounded output),
    two domain-bounded marginal frames broadcast back on — no
    data-sized shuffle after the first groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    marg_lang = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lang")
    )
    marg_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_src")
    )
    n_tot = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    return (
        cells.join(F.broadcast(marg_lang), "lang")
        .join(F.broadcast(marg_src), "source")
        .crossJoin(F.broadcast(n_tot))
        .selectExpr(
            "lang",
            "source",
            "n_obs",
            "ROUND(CAST(n_lang AS DOUBLE) * CAST(n_src AS DOUBLE)"
            " / CAST(n_total AS DOUBLE), 6) AS expected",
            "ROUND(POWER(CAST(n_obs AS DOUBLE)"
            " - CAST(n_lang AS DOUBLE) * CAST(n_src AS DOUBLE)"
            " / CAST(n_total AS DOUBLE), 2)"
            " / (CAST(n_lang AS DOUBLE) * CAST(n_src AS DOUBLE)"
            " / CAST(n_total AS DOUBLE)), 6) AS chi2_contrib",
        )
    )


CHI2_ORACLE = """
WITH cells AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM documents GROUP BY lang, source
), marg_lang AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang
  FROM documents GROUP BY lang
), marg_src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src
  FROM documents GROUP BY source
), n_tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents
)
SELECT c.lang, c.source, c.n_obs,
       ROUND(CAST(n_lang AS DOUBLE) * CAST(n_src AS DOUBLE)
             / CAST(n_total AS DOUBLE), 6) AS expected,
       ROUND(POWER(CAST(n_obs AS DOUBLE)
             - CAST(n_lang AS DOUBLE) * CAST(n_src AS DOUBLE)
             / CAST(n_total AS DOUBLE), 2)
             / (CAST(n_lang AS DOUBLE) * CAST(n_src AS DOUBLE)
             / CAST(n_total AS DOUBLE)), 6) AS chi2_contrib
FROM cells c
JOIN marg_lang USING (lang)
JOIN marg_src USING (source)
CROSS JOIN n_tot
"""


# --------------------------------------------------------------------------
# Poisson bootstrap confidence interval for the mean order value
# --------------------------------------------------------------------------

_BOOT_B = 32  # replicate count; 2.5%/97.5% nearest-rank = min/max at B=32


def _poisson_thresholds() -> list[int]:
    """floor(P(Poisson(1) ≤ w) · 2³²) for w = 0..6 — integer literals
    shared with the oracle so the weight draw is a pure integer compare
    (no double ever decides a weight).  Tail truncated at 7
    (P ≈ 8.3e-5, documented)."""
    import math

    cum, thresholds, p = 0.0, [], math.exp(-1.0)
    for w in range(7):
        cum += p
        thresholds.append(int(cum * 4294967296.0))
        p /= w + 1
    return thresholds


def revenue_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (the distributed bootstrap: each row's
    replicate weight is an independent Poisson(1) draw, so resampling
    never materializes n×B rows on one machine) for the mean order
    value: B = 32 replicates, each a weighted mean with deterministic
    md5-derived weights, and the 2.5%/97.5% nearest-rank envelope of the
    replicate means — which at B = 32 is exactly their min/max
    (⌈0.025·32⌉ = 1, ⌈0.975·32⌉ = 32).

    Weight draw: u = first 8 md5 hex chars of ``orderkey_b`` as a
    uniform 32-bit integer, mapped through the precomputed Poisson(1)
    CDF thresholds — integer compares end to end, identical in any
    engine.  Replicate means are exact-integer ratios via the half-up
    device.

    Scale shape: one explode to n×B rows (B bounded), one B-group
    aggregation, one 32-row fold — no data-sized shuffle beyond the
    B-key aggregation, and the whole replicate axis is model-sized."""
    thr = _poisson_thresholds()
    # spread BEFORE the B-way explode + per-row md5: the bench tables are
    # single-row-group files (one scan task), and the n·B md5 stream is
    # this query's whole cost — it must run on every core (guide §2.1);
    # at 100 TB the scan arrives in thousands of splits and spread is a
    # no-op.  Projecting to the two needed columns first keeps the
    # repartition payload minimal (guide §2.3)
    orders = spread(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    )
    reps = orders.selectExpr(
        "o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0))"
        " AS cents",
    ).selectExpr(
        "o_orderkey",
        "cents",
        f"explode(sequence(0, {_BOOT_B - 1})) AS b",
    )
    weight_case = " ".join(
        f"WHEN h < {t} THEN {w}" for w, t in enumerate(thr)
    )
    weighted = reps.selectExpr(
        "b",
        "cents",
        "CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING), '_',"
        " CAST(b AS STRING))), 1, 8), 16, 10) AS BIGINT) AS h",
    ).selectExpr("b", "cents", f"CASE {weight_case} ELSE 7 END AS w")
    rep_means = weighted.groupBy("b").agg(
        F.expr(
            "CAST((2 * CAST(SUM(w * cents) AS DECIMAL(38,0)) + SUM(w))"
            " DIV (2 * SUM(w)) AS DECIMAL(38,0))"
        ).alias("rep_mean_cents")
    )
    return rep_means.agg(
        F.expr(f"CAST({_BOOT_B} AS BIGINT)").alias("n_replicates"),
        F.expr("CAST(MIN(rep_mean_cents) AS BIGINT)").alias("ci_lo_cents"),
        F.expr("CAST(MAX(rep_mean_cents) AS BIGINT)").alias("ci_hi_cents"),
    )


def _bootstrap_oracle() -> str:
    thr = _poisson_thresholds()
    weight_case = " ".join(
        f"WHEN h < {t} THEN {w}" for w, t in enumerate(thr)
    )
    return f"""
WITH reps AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0))
           AS cents,
         unnest(range(0, {_BOOT_B})) AS b
  FROM orders
), hashed AS (
  SELECT b, cents,
         CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '_'
              || CAST(b AS VARCHAR)), 1, 8))::BIGINT AS BIGINT) AS h
  FROM reps
), weighted AS (
  SELECT b, cents, CASE {weight_case} ELSE 7 END AS w FROM hashed
), rep_means AS (
  SELECT b,
         CAST((2 * CAST(SUM(w * cents) AS HUGEINT) + CAST(SUM(w) AS HUGEINT))
              // (2 * CAST(SUM(w) AS HUGEINT)) AS HUGEINT) AS rep_mean_cents
  FROM weighted GROUP BY b
)
SELECT CAST({_BOOT_B} AS BIGINT) AS n_replicates,
       CAST(MIN(rep_mean_cents) AS BIGINT) AS ci_lo_cents,
       CAST(MAX(rep_mean_cents) AS BIGINT) AS ci_hi_cents
FROM rep_means
"""


BOOTSTRAP_ORACLE = _bootstrap_oracle()


# --------------------------------------------------------------------------
# Mann-Whitney U / AUC: does the discount separate returned lineitems?
# --------------------------------------------------------------------------


def lineitem_discount_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test as an AUC: the probability that a randomly
    chosen RETURNED lineitem (``l_returnflag = 'R'``) carries a higher
    discount than a non-returned one (ties count half) — the
    distribution-free two-sample separation score every feature audit
    starts with (AUC 0.5 = no signal).

    Tie handling is the real content: discounts integerize to few
    distinct values, so per VALUE the doubled mid-rank
    ``2·cum_before + n_v + 1`` keeps everything integer; the R-side
    rank-sum, U and AUC = U/(n_R·n_other) then emit through the exact
    half-up device.  Scale shape: one (value)-grouped aggregation
    (domain-bounded: discounts are 2-dp in [0, 0.10]), one bounded
    prefix fold, one final row — the data-sized input is touched
    exactly once."""
    li = load_table(spark, sf_dir, "lineitem")
    per_val = li.selectExpr(
        "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0))"
        " AS disc",
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_r",
    ).groupBy("disc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_v"),
        F.expr("CAST(SUM(is_r) AS BIGINT)").alias("n_r_v"),
    )
    from pyspark.sql import Window as W

    # bounded: per-distinct-discount frame (2-dp domain, ≤ 11 rows)
    w_excl = W.orderBy(F.asc("disc")).rowsBetween(W.unboundedPreceding, -1)
    stepped = per_val.withColumn(
        "cum_before", F.coalesce(F.sum("n_v").over(w_excl), F.lit(0))
    )
    return stepped.agg(
        F.expr("CAST(SUM(n_r_v) AS BIGINT)").alias("n_returned"),
        F.expr("CAST(SUM(n_v - n_r_v) AS BIGINT)").alias("n_other"),
        F.expr(
            "CAST(SUM(n_r_v * (2 * cum_before + n_v + 1)) AS DECIMAL(38,0))"
        ).alias("ranksum2_r"),
    ).selectExpr(
        "n_returned",
        "n_other",
        # U2 = 2*ranksum_R - n_R(n_R+1) (doubled to stay integer)
        "CAST(ranksum2_r - CAST(n_returned AS DECIMAL(38,0))"
        " * (n_returned + 1) AS BIGINT) AS u2",
        "CAST((1000000 * (ranksum2_r - CAST(n_returned AS DECIMAL(38,0))"
        " * (n_returned + 1))"
        " + CAST(n_returned AS DECIMAL(38,0)) * n_other)"
        " DIV (2 * CAST(n_returned AS DECIMAL(38,0)) * n_other) AS DOUBLE)"
        " / CAST(1000000 AS DOUBLE) AS auc",
    )


MANNWHITNEY_ORACLE = """
WITH per_val AS (
  SELECT CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0))
           AS disc,
         CAST(COUNT(*) AS BIGINT) AS n_v,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_r_v
  FROM lineitem GROUP BY 1
), stepped AS (
  SELECT disc, n_v, n_r_v,
         COALESCE(SUM(n_v) OVER (ORDER BY disc
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM per_val
), agg AS (
  SELECT CAST(SUM(n_r_v) AS BIGINT) AS n_returned,
         CAST(SUM(n_v - n_r_v) AS BIGINT) AS n_other,
         CAST(SUM(n_r_v * (2 * cum_before + n_v + 1)) AS DECIMAL(38,0))
           AS ranksum2_r
  FROM stepped
)
SELECT n_returned, n_other,
       CAST(CAST(ranksum2_r AS HUGEINT)
            - CAST(n_returned AS HUGEINT) * (n_returned + 1) AS BIGINT) AS u2,
       CAST((1000000 * (CAST(ranksum2_r AS HUGEINT)
             - CAST(n_returned AS HUGEINT) * (n_returned + 1))
             + CAST(n_returned AS HUGEINT) * n_other)
            // (2 * CAST(n_returned AS HUGEINT) * n_other) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS auc
FROM agg
"""


# --------------------------------------------------------------------------
# Language-ID evaluation: confusion matrix against the labeled lang column
# --------------------------------------------------------------------------


def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation harness for the marker-word language classifier
    (``text.language_id``): the (true lang × predicted lang) confusion
    matrix over the labeled ``documents.lang`` column, with per-cell
    share of the TRUE class (row-normalized recall when on the diagonal)
    — the audit a pipeline runs before trusting a heuristic filter to
    route documents by language.

    Scale shape: classify map-side (codegen'd token filters), one
    (true, pred) aggregation bounded by the language-domain square, one
    broadcast row-marginal join.  Shares via the half-up device."""
    from df_to_azure_spark.functions import text as TXT

    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.select(
        F.col("lang").alias("true_lang"),
        TXT.language_id("text").alias("pred_lang"),
    )
    cells = labeled.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    marg = labeled.groupBy("true_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )
    return cells.join(F.broadcast(marg), "true_lang").selectExpr(
        "true_lang",
        "pred_lang",
        "n_docs",
        "CAST((2000000 * n_docs + n_true) DIV (2 * n_true) AS DOUBLE)"
        " / CAST(1000000 AS DOUBLE) AS share_of_true",
    )


def _langid_confusion_oracle() -> str:
    from df_to_azure_spark.plans.training_data import DOC_LANG_ORACLE

    return f"""
WITH labeled AS (
  SELECT lang AS true_lang, lang_guess AS pred_lang
  FROM ({DOC_LANG_ORACLE}) t
), cells AS (
  SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM labeled GROUP BY true_lang, pred_lang
), marg AS (
  SELECT true_lang, CAST(COUNT(*) AS BIGINT) AS n_true
  FROM labeled GROUP BY true_lang
)
SELECT c.true_lang, c.pred_lang, c.n_docs,
       CAST((2000000 * n_docs + n_true) // (2 * n_true) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS share_of_true
FROM cells c JOIN marg USING (true_lang)
"""


LANGID_CONFUSION_ORACLE = _langid_confusion_oracle()


# --------------------------------------------------------------------------
# CUSUM change detection over daily revenue (non-recursive identity)
# --------------------------------------------------------------------------


def daily_revenue_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift statistic over the daily revenue series —
    the SEQUENTIAL companion to ``revenue_cusum_changepoint``
    (pipeline4), which reports only the offline argmax |S_t| change
    point; this query emits the full clamped drift series a monitor
    thresholds in production.  Computed WITHOUT the usual clamp
    recursion: ``C_t = max(0, C_{t−1} + x_t − μ)`` is identically
    ``S_t − min(0, min_{s≤t} S_s)`` for the plain cumulative sum
    ``S_t = Σ_{s≤t}(x_s − μ)``, which turns the sequential definition
    into a prefix-sum + prefix-min — both of which this engine already
    distributes exactly (``two_phase_rank``'s running DECIMAL sum and
    ``two_phase_cummin``), so the detector needs no single-partition
    window and no iteration.  μ is the exact half-up mean of the daily
    cents (integer), so every value in the chain is an exact integer.

    Output per day: revenue, deviation sum ``s_cents``, and the CUSUM
    statistic ``cusum_cents ≥ 0`` — spikes flag sustained upward drift
    from the global mean."""
    from df_to_azure_spark.functions.distrank import two_phase_cummin

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.expr(
            "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01')"
            " AS BIGINT)"
        ).alias("day")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
            " AS DECIMAL(19,0))) AS DECIMAL(19,0))"
        ).alias("rev_cents")
    )
    mu = daily.agg(
        F.expr(
            "CAST((2 * CAST(SUM(rev_cents) AS DECIMAL(38,0)) + COUNT(*))"
            " DIV (2 * COUNT(*)) AS DECIMAL(19,0))"
        ).alias("mu_cents")
    )
    dev = daily.crossJoin(F.broadcast(mu)).select(
        "day",
        "rev_cents",
        F.expr("CAST(rev_cents - mu_cents AS DECIMAL(19,0))").alias("dev"),
    )
    summed = two_phase_rank(
        dev,
        order_by=[("day", "asc")],
        sum_col="dev",
        rank_col="rk",
        cum_col="s_cents",
    )
    out = two_phase_cummin(
        summed.select("day", "rev_cents", "s_cents"),
        order_by=[("day", "asc")],
        val_col="s_cents",
        out_col="min_s",
        inclusive=True,
    )
    return out.selectExpr(
        "day",
        "CAST(rev_cents AS BIGINT) AS rev_cents",
        "CAST(s_cents AS BIGINT) AS s_cents",
        "CAST(s_cents - LEAST(CAST(0 AS DECIMAL(38,0)), min_s) AS BIGINT)"
        " AS cusum_cents",
    )


CUSUM_ORACLE = """
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1995-01-01',
              CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
              AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS rev_cents
  FROM orders GROUP BY 1
), mu AS (
  SELECT CAST((2 * CAST(SUM(rev_cents) AS HUGEINT) + COUNT(*))
              // (2 * COUNT(*)) AS HUGEINT) AS mu_cents
  FROM daily
), dev AS (
  SELECT day, rev_cents,
         CAST(rev_cents AS HUGEINT) - mu_cents AS dev
  FROM daily CROSS JOIN mu
), summed AS (
  SELECT day, rev_cents,
         SUM(dev) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_cents
  FROM dev
)
SELECT day,
       CAST(rev_cents AS BIGINT) AS rev_cents,
       CAST(s_cents AS BIGINT) AS s_cents,
       CAST(s_cents - LEAST(CAST(0 AS HUGEINT),
            MIN(s_cents) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
            AS BIGINT) AS cusum_cents
FROM summed
"""


# --------------------------------------------------------------------------
# Custom Python DataSource (Spark 4 API): synthetic log source rollup
# --------------------------------------------------------------------------

_SYNTH_PARTS = 4
_SYNTH_ROWS = 1500


def synthlogs_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the CUSTOM CONNECTOR (``sources.pydatasource`` — the
    Spark 4 Python DataSource API): the deterministic ``synthlogs``
    generator exposes a programmatic source as a first-class partitioned
    table, and this query proves the full loop — register, parallel
    partitioned read (one task per InputPartition), relational rollup —
    with the generator's LCG integer math replayed row-exactly by the
    DuckDB oracle.  ``sf_dir`` is unused by design: the source IS the
    fixture (a load generator does not scale with the lake).

    Scale shape: N generator partitions → N map tasks, one
    domain-bounded (6-status) aggregation."""
    from df_to_azure_spark.sources import pydatasource as PDS

    PDS.register(spark)
    logs = (
        spark.read.format("synthlogs")
        .option("partitions", str(_SYNTH_PARTS))
        .option("rows_per_partition", str(_SYNTH_ROWS))
        .load()
    )
    return logs.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_requests"),
        F.expr("CAST(SUM(n_bytes) AS BIGINT)").alias("total_bytes"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


def _synthlogs_rollup_oracle() -> str:
    from df_to_azure_spark.sources.pydatasource import synthlogs_oracle_sql

    return f"""
WITH logs AS ({synthlogs_oracle_sql(_SYNTH_PARTS, _SYNTH_ROWS)})
SELECT status,
       CAST(COUNT(*) AS BIGINT) AS n_requests,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM logs GROUP BY status
"""


SYNTHLOGS_ROLLUP_ORACLE = _synthlogs_rollup_oracle()


# --------------------------------------------------------------------------
# Logistic regression by unrolled IRLS (2 Newton steps, fully relational)
# --------------------------------------------------------------------------


def _cramer3_text(a: dict[str, str], r: tuple[str, str, str]) -> dict[str, str]:
    """Cramer-rule expression text for a symmetric 3×3 system with named
    entry expressions — the same shared-text device as the ridge solve:
    both engines evaluate the identical IEEE tree, so the solution
    components are bit-identical.  ``a`` maps {a11,a12,a13,a22,a23,a33};
    ``r`` is the RHS triple."""

    def det3(r1, r2, r3):
        (x1, x2, x3), (y1, y2, y3), (z1, z2, z3) = r1, r2, r3
        return (
            f"({x1} * ({y2} * {z3} - {y3} * {z2})"
            f" - {x2} * ({y1} * {z3} - {y3} * {z1})"
            f" + {x3} * ({y1} * {z2} - {y2} * {z1}))"
        )

    rows = [
        (a["a11"], a["a12"], a["a13"]),
        (a["a12"], a["a22"], a["a23"]),
        (a["a13"], a["a23"], a["a33"]),
    ]
    det_a = det3(*rows)

    def repl(i):
        return [
            tuple(r[ri] if ci == i else rows[ri][ci] for ci in range(3))
            for ri in range(3)
        ]

    return {
        "x0": f"({det3(*repl(0))} / {det_a})",
        "x1": f"({det3(*repl(1))} / {det_a})",
        "x2": f"({det3(*repl(2))} / {det_a})",
    }


_LOGIT_FEATURES = """
  CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS DECIMAL(10,0)) AS x1,
  CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS DECIMAL(10,0)) AS x2,
  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
"""

# iteration-1 closed form: at beta = 0 every p_i = 1/2, so
# (X'WX) b = X'(y - 1/2) becomes the INTEGER system G b = [2*t0, 2*t1,
# 2*t2] with G the raw Gram matrix and t_j = sum (2y-1) x_j
_IT1_SUMS = """
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(x1) AS DECIMAL(38,0)) AS sx1,
  CAST(SUM(x2) AS DECIMAL(38,0)) AS sx2,
  CAST(SUM(x1 * x1) AS DECIMAL(38,0)) AS s11,
  CAST(SUM(x1 * x2) AS DECIMAL(38,0)) AS s12,
  CAST(SUM(x2 * x2) AS DECIMAL(38,0)) AS s22,
  CAST(SUM(2 * y - 1) AS DECIMAL(38,0)) AS t0,
  CAST(SUM((2 * y - 1) * x1) AS DECIMAL(38,0)) AS t1,
  CAST(SUM((2 * y - 1) * x2) AS DECIMAL(38,0)) AS t2
"""

_IT1_A = {
    "a11": "CAST(n AS DOUBLE)",
    "a12": "CAST(sx1 AS DOUBLE)",
    "a13": "CAST(sx2 AS DOUBLE)",
    "a22": "CAST(s11 AS DOUBLE)",
    "a23": "CAST(s12 AS DOUBLE)",
    "a33": "CAST(s22 AS DOUBLE)",
}
_IT1_R = (
    "(2.0 * CAST(t0 AS DOUBLE))",
    "(2.0 * CAST(t1 AS DOUBLE))",
    "(2.0 * CAST(t2 AS DOUBLE))",
)

# iteration-2 per-row terms: eta from the iteration-1 betas, p through
# the one transcendental (EXP) with the ROUND(12) per-row policy, then
# every sum is a DECIMAL product of exact factors — order-free
_P_EXPR = (
    "CAST(ROUND(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE)"
    " + EXP(-(b0 + b1 * CAST(x1 AS DOUBLE) + b2 * CAST(x2 AS DOUBLE)))),"
    " 12) AS DECIMAL(14,12))"
)
# w widened to DECIMAL(20,12) before any product: DuckDB runs a
# DECIMAL(14,12)x(10,0) multiply on int64 storage and overflows at
# ~1e18 scaled units; width > 18 forces its int128 path (value-identical
# either way, so the shared text stays engine-exact)
_IT2_SUMS = """
  CAST(SUM(w) AS DECIMAL(38,12)) AS sw,
  CAST(SUM(CAST(w AS DECIMAL(20,12)) * x1) AS DECIMAL(38,12)) AS swx1,
  CAST(SUM(CAST(w AS DECIMAL(20,12)) * x2) AS DECIMAL(38,12)) AS swx2,
  CAST(SUM(CAST(w AS DECIMAL(20,12)) * CAST(x1 * x1 AS DECIMAL(10,0)))
       AS DECIMAL(38,12)) AS swx11,
  CAST(SUM(CAST(w AS DECIMAL(20,12)) * CAST(x1 * x2 AS DECIMAL(10,0)))
       AS DECIMAL(38,12)) AS swx12,
  CAST(SUM(CAST(w AS DECIMAL(20,12)) * CAST(x2 * x2 AS DECIMAL(10,0)))
       AS DECIMAL(38,12)) AS swx22,
  CAST(SUM(CAST(y AS DECIMAL(14,12)) - p) AS DECIMAL(38,12)) AS u0,
  CAST(SUM(CAST(CAST(y AS DECIMAL(14,12)) - p AS DECIMAL(21,12)) * x1)
       AS DECIMAL(38,12)) AS u1,
  CAST(SUM(CAST(CAST(y AS DECIMAL(14,12)) - p AS DECIMAL(21,12)) * x2)
       AS DECIMAL(38,12)) AS u2
"""

_IT2_A = {
    "a11": "CAST(sw AS DOUBLE)",
    "a12": "CAST(swx1 AS DOUBLE)",
    "a13": "CAST(swx2 AS DOUBLE)",
    "a22": "CAST(swx11 AS DOUBLE)",
    "a23": "CAST(swx12 AS DOUBLE)",
    "a33": "CAST(swx22 AS DOUBLE)",
}
_IT2_R = ("CAST(u0 AS DOUBLE)", "CAST(u1 AS DOUBLE)", "CAST(u2 AS DOUBLE)")


def logistic_return_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression trained IN the engine: P(returned) ~
    sigmoid(β₀ + β₁·discount + β₂·quantity) over the whole lineitem
    table, fit by TWO unrolled IRLS/Newton steps with zero driver-side
    iteration — the relational formulation of how GLMs actually train
    at 100 TB (one full pass per step: sufficient statistics in, 3×3
    solve as shared Cramer expression text, coefficients re-broadcast
    into the next pass as a 1-row frame, never a collect).

    Step 1 exploits β=0 ⇒ p≡½: the Newton system collapses to the
    INTEGER system G·β = 2·Σ(2y−1)xⱼ — no transcendental at all.
    Step 2 computes per-row p via the one EXP (ROUND(12) policy), forms
    the weighted Gram/gradient as exact DECIMAL sums (order-free), and
    adds the Cramer-solved Newton delta.  Every DOUBLE division happens
    in identical shared expression text, so the betas are engine-exact
    at ROUND(8)."""
    li = load_table(spark, sf_dir, "lineitem")
    feats = li.selectExpr(*[
        s.strip() for s in _LOGIT_FEATURES.strip().split(",\n")
    ])
    it1_sums = feats.selectExpr("x1", "x2", "y").agg(
        *[
            F.expr(e.strip())
            for e in _IT1_SUMS.strip().rstrip(",").split(",\n")
        ]
    )
    c1 = _cramer3_text(_IT1_A, _IT1_R)
    it1 = it1_sums.selectExpr(
        "n",
        f"{c1['x0']} AS b0",
        f"{c1['x1']} AS b1",
        f"{c1['x2']} AS b2",
    )
    scored = feats.crossJoin(F.broadcast(it1)).selectExpr(
        "n",
        "b0",
        "b1",
        "b2",
        "x1",
        "x2",
        "y",
        f"{_P_EXPR} AS p",
    ).selectExpr(
        "n", "b0", "b1", "b2", "x1", "x2", "y", "p",
        "CAST(ROUND(p * (1 - p), 12) AS DECIMAL(14,12)) AS w",
    )
    it2_sums = scored.groupBy("n", "b0", "b1", "b2").agg(
        *[
            F.expr(e.strip())
            for e in _IT2_SUMS.strip().rstrip(",").split(",\n")
        ]
    )
    c2 = _cramer3_text(_IT2_A, _IT2_R)
    return it2_sums.selectExpr(
        "n",
        f"ROUND(b0 + {c2['x0']}, 8) AS beta0",
        f"ROUND(b1 + {c2['x1']}, 8) AS beta1",
        f"ROUND(b2 + {c2['x2']}, 8) AS beta2",
    )


def _logistic_oracle() -> str:
    c1 = _cramer3_text(_IT1_A, _IT1_R)
    c2 = _cramer3_text(_IT2_A, _IT2_R)
    return f"""
WITH feats AS (
  SELECT {_LOGIT_FEATURES} FROM lineitem
), it1_sums AS (
  SELECT {_IT1_SUMS} FROM feats
), it1 AS (
  SELECT n, {c1['x0']} AS b0, {c1['x1']} AS b1, {c1['x2']} AS b2
  FROM it1_sums
), scored0 AS (
  SELECT n, b0, b1, b2, x1, x2, y, {_P_EXPR} AS p
  FROM feats CROSS JOIN it1
), scored AS (
  SELECT *, CAST(ROUND(p * (1 - p), 12) AS DECIMAL(14,12)) AS w
  FROM scored0
), it2_sums AS (
  SELECT n, b0, b1, b2, {_IT2_SUMS}
  FROM scored GROUP BY n, b0, b1, b2
)
SELECT n,
       ROUND(b0 + {c2['x0']}, 8) AS beta0,
       ROUND(b1 + {c2['x1']}, 8) AS beta1,
       ROUND(b2 + {c2['x2']}, 8) AS beta2
FROM it2_sums
"""


LOGISTIC_ORACLE = _logistic_oracle()


# --------------------------------------------------------------------------
# Logistic model evaluation: exact AUC of the fitted scores
# --------------------------------------------------------------------------


def logistic_model_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact training-set AUC of the 2-step IRLS model
    (``logistic_return_model``): score every lineitem with the FINAL
    betas, then Mann-Whitney with mid-rank tie handling over the score
    distribution.  Unlike ``lineitem_discount_auc`` (whose 11-value
    discount domain bounds the rank fold), the fitted score p takes a
    DATA-SIZED set of distinct values — so the cumulative count below
    the current score runs through the distributed ``two_phase_rank``
    running sum (range partition + offsets), never a global window.
    This is the eval loop closed in-engine: train (two passes) → score
    (one pass) → rank-based metric (one grouped pass + the two-phase
    fold), all exact.

    Exactness: p is the ROUND(12) DECIMAL score (ties are real equal
    values, handled by the doubled mid-rank identity
    ``2·cum_before + n_v + 1``); every sum is integer/DECIMAL; the AUC
    emits through the half-up device."""
    li = load_table(spark, sf_dir, "lineitem")
    feats = li.selectExpr(*[
        s.strip() for s in _LOGIT_FEATURES.strip().split(",\n")
    ])
    it1_sums = feats.agg(
        *[
            F.expr(e.strip())
            for e in _IT1_SUMS.strip().rstrip(",").split(",\n")
        ]
    )
    c1 = _cramer3_text(_IT1_A, _IT1_R)
    it1 = it1_sums.selectExpr(
        "n", f"{c1['x0']} AS b0", f"{c1['x1']} AS b1", f"{c1['x2']} AS b2"
    )
    scored = feats.crossJoin(F.broadcast(it1)).selectExpr(
        "n", "b0", "b1", "b2", "x1", "x2", "y", f"{_P_EXPR} AS p"
    ).selectExpr(
        "n", "b0", "b1", "b2", "x1", "x2", "y", "p",
        "CAST(ROUND(p * (1 - p), 12) AS DECIMAL(14,12)) AS w",
    )
    it2_sums = scored.groupBy("n", "b0", "b1", "b2").agg(
        *[
            F.expr(e.strip())
            for e in _IT2_SUMS.strip().rstrip(",").split(",\n")
        ]
    )
    c2 = _cramer3_text(_IT2_A, _IT2_R)
    it2 = it2_sums.selectExpr(
        f"b0 + {c2['x0']} AS f0",
        f"b1 + {c2['x1']} AS f1",
        f"b2 + {c2['x2']} AS f2",
    )
    rescored = feats.crossJoin(F.broadcast(it2)).selectExpr(
        "y",
        "CAST(ROUND(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE)"
        " + EXP(-(f0 + f1 * CAST(x1 AS DOUBLE)"
        " + f2 * CAST(x2 AS DOUBLE)))), 12) AS DECIMAL(14,12)) AS p",
    )
    per_val = rescored.groupBy("p").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_v"),
        F.expr("CAST(SUM(y) AS BIGINT)").alias("n_pos_v"),
    )
    ranked = two_phase_rank(
        per_val,
        order_by=[("p", "asc")],
        sum_col="n_v",
        rank_col="rk",
        cum_col="cum_incl",
    )
    return ranked.agg(
        F.expr("CAST(SUM(n_pos_v) AS BIGINT)").alias("n_pos"),
        F.expr("CAST(SUM(n_v - n_pos_v) AS BIGINT)").alias("n_neg"),
        F.expr(
            "CAST(SUM(CAST(n_pos_v AS DECIMAL(19,0))"
            " * (2 * (cum_incl - n_v) + n_v + 1)) AS DECIMAL(38,0))"
        ).alias("ranksum2_pos"),
    ).selectExpr(
        "n_pos",
        "n_neg",
        "CAST(ranksum2_pos - CAST(n_pos AS DECIMAL(38,0))"
        " * (n_pos + 1) AS BIGINT) AS u2",
        "CAST((1000000 * (ranksum2_pos - CAST(n_pos AS DECIMAL(38,0))"
        " * (n_pos + 1))"
        " + CAST(n_pos AS DECIMAL(38,0)) * n_neg)"
        " DIV (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS DOUBLE)"
        " / CAST(1000000 AS DOUBLE) AS auc",
    )


def _logistic_auc_oracle() -> str:
    c1 = _cramer3_text(_IT1_A, _IT1_R)
    c2 = _cramer3_text(_IT2_A, _IT2_R)
    return f"""
WITH feats AS (
  SELECT {_LOGIT_FEATURES} FROM lineitem
), it1_sums AS (
  SELECT {_IT1_SUMS} FROM feats
), it1 AS (
  SELECT n, {c1['x0']} AS b0, {c1['x1']} AS b1, {c1['x2']} AS b2
  FROM it1_sums
), scored0 AS (
  SELECT n, b0, b1, b2, x1, x2, y, {_P_EXPR} AS p
  FROM feats CROSS JOIN it1
), scored AS (
  SELECT *, CAST(ROUND(p * (1 - p), 12) AS DECIMAL(14,12)) AS w
  FROM scored0
), it2_sums AS (
  SELECT n, b0, b1, b2, {_IT2_SUMS}
  FROM scored GROUP BY n, b0, b1, b2
), it2 AS (
  SELECT b0 + {c2['x0']} AS f0, b1 + {c2['x1']} AS f1,
         b2 + {c2['x2']} AS f2
  FROM it2_sums
), rescored AS (
  SELECT y,
         CAST(ROUND(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE)
              + EXP(-(f0 + f1 * CAST(x1 AS DOUBLE)
              + f2 * CAST(x2 AS DOUBLE)))), 12) AS DECIMAL(14,12)) AS p
  FROM feats CROSS JOIN it2
), per_val AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS n_v,
         CAST(SUM(y) AS BIGINT) AS n_pos_v
  FROM rescored GROUP BY p
), ranked AS (
  SELECT n_v, n_pos_v,
         CAST(SUM(n_v) OVER (ORDER BY p
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DECIMAL(38,0)) AS cum_incl
  FROM per_val
), agg AS (
  SELECT CAST(SUM(n_pos_v) AS BIGINT) AS n_pos,
         CAST(SUM(n_v - n_pos_v) AS BIGINT) AS n_neg,
         CAST(SUM(CAST(n_pos_v AS HUGEINT)
              * (2 * (cum_incl - n_v) + n_v + 1)) AS HUGEINT)
           AS ranksum2_pos
  FROM ranked
)
SELECT n_pos, n_neg,
       CAST(ranksum2_pos - CAST(n_pos AS HUGEINT) * (n_pos + 1)
            AS BIGINT) AS u2,
       CAST((1000000 * (ranksum2_pos - CAST(n_pos AS HUGEINT)
             * (n_pos + 1))
             + CAST(n_pos AS HUGEINT) * n_neg)
            // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS auc
FROM agg
"""


LOGISTIC_AUC_ORACLE = _logistic_auc_oracle()


# --------------------------------------------------------------------------
# Kaplan-Meier by signup cohort (grouped survival curves)
# --------------------------------------------------------------------------


def kaplan_meier_by_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohorted survival: the same right-censored KM estimate as
    ``event_user_kaplan_meier``, grouped by the user's signup YEAR
    (first event's year) — "did this year's users live longer than last
    year's", the retention comparison a product team actually reads.
    All windows are PARTITIONED by cohort (never a global-order window),
    so the fold distributes across cohorts by construction; within a
    cohort the frame stays calendar-bounded."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.expr("MIN(CAST(ts AS DATE))").alias("d0"),
        F.expr("MAX(CAST(ts AS DATE))").alias("d1"),
    )
    gmax = ev.agg(F.expr("MAX(CAST(ts AS DATE))").alias("dmax"))
    lifetimes = per_user.crossJoin(F.broadcast(gmax)).select(
        F.expr("CAST(year(d0) AS INT)").alias("cohort_year"),
        F.expr("CAST(datediff(d1, d0) AS BIGINT)").alias("dur"),
        F.expr(
            f"CASE WHEN datediff(dmax, d1) < {_KM_CENSOR_DAYS}"
            " THEN 1 ELSE 0 END"
        ).alias("censored"),
    )
    per_dur = lifetimes.groupBy("cohort_year", "dur").agg(
        F.expr("CAST(SUM(1 - censored) AS BIGINT)").alias("n_churned"),
        F.expr("CAST(SUM(censored) AS BIGINT)").alias("n_censored"),
    )
    coh_tot = lifetimes.groupBy("cohort_year").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    from pyspark.sql import Window as W

    w_excl = (
        W.partitionBy("cohort_year")
        .orderBy(F.asc("dur"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_prev = (
        W.partitionBy("cohort_year")
        .orderBy(F.asc("dur"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    stepped = (
        per_dur.withColumn(
            "n_removed_before",
            F.coalesce(
                F.sum(F.col("n_churned") + F.col("n_censored")).over(w_excl),
                F.lit(0),
            ),
        )
        .join(F.broadcast(coh_tot), "cohort_year")
        .withColumn("n_risk", F.expr("n_total - n_removed_before"))
        .withColumn(
            "log_step",
            F.expr(
                "CASE WHEN n_churned = 0 THEN CAST(0 AS DECIMAL(18,12))"
                " ELSE CAST(ROUND(LN(CAST(n_risk - n_churned AS DOUBLE)"
                " / CAST(n_risk AS DOUBLE)), 12) AS DECIMAL(18,12)) END"
            ),
        )
    )
    return (
        stepped.withColumn("log_surv_dec", F.sum("log_step").over(w_prev))
        .selectExpr(
            "cohort_year",
            "dur AS duration_days",
            "n_risk",
            "n_churned",
            "n_censored",
            "ROUND(EXP(CAST(log_surv_dec AS DOUBLE)), 6) AS km_survival",
        )
    )


KM_COHORT_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
  FROM events GROUP BY user_id
), gmax AS (
  SELECT MAX(CAST(ts AS DATE)) AS dmax FROM events
), lifetimes AS (
  SELECT CAST(year(d0) AS INT) AS cohort_year,
         CAST(date_diff('day', d0, d1) AS BIGINT) AS dur,
         CASE WHEN date_diff('day', d1, dmax) < {_KM_CENSOR_DAYS}
              THEN 1 ELSE 0 END AS censored
  FROM per_user CROSS JOIN gmax
), per_dur AS (
  SELECT cohort_year, dur,
         CAST(SUM(1 - censored) AS BIGINT) AS n_churned,
         CAST(SUM(censored) AS BIGINT) AS n_censored
  FROM lifetimes GROUP BY cohort_year, dur
), coh_tot AS (
  SELECT cohort_year, CAST(COUNT(*) AS BIGINT) AS n_total
  FROM lifetimes GROUP BY cohort_year
), stepped AS (
  SELECT p.cohort_year, p.dur, p.n_churned, p.n_censored,
         t.n_total
           - COALESCE(SUM(p.n_churned + p.n_censored) OVER (
               PARTITION BY p.cohort_year ORDER BY p.dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk
  FROM per_dur p JOIN coh_tot t USING (cohort_year)
), logged AS (
  SELECT cohort_year, dur, n_risk, n_churned, n_censored,
         CASE WHEN n_churned = 0 THEN CAST(0 AS DECIMAL(18,12))
              ELSE CAST(ROUND(LN(CAST(n_risk - n_churned AS DOUBLE)
                   / CAST(n_risk AS DOUBLE)), 12) AS DECIMAL(18,12)) END
           AS log_step
  FROM stepped
)
SELECT cohort_year,
       dur AS duration_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       n_churned, n_censored,
       ROUND(EXP(CAST(CAST(SUM(log_step) OVER (
             PARTITION BY cohort_year ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DECIMAL(38,12)) AS DOUBLE)), 6) AS km_survival
FROM logged
"""


# --------------------------------------------------------------------------
# Good-Turing count-of-counts (LM smoothing diagnostics)
# --------------------------------------------------------------------------

_GT_MAX_R = 10


def token_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency-of-frequencies over the corpus's 3-gram
    TYPES: for r = 1..{r_max}, how many distinct 3-grams occur exactly r
    times (``n_r``) and the GT-discounted count
    ``r* = (r+1)·N_{{r+1}}/N_r`` — the table every count-based n-gram LM
    smoother (and the unseen-mass estimate ``N_1/N_tokens``) is built
    from.  3-grams, not unigrams, because GT lives where the count tail
    lives: this corpus's unigram vocabulary is fully saturated (every
    word type occurs hundreds of times — N_r empty below r≈26) while the
    3-gram tail is properly Zipfian; that is exactly the regime where
    r* dropping below r signals the tail needs smoothing before a
    perplexity means anything.

    Scale shape: shingle count (one shuffle), count-of-counts (one
    bounded-output shuffle), then a self-join on the ≤ r_max+1-row
    frame.  The ratio emits exact via the half-up device; the unseen
    mass rides along as constant columns of the bounded table."""
    from df_to_azure_spark.functions.text import shingles

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(shingles("text", 3)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    n_tok = counts.agg(
        F.expr("CAST(SUM(r) AS BIGINT)").alias("n_tokens"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_types"),
    )
    coc = (
        counts.groupBy("r")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_r"))
        .where(F.col("r") <= _GT_MAX_R + 1)
    )
    nxt = coc.selectExpr("r - 1 AS r", "n_r AS n_r_next")
    return (
        coc.where(F.col("r") <= _GT_MAX_R)
        .join(nxt, "r", "left")
        .crossJoin(F.broadcast(n_tok))
        .selectExpr(
            "CAST(r AS BIGINT) AS r",
            "n_r",
            "COALESCE(n_r_next, CAST(0 AS BIGINT)) AS n_r_next",
            # r* = (r+1) * N_{r+1} / N_r, exact half-up at 1e6
            "CAST((2000000 * (r + 1) * COALESCE(n_r_next, 0) + n_r)"
            " DIV (2 * n_r) AS DOUBLE) / CAST(1000000 AS DOUBLE)"
            " AS gt_discounted_r",
            "n_tokens",
            "n_types",
        )
    )


GOOD_TURING_ORACLE = f"""
WITH toked AS (
  SELECT list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
), toks AS (
  SELECT unnest(list_transform(
           range(1, greatest(len(toks) - 2, 1) + 1),
           i -> array_to_string(toks[i:i+2], ' '))) AS tok
  FROM toked WHERE len(toks) > 0
), counts AS (
  SELECT tok, COUNT(*) AS r FROM toks GROUP BY tok
), n_tok AS (
  SELECT CAST(SUM(r) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types
  FROM counts
), coc AS (
  SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r
  FROM counts GROUP BY r HAVING r <= {_GT_MAX_R + 1}
)
SELECT CAST(c.r AS BIGINT) AS r, c.n_r,
       COALESCE(nx.n_r, CAST(0 AS BIGINT)) AS n_r_next,
       CAST((2000000 * (c.r + 1) * COALESCE(nx.n_r, 0) + c.n_r)
            // (2 * c.n_r) AS DOUBLE) / CAST(1000000 AS DOUBLE)
         AS gt_discounted_r,
       n_tokens, n_types
FROM coc c
LEFT JOIN coc nx ON nx.r = c.r + 1
CROSS JOIN n_tok
WHERE c.r <= {_GT_MAX_R}
"""


# --------------------------------------------------------------------------
# Logistic model calibration curve (reliability diagram)
# --------------------------------------------------------------------------

_CAL_BINS = 20


def logistic_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the 2-step IRLS model (the in-engine-
    trained GLM; ``classifier_calibration_bins`` in pipeline3 is the
    same audit for the document quality classifier, with quantile bins):
    bin the fitted probabilities into fixed 1/{bins}-wide bins and compare each bin's
    MEAN PREDICTED probability against its OBSERVED positive rate — the
    calibration audit that decides whether the scores can be used as
    probabilities or must be recalibrated (Platt/isotonic).  Bins are
    fixed-width (not quantile), so the bin id is a pure integer function
    of p and the output is bounded by the bin count.

    Exactness: p is the ROUND(12) DECIMAL score; per-bin sums of p are
    exact DECIMAL; both emitted ratios go through the half-up device."""
    li = load_table(spark, sf_dir, "lineitem")
    feats = li.selectExpr(*[
        s.strip() for s in _LOGIT_FEATURES.strip().split(",\n")
    ])
    it1_sums = feats.agg(
        *[
            F.expr(e.strip())
            for e in _IT1_SUMS.strip().rstrip(",").split(",\n")
        ]
    )
    c1 = _cramer3_text(_IT1_A, _IT1_R)
    it1 = it1_sums.selectExpr(
        "n", f"{c1['x0']} AS b0", f"{c1['x1']} AS b1", f"{c1['x2']} AS b2"
    )
    scored = feats.crossJoin(F.broadcast(it1)).selectExpr(
        "n", "b0", "b1", "b2", "x1", "x2", "y", f"{_P_EXPR} AS p"
    ).selectExpr(
        "n", "b0", "b1", "b2", "x1", "x2", "y", "p",
        "CAST(ROUND(p * (1 - p), 12) AS DECIMAL(14,12)) AS w",
    )
    it2_sums = scored.groupBy("n", "b0", "b1", "b2").agg(
        *[
            F.expr(e.strip())
            for e in _IT2_SUMS.strip().rstrip(",").split(",\n")
        ]
    )
    c2 = _cramer3_text(_IT2_A, _IT2_R)
    it2 = it2_sums.selectExpr(
        f"b0 + {c2['x0']} AS f0",
        f"b1 + {c2['x1']} AS f1",
        f"b2 + {c2['x2']} AS f2",
    )
    rescored = feats.crossJoin(F.broadcast(it2)).selectExpr(
        "y",
        "CAST(ROUND(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE)"
        " + EXP(-(f0 + f1 * CAST(x1 AS DOUBLE)"
        " + f2 * CAST(x2 AS DOUBLE)))), 12) AS DECIMAL(14,12)) AS p",
    )
    return (
        rescored.selectExpr(
            "y",
            "p",
            f"CAST(LEAST(CAST(FLOOR(CAST(p AS DOUBLE) * {_CAL_BINS})"
            f" AS INT), {_CAL_BINS - 1}) AS BIGINT) AS bin",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr("CAST(SUM(p) AS DECIMAL(38,12))").alias("sum_p"),
            F.expr("CAST(SUM(y) AS BIGINT)").alias("n_pos"),
        )
        .selectExpr(
            "bin",
            "n",
            # mean predicted probability: exact decimal sum / n, 1e6 device
            "CAST((2000000 * CAST(sum_p * 1000000 AS DECIMAL(38,0))"
            " + CAST(n AS DECIMAL(38,0)) * 1000000)"
            " DIV (2 * CAST(n AS DECIMAL(38,0)) * 1000000) AS DOUBLE)"
            " / CAST(1000000 AS DOUBLE) AS mean_predicted",
            "CAST((2000000 * n_pos + n) DIV (2 * n) AS DOUBLE)"
            " / CAST(1000000 AS DOUBLE) AS observed_rate",
        )
    )


def _logistic_calibration_oracle() -> str:
    c1 = _cramer3_text(_IT1_A, _IT1_R)
    c2 = _cramer3_text(_IT2_A, _IT2_R)
    return f"""
WITH feats AS (
  SELECT {_LOGIT_FEATURES} FROM lineitem
), it1_sums AS (
  SELECT {_IT1_SUMS} FROM feats
), it1 AS (
  SELECT n, {c1['x0']} AS b0, {c1['x1']} AS b1, {c1['x2']} AS b2
  FROM it1_sums
), scored0 AS (
  SELECT n, b0, b1, b2, x1, x2, y, {_P_EXPR} AS p
  FROM feats CROSS JOIN it1
), scored AS (
  SELECT *, CAST(ROUND(p * (1 - p), 12) AS DECIMAL(14,12)) AS w
  FROM scored0
), it2_sums AS (
  SELECT n, b0, b1, b2, {_IT2_SUMS}
  FROM scored GROUP BY n, b0, b1, b2
), it2 AS (
  SELECT b0 + {c2['x0']} AS f0, b1 + {c2['x1']} AS f1,
         b2 + {c2['x2']} AS f2
  FROM it2_sums
), rescored AS (
  SELECT y,
         CAST(ROUND(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE)
              + EXP(-(f0 + f1 * CAST(x1 AS DOUBLE)
              + f2 * CAST(x2 AS DOUBLE)))), 12) AS DECIMAL(14,12)) AS p
  FROM feats CROSS JOIN it2
), binned AS (
  SELECT y, p,
         CAST(LEAST(CAST(FLOOR(CAST(p AS DOUBLE) * {_CAL_BINS}) AS INT),
               {_CAL_BINS - 1}) AS BIGINT) AS bin
  FROM rescored
), agg AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(p) AS DECIMAL(38,12)) AS sum_p,
         CAST(SUM(y) AS BIGINT) AS n_pos
  FROM binned GROUP BY bin
)
SELECT bin, n,
       CAST((2000000 * CAST(sum_p * 1000000 AS HUGEINT)
             + CAST(n AS HUGEINT) * 1000000)
            // (2 * CAST(n AS HUGEINT) * 1000000) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS mean_predicted,
       CAST((2000000 * n_pos + n) // (2 * n) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS observed_rate
FROM agg
"""


LOGISTIC_CALIBRATION_ORACLE = _logistic_calibration_oracle()
