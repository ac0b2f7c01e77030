"""Round-10 second wave: the binned range-join operator family
(point-in-interval and keyed interval-overlap — the join shape Spark
lacks natively and naive plans turn into cross products), an in-engine
multinomial Naive Bayes language classifier (train + score + confusion
in ONE plan over the md5 split), a seeded randomization test, Ljung–Box
autocorrelation diagnostics, a Matryoshka truncated-dimension retrieval
check, and an l-diversity audit next to the k-anonymity one.

Same cross-engine exactness policy as ``pipeline2``..``pipeline9``:
integer/decimal arithmetic end-to-end where possible, one ROUND after
each transcendental (9 dp here), per-row ROUND → DECIMAL before any
order-free SUM, final presentation doubles rounded once.

Reference anchor: the reference (``/root/reference/df_to_azure``) is a
pandas→Azure mover with no analytics surface; these extend the engine's
query capabilities per the brief (temporal joins, corpus classifiers,
resampling inference, privacy audits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from df_to_azure_spark.functions import similarity as SIM
from df_to_azure_spark.functions import text as TXT
from df_to_azure_spark.operators.intervaljoin import (
    interval_overlap_join,
    interval_point_join,
)
from df_to_azure_spark.sources import load_table


# --------------------------------------------------------------------------
# Binned range join #1: point-in-interval (purchases × sessions)
# --------------------------------------------------------------------------

_SESSION_GAP_MIN = 30
_IJ_BUCKET_S = 3600  # ~typical session length; replication = len/W + 1


def purchase_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, how many OTHER users had an active
    session (30-min-gap sessionization) covering the purchase moment —
    the platform-load covariate a price-sensitivity model joins onto
    conversions.

    This is a RANGE join (no equi-key: any user's session may cover any
    purchase), executed with the binned strategy from
    ``operators/intervaljoin.py``: sessions replicate once per covered
    hour bucket, purchases carry exactly one bucket, ONE hash equi-join
    on the bucket id, exact containment + user-mismatch as the join
    filter.  At 100 TB the shuffle is keyed by hour-of-history — tens of
    thousands of keys — and a hot hour is an ordinary AQE skew-join
    case.  The naive plan (cross join, then filter) touches |purchases|
    × |sessions| pairs and is exactly what this operator exists to
    avoid.  Left join keeps zero-concurrency purchases in the output.
    """
    from df_to_azure_spark.streaming.events import sessionize

    events = load_table(spark, sf_dir, "events")
    sessions = sessionize(events, gap_minutes=_SESSION_GAP_MIN).select(
        F.col("user_id").alias("s_user"),
        F.col("session_start"),
        F.col("session_end"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("p_user"), "ts"
    )
    joined = interval_point_join(
        purchases,
        sessions,
        ts_col="ts",
        start_col="session_start",
        end_col="session_end",
        bucket_seconds=_IJ_BUCKET_S,
        extra_on=F.col("p_user") != F.col("s_user"),
        how="left",
    )
    return (
        joined.groupBy("event_id")
        .agg(F.count(F.col("s_user")).cast("bigint").alias("n_concurrent"))
        .select("event_id", "n_concurrent")
    )


_SESSIONS_CTE = """
flagged AS (
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
  SELECT user_id AS s_user,
         MIN(ts) AS session_start, MAX(ts) AS session_end
  FROM with_ids GROUP BY user_id, session_seq
)
"""

CONCURRENT_SESSIONS_ORACLE = f"""
WITH {_SESSIONS_CTE},
p AS (
  SELECT event_id, user_id AS p_user, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id,
       CAST(COUNT(s.s_user) AS BIGINT) AS n_concurrent
FROM p LEFT JOIN sessions s
  ON p.ts >= s.session_start AND p.ts <= s.session_end AND s.s_user <> p.p_user
GROUP BY p.event_id
"""


# --------------------------------------------------------------------------
# Binned range join #2: keyed interval overlap (order windows per customer)
# --------------------------------------------------------------------------

_ORDER_WINDOW_DAYS = 30


def customer_order_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer: how many pairs of their 30-day order-fulfillment
    windows ``[o_orderdate, +30d)`` overlap, and the widest overlap in
    days — the double-booking exposure a fulfillment planner audits.

    Keyed interval-overlap join (``operators/intervaljoin.py``): the
    customer key carries the shuffle as an ordinary hash join and the
    overlap predicate runs as the join filter, so per-key work is
    bounded by (orders per customer)² — a domain constant, not a data
    property.  No time-bucket replication is needed when a bounded
    equi-key exists; the keyless binned form is the sibling operator
    ``purchase_concurrent_sessions`` exercises.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderdate").cast("date").alias("ws"),
        F.date_add(F.col("o_orderdate").cast("date"), _ORDER_WINDOW_DAYS).alias(
            "we"
        ),
    )
    a = w.select([F.col(c).alias(f"a_{c}") for c in w.columns])
    b = w.select([F.col(c).alias(f"b_{c}") for c in w.columns])
    pairs = interval_overlap_join(
        a,
        b,
        keys=[("a_custkey", "b_custkey")],
        left_start="a_ws",
        left_end="a_we",
        right_start="b_ws",
        right_end="b_we",
    ).where(F.col("a_okey") < F.col("b_okey"))
    return (
        pairs.groupBy(F.col("a_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_overlap_pairs"),
            F.max(
                F.datediff(
                    F.least(F.col("a_we"), F.col("b_we")),
                    F.greatest(F.col("a_ws"), F.col("b_ws")),
                )
            )
            .cast("int")
            .alias("max_overlap_days"),
        )
        .select("custkey", "n_overlap_pairs", "max_overlap_days")
    )


ORDER_OVERLAP_ORACLE = f"""
WITH w AS (
  SELECT o_custkey AS custkey, o_orderkey AS okey,
         CAST(o_orderdate AS DATE) AS ws,
         CAST(o_orderdate AS DATE) + {_ORDER_WINDOW_DAYS} AS we
  FROM orders
)
SELECT a.custkey,
       CAST(COUNT(*) AS BIGINT) AS n_overlap_pairs,
       CAST(MAX(date_diff('day', greatest(a.ws, b.ws), least(a.we, b.we))) AS INT)
         AS max_overlap_days
FROM w a JOIN w b
  ON a.custkey = b.custkey AND a.okey < b.okey
 AND a.ws < b.we AND b.ws < a.we
GROUP BY a.custkey
"""


# --------------------------------------------------------------------------
# Multinomial Naive Bayes language classifier (train + score + confusion)
# --------------------------------------------------------------------------

# md5 80/20 split — the same device the KN / contamination family uses
_SPLIT_SPARK = (
    "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS INT) % 100"
)
_SPLIT_DUCK = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100"

# transcendental rounding for this family: ROUND(·, 9) — coarser than
# the 12 dp elsewhere ON PURPOSE: scores sum hundreds of per-token LN
# terms, so the extra headroom against a cross-libm last-ulp disagreement
# costs nothing (argmax margins dwarf 1e-9) while making each rounded
# term bit-identical across engines with even more slack
_NB_DP = 9


def nb_language_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language ID — the classic fastText-class
    baseline a corpus pipeline trains as its first lang-ID pass — with
    training, scoring, and the confusion matrix in ONE Spark plan:

    * TRAIN (md5 80%): per-language token counts ``c_{L,w}``, token
      totals ``t_L``, doc priors ``n_L/N``, Laplace-smoothed vocabulary
      ``V`` (train-wide distinct tokens);
    * TEST (md5 20%): ``score(d, L) = ln prior_L + Σ_w m_w ·
      ln((c_{L,w}+1)/(t_L+V))``, argmax over L, ties → language asc;
    * output: (true lang, predicted, count).

    The unseen-token mass is factored so the scoring join touches only
    SEEN (token, lang) pairs: ``score = prior + M_d·lnp0_L + Σ_seen
    m·(lnp_{L,w} − lnp0_L)`` with ``lnp0_L = ln(1/(t_L+V))`` — the
    correction join is test-tokens × train-vocabulary (inner), never
    test-tokens × languages.  Every LN is rounded once (9 dp) and summed
    as exact DECIMAL, so the argmax is deterministic and engine-exact.
    At 100 TB: token-keyed shuffles with map-side combine; the language
    model frame is 5 rows (lang domain) and broadcasts.
    """
    docs = load_table(spark, sf_dir, "documents")
    split = F.expr(_SPLIT_SPARK)
    train = docs.where(split < 80)
    test = docs.where(split >= 80)

    train_tok = train.select("lang", F.explode(TXT.tokens("text")).alias("tok"))
    # the aggregated (lang, tok) count table IS the trained model — pin
    # it (model-sized: vocabulary × languages, never corpus-sized) and
    # derive vocabulary size and per-language token totals FROM it, so
    # the train split is tokenized exactly once instead of three times
    # (t_l = Σ_tok c ≡ Σ_doc token_count; V = distinct tok of c_lw)
    c_lw = (
        train_tok.groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    # 5-row language frame: doc prior (text-free scan) + token total
    # (from the pinned model; left join keeps a lang whose train docs
    # are all token-less, as the direct SUM(token_count) did)
    n_docs_l = train.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    t_l = c_lw.groupBy("lang").agg(F.sum("c").alias("t_l"))
    # both sides are |languages| rows (≤5) — broadcast the token-total
    # side so the left join is a BroadcastHashJoin instead of a
    # sort-merge (r14 verdict: the model-side fold added exchanges; the
    # broadcast claws the SMJ's two exchanges + sorts back)
    per_lang = n_docs_l.join(F.broadcast(t_l), "lang", "left").select(
        "lang",
        "n_docs",
        F.coalesce(F.col("t_l"), F.lit(0).cast("bigint")).alias("t_l"),
    )
    # 1-row corpus frames: smoothed vocabulary size + train doc total
    vocab_n = c_lw.agg(F.countDistinct("tok").cast("bigint").alias("v"))
    totals = train.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_train")
    ).crossJoin(F.broadcast(vocab_n))
    lang_model = (
        per_lang.crossJoin(F.broadcast(totals))
        .select(
            "lang",
            F.expr(
                f"CAST(ROUND(LN(CAST(n_docs AS DOUBLE) / CAST(n_train AS DOUBLE)), {_NB_DP})"
                f" AS DECIMAL(20,{_NB_DP})) AS prior"
            ),
            F.expr(
                f"CAST(ROUND(LN(CAST(1 AS DOUBLE) / CAST(t_l + v AS DOUBLE)), {_NB_DP})"
                f" AS DECIMAL(20,{_NB_DP})) AS lnp0"
            ),
            F.expr("t_l + v AS den"),
        )
    )
    # seen-token log-probs minus the unseen floor (exact decimal delta)
    c_aug = c_lw.join(F.broadcast(lang_model), "lang").select(
        "lang",
        "tok",
        F.expr(
            f"CAST(ROUND(LN(CAST(c + 1 AS DOUBLE) / CAST(den AS DOUBLE)), {_NB_DP})"
            f" AS DECIMAL(20,{_NB_DP})) - lnp0 AS delta"
        ),
    )
    test_tok = (
        test.select("doc_id", F.explode(TXT.tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    corr = (
        test_tok.join(c_aug, "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.expr(
                # shrink the BIGINT count to DECIMAL(10,0) before the
                # multiply: BIGINT×DECIMAL(21,9) would promote to
                # DECIMAL(42,9) and hit Spark's precision-38 cap
                # (silent round to scale 6 under allowPrecisionLoss)
                # while DuckDB keeps exact 9-dp via HUGEINT — the
                # DECIMAL(10,0) operand keeps the product at
                # DECIMAL(32,9), exact in both engines
                f"SUM(CAST(CAST(m AS DECIMAL(10,0)) * delta"
                f" AS DECIMAL(38,{_NB_DP}))) AS corr"
            )
        )
    )
    test_docs = test.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        TXT.token_count("text").cast("bigint").alias("m_total"),
    )
    scored = (
        test_docs.crossJoin(F.broadcast(lang_model))
        .join(corr, ["doc_id", "lang"], "left")
        .select(
            "doc_id",
            "true_lang",
            "lang",
            F.expr(
                # operands cast to DECIMAL(25,·): the three-term sum
                # stays inside precision 38, so BOTH engines add exactly —
                # DECIMAL(38,·)+DECIMAL(38,·) would overflow the cap and
                # make Spark silently round scale down (half-up) while
                # DuckDB widens differently, flipping near-tie argmaxes.
                # m_total is shrunk to DECIMAL(10,0) first for the same
                # reason as the corr multiply (BIGINT×DECIMAL(20,9)
                # would exceed precision 38 and round at 6 dp in Spark)
                f"CAST(prior AS DECIMAL(25,{_NB_DP}))"
                f" + CAST(CAST(m_total AS DECIMAL(10,0)) * lnp0"
                f" AS DECIMAL(25,{_NB_DP}))"
                f" + COALESCE(CAST(corr AS DECIMAL(25,{_NB_DP})),"
                f" CAST(0 AS DECIMAL(25,{_NB_DP}))) AS score"
            ),
        )
    )
    w_doc = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    pred = (
        scored.withColumn("rn", F.row_number().over(w_doc))
        .where(F.col("rn") == 1)
        .select("true_lang", F.col("lang").alias("predicted"))
    )
    return (
        pred.groupBy(F.col("true_lang").alias("lang"), "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select("lang", "predicted", "n")
    )


NB_CONFUSION_ORACLE = f"""
WITH train AS (
  SELECT * FROM documents WHERE {_SPLIT_DUCK} < 80
), test AS (
  SELECT * FROM documents WHERE {_SPLIT_DUCK} >= 80
), train_tok AS (
  SELECT lang, unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS tok
  FROM train
), c_lw AS (
  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c FROM train_tok GROUP BY 1, 2
), per_lang AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))) AS BIGINT) AS t_l
  FROM train GROUP BY 1
), totals AS (
  SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM train) AS n_train
  FROM train_tok
), lang_model AS (
  SELECT lang,
         CAST(ROUND(LN(CAST(n_docs AS DOUBLE) / CAST(n_train AS DOUBLE)), {_NB_DP}) AS DECIMAL(20,{_NB_DP})) AS prior,
         CAST(ROUND(LN(CAST(1 AS DOUBLE) / CAST(t_l + v AS DOUBLE)), {_NB_DP}) AS DECIMAL(20,{_NB_DP})) AS lnp0,
         t_l + v AS den
  FROM per_lang CROSS JOIN totals
), c_aug AS (
  SELECT c_lw.lang, tok,
         CAST(ROUND(LN(CAST(c + 1 AS DOUBLE) / CAST(den AS DOUBLE)), {_NB_DP}) AS DECIMAL(20,{_NB_DP})) - lnp0 AS delta
  FROM c_lw JOIN lang_model ON c_lw.lang = lang_model.lang
), test_tok AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS m
  FROM (
    SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS tok
    FROM test
  ) GROUP BY 1, 2
), corr AS (
  SELECT doc_id, lang,
         SUM(CAST(CAST(m AS DECIMAL(10,0)) * delta AS DECIMAL(38,{_NB_DP}))) AS corr
  FROM test_tok JOIN c_aug USING (tok)
  GROUP BY 1, 2
), test_docs AS (
  SELECT doc_id, lang AS true_lang,
         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS m_total
  FROM test
), scored AS (
  SELECT d.doc_id, d.true_lang, lm.lang,
         CAST(lm.prior AS DECIMAL(25,{_NB_DP}))
           + CAST(CAST(d.m_total AS DECIMAL(10,0)) * lm.lnp0 AS DECIMAL(25,{_NB_DP}))
           + COALESCE(CAST(c.corr AS DECIMAL(25,{_NB_DP})),
                      CAST(0 AS DECIMAL(25,{_NB_DP}))) AS score
  FROM test_docs d CROSS JOIN lang_model lm
  LEFT JOIN corr c ON c.doc_id = d.doc_id AND c.lang = lm.lang
), pred AS (
  SELECT true_lang, lang AS predicted
  FROM (
    SELECT true_lang, lang,
           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT true_lang AS lang, predicted, CAST(COUNT(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Seeded randomization test (daily revenue, calendar-phase split)
# --------------------------------------------------------------------------

_PERM_B = 200


def revenue_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization test for the daily-revenue gap between the 2-of-7
    calendar phase (day-number mod 7 < 2 — the weekend proxy this
    synthetic calendar admits) and the rest: is the observed mean gap
    explainable by chance alignment?  B=200 seeded md5 reassignments of
    the group label per day; the p-value is the add-one-smoothed
    fraction of replicas whose |gap| reaches the observed |gap|.

    This is a Bernoulli RANDOMIZATION test (group sizes vary per
    replica), the standard large-sample surrogate for the exact
    permutation test — per-replica group sizes are reported nowhere
    because the statistic conditions on them.  Plan: one day-level
    pre-agg (bounded by the calendar), a 200× explode of that bounded
    frame, ONE grouped aggregation over replicas, and a broadcast of the
    1-row observed statistic.  At 100 TB the only data-sized stage is
    the daily pre-agg; everything after is calendar × B.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.expr(
            "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') AS BIGINT)"
        ).alias("d")
    ).agg(
        F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2))").alias(
            "rev"
        )
    )
    gap = (
        "ROUND(CAST(SUM(CASE WHEN g = 1 THEN rev END) AS DOUBLE)"
        "      / COUNT(CASE WHEN g = 1 THEN 1 END)"
        "    - CAST(SUM(CASE WHEN g = 0 THEN rev END) AS DOUBLE)"
        "      / COUNT(CASE WHEN g = 0 THEN 1 END), 9)"
    )
    obs = daily.withColumn(
        "g", F.expr("CASE WHEN d % 7 < 2 THEN 1 ELSE 0 END")
    ).agg(F.expr(f"{gap} AS obs_gap"))
    reps = (
        daily.withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(_PERM_B - 1))))
        .withColumn(
            "g",
            F.expr(
                "CAST(conv(substring(md5(concat(CAST(d AS STRING), '_',"
                " CAST(b AS STRING))), 1, 4), 16, 10) AS INT) % 2"
            ),
        )
        .groupBy("b")
        .agg(F.expr(f"{gap} AS gap_b"))
    )
    return (
        reps.crossJoin(F.broadcast(obs))
        .agg(
            F.max("obs_gap").alias("obs_gap"),
            F.expr(
                "CAST(SUM(CASE WHEN ABS(gap_b) >= ABS(obs_gap) THEN 1 ELSE 0 END)"
                " AS BIGINT) AS n_extreme"
            ),
        )
        .select(
            "obs_gap",
            "n_extreme",
            F.lit(_PERM_B).cast("int").alias("n_replicas"),
            F.expr(
                f"ROUND(CAST(n_extreme + 1 AS DOUBLE) / CAST({_PERM_B} + 1 AS DOUBLE), 6)"
                " AS p_value"
            ),
        )
    )


PERMUTATION_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2)) AS rev
  FROM orders GROUP BY 1
), obs AS (
  SELECT ROUND(CAST(SUM(CASE WHEN d % 7 < 2 THEN rev END) AS DOUBLE)
               / COUNT(CASE WHEN d % 7 < 2 THEN 1 END)
             - CAST(SUM(CASE WHEN d % 7 >= 2 THEN rev END) AS DOUBLE)
               / COUNT(CASE WHEN d % 7 >= 2 THEN 1 END), 9) AS obs_gap
  FROM daily
), reps AS (
  SELECT b,
         ROUND(CAST(SUM(CASE WHEN g = 1 THEN rev END) AS DOUBLE)
               / COUNT(CASE WHEN g = 1 THEN 1 END)
             - CAST(SUM(CASE WHEN g = 0 THEN rev END) AS DOUBLE)
               / COUNT(CASE WHEN g = 0 THEN 1 END), 9) AS gap_b
  FROM (
    SELECT d, rev, b,
           ('0x' || substr(md5(CAST(d AS VARCHAR) || '_' || CAST(b AS VARCHAR)), 1, 4))::INTEGER % 2 AS g
    FROM daily CROSS JOIN (SELECT UNNEST(generate_series(0, {_PERM_B - 1})) AS b)
  ) GROUP BY b
)
SELECT obs.obs_gap,
       CAST(SUM(CASE WHEN ABS(gap_b) >= ABS(obs_gap) THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
       CAST({_PERM_B} AS INT) AS n_replicas,
       ROUND(CAST(SUM(CASE WHEN ABS(gap_b) >= ABS(obs_gap) THEN 1 ELSE 0 END) + 1 AS DOUBLE)
             / CAST({_PERM_B} + 1 AS DOUBLE), 6) AS p_value
FROM reps CROSS JOIN obs
GROUP BY obs.obs_gap
"""


# --------------------------------------------------------------------------
# Ljung–Box autocorrelation diagnostic (daily revenue, lags 1..10)
# --------------------------------------------------------------------------

_LB_LAGS = 10


def daily_revenue_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau statistic on daily order revenue:
    ``Q(m) = n(n+2) Σ_{k≤m} ρ_k²/(n−k)`` with the standard ACF estimator
    (global-mean-centered, full-series variance denominator) — the
    white-noise screen run on forecast residuals; on raw revenue it
    quantifies how much structure a forecaster must explain before its
    residuals could pass.

    Exactness: the daily pre-agg and all sufficient sums (per-lag n, Σx,
    Σy, Σxy; global n, Σy, Σy²) are exact DECIMALs; ρ_k is ONE double
    expression per lag row (ROUND 9), the per-lag Q term is rounded to a
    DECIMAL(28,12) and the cumulative sum over the 10-row lag frame is
    exact.  Same calendar-bounded shape as ``daily_revenue_acf``: after
    the day-level pre-agg every frame is bounded by |calendar| × lags.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.expr(
            "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') AS BIGINT)"
        ).alias("d")
    ).agg(
        F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2))").alias(
            "rev"
        )
    )
    totals = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("SUM(rev)").alias("gsy"),
        F.expr("SUM(CAST(rev * rev AS DECIMAL(38,4)))").alias("gsyy"),
    )
    lags = spark.range(1, _LB_LAGS + 1).select(F.col("id").cast("int").alias("lag"))
    shifted = daily.crossJoin(F.broadcast(lags)).select(
        (F.col("d") + F.col("lag")).alias("d"), "lag", F.col("rev").alias("x")
    )
    pairs = shifted.join(daily.select("d", F.col("rev").alias("y")), "d")
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("nk"),
        F.expr("SUM(x)").alias("sx"),
        F.expr("SUM(y)").alias("sy"),
        F.expr("SUM(CAST(x * y AS DECIMAL(38,4)))").alias("sxy"),
    )
    rho = (
        "ROUND((CAST(sxy AS DOUBLE)"
        "       - (CAST(gsy AS DOUBLE) / CAST(n AS DOUBLE))"
        "         * (CAST(sx AS DOUBLE) + CAST(sy AS DOUBLE))"
        "       + CAST(nk AS DOUBLE) * POWER(CAST(gsy AS DOUBLE) / CAST(n AS DOUBLE), 2))"
        "  / (CAST(gsyy AS DOUBLE)"
        "     - CAST(n AS DOUBLE) * POWER(CAST(gsy AS DOUBLE) / CAST(n AS DOUBLE), 2)), 9)"
    )
    terms = (
        s.crossJoin(F.broadcast(totals))
        .select(
            "lag",
            "n",
            F.expr(f"{rho} AS rho"),
        )
        .select(
            "lag",
            "n",
            "rho",
            F.expr(
                "CAST(ROUND(rho * rho / CAST(n - lag AS DOUBLE), 12)"
                " AS DECIMAL(28,12)) AS term"
            ),
        )
    )
    # bounded: the cumulative SUM() OVER (ORDER BY lag) below runs over
    # the 10-row fixed lag frame, never over data-sized input
    return terms.select(
        "lag",
        "rho",
        F.expr(
            "ROUND(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE)"
            " * CAST(SUM(term) OVER (ORDER BY lag"
            "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)"
        ).alias("q_stat"),
    )


LJUNG_BOX_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2)) AS rev
  FROM orders GROUP BY 1
), totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(rev) AS gsy,
         SUM(CAST(rev * rev AS DECIMAL(38,4))) AS gsyy
  FROM daily
), lags AS (
  SELECT CAST(UNNEST(generate_series(1, {_LB_LAGS})) AS INTEGER) AS lag
), pairs AS (
  SELECT sh.lag, sh.x, dy.rev AS y
  FROM (SELECT d + lag AS d, lag, rev AS x FROM daily CROSS JOIN lags) sh
  JOIN daily dy ON sh.d = dy.d
), s AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS nk,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(x * y AS DECIMAL(38,4))) AS sxy
  FROM pairs GROUP BY lag
), terms AS (
  SELECT lag, n,
         ROUND((CAST(sxy AS DOUBLE)
                - (CAST(gsy AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(sx AS DOUBLE) + CAST(sy AS DOUBLE))
                + CAST(nk AS DOUBLE) * POWER(CAST(gsy AS DOUBLE) / CAST(n AS DOUBLE), 2))
           / (CAST(gsyy AS DOUBLE)
              - CAST(n AS DOUBLE) * POWER(CAST(gsy AS DOUBLE) / CAST(n AS DOUBLE), 2)), 9) AS rho
  FROM s CROSS JOIN totals
)
SELECT lag, rho,
       ROUND(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE)
             * CAST(SUM(CAST(ROUND(rho * rho / CAST(n - lag AS DOUBLE), 12) AS DECIMAL(28,12)))
                    OVER (ORDER BY lag ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS q_stat
FROM terms
"""


# --------------------------------------------------------------------------
# Matryoshka truncated-dimension retrieval check
# --------------------------------------------------------------------------

_MRL_DIMS = (16, 32)
_MRL_K = 10
_MRL_QUERIES = 50


def matryoshka_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of PREFIX-truncated embeddings against the full-dim
    exact ranking — the evaluation behind Matryoshka-style
    dimension-adaptive retrieval (store one 64-dim vector, serve cheap
    queries from its first 16 or 32 coordinates, escalate only misses).
    A coarse-to-fine ANN deployment needs this table before picking the
    cheap tier's dimensionality.

    Truth and candidates both come from the exact brute-force ranker
    (``similarity.cosine_topk`` — rounded cosine, id tie-break), so the
    measured gap is PURELY the truncation's cost, not index noise.  At
    100 TB the sliced candidate pass scans the same corpus with a
    4×-narrower vector — the whole point of the technique.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _MRL_QUERIES)
    truth = SIM.cosine_topk(queries, emb, k=_MRL_K).select(
        "query_id", "neighbor_id"
    )
    cands = None
    for dims in _MRL_DIMS:
        sliced = emb.select(
            "vec_id", F.slice(F.col("embedding"), 1, dims).alias("embedding")
        )
        cand = SIM.cosine_topk(
            sliced.where(F.col("vec_id") < _MRL_QUERIES), sliced, k=_MRL_K
        ).select(
            F.lit(dims).cast("int").alias("dims"), "query_id", "neighbor_id"
        )
        cands = cand if cands is None else cands.unionByName(cand)
    totals = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    hits = cands.join(truth, ["query_id", "neighbor_id"]).groupBy("dims").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits")
    )
    return hits.crossJoin(F.broadcast(totals)).select(
        "dims",
        "n_hits",
        F.expr(
            "ROUND(CAST(n_hits AS DOUBLE) / CAST(n_truth AS DOUBLE), 4) AS recall"
        ),
    )


def _mrl_oracle() -> str:
    def dot(a: str, b: str) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(list_zip({a}, {b}), r -> r[1] * r[2])), (acc, x) -> acc + x)"
        )

    def topk(view: str, vec: str) -> str:
        cos = (
            f"round({dot('qv', 'cv')} / "
            f"(sqrt({dot('qv', 'qv')}) * sqrt({dot('cv', 'cv')})), 8)"
        )
        return f"""
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
    FROM (
      SELECT q.query_id, c.neighbor_id, {cos} AS cos_sim
      FROM (SELECT vec_id AS neighbor_id, {vec} AS cv FROM {view}) c
      CROSS JOIN (SELECT vec_id AS query_id, {vec} AS qv FROM {view}
                  WHERE vec_id < {_MRL_QUERIES}) q
      WHERE query_id <> neighbor_id
    )
  ) WHERE rank <= {_MRL_K}"""

    full = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    parts = []
    for dims in _MRL_DIMS:
        sliced = f"list_transform(embedding, x -> CAST(x AS DOUBLE))[1:{dims}]"
        parts.append(
            f"SELECT CAST({dims} AS INT) AS dims, query_id, neighbor_id"
            f" FROM ({topk('embeddings', sliced)})"
        )
    cand_union = "\nUNION ALL\n".join(parts)
    return f"""
WITH truth AS ({topk('embeddings', full)}
), cands AS (
{cand_union}
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth
)
SELECT dims, CAST(COUNT(*) AS BIGINT) AS n_hits,
       ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(MAX(n_truth) AS DOUBLE), 4) AS recall
FROM cands JOIN truth USING (query_id, neighbor_id)
CROSS JOIN tot
GROUP BY dims
"""


MATRYOSHKA_ORACLE = _mrl_oracle()


# --------------------------------------------------------------------------
# l-diversity audit (sibling of customer_kanonymity)
# --------------------------------------------------------------------------

_LDIV_L = 3


def customer_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over the quasi-identifier classes (nation,
    account-balance band): how many DISTINCT sensitive values (market
    segment) each class carries.  k-anonymity alone
    (``customer_kanonymity``) does not stop attribute disclosure — a
    class of 50 members all in one segment reveals the segment of every
    member; this reports the classes failing l ≥ 3.  Same one-hash-
    aggregate shape as any groupBy at 100 TB."""
    cust = load_table(spark, sf_dir, "customer")
    band = (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("bigint")
    return (
        cust.select("c_nationkey", band.alias("acctbal_band"), "c_mktsegment")
        .groupBy("c_nationkey", "acctbal_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("class_size"),
            F.countDistinct("c_mktsegment").cast("bigint").alias("l_distinct"),
        )
        .withColumn("violates_l", F.col("l_distinct") < _LDIV_L)
    )


L_DIVERSITY_ORACLE = f"""
SELECT c_nationkey,
       CAST(FLOOR(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_band,
       CAST(COUNT(*) AS BIGINT) AS class_size,
       CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_distinct,
       COUNT(DISTINCT c_mktsegment) < {_LDIV_L} AS violates_l
FROM customer
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# L2-boosted decision stumps (2 rounds, histogram split search)
# --------------------------------------------------------------------------

_GBDT_DP = 12  # leaf-value quantization (exact decimal residuals after it)


def gbdt_stump_return_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of L2 gradient boosting with depth-1 trees (decision
    stumps) fit IN-ENGINE on the return-flag target — the distributed
    histogram algorithm every scalable GBDT implementation uses: one scan
    aggregates (feature, bin) → (count, residual sum); prefix sums over
    each feature's ordered bins price every candidate threshold at once;
    the argmax split needs no second pass because the winning row already
    carries its side sums.

    Round 1 fits ``y − ȳ`` (the gain is shift-invariant, so the
    histogram aggregates raw ``y``); round 2 re-scans once with the
    broadcast 1-row stump to form exact-decimal residuals and repeats the
    search.  Features are the integer-binned discount/quantity/tax
    domains (11/50/9 bins — stacked in ONE scan, never three).  Split
    gain is the SSE reduction ``S_L²/n_L + S_R²/n_R − S²/N`` computed as
    one double expression per candidate from exact decimal sums
    (ROUND 9); leaf values quantize at 12 dp so round-2 residuals stay
    exact decimals.  Ties break (feature, threshold) ascending.

    At 100 TB: two scans total, each collapsing map-side to the ~70-row
    bin domain before any shuffle; the candidate pricing and argmax run
    on that bounded frame.  Output: one row per round — the fitted stump
    and its gain.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # pin the projected 4-int frame: four downstream evaluations
    # (round-1 histogram + total, round-2 residual histogram + total)
    # each re-ran the scan+cast chain; the pin materializes it once and
    # the consumers replay in-memory rows (guide §5 "reuse", measured
    # 3.87 -> 3.46 s median vs re-evaluating; an explicit repartition
    # was ALSO tried and regressed to 4.24 s — the shuffle of 600k rows
    # costs more than the one-task scan it parallelizes).  At 100 TB
    # this is the standard between-rounds checkpoint of an iterative
    # fit; the scan arrives pre-split so no parallelism is lost there
    base = li.select(
        F.expr("CAST(l_returnflag = 'R' AS INT) AS y"),
        F.expr("CAST(ROUND(l_discount * 100, 0) AS INT) AS d"),
        F.expr("CAST(l_quantity AS INT) AS q"),
        F.expr("CAST(ROUND(l_tax * 100, 0) AS INT) AS t"),
    ).localCheckpoint()

    def split_search(rows: DataFrame, r_col: str) -> DataFrame:
        """(feat, val) histogram → prefix sums → per-threshold gain."""
        fv = rows.select(
            F.col(r_col).alias("r"),
            F.expr("stack(3, 'd', d, 'q', q, 't', t) AS (feat, val)"),
        )
        g = fv.groupBy("feat", "val").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr(f"SUM(CAST(r AS DECIMAL(38,{_GBDT_DP}))) AS s"),
        )
        w = W.partitionBy("feat").orderBy("val").rowsBetween(
            W.unboundedPreceding, 0
        )
        pre = g.select(
            "feat",
            "val",
            F.sum("n").over(w).alias("nl"),
            F.sum("s").over(w).alias("sl"),
        )
        tot = rows.agg(
            F.count(F.lit(1)).cast("bigint").alias("nn"),
            F.expr(f"SUM(CAST({r_col} AS DECIMAL(38,{_GBDT_DP}))) AS ss"),
        )
        return (
            pre.crossJoin(F.broadcast(tot))
            .where(F.col("nl") < F.col("nn"))
            .select(
                "feat",
                "val",
                "nl",
                "sl",
                "nn",
                "ss",
                F.expr(
                    "ROUND(CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)"
                    " + CAST(ss - sl AS DOUBLE) * CAST(ss - sl AS DOUBLE)"
                    "   / CAST(nn - nl AS DOUBLE)"
                    " - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE), 9)"
                ).alias("gain"),
            )
            .orderBy(F.desc("gain"), F.asc("feat"), F.asc("val"))
            .limit(1)
        )

    dp = _GBDT_DP
    best1 = split_search(base, "y").select(
        "feat",
        "val",
        "nl",
        "nn",
        "gain",
        F.expr(f"CAST(ROUND(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE), {dp})"
               f" AS DECIMAL(20,{dp})) AS f0"),
        F.expr(
            f"CAST(ROUND(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)"
            f" - ROUND(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE), {dp}), {dp})"
            f" AS DECIMAL(20,{dp})) AS vl"
        ),
        F.expr(
            f"CAST(ROUND(CAST(ss - sl AS DOUBLE) / CAST(nn - nl AS DOUBLE)"
            f" - ROUND(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE), {dp}), {dp})"
            f" AS DECIMAL(20,{dp})) AS vr"
        ),
    )
    resid = base.crossJoin(F.broadcast(best1)).select(
        F.expr(
            f"CAST(y AS DECIMAL(20,{dp})) - f0 - CASE WHEN"
            " (feat = 'd' AND d <= val) OR (feat = 'q' AND q <= val)"
            " OR (feat = 't' AND t <= val) THEN vl ELSE vr END AS r2"
        ),
        "d",
        "q",
        "t",
    )
    best2 = split_search(resid, "r2").select(
        "feat",
        "val",
        "nl",
        "nn",
        "gain",
        F.expr(
            f"CAST(ROUND(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE), {dp})"
            f" AS DECIMAL(20,{dp})) AS vl"
        ),
        F.expr(
            f"CAST(ROUND(CAST(ss - sl AS DOUBLE) / CAST(nn - nl AS DOUBLE), {dp})"
            f" AS DECIMAL(20,{dp})) AS vr"
        ),
    )
    out_cols = [
        F.col("feat").alias("feature"),
        F.col("val").alias("threshold"),
        F.col("nl").alias("n_left"),
        F.expr("nn - nl AS n_right"),
        F.expr("CAST(vl AS DOUBLE) AS left_value"),
        F.expr("CAST(vr AS DOUBLE) AS right_value"),
        "gain",
    ]
    return (
        best1.select(F.lit(1).cast("int").alias("round"), *out_cols)
        .unionByName(best2.select(F.lit(2).cast("int").alias("round"), *out_cols))
    )


def _gbdt_oracle() -> str:
    dp = _GBDT_DP
    search = """
  g_{i} AS (
    SELECT feat, val, CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(r AS DECIMAL(38,{dp}))) AS s
    FROM fv_{i} GROUP BY 1, 2
  ), pre_{i} AS (
    SELECT feat, val,
           SUM(n) OVER (PARTITION BY feat ORDER BY val
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
           SUM(s) OVER (PARTITION BY feat ORDER BY val
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sl
    FROM g_{i}
  ), tot_{i} AS (
    -- totals over the BASE rows (N), not the 3x-stacked feature frame
    SELECT CAST(COUNT(*) AS BIGINT) AS nn,
           SUM(CAST({totcol} AS DECIMAL(38,{dp}))) AS ss
    FROM {totsrc}
  ), cand_{i} AS (
    SELECT feat, val, CAST(nl AS BIGINT) AS nl, sl, nn, ss,
           ROUND(CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)
               + CAST(ss - sl AS DOUBLE) * CAST(ss - sl AS DOUBLE)
                 / CAST(nn - nl AS DOUBLE)
               - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE), 9) AS gain
    FROM pre_{i} CROSS JOIN tot_{i}
    WHERE nl < nn
  ), best_{i} AS (
    SELECT * FROM cand_{i} ORDER BY gain DESC, feat, val LIMIT 1
  )"""
    return f"""
WITH base AS (
  SELECT CAST(l_returnflag = 'R' AS INT) AS y,
         CAST(ROUND(l_discount * 100, 0) AS INT) AS d,
         CAST(l_quantity AS INT) AS q,
         CAST(ROUND(l_tax * 100, 0) AS INT) AS t
  FROM lineitem
), fv_1 AS (
  SELECT y AS r, 'd' AS feat, d AS val FROM base
  UNION ALL SELECT y, 'q', q FROM base
  UNION ALL SELECT y, 't', t FROM base
),{search.format(i=1, dp=dp, totsrc='base', totcol='y')}
, stump1 AS (
  SELECT feat, val, nl, nn, gain,
         CAST(ROUND(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE), {dp}) AS DECIMAL(20,{dp})) AS f0,
         CAST(ROUND(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)
              - ROUND(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE), {dp}), {dp}) AS DECIMAL(20,{dp})) AS vl,
         CAST(ROUND(CAST(ss - sl AS DOUBLE) / CAST(nn - nl AS DOUBLE)
              - ROUND(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE), {dp}), {dp}) AS DECIMAL(20,{dp})) AS vr
  FROM best_1
), resid AS (
  SELECT CAST(y AS DECIMAL(20,{dp})) - f0 - CASE WHEN
           (feat = 'd' AND d <= val) OR (feat = 'q' AND q <= val)
           OR (feat = 't' AND t <= val) THEN vl ELSE vr END AS r2,
         d, q, t
  FROM base CROSS JOIN stump1
), fv_2 AS (
  SELECT r2 AS r, 'd' AS feat, d AS val FROM resid
  UNION ALL SELECT r2, 'q', q FROM resid
  UNION ALL SELECT r2, 't', t FROM resid
),{search.format(i=2, dp=dp, totsrc='resid', totcol='r2')}
, stump2 AS (
  SELECT feat, val, nl, nn, gain,
         CAST(ROUND(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE), {dp}) AS DECIMAL(20,{dp})) AS vl,
         CAST(ROUND(CAST(ss - sl AS DOUBLE) / CAST(nn - nl AS DOUBLE), {dp}) AS DECIMAL(20,{dp})) AS vr
  FROM best_2
)
SELECT CAST(1 AS INT) AS round, feat AS feature, val AS threshold,
       CAST(nl AS BIGINT) AS n_left, CAST(nn - nl AS BIGINT) AS n_right,
       CAST(vl AS DOUBLE) AS left_value, CAST(vr AS DOUBLE) AS right_value, gain
FROM stump1
UNION ALL
SELECT CAST(2 AS INT), feat, val, CAST(nl AS BIGINT), CAST(nn - nl AS BIGINT),
       CAST(vl AS DOUBLE), CAST(vr AS DOUBLE), gain
FROM stump2
"""


GBDT_STUMP_ORACLE = _gbdt_oracle()


# --------------------------------------------------------------------------
# Multiple testing: per-nation z-tests + Benjamini–Hochberg step-up
# --------------------------------------------------------------------------

_FDR_Q = 0.10
# Abramowitz & Stegun 26.2.17 constants — SHARED literals, so both
# engines run bit-identical double arithmetic
_AS_T = "0.2316419"
_AS_B = ("0.319381530", "-0.356563782", "1.781477937",
         "-1.821255978", "1.330274429")
_INV_SQRT_2PI = "0.3989422804014327"


def nation_urgent_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which nations order URGENT at a rate that differs from the global
    rate — 25 simultaneous two-proportion z-tests with
    Benjamini–Hochberg FDR control (q = 0.10), the correction any
    dashboard running per-segment tests needs before flagging segments.

    z_i = (p̂_i − p̂) / sqrt(p̂(1−p̂)/n_i) from exact counts; the normal
    tail comes from the Abramowitz–Stegun 26.2.17 polynomial (shared
    literal constants, ONE EXP transcendental rounded at 12 dp, p-value
    rounded at 9).  BH step-up runs on the 25-row nation frame: rank
    p ascending, reject ranks ≤ max{k : p_(k) ≤ k·q/m}.

    Scale shape: one orders aggregation to the nation domain (map-side
    combine), everything after is 25 rows.  The customer→nation join
    broadcasts the nation-keyed customer aggregate's parent — here we
    aggregate orders by custkey's nation via a join to the customer
    table first, which is itself a key-partitioned hash join at scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per_cust = orders.select(
        "o_custkey", F.expr("CAST(o_orderpriority = '1-URGENT' AS INT) AS u")
    )
    per_nation = (
        per_cust.join(cust.select("c_custkey", "c_nationkey"),
                      per_cust["o_custkey"] == cust["c_custkey"])
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_i"),
            F.expr("CAST(SUM(u) AS BIGINT) AS u_i"),
        )
    )
    totals = per_nation.agg(
        F.expr("CAST(SUM(n_i) AS BIGINT) AS n"),
        F.expr("CAST(SUM(u_i) AS BIGINT) AS u"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    b1, b2, b3, b4, b5 = _AS_B
    z = (
        "(CAST(u_i AS DOUBLE) / CAST(n_i AS DOUBLE)"
        " - CAST(u AS DOUBLE) / CAST(n AS DOUBLE))"
        " / SQRT(CAST(u AS DOUBLE) / CAST(n AS DOUBLE)"
        "        * (1.0 - CAST(u AS DOUBLE) / CAST(n AS DOUBLE))"
        "        / CAST(n_i AS DOUBLE))"
    )
    scored = per_nation.crossJoin(F.broadcast(totals)).select(
        "c_nationkey",
        "n_i",
        "u_i",
        "m",
        F.expr(f"ROUND({z}, 9) AS z"),
    )
    # A&S 26.2.17 upper tail on |z|; two-sided p = 2 * tail
    tail = (
        f"ROUND(EXP(-ABS(z) * ABS(z) / 2.0), 12) * {_INV_SQRT_2PI}"
        f" * (({b1}) * tt + ({b2}) * tt * tt + ({b3}) * tt * tt * tt"
        f"    + ({b4}) * tt * tt * tt * tt + ({b5}) * tt * tt * tt * tt * tt)"
    )
    p = scored.withColumn(
        "tt", F.expr(f"1.0 / (1.0 + {_AS_T} * ABS(z))")
    ).select(
        "c_nationkey",
        "n_i",
        "u_i",
        "m",
        "z",
        F.expr(f"ROUND(LEAST(2.0 * ({tail}), 1.0), 9) AS p_value"),
    )
    # bounded: rank + step-up windows run over the 25-row nation frame
    w_rank = W.orderBy("p_value", "c_nationkey")
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    ranked = p.withColumn("rank", F.row_number().over(w_rank)).withColumn(
        "k_pass",
        F.expr(
            f"CASE WHEN p_value <= CAST(rank AS DOUBLE) * {_FDR_Q}"
            " / CAST(m AS DOUBLE) THEN rank END"
        ),
    )
    return ranked.withColumn("k_max", F.max("k_pass").over(w_all)).select(
        F.col("c_nationkey").alias("nationkey"),
        "n_i",
        "u_i",
        "z",
        "p_value",
        F.col("rank").cast("int").alias("rank"),
        F.expr("COALESCE(rank <= k_max, FALSE) AS rejected"),
    )


NATION_FDR_ORACLE = f"""
WITH per_nation AS (
  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_i,
         CAST(SUM(CAST(o_orderpriority = '1-URGENT' AS INT)) AS BIGINT) AS u_i
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
), totals AS (
  SELECT CAST(SUM(n_i) AS BIGINT) AS n, CAST(SUM(u_i) AS BIGINT) AS u,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM per_nation
), scored AS (
  SELECT c_nationkey, n_i, u_i, m,
         ROUND((CAST(u_i AS DOUBLE) / CAST(n_i AS DOUBLE)
                - CAST(u AS DOUBLE) / CAST(n AS DOUBLE))
               / SQRT(CAST(u AS DOUBLE) / CAST(n AS DOUBLE)
                      * (1.0 - CAST(u AS DOUBLE) / CAST(n AS DOUBLE))
                      / CAST(n_i AS DOUBLE)), 9) AS z
  FROM per_nation CROSS JOIN totals
), pv AS (
  SELECT c_nationkey, n_i, u_i, m, z,
         ROUND(LEAST(2.0 * (ROUND(EXP(-ABS(z) * ABS(z) / 2.0), 12) * {_INV_SQRT_2PI}
           * (({_AS_B[0]}) * tt + ({_AS_B[1]}) * tt * tt + ({_AS_B[2]}) * tt * tt * tt
              + ({_AS_B[3]}) * tt * tt * tt * tt
              + ({_AS_B[4]}) * tt * tt * tt * tt * tt)), 1.0), 9) AS p_value
  FROM (SELECT *, 1.0 / (1.0 + {_AS_T} * ABS(z)) AS tt FROM scored)
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY p_value, c_nationkey) AS rank
  FROM pv
), marked AS (
  SELECT *, CASE WHEN p_value <= CAST(rank AS DOUBLE) * {_FDR_Q}
                      / CAST(m AS DOUBLE) THEN rank END AS k_pass
  FROM ranked
)
SELECT c_nationkey AS nationkey, n_i, u_i, z, p_value,
       CAST(rank AS INT) AS rank,
       COALESCE(rank <= MAX(k_pass) OVER (), FALSE) AS rejected
FROM marked
"""


# --------------------------------------------------------------------------
# NB leave-own-source-out generalization (data valuation by count algebra)
# --------------------------------------------------------------------------


def _nb_loso_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level LOSO score frame (doc_id, src, true_lang, lang, score)
    — split out so tests and cross-engine debugging can compare the
    score surface itself, not just the aggregated accuracies."""
    return _nb_loso_impl(spark, sf_dir)


def _nb_loso_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source generalization of the Naive Bayes language model:
    every md5-TEST document is scored under the model trained WITHOUT
    its own source — the leave-one-source-out screen a data-curation
    pipeline runs to measure how much each source's lang-ID signal is
    self-reinforcement (cf. ``nb_language_confusion`` for the full-model
    confusion).  Because NB is count-based, the 5 held-out models are
    pure COUNT ALGEBRA — no retraining: ``c_{L,w,−s} = c_{L,w} −
    c_{L,w,s}``, and the held-out vocabulary is the full vocabulary
    minus the tokens occurring ONLY in s.  Tokens whose remaining count
    is zero contribute a zero delta against the unseen floor, so the
    scoring join still touches only seen (token, lang) pairs.

    Output: per source — test docs, correct LOSO predictions, accuracy.
    At 100 TB: token-keyed shuffles with map-side combine; every model
    frame is bounded by the lang × source domain (25 rows).
    """
    docs = load_table(spark, sf_dir, "documents")
    split = F.expr(_SPLIT_SPARK)
    train = docs.where(split < 80)
    test = docs.where(split >= 80)

    train_tok = train.select(
        "lang", "source", F.explode(TXT.tokens("text")).alias("tok")
    )
    c_lw = train_tok.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    c_lws = train_tok.groupBy("lang", "tok", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_s")
    )
    per_lang = train.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(TXT.token_count("text").cast("bigint")).alias("t_l"),
    )
    per_lang_src = train.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_s"),
        F.sum(TXT.token_count("text").cast("bigint")).alias("t_ls"),
    )
    n_tr_tot = train.agg(F.count(F.lit(1)).cast("bigint").alias("n_tr"))
    n_train = train.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_train_s")
    ).crossJoin(F.broadcast(n_tr_tot))
    # held-out vocabulary: |V| minus tokens living ONLY in source s
    tok_tot = train_tok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_tot")
    )
    tok_src = train_tok.groupBy("tok", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_tot_s")
    )
    vocab_n = tok_tot.agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    excl = (
        tok_src.join(tok_tot, "tok")
        .where(F.col("c_tot_s") == F.col("c_tot"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("v_excl"))
    )
    # 25-row held-out model frame: (lang, source) → prior/lnp0/den
    # full lang x source grid: a language with ZERO training docs in the
    # held-out source keeps its whole model (n_docs_s/t_ls default 0) —
    # dropping it would silently remove it from the candidate set
    grid = per_lang.crossJoin(
        F.broadcast(n_train.select("source", "n_train_s"))
    )
    ls_model = (
        grid.join(per_lang_src, ["lang", "source"], "left")
        .withColumn("n_docs_s", F.expr("COALESCE(n_docs_s, CAST(0 AS BIGINT))"))
        .withColumn("t_ls", F.expr("COALESCE(t_ls, CAST(0 AS BIGINT))"))
        .join(n_train.select("source", "n_tr"), "source")
        .join(excl, "source", "left")
        .crossJoin(F.broadcast(vocab_n))
        .where(F.col("n_docs") > F.col("n_docs_s"))
        .select(
            "lang",
            "source",
            F.expr(
                f"CAST(ROUND(LN(CAST(n_docs - n_docs_s AS DOUBLE)"
                f" / CAST(n_tr - n_train_s AS DOUBLE)), {_NB_DP})"
                f" AS DECIMAL(20,{_NB_DP})) AS prior"
            ),
            F.expr(
                "t_l - t_ls + v - COALESCE(v_excl, CAST(0 AS BIGINT)) AS den"
            ),
        )
        .withColumn(
            "lnp0",
            F.expr(
                f"CAST(ROUND(LN(CAST(1 AS DOUBLE) / CAST(den AS DOUBLE)), {_NB_DP})"
                f" AS DECIMAL(20,{_NB_DP}))"
            ),
        )
    )
    # seen-token deltas vs the held-out floor, per (lang, tok, src) for
    # EVERY source — a token absent from the held-out source but present
    # elsewhere keeps its full count and MUST contribute (only tokens
    # living entirely in the held-out source collapse to a zero delta)
    sources = train.select(F.col("source").alias("src")).distinct()
    c_aug = (
        c_lw.crossJoin(F.broadcast(sources))
        .join(
            F.broadcast(ls_model.withColumnRenamed("source", "src")),
            ["lang", "src"],
        )
        .join(
            c_lws.withColumnRenamed("source", "src"),
            ["lang", "tok", "src"],
            "left",
        )
        .select(
            "lang",
            "tok",
            "src",
            F.expr(
                f"CAST(ROUND(LN(CAST(c - COALESCE(c_s, CAST(0 AS BIGINT)) + 1 AS DOUBLE)"
                f" / CAST(den AS DOUBLE)),"
                f" {_NB_DP}) AS DECIMAL(20,{_NB_DP})) - lnp0 AS delta"
            ),
        )
    )
    test_tok = (
        test.select(
            "doc_id",
            F.col("source").alias("src"),
            F.explode(TXT.tokens("text")).alias("tok"),
        )
        .groupBy("doc_id", "src", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    corr = (
        test_tok.join(c_aug, ["tok", "src"])
        .groupBy("doc_id", "lang")
        .agg(
            F.expr(
                # DECIMAL(10,0) operand shrink — same precision-38-cap
                # rationale as the confusion-matrix corr sum above
                f"SUM(CAST(CAST(m AS DECIMAL(10,0)) * delta"
                f" AS DECIMAL(38,{_NB_DP}))) AS corr"
            )
        )
    )
    test_docs = test.select(
        "doc_id",
        F.col("source").alias("src"),
        F.col("lang").alias("true_lang"),
        TXT.token_count("text").cast("bigint").alias("m_total"),
    )
    scored = (
        test_docs.join(
            F.broadcast(ls_model.withColumnRenamed("source", "src")), "src"
        )
        .join(corr, ["doc_id", "lang"], "left")
        .select(
            "doc_id",
            "src",
            "true_lang",
            "lang",
            F.expr(
                # operands cast to DECIMAL(25,·): the three-term sum
                # stays inside precision 38, so BOTH engines add exactly —
                # DECIMAL(38,·)+DECIMAL(38,·) would overflow the cap and
                # make Spark silently round scale down (half-up) while
                # DuckDB widens differently, flipping near-tie argmaxes.
                # m_total shrunk to DECIMAL(10,0) to keep the product
                # inside precision 38 (exact 9-dp in both engines)
                f"CAST(prior AS DECIMAL(25,{_NB_DP}))"
                f" + CAST(CAST(m_total AS DECIMAL(10,0)) * lnp0"
                f" AS DECIMAL(25,{_NB_DP}))"
                f" + COALESCE(CAST(corr AS DECIMAL(25,{_NB_DP})),"
                f" CAST(0 AS DECIMAL(25,{_NB_DP}))) AS score"
            ),
        )
    )
    return scored


def nb_loso_source_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source LOSO accuracy — the aggregation of ``_nb_loso_scored``;
    see ``_nb_loso_impl`` for the full model/count-algebra docstring."""
    return _nb_loso_accuracy_from_scored(_nb_loso_scored(spark, sf_dir))


def _nb_loso_accuracy_from_scored(scored: DataFrame) -> DataFrame:
    w_doc = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    pred = (
        scored.withColumn("rn", F.row_number().over(w_doc))
        .where(F.col("rn") == 1)
        .select("src", F.expr("CAST(lang = true_lang AS INT) AS ok"))
    )
    return (
        pred.groupBy(F.col("src").alias("source"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr("CAST(SUM(ok) AS BIGINT) AS n_correct"),
        )
        .select(
            "source",
            "n_docs",
            "n_correct",
            F.expr(
                "ROUND(CAST(n_correct AS DOUBLE) / CAST(n_docs AS DOUBLE), 4)"
                " AS acc_loso"
            ),
        )
    )


NB_LOSO_ORACLE = f"""
WITH train AS (
  SELECT * FROM documents WHERE {_SPLIT_DUCK} < 80
), test AS (
  SELECT * FROM documents WHERE {_SPLIT_DUCK} >= 80
), train_tok AS (
  SELECT lang, source,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS tok
  FROM train
), c_lw AS (
  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c FROM train_tok GROUP BY 1, 2
), c_lws AS (
  SELECT lang, tok, source AS src, CAST(COUNT(*) AS BIGINT) AS c_s
  FROM train_tok GROUP BY 1, 2, 3
), per_lang AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))) AS BIGINT) AS t_l
  FROM train GROUP BY 1
), per_lang_src AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs_s,
         CAST(SUM(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))) AS BIGINT) AS t_ls
  FROM train GROUP BY 1, 2
), n_train AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_train_s,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM train) AS n_tr
  FROM train GROUP BY 1
), tok_tot AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c_tot FROM train_tok GROUP BY 1
), tok_src AS (
  SELECT tok, source, CAST(COUNT(*) AS BIGINT) AS c_tot_s
  FROM train_tok GROUP BY 1, 2
), vocab_n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM tok_tot
), excl AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS v_excl
  FROM tok_src JOIN tok_tot USING (tok)
  WHERE c_tot_s = c_tot
  GROUP BY 1
), grid AS (
  SELECT pl.lang, pl.n_docs, pl.t_l, nt.source, nt.n_train_s, nt.n_tr
  FROM per_lang pl CROSS JOIN n_train nt
), ls_model AS (
  SELECT g.lang, g.source,
         CAST(ROUND(LN(CAST(g.n_docs - COALESCE(pls.n_docs_s, 0) AS DOUBLE)
              / CAST(g.n_tr - g.n_train_s AS DOUBLE)), {_NB_DP}) AS DECIMAL(20,{_NB_DP})) AS prior,
         g.t_l - COALESCE(pls.t_ls, 0) + vn.v - COALESCE(ex.v_excl, 0) AS den,
         CAST(ROUND(LN(CAST(1 AS DOUBLE)
              / CAST(g.t_l - COALESCE(pls.t_ls, 0) + vn.v - COALESCE(ex.v_excl, 0) AS DOUBLE)),
              {_NB_DP}) AS DECIMAL(20,{_NB_DP})) AS lnp0
  FROM grid g
  LEFT JOIN per_lang_src pls ON g.lang = pls.lang AND g.source = pls.source
  LEFT JOIN excl ex ON g.source = ex.source
  CROSS JOIN vocab_n vn
  WHERE g.n_docs > COALESCE(pls.n_docs_s, 0)
), sources AS (
  SELECT DISTINCT source AS src FROM train
), c_aug AS (
  SELECT c_lw.lang, c_lw.tok, so.src,
         CAST(ROUND(LN(CAST(c_lw.c - COALESCE(cs.c_s, 0) + 1 AS DOUBLE)
              / CAST(lm.den AS DOUBLE)), {_NB_DP}) AS DECIMAL(20,{_NB_DP})) - lm.lnp0 AS delta
  FROM c_lw
  CROSS JOIN sources so
  JOIN ls_model lm ON lm.lang = c_lw.lang AND lm.source = so.src
  LEFT JOIN c_lws cs ON cs.lang = c_lw.lang AND cs.tok = c_lw.tok AND cs.src = so.src
), test_tok AS (
  SELECT doc_id, src, tok, CAST(COUNT(*) AS BIGINT) AS m
  FROM (
    SELECT doc_id, source AS src,
           unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS tok
    FROM test
  ) GROUP BY 1, 2, 3
), corr AS (
  SELECT doc_id, lang,
         SUM(CAST(CAST(m AS DECIMAL(10,0)) * delta AS DECIMAL(38,{_NB_DP}))) AS corr
  FROM test_tok JOIN c_aug ON test_tok.tok = c_aug.tok AND test_tok.src = c_aug.src
  GROUP BY 1, 2
), test_docs AS (
  SELECT doc_id, source AS src, lang AS true_lang,
         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS m_total
  FROM test
), scored AS (
  SELECT d.doc_id, d.src, d.true_lang, lm.lang,
         CAST(lm.prior AS DECIMAL(25,{_NB_DP}))
           + CAST(CAST(d.m_total AS DECIMAL(10,0)) * lm.lnp0 AS DECIMAL(25,{_NB_DP}))
           + COALESCE(CAST(c.corr AS DECIMAL(25,{_NB_DP})),
                      CAST(0 AS DECIMAL(25,{_NB_DP}))) AS score
  FROM test_docs d
  JOIN ls_model lm ON lm.source = d.src
  LEFT JOIN corr c ON c.doc_id = d.doc_id AND c.lang = lm.lang
), pred AS (
  SELECT src, CAST(lang = true_lang AS INT) AS ok
  FROM (
    SELECT src, lang, true_lang,
           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT src AS source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ok) AS BIGINT) AS n_correct,
       ROUND(CAST(SUM(ok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4) AS acc_loso
FROM pred GROUP BY 1
"""


# --------------------------------------------------------------------------
# Multimodal frame-sampling manifest (video lane)
# --------------------------------------------------------------------------

_FRAME_K = 4
_FRAME_W = 16


def media_frame_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling manifest: K evenly-spaced byte offsets per
    video payload with a sha256 window fingerprint each — the artifact a
    frame-dedup / frame-retrieval pipeline materializes before any GPU
    decode (see ``multimodal.sample_frames`` for why the byte-window
    stand-in keeps the whole lane hash-checkable).  Arrow-batched
    mapInPandas; the binary column never enters a shuffle."""
    from df_to_azure_spark.functions import multimodal as MM

    media = MM.synthesize_media(spark, n=200).where(F.col("kind") == "video")
    return MM.sample_frames(media, k=_FRAME_K, window=_FRAME_W)


MEDIA_FRAME_ORACLE = f"""
WITH m AS (
  SELECT range AS media_id, sha256(CAST(range AS VARCHAR)) AS payload
  FROM range(0, 200) WHERE range % 3 = 2
), f AS (
  SELECT media_id, payload, CAST(UNNEST(range(0, {_FRAME_K})) AS INT) AS frame_idx
  FROM m
)
SELECT media_id, frame_idx,
       CAST(frame_idx * (length(payload) - {_FRAME_W}) // {_FRAME_K - 1} AS INT)
         AS byte_offset,
       sha256(substr(payload,
                     CAST(frame_idx * (length(payload) - {_FRAME_W})
                          // {_FRAME_K - 1} AS INT) + 1,
                     {_FRAME_W})) AS window_sha
FROM f
"""


# --------------------------------------------------------------------------
# Always-valid monitoring: e-process on daily revenue (testing by betting)
# --------------------------------------------------------------------------

_EV_LAMBDA = "0.2"
_EV_BASELINE_DAYS = 365
_EV_ALARM = 20.0  # e >= 1/alpha, alpha = 0.05


def revenue_evalue_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid drift monitor on daily revenue, the
    testing-by-betting form (Shafer 2021): against a FIXED baseline
    window (first year: exact-decimal mean μ0 and variance), each later
    day bets a bounded fraction ``λ·g_d`` of current wealth with
    ``g_d = clip((r_d − μ0)/(3σ0), −1, 1)``; the running wealth
    ``E_t = Π(1 + λ·g_d)`` is an anytime-valid evidence measure — a
    dashboard can stop at ANY day and read ``E_t ≥ 1/α`` as a level-α
    rejection, with no multiple-testing correction for continuous
    monitoring.  The classical fixed-horizon tests next to it
    (``revenue_permutation_test``, ``daily_revenue_cusum``) answer the
    same question only at a pre-registered stopping point.

    Exactness: baseline sums are exact decimals; per-day ``g`` and
    ``ln(1+λg)`` are one double expression each (ROUND 12 → DECIMAL),
    the cumulative log-wealth is an exact decimal running sum, and the
    final EXP is rounded once.  Everything after the day-level pre-agg
    is calendar-bounded."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.expr(
            "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') AS BIGINT)"
        ).alias("d")
    ).agg(
        F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2))").alias(
            "rev"
        )
    )
    d0 = daily.agg(F.expr("MIN(d) AS dmin"))
    base = (
        daily.crossJoin(F.broadcast(d0))
        .where(F.col("d") < F.col("dmin") + _EV_BASELINE_DAYS)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n0"),
            F.expr("SUM(rev) AS s0"),
            F.expr("SUM(CAST(rev * rev AS DECIMAL(38,4))) AS ss0"),
            F.expr(f"MIN(d) + {_EV_BASELINE_DAYS} AS cut"),
        )
    )
    g = (
        "LEAST(GREATEST((CAST(rev AS DOUBLE) - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
        " / (3.0 * SQRT(CAST(ss0 AS DOUBLE) / CAST(n0 AS DOUBLE)"
        "     - POWER(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE), 2))), -1.0), 1.0)"
    )
    post = (
        daily.crossJoin(F.broadcast(base))
        .where(F.col("d") >= F.col("cut"))
        .select(
            "d",
            F.expr(f"ROUND({g}, 9) AS g"),
        )
        .select(
            "d",
            "g",
            F.expr(
                f"CAST(ROUND(LN(1.0 + {_EV_LAMBDA} * g), 12) AS DECIMAL(28,12))"
                " AS lw"
            ),
        )
    )
    # bounded: the running log-wealth window orders the calendar-bounded
    # post-baseline day frame (|days| is a domain constant, not row count)
    return post.select(
        "d",
        "g",
        F.expr(
            "ROUND(EXP(CAST(SUM(lw) OVER (ORDER BY d"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 6)"
        ).alias("e_value"),
    ).withColumn("alarm", F.expr(f"e_value >= {_EV_ALARM}"))


EVALUE_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2)) AS rev
  FROM orders GROUP BY 1
), base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n0, SUM(rev) AS s0,
         SUM(CAST(rev * rev AS DECIMAL(38,4))) AS ss0,
         MIN(d) + {_EV_BASELINE_DAYS} AS cut
  FROM daily
  WHERE d < (SELECT MIN(d) FROM daily) + {_EV_BASELINE_DAYS}
), post AS (
  SELECT d,
         ROUND(LEAST(GREATEST((CAST(rev AS DOUBLE) - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
           / (3.0 * SQRT(CAST(ss0 AS DOUBLE) / CAST(n0 AS DOUBLE)
               - POWER(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE), 2))), -1.0), 1.0), 9) AS g
  FROM daily CROSS JOIN base
  WHERE d >= cut
), lw AS (
  SELECT d, g,
         CAST(ROUND(LN(1.0 + {_EV_LAMBDA} * g), 12) AS DECIMAL(28,12)) AS lw
  FROM post
)
SELECT d, g,
       ROUND(EXP(CAST(SUM(lw) OVER (ORDER BY d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 6) AS e_value,
       ROUND(EXP(CAST(SUM(lw) OVER (ORDER BY d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 6) >= {_EV_ALARM} AS alarm
FROM lw
"""


# --------------------------------------------------------------------------
# HBOS outlier scoring (histogram-based, fully decomposable)
# --------------------------------------------------------------------------

_HBOS_PRICE_BAND = 20000
_HBOS_TOP = 100


def order_hbos_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-Based Outlier Score over orders: treat (price band,
    priority, order weekday) as independent feature histograms and score
    each order by ``Σ −ln(bin share)`` — the embarrassingly-parallel
    outlier detector (Goldstein & Dengel 2012) a 100 TB triage pass
    runs before any pairwise/density method, because it needs only one
    histogram per feature (map-side combine to domain-bounded frames)
    plus one broadcast-join scoring scan.  Top-100 by score
    (TakeOrdered, never a full sort), ties → orderkey.
    """
    orders = load_table(spark, sf_dir, "orders")
    feat = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.expr(f"CAST(FLOOR(o_totalprice / {_HBOS_PRICE_BAND}) AS BIGINT) AS pband"),
        F.col("o_orderpriority").alias("prio"),
        F.expr(
            "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') % 7 AS INT)"
            " AS dow"
        ),
    )
    tot = feat.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    hp = feat.groupBy("pband").agg(F.count(F.lit(1)).cast("bigint").alias("n_p"))
    hq = feat.groupBy("prio").agg(F.count(F.lit(1)).cast("bigint").alias("n_q"))
    hd = feat.groupBy("dow").agg(F.count(F.lit(1)).cast("bigint").alias("n_d"))
    score = (
        "ROUND(-LN(CAST(n_p AS DOUBLE) / CAST(n AS DOUBLE))"
        " - LN(CAST(n_q AS DOUBLE) / CAST(n AS DOUBLE))"
        " - LN(CAST(n_d AS DOUBLE) / CAST(n AS DOUBLE)), 9)"
    )
    return (
        feat.join(F.broadcast(hp), "pband")
        .join(F.broadcast(hq), "prio")
        .join(F.broadcast(hd), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "okey",
            "pband",
            "prio",
            "dow",
            F.expr(f"{score} AS hbos"),
        )
        .orderBy(F.desc("hbos"), F.asc("okey"))
        .limit(_HBOS_TOP)
    )


HBOS_ORACLE = f"""
WITH feat AS (
  SELECT o_orderkey AS okey,
         CAST(FLOOR(o_totalprice / {_HBOS_PRICE_BAND}) AS BIGINT) AS pband,
         o_orderpriority AS prio,
         CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 7 AS INT) AS dow
  FROM orders
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM feat),
hp AS (SELECT pband, CAST(COUNT(*) AS BIGINT) AS n_p FROM feat GROUP BY 1),
hq AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n_q FROM feat GROUP BY 1),
hd AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_d FROM feat GROUP BY 1)
SELECT okey, pband, prio, dow,
       ROUND(-LN(CAST(n_p AS DOUBLE) / CAST(n AS DOUBLE))
             - LN(CAST(n_q AS DOUBLE) / CAST(n AS DOUBLE))
             - LN(CAST(n_d AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS hbos
FROM feat
JOIN hp USING (pband) JOIN hq USING (prio) JOIN hd USING (dow)
CROSS JOIN tot
ORDER BY hbos DESC, okey
LIMIT {_HBOS_TOP}
"""


# --------------------------------------------------------------------------
# AGMS (tug-of-war) join-size estimation — optimizer-internals sketch
# --------------------------------------------------------------------------

_AGMS_K = 64  # independent ±1 sketches averaged



def _agms_dot_sum(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """1-row frame with the AGMS integer dot-sum for a key pair — the
    sketch-only half shared by ``agms_join_size`` (which audits it
    against the exact size) and ``join_strategy_probe`` (which must
    never execute the join it is pricing).

    The K=64 ±1 signs for a key are the 64 low bits of ONE digest per
    row (``xxhash64`` default — JVM-side, no string materialization;
    ``hash_fn='md5'`` slices the first 16 hex nibbles instead, kept
    because DuckDB reproduces it bit-for-bit for the oracle-paired
    registry twins).  One hash per row + 64 map-side SUMs replaces the
    previous 64×-explode-then-md5 shape: no row blowup, no i-keyed
    shuffle — each side collapses map-side to a single 64-column row,
    and the dot product is a broadcast join of two 1-row frames.
    """
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")

    def sketch(df: DataFrame, key: str, prefix: str) -> DataFrame:
        if hash_fn == "xxhash64":
            base = df.select(
                F.expr(f"xxhash64(CAST({key} AS BIGINT))").alias("h")
            )
            # bit i of the signed 64-bit hash; & 1 is sign-safe where
            # % 2 would return -1 for negative odd values
            signs = [
                F.expr(f"1 - 2 * CAST(shiftright(h, {i}) & 1 AS INT)").alias(
                    f"s{i}"
                )
                for i in range(_AGMS_K)
            ]
        else:
            base = df.select(
                F.expr(f"md5(CAST(CAST({key} AS BIGINT) AS STRING))").alias("h")
            )
            # bit i%4 of hex nibble i//4 — DIV/% on a 0..15 value is
            # exact and identical in DuckDB ( // and % )
            signs = [
                F.expr(
                    f"1 - 2 * ((CAST(conv(substring(h, {1 + i // 4}, 1),"
                    f" 16, 10) AS INT) DIV {2 ** (i % 4)}) % 2)"
                ).alias(f"s{i}")
                for i in range(_AGMS_K)
            ]
        return base.select(*signs).agg(
            *[
                F.expr(f"CAST(SUM(s{i}) AS BIGINT) AS {prefix}{i}")
                for i in range(_AGMS_K)
            ]
        )

    xa = sketch(left, left_key, "a")
    xb = sketch(right, right_key, "b")
    dot = " + ".join(f"a{i} * b{i}" for i in range(_AGMS_K))
    return xa.crossJoin(F.broadcast(xb)).select(
        F.expr(f"CAST({dot} AS BIGINT) AS dot_sum")
    )


def agms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation WITHOUT executing the join — the
    AGMS / tug-of-war sketch (Alon-Gibbons-Matias-Szegedy) a
    cost-based optimizer consults before picking a join strategy:
    each side folds to K signed sums ``X_i = Σ_rows s_i(key)`` with
    ``s_i(key) ∈ {−1,+1}`` = bit i of one seeded digest of the key;
    ``E[X_i^A·X_i^B] = |A ⋈ B|`` exactly, and averaging K independent
    sketches tames the variance.  One scan per side collapsing map-side
    to a single K-column row — at 100 TB this is the cheapest join-size
    probe that handles skewed multiplicities (distinct-only sketches
    like KMV cannot: join size is Σ_k n_A(k)·n_B(k), not the key
    overlap).  This registry twin pins ``hash_fn='md5'`` so DuckDB
    reproduces every bit; library callers get the faster xxhash64
    default of :func:`_agms_dot_sum`.

    Output: the sketch estimate, the exact size (computed here from the
    key-count join — the audit a test harness wants; production omits
    it), and the relative error.  Everything is exact integer
    arithmetic until the final two ROUNDed doubles; the seeded signs
    are shared literals, so the estimate is bit-reproducible."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    est = _agms_dot_sum(orders, "o_custkey", cust, "c_custkey", hash_fn="md5")
    na = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a")
    )
    nb_ = cust.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b")
    )
    actual = na.join(nb_, "k").agg(
        F.expr("CAST(SUM(n_a * n_b) AS BIGINT) AS actual")
    )
    return est.crossJoin(F.broadcast(actual)).select(
        F.expr(f"ROUND(CAST(dot_sum AS DOUBLE) / {_AGMS_K}, 4) AS estimate"),
        "actual",
        F.expr(
            f"ROUND(ABS(CAST(dot_sum AS DOUBLE) / {_AGMS_K}"
            " - CAST(actual AS DOUBLE)) / CAST(actual AS DOUBLE), 6)"
            " AS rel_error"
        ),
    )


AGMS_ORACLE = f"""
WITH ii AS (
  SELECT CAST(UNNEST(generate_series(0, {_AGMS_K - 1})) AS INTEGER) AS i
), xa AS (
  SELECT i, CAST(SUM(1 - 2 * (((('0x' || substr(md5(
             CAST(CAST(o_custkey AS BIGINT) AS VARCHAR)),
             1 + i // 4, 1))::INTEGER) // (1 << (i % 4))) % 2)) AS BIGINT) AS xa
  FROM orders CROSS JOIN ii GROUP BY i
), xb AS (
  SELECT i, CAST(SUM(1 - 2 * (((('0x' || substr(md5(
             CAST(CAST(c_custkey AS BIGINT) AS VARCHAR)),
             1 + i // 4, 1))::INTEGER) // (1 << (i % 4))) % 2)) AS BIGINT) AS xb
  FROM customer CROSS JOIN ii GROUP BY i
), est AS (
  SELECT CAST(SUM(xa * xb) AS BIGINT) AS dot_sum FROM xa JOIN xb USING (i)
), actual AS (
  SELECT CAST(SUM(n_a * n_b) AS BIGINT) AS actual
  FROM (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_a FROM orders GROUP BY 1) a
  JOIN (SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_b FROM customer GROUP BY 1) b
  USING (k)
)
SELECT ROUND(CAST(dot_sum AS DOUBLE) / {_AGMS_K}, 4) AS estimate,
       actual,
       ROUND(ABS(CAST(dot_sum AS DOUBLE) / {_AGMS_K} - CAST(actual AS DOUBLE))
             / CAST(actual AS DOUBLE), 6) AS rel_error
FROM est CROSS JOIN actual
"""


# --------------------------------------------------------------------------
# ALS half-step: per-user rank-2 normal equations (recommender factors)
# --------------------------------------------------------------------------

_ALS_LAMBDA_SCALED = 100000  # λ=0.1 after the (f/1000) scaling folds out


def als_user_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed ALS alternation (the user half-step) on implicit
    feedback: ratings = lineitem counts per (customer, part), item
    factors = seeded md5-derived rank-2 vectors, and each user's factor
    solves the per-user 2×2 ridge normal equations
    ``(FᵀF + λI)x = Fᵀr`` in closed form.  Iterating this half-step
    alternating sides IS ALS-WR (Zhou et al. 2008) — the half-step
    carries all the distribution structure: ONE groupBy(custkey)
    aggregation of five sufficient sums, no item×item work, no driver
    participation.

    Integer exactness end-to-end: item factors are integers
    ``h(part) % 1000`` (the /1000 scaling folds out of the normal
    equations — λ·10⁶ lands on the diagonal as the exact integer 10⁵),
    so every sufficient sum is an exact BIGINT and the Cramer solve is
    the only double arithmetic (ROUND 9).  Seeded factor literals are
    shared with the oracle, making the whole sweep bit-reproducible."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    r = (
        li.select("l_orderkey", "l_partkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    )
    h = (
        "CAST(conv(substring(md5(concat('{tag}_', CAST(partkey AS STRING))),"
        " 1, 4), 16, 10) AS BIGINT) % 1000"
    )
    feats = r.select(
        "custkey",
        "r",
        F.expr(h.format(tag="f1")).alias("f1"),
        F.expr(h.format(tag="f2")).alias("f2"),
    )
    s = feats.groupBy("custkey").agg(
        F.expr("CAST(SUM(f1 * f1) AS BIGINT) AS a11"),
        F.expr("CAST(SUM(f1 * f2) AS BIGINT) AS a12"),
        F.expr("CAST(SUM(f2 * f2) AS BIGINT) AS a22"),
        F.expr("CAST(SUM(r * f1) AS BIGINT) AS b1"),
        F.expr("CAST(SUM(r * f2) AS BIGINT) AS b2"),
    )
    lam = _ALS_LAMBDA_SCALED
    det = (
        f"(CAST(a11 + {lam} AS DOUBLE) * CAST(a22 + {lam} AS DOUBLE)"
        " - CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE))"
    )
    return s.select(
        "custkey",
        F.expr(
            f"ROUND((1000.0 * CAST(b1 AS DOUBLE) * CAST(a22 + {lam} AS DOUBLE)"
            f" - 1000.0 * CAST(b2 AS DOUBLE) * CAST(a12 AS DOUBLE)) / {det}, 9)"
            " AS x1"
        ),
        F.expr(
            f"ROUND((1000.0 * CAST(b2 AS DOUBLE) * CAST(a11 + {lam} AS DOUBLE)"
            f" - 1000.0 * CAST(b1 AS DOUBLE) * CAST(a12 AS DOUBLE)) / {det}, 9)"
            " AS x2"
        ),
    )


_ALS_H_DUCK = (
    "('0x' || substr(md5('{tag}_' || CAST(partkey AS VARCHAR)), 1, 4))::BIGINT % 1000"
)

ALS_ORACLE = f"""
WITH r AS (
  SELECT o_custkey AS custkey, l_partkey AS partkey,
         CAST(COUNT(*) AS BIGINT) AS r
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), feats AS (
  SELECT custkey, r,
         {_ALS_H_DUCK.format(tag='f1')} AS f1,
         {_ALS_H_DUCK.format(tag='f2')} AS f2
  FROM r
), s AS (
  SELECT custkey,
         CAST(SUM(f1 * f1) AS BIGINT) AS a11,
         CAST(SUM(f1 * f2) AS BIGINT) AS a12,
         CAST(SUM(f2 * f2) AS BIGINT) AS a22,
         CAST(SUM(r * f1) AS BIGINT) AS b1,
         CAST(SUM(r * f2) AS BIGINT) AS b2
  FROM feats GROUP BY 1
)
SELECT custkey,
       ROUND((1000.0 * CAST(b1 AS DOUBLE) * CAST(a22 + {_ALS_LAMBDA_SCALED} AS DOUBLE)
              - 1000.0 * CAST(b2 AS DOUBLE) * CAST(a12 AS DOUBLE))
             / (CAST(a11 + {_ALS_LAMBDA_SCALED} AS DOUBLE) * CAST(a22 + {_ALS_LAMBDA_SCALED} AS DOUBLE)
                - CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE)), 9) AS x1,
       ROUND((1000.0 * CAST(b2 AS DOUBLE) * CAST(a11 + {_ALS_LAMBDA_SCALED} AS DOUBLE)
              - 1000.0 * CAST(b1 AS DOUBLE) * CAST(a12 AS DOUBLE))
             / (CAST(a11 + {_ALS_LAMBDA_SCALED} AS DOUBLE) * CAST(a22 + {_ALS_LAMBDA_SCALED} AS DOUBLE)
                - CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE)), 9) AS x2
FROM s
"""


# --------------------------------------------------------------------------
# Join-strategy advisor probe (cost-model features + recommendation)
# --------------------------------------------------------------------------

_ADVISOR_BROADCAST_ROWS = 100_000  # ~10 MB at 100 B/row — Spark's default


def join_strategy_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cost-model probe a join planner runs BEFORE executing a big
    join: per-side row counts and exact key NDVs, the AGMS-sketch join
    size estimate (never the join itself), the implied average output
    fan-out, and the strategy a Spark-shaped cost model would pick —
    broadcast-hash when a side fits the broadcast budget, shuffle-hash
    when one side is much smaller, sort-merge otherwise.  At 100 TB all
    four inputs are one-scan map-side-collapsing aggregates; the probe
    costs two table scans and answers the question that decides whether
    the real join shuffles 100 TB or 10 MB.

    Every number is exact integer arithmetic (the sketch estimate is the
    integer dot-sum over K=64 averaged at the end), so the
    recommendation is deterministic and oracle-checkable."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def side(df: DataFrame, key: str, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("side"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr(f"CAST(COUNT(DISTINCT {key}) AS BIGINT) AS ndv"),
        )

    side_a = side(orders, "o_custkey", "orders").select(
        F.col("n_rows").alias("rows_a"), F.col("ndv").alias("ndv_a")
    )
    side_b = side(cust, "c_custkey", "customer").select(
        F.col("n_rows").alias("rows_b"), F.col("ndv").alias("ndv_b")
    )
    est = _agms_dot_sum(
        orders, "o_custkey", cust, "c_custkey", hash_fn="md5"
    ).select(F.expr(f"ROUND(CAST(dot_sum AS DOUBLE) / {_AGMS_K}, 4) AS estimate"))
    stats = side_a.crossJoin(F.broadcast(side_b)).crossJoin(F.broadcast(est))
    return stats.select(
        "rows_a",
        "ndv_a",
        "rows_b",
        "ndv_b",
        "estimate",
        F.expr(
            "ROUND(estimate / CAST(GREATEST(rows_a, rows_b) AS DOUBLE), 6)"
            " AS est_fanout"
        ),
        F.expr(
            f"CASE WHEN LEAST(rows_a, rows_b) <= {_ADVISOR_BROADCAST_ROWS}"
            "      THEN 'broadcast_hash'"
            "      WHEN LEAST(rows_a, rows_b) * 3 <= GREATEST(rows_a, rows_b)"
            "      THEN 'shuffle_hash'"
            "      ELSE 'sort_merge' END AS recommended"
        ),
    )


ADVISOR_ORACLE = f"""
WITH a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS rows_a,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv_a
  FROM orders
), b AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS rows_b,
         CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS ndv_b
  FROM customer
), ii AS (
  SELECT CAST(UNNEST(generate_series(0, {_AGMS_K - 1})) AS INTEGER) AS i
), xa AS (
  SELECT i, CAST(SUM(1 - 2 * (((('0x' || substr(md5(
             CAST(CAST(o_custkey AS BIGINT) AS VARCHAR)),
             1 + i // 4, 1))::INTEGER) // (1 << (i % 4))) % 2)) AS BIGINT) AS xa
  FROM orders CROSS JOIN ii GROUP BY i
), xb AS (
  SELECT i, CAST(SUM(1 - 2 * (((('0x' || substr(md5(
             CAST(CAST(c_custkey AS BIGINT) AS VARCHAR)),
             1 + i // 4, 1))::INTEGER) // (1 << (i % 4))) % 2)) AS BIGINT) AS xb
  FROM customer CROSS JOIN ii GROUP BY i
), est AS (
  SELECT ROUND(CAST(SUM(xa * xb) AS DOUBLE) / {_AGMS_K}, 4) AS estimate
  FROM xa JOIN xb USING (i)
)
SELECT rows_a, ndv_a, rows_b, ndv_b, estimate,
       ROUND(estimate / CAST(GREATEST(rows_a, rows_b) AS DOUBLE), 6) AS est_fanout,
       CASE WHEN LEAST(rows_a, rows_b) <= {_ADVISOR_BROADCAST_ROWS}
            THEN 'broadcast_hash'
            WHEN LEAST(rows_a, rows_b) * 3 <= GREATEST(rows_a, rows_b)
            THEN 'shuffle_hash'
            ELSE 'sort_merge' END AS recommended
FROM a CROSS JOIN b CROSS JOIN est
"""


# --------------------------------------------------------------------------
# Sequential pattern mining: frequent contiguous event triples + lift
# --------------------------------------------------------------------------

_TRIPLE_TOP = 50


def frequent_event_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent CONTIGUOUS 3-event sequences per user (the PrefixSpan-
    lite screen a journey-mining pass runs before any model): support
    (distinct users emitting the triple), total occurrences, and lift
    against the order-1 Markov factorization
    ``P(abc) / (P(ab)·P(bc)/P(b·))`` — triples with lift ≫ 1 are real
    3-step structure, not chained bigram noise.

    Plan: ONE user-ordered window pass builds (e1,e2,e3) per position
    (two LEADs over the same shuffle), then domain-bounded aggregates —
    triple counts are capped by |event_type|³ = 125 rows, so every
    frame after the window is a constant.  Exact integer lift
    arithmetic until the final ROUNDed double.  Top-50 by occurrences
    via TakeOrdered."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    triples = seq.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
    pairs12 = seq.groupBy("e1", "e2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n12")
    )
    pairs23 = seq.groupBy("e2", "e3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n23")
    )
    mid = seq.groupBy("e2").agg(F.count(F.lit(1)).cast("bigint").alias("n2"))
    return (
        triples.join(F.broadcast(pairs12), ["e1", "e2"])
        .join(F.broadcast(pairs23), ["e2", "e3"])
        .join(F.broadcast(mid), "e2")
        .select(
            "e1",
            "e2",
            "e3",
            "n_occ",
            "n_users",
            F.expr(
                "ROUND(CAST(n_occ AS DOUBLE) * CAST(n2 AS DOUBLE)"
                " / (CAST(n12 AS DOUBLE) * CAST(n23 AS DOUBLE)), 6) AS lift"
            ),
        )
        .orderBy(F.desc("n_occ"), "e1", "e2", "e3")
        .limit(_TRIPLE_TOP)
    )


EVENT_TRIPLES_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (SELECT * FROM seq WHERE e3 IS NOT NULL),
triples AS (
  SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_occ,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM s GROUP BY 1, 2, 3
),
p12 AS (SELECT e1, e2, CAST(COUNT(*) AS BIGINT) AS n12 FROM s GROUP BY 1, 2),
p23 AS (SELECT e2, e3, CAST(COUNT(*) AS BIGINT) AS n23 FROM s GROUP BY 1, 2),
mid AS (SELECT e2, CAST(COUNT(*) AS BIGINT) AS n2 FROM s GROUP BY 1)
SELECT e1, e2, e3, n_occ, n_users,
       ROUND(CAST(n_occ AS DOUBLE) * CAST(n2 AS DOUBLE)
             / (CAST(n12 AS DOUBLE) * CAST(n23 AS DOUBLE)), 6) AS lift
FROM triples JOIN p12 USING (e1, e2) JOIN p23 USING (e2, e3) JOIN mid USING (e2)
ORDER BY n_occ DESC, e1, e2, e3
LIMIT {_TRIPLE_TOP}
"""


# --------------------------------------------------------------------------
# Local differential privacy: randomized-response frequency estimation
# --------------------------------------------------------------------------

_LDP_KEEP_PCT = 75  # P(report truth) = 0.75, else uniform over 5 types


def dp_local_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL differential privacy for the event-type histogram:
    generalized randomized response where each row keeps its true type
    with p = 0.75 and otherwise reports a uniformly drawn type — the
    client-side mechanism (each record is privatized BEFORE
    aggregation, no trusted curator), vs the central-DP
    ``dp_segment_counts``.  The debiased estimator inverts the
    perturbation: ``n̂_v = (obs_v − n·q) / (p − q)`` with
    ``q = (1−p)/k``.  Output per event type: perturbed count, debiased
    estimate, true count (the audit), and relative error.

    Seeded md5 coins make the mechanism deterministic and
    oracle-exact — the privacy ANALYSIS (ε = ln(p/q)) is the standard
    one, while the coin is a test-harness device.  At 100 TB the
    mechanism is a map-side expression and the aggregation is a 5-row
    histogram."""
    events = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    k = len(types)
    arr = "array(" + ", ".join(f"'{t}'" for t in types) + ")"
    coin = (
        "CAST(conv(substring(md5(concat('rr_', CAST(event_id AS STRING))),"
        " 1, 4), 16, 10) AS INT) % 100"
    )
    pick = (
        "CAST(conv(substring(md5(concat('pk_', CAST(event_id AS STRING))),"
        " 1, 4), 16, 10) AS INT) % " + str(k)
    )
    reported = events.select(
        F.expr(
            f"CASE WHEN {coin} < {_LDP_KEEP_PCT} THEN event_type"
            f" ELSE element_at({arr}, {pick} + 1) END AS reported"
        ),
        "event_type",
    )
    obs = reported.groupBy(F.col("reported").alias("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_perturbed")
    )
    true = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )
    tot = events.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    p, q = _LDP_KEEP_PCT / 100.0, (1 - _LDP_KEEP_PCT / 100.0) / k
    return (
        obs.join(true, "event_type")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n_perturbed",
            F.expr(
                f"ROUND((CAST(n_perturbed AS DOUBLE) - CAST(n AS DOUBLE) * {q!r})"
                f" / ({p!r} - {q!r}), 4) AS n_estimated"
            ),
            "n_true",
            F.expr(
                f"ROUND(ABS((CAST(n_perturbed AS DOUBLE) - CAST(n AS DOUBLE) * {q!r})"
                f" / ({p!r} - {q!r}) - CAST(n_true AS DOUBLE))"
                " / CAST(n_true AS DOUBLE), 6) AS rel_error"
            ),
        )
    )


_LDP_P = _LDP_KEEP_PCT / 100.0
_LDP_Q = (1 - _LDP_KEEP_PCT / 100.0) / 5

DP_LOCAL_ORACLE = f"""
WITH rep AS (
  SELECT CASE WHEN ('0x' || substr(md5('rr_' || CAST(event_id AS VARCHAR)), 1, 4))::INTEGER % 100 < {_LDP_KEEP_PCT}
              THEN event_type
              ELSE (['click', 'error', 'purchase', 'signup', 'view'])
                   [(('0x' || substr(md5('pk_' || CAST(event_id AS VARCHAR)), 1, 4))::INTEGER % 5) + 1]
         END AS reported,
         event_type
  FROM events
), obs AS (
  SELECT reported AS event_type, CAST(COUNT(*) AS BIGINT) AS n_perturbed
  FROM rep GROUP BY 1
), tru AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true FROM events GROUP BY 1
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events)
SELECT event_type, n_perturbed,
       ROUND((CAST(n_perturbed AS DOUBLE) - CAST(n AS DOUBLE) * {_LDP_Q!r})
             / ({_LDP_P!r} - {_LDP_Q!r}), 4) AS n_estimated,
       n_true,
       ROUND(ABS((CAST(n_perturbed AS DOUBLE) - CAST(n AS DOUBLE) * {_LDP_Q!r})
             / ({_LDP_P!r} - {_LDP_Q!r}) - CAST(n_true AS DOUBLE))
             / CAST(n_true AS DOUBLE), 6) AS rel_error
FROM obs JOIN tru USING (event_type) CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# Difference-in-differences (causal readout on the order panel)
# --------------------------------------------------------------------------

_DID_CUTOFF = "DATE '1998-01-01'"
_DID_SEGMENT = "BUILDING"


def revenue_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout: did BUILDING-segment customers'
    mean order value move differently after 1998-01-01 than everyone
    else's?  ``DID = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)`` —
    the workhorse causal estimate when treatment assignment is a fixed
    group and a calendar cutoff (the CUPED query next door is its
    variance-reduction sibling for randomized assignment).

    One orders→customer join, one 4-cell aggregation (group × period),
    exact decimal sums; the four means and the DID are one double
    expression each (ROUND 4).  Output: the 2×2 cell means + one DID
    row value on each row for self-containedness."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cells = (
        orders.join(
            cust.select("c_custkey", "c_mktsegment"),
            orders["o_custkey"] == cust["c_custkey"],
        )
        .groupBy(
            F.expr(f"CAST(c_mktsegment = '{_DID_SEGMENT}' AS INT) AS treated"),
            F.expr(
                f"CAST(CAST(o_orderdate AS DATE) >= {_DID_CUTOFF} AS INT) AS post"
            ),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2))"
            ).alias("s"),
        )
    )
    m = "CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
    wide = cells.groupBy().agg(
        F.expr(f"MAX(CASE WHEN treated = 1 AND post = 1 THEN {m} END) AS t_post"),
        F.expr(f"MAX(CASE WHEN treated = 1 AND post = 0 THEN {m} END) AS t_pre"),
        F.expr(f"MAX(CASE WHEN treated = 0 AND post = 1 THEN {m} END) AS c_post"),
        F.expr(f"MAX(CASE WHEN treated = 0 AND post = 0 THEN {m} END) AS c_pre"),
    )
    return wide.select(
        F.expr("ROUND(t_pre, 4) AS treated_pre"),
        F.expr("ROUND(t_post, 4) AS treated_post"),
        F.expr("ROUND(c_pre, 4) AS control_pre"),
        F.expr("ROUND(c_post, 4) AS control_post"),
        F.expr("ROUND((t_post - t_pre) - (c_post - c_pre), 4) AS did"),
    )


DID_ORACLE = f"""
WITH cells AS (
  SELECT CAST(c_mktsegment = '{_DID_SEGMENT}' AS INT) AS treated,
         CAST(CAST(o_orderdate AS DATE) >= {_DID_CUTOFF} AS INT) AS post,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2)) AS s
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), wide AS (
  SELECT MAX(CASE WHEN treated = 1 AND post = 1 THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS t_post,
         MAX(CASE WHEN treated = 1 AND post = 0 THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS t_pre,
         MAX(CASE WHEN treated = 0 AND post = 1 THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS c_post,
         MAX(CASE WHEN treated = 0 AND post = 0 THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS c_pre
  FROM cells
)
SELECT ROUND(t_pre, 4) AS treated_pre, ROUND(t_post, 4) AS treated_post,
       ROUND(c_pre, 4) AS control_pre, ROUND(c_post, 4) AS control_post,
       ROUND((t_post - t_pre) - (c_post - c_pre), 4) AS did
FROM wide
"""


# --------------------------------------------------------------------------
# Brier decomposition (composes on the registered calibration table)
# --------------------------------------------------------------------------


def logistic_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the IRLS model's (binned) Brier score:
    ``brier = reliability − resolution + uncertainty`` — reliability is
    what recalibration can remove, resolution is the discrimination that
    survives it, uncertainty is the base-rate floor no model beats.
    Composes directly on the registered reliability table
    (``logistic_calibration_curve``) so the decomposition is consistent
    with the curve the dashboard already shows; per-bin terms round to
    DECIMAL before the order-free sum (the bin frame is ≤ 20 rows)."""
    from df_to_azure_spark.plans import pipeline8 as PL8

    cal = PL8.logistic_calibration_curve(spark, sf_dir)
    tot = cal.agg(
        F.expr("CAST(SUM(n) AS BIGINT) AS n_total"),
        F.expr(
            "CAST(SUM(CAST(ROUND(observed_rate * CAST(n AS DOUBLE), 6)"
            " AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS sum_pos"
        ),
    ).selectExpr(
        "n_total",
        "ROUND(CAST(sum_pos AS DOUBLE) / CAST(n_total AS DOUBLE), 9) AS base_rate",
    )
    terms = cal.crossJoin(F.broadcast(tot)).select(
        "n_total",
        "base_rate",
        F.expr(
            "CAST(ROUND(CAST(n AS DOUBLE)"
            " * POWER(mean_predicted - observed_rate, 2), 9)"
            " AS DECIMAL(38,9)) AS rel_term"
        ),
        F.expr(
            "CAST(ROUND(CAST(n AS DOUBLE)"
            " * POWER(observed_rate - base_rate, 2), 9)"
            " AS DECIMAL(38,9)) AS res_term"
        ),
    )
    return terms.groupBy("n_total", "base_rate").agg(
        F.expr(
            "ROUND(CAST(SUM(rel_term) AS DOUBLE) / CAST(n_total AS DOUBLE), 9)"
            " AS reliability"
        ),
        F.expr(
            "ROUND(CAST(SUM(res_term) AS DOUBLE) / CAST(n_total AS DOUBLE), 9)"
            " AS resolution"
        ),
    ).selectExpr(
        "n_total",
        "base_rate",
        "reliability",
        "resolution",
        "ROUND(base_rate * (1.0 - base_rate), 9) AS uncertainty",
        "ROUND(reliability - resolution"
        " + ROUND(base_rate * (1.0 - base_rate), 9), 9) AS brier_binned",
    )


def _brier_oracle() -> str:
    from df_to_azure_spark.plans import pipeline8 as PL8

    return f"""
WITH cal AS ({PL8.LOGISTIC_CALIBRATION_ORACLE}
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(SUM(CAST(ROUND(observed_rate * CAST(n AS DOUBLE), 6)
              AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS sum_pos
  FROM cal
), tot2 AS (
  SELECT n_total,
         ROUND(CAST(sum_pos AS DOUBLE) / CAST(n_total AS DOUBLE), 9) AS base_rate
  FROM tot
), terms AS (
  SELECT n_total, base_rate,
         CAST(ROUND(CAST(n AS DOUBLE)
              * POWER(mean_predicted - observed_rate, 2), 9)
              AS DECIMAL(38,9)) AS rel_term,
         CAST(ROUND(CAST(n AS DOUBLE)
              * POWER(observed_rate - base_rate, 2), 9)
              AS DECIMAL(38,9)) AS res_term
  FROM cal CROSS JOIN tot2
), agg AS (
  SELECT n_total, base_rate,
         ROUND(CAST(SUM(rel_term) AS DOUBLE) / CAST(n_total AS DOUBLE), 9) AS reliability,
         ROUND(CAST(SUM(res_term) AS DOUBLE) / CAST(n_total AS DOUBLE), 9) AS resolution
  FROM terms GROUP BY 1, 2
)
SELECT n_total, base_rate, reliability, resolution,
       ROUND(base_rate * (1.0 - base_rate), 9) AS uncertainty,
       ROUND(reliability - resolution
         + ROUND(base_rate * (1.0 - base_rate), 9), 9) AS brier_binned
FROM agg
"""


BRIER_ORACLE = _brier_oracle()


# --------------------------------------------------------------------------
# Fellegi–Sunter record-linkage weights (entity resolution)
# --------------------------------------------------------------------------

_FS_SEGMENTS = "'AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY'"


def fellegi_sunter_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage, trained end-to-end
    in one plan: a deterministically CORRUPTED copy of the customer
    table (one md5-chosen digit of the name's 9-digit id corrupted per
    record, nation swapped 10%, segment swapped 20%) is blocked against
    the clean table on the first 7 name digits, and every candidate
    pair's agreement vector (name Hamming ≤ 1, nation equal, segment
    equal) is labeled by key equality — so the m/u probabilities
    (``P(agree|match)`` / ``P(agree|non-match)``) and the field weights
    ``w⁺ = log2(m/u)``, ``w⁻ = log2((1−m)/(1−u))`` come straight from
    counts (add-half smoothing keeps zero cells finite).  Blocking
    misses pairs whose corruption hit the block prefix — the honest
    recall/cost trade every linkage deployment makes, reported here as
    the match recall.

    Scale shape: the block equi-join carries the shuffle (block size
    bounded by the 100-key digit range), the agreement aggregation is
    ONE row of 14 sums unpivoted to the 3-field table.  At 100 TB this
    is the standard blocking-based linkage plan; only the block key
    choice changes."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.expr("substring(c_name, 10, 9) AS digits"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
    )
    h = (
        "CAST(conv(substring(md5(concat('{tag}_', CAST(ckey AS STRING))),"
        " 1, 4), 16, 10) AS INT)"
    )
    dirty = cust.select(
        F.col("ckey").alias("d_key"),
        F.expr(
            f"concat(substring(digits, 1, {h.format(tag='pos')} % 9),"
            f" CAST({h.format(tag='dig')} % 10 AS STRING),"
            f" substring(digits, {h.format(tag='pos')} % 9 + 2)) AS d_digits"
        ),
        F.expr(
            f"CASE WHEN {h.format(tag='nat')} % 100 < 10"
            f" THEN CAST((nat + 1 + {h.format(tag='natp')} % 24) % 25 AS INT)"
            " ELSE nat END AS d_nat"
        ),
        F.expr(
            f"CASE WHEN {h.format(tag='seg')} % 100 < 20"
            f" THEN element_at(array({_FS_SEGMENTS}),"
            f" {h.format(tag='segp')} % 5 + 1)"
            " ELSE seg END AS d_seg"
        ),
    )
    clean = cust.select(
        F.col("ckey").alias("c_key"),
        F.col("digits").alias("c_digits"),
        F.col("nat").alias("c_nat"),
        F.col("seg").alias("c_seg"),
    )
    ham = " + ".join(
        f"CAST(substring(d_digits, {i}, 1) = substring(c_digits, {i}, 1) AS INT)"
        for i in range(1, 10)
    )
    pairs = dirty.join(
        clean,
        F.expr("substring(d_digits, 1, 7) = substring(c_digits, 1, 7)"),
    ).select(
        F.expr("CAST(d_key = c_key AS INT) AS is_match"),
        F.expr(f"CAST(({ham}) >= 8 AS INT) AS a_name"),
        F.expr("CAST(d_nat = c_nat AS INT) AS a_nat"),
        F.expr("CAST(d_seg = c_seg AS INT) AS a_seg"),
    )
    sums = pairs.agg(
        F.expr("CAST(SUM(is_match) AS BIGINT) AS n_m"),
        F.expr("CAST(SUM(1 - is_match) AS BIGINT) AS n_u"),
        *[
            F.expr(
                f"CAST(SUM(CASE WHEN is_match = {lbl} THEN {f} ELSE 0 END)"
                f" AS BIGINT) AS {f}_{suf}"
            )
            for f in ("a_name", "a_nat", "a_seg")
            for lbl, suf in ((1, "m"), (0, "u"))
        ],
    )
    # add-half smoothed probabilities + log2 weights, 3-row unpivot
    stack = ", ".join(
        f"'{name}', {f}_m, {f}_u"
        for name, f in (
            ("name_ham1", "a_name"),
            ("nation", "a_nat"),
            ("segment", "a_seg"),
        )
    )
    unp = sums.selectExpr(
        "n_m", "n_u", f"stack(3, {stack}) AS (field, c_m, c_u)"
    )
    prob = (
        "ROUND((CAST({c} AS DOUBLE) + 0.5) / (CAST({n} AS DOUBLE) + 1.0), 9)"
    )
    return unp.select(
        "field",
        F.expr(prob.format(c="c_m", n="n_m") + " AS m"),
        F.expr(prob.format(c="c_u", n="n_u") + " AS u"),
    ).select(
        "field",
        "m",
        "u",
        F.expr("ROUND(LOG2(m / u), 6) AS w_agree"),
        F.expr("ROUND(LOG2((1.0 - m) / (1.0 - u)), 6) AS w_disagree"),
    )


FELLEGI_SUNTER_ORACLE = f"""
WITH cust AS (
  SELECT c_custkey AS ckey, substr(c_name, 10, 9) AS digits,
         c_nationkey AS nat, c_mktsegment AS seg
  FROM customer
), dirty AS (
  SELECT ckey AS d_key,
         substr(digits, 1, ('0x' || substr(md5('pos_' || CAST(ckey AS VARCHAR)), 1, 4))::INTEGER % 9)
           || CAST(('0x' || substr(md5('dig_' || CAST(ckey AS VARCHAR)), 1, 4))::INTEGER % 10 AS VARCHAR)
           || substr(digits, ('0x' || substr(md5('pos_' || CAST(ckey AS VARCHAR)), 1, 4))::INTEGER % 9 + 2)
           AS d_digits,
         CASE WHEN ('0x' || substr(md5('nat_' || CAST(ckey AS VARCHAR)), 1, 4))::INTEGER % 100 < 10
              THEN CAST((nat + 1 + ('0x' || substr(md5('natp_' || CAST(ckey AS VARCHAR)), 1, 4))::INTEGER % 24) % 25 AS INT)
              ELSE nat END AS d_nat,
         CASE WHEN ('0x' || substr(md5('seg_' || CAST(ckey AS VARCHAR)), 1, 4))::INTEGER % 100 < 20
              THEN ([{_FS_SEGMENTS}])
                   [(('0x' || substr(md5('segp_' || CAST(ckey AS VARCHAR)), 1, 4))::INTEGER % 5) + 1]
              ELSE seg END AS d_seg
  FROM cust
), pairs AS (
  SELECT CAST(d_key = ckey AS INT) AS is_match,
         CAST(({" + ".join(f"CAST(substr(d_digits, {i}, 1) = substr(digits, {i}, 1) AS INT)" for i in range(1, 10))}) >= 8 AS INT) AS a_name,
         CAST(d_nat = nat AS INT) AS a_nat,
         CAST(d_seg = seg AS INT) AS a_seg
  FROM dirty JOIN cust ON substr(d_digits, 1, 7) = substr(digits, 1, 7)
), sums AS (
  SELECT CAST(SUM(is_match) AS BIGINT) AS n_m,
         CAST(SUM(1 - is_match) AS BIGINT) AS n_u,
         CAST(SUM(CASE WHEN is_match = 1 THEN a_name ELSE 0 END) AS BIGINT) AS name_m,
         CAST(SUM(CASE WHEN is_match = 0 THEN a_name ELSE 0 END) AS BIGINT) AS name_u,
         CAST(SUM(CASE WHEN is_match = 1 THEN a_nat ELSE 0 END) AS BIGINT) AS nat_m,
         CAST(SUM(CASE WHEN is_match = 0 THEN a_nat ELSE 0 END) AS BIGINT) AS nat_u,
         CAST(SUM(CASE WHEN is_match = 1 THEN a_seg ELSE 0 END) AS BIGINT) AS seg_m,
         CAST(SUM(CASE WHEN is_match = 0 THEN a_seg ELSE 0 END) AS BIGINT) AS seg_u
  FROM pairs
), unp AS (
  SELECT 'name_ham1' AS field, name_m AS c_m, name_u AS c_u, n_m, n_u FROM sums
  UNION ALL SELECT 'nation', nat_m, nat_u, n_m, n_u FROM sums
  UNION ALL SELECT 'segment', seg_m, seg_u, n_m, n_u FROM sums
), prob AS (
  SELECT field,
         ROUND((CAST(c_m AS DOUBLE) + 0.5) / (CAST(n_m AS DOUBLE) + 1.0), 9) AS m,
         ROUND((CAST(c_u AS DOUBLE) + 0.5) / (CAST(n_u AS DOUBLE) + 1.0), 9) AS u
  FROM unp
)
SELECT field, m, u,
       ROUND(LOG2(m / u), 6) AS w_agree,
       ROUND(LOG2((1.0 - m) / (1.0 - u)), 6) AS w_disagree
FROM prob
"""
