"""Round-10 wave: interpolated Kneser–Ney TRIGRAM scoring (the
three-level backoff upgrade over pipeline7's bigram KN), per-nation
Lorenz concentration curves (grouped two-phase rank), and isotonic
recalibration of the in-engine logistic model via the PAV minimax
identity on the bounded calibration-bin grid.

Same cross-engine exactness policy as ``pipeline2``..``pipeline8``:
integer/decimal arithmetic end-to-end, double literals shared via
``repr`` + ``CAST(.. AS DOUBLE)``, one ROUND after each transcendental,
per-row ROUND → DECIMAL before any order-free SUM.

Reference anchor: the reference (``/root/reference/df_to_azure``) is a
pandas→Azure mover with no analytics surface; these extend the engine's
query capabilities per the brief (language-model data scoring,
concentration audits, probability recalibration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from df_to_azure_spark.functions.distrank import two_phase_rank
from df_to_azure_spark.sources import load_table


# --------------------------------------------------------------------------
# Interpolated Kneser–Ney TRIGRAM surprisal (Chen & Goodman 1998 §2.7)
# --------------------------------------------------------------------------

# 2^62: surprisal clamp so the integer ratio always fits BIGINT before
# bin() — a test trigram whose exact 1/p exceeds this reports 63 bits
# (both engines share the LEAST, so the clamp is oracle-exact)
_KN3_CLAMP = 4611686018427387904


def doc_kn_trigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney TRIGRAM scoring of the md5 TEST split
    against TRAIN counts — the full three-level backoff chain on top of
    ``doc_kneser_ney_surprisal``'s bigram model:

    ``p(w3|w1w2) = max(c123−D,0)/c12 + λ(w1w2)·p_low(w3|w2)`` with
    ``p_low(w3|w2) = max(N1+(·w2w3)−D,0)/N1+(·w2·) + λ(w2)·p_cont(w3)``
    and ``p_cont(w3) = N1+(·w3)/N1+(··)`` over continuation TYPES — the
    Kneser–Ney insight applied twice (a continuation is counted once per
    distinct context, not per token).  Unseen (w1,w2) contexts back off
    to ``p_low``; a w2 never seen as a trigram middle backs off to the
    bare continuation ratio (floored at 1/N1+(··)).

    Engine-exact quantization, same device as the bigram model: D is
    kept RATIONAL (3/4), so every level is an exact integer fraction —
    ``p_low = numL/denL`` with
    ``numL = max(4·N1+(·w2w3)−3,0)·Nbb + 3·N1+(w2·)·N1+(·w3)`` and
    ``denL = 4·N1+(·w2·)·Nbb``, then
    ``p = num/den`` with
    ``num = max(4·c123−3,0)·denL + 3·N1+(w1w2·)·numL`` and
    ``den = 4·c12·denL``.  The bit cost is
    ``bit_length(den div num)`` (≈ −log₂ p) — pure integer arithmetic;
    all products ride DECIMAL(38,0)/HUGEINT (den ≤ 16·c12·N1+(·w2·)·Nbb
    overflows int64 at corpus scale) and the ratio clamps at 2^62
    before the BIGINT ``bin()`` (the clamp is shared, so exact).

    Plan: one trigram explode per split, four keyed TRAIN aggregates
    (all map-side combined, bounded by trigram-type cardinality), one
    1-row type total, then keyed left joins onto the test stream — AQE
    broadcasts the small sides; no driver-sized state."""
    from df_to_azure_spark.functions import text as TXT
    from df_to_azure_spark.functions.sampling import with_split

    docs = with_split(load_table(spark, sf_dir, "documents"), "doc_id")
    # pin the tokenized arrays: the train aggregation chain and the test
    # scoring stream are the two consumers of this frame, and without
    # the pin each re-runs the regex tokenize over the full document
    # scan — the pinned copy is the same rows both sides already read
    toks_arr = docs.select(
        "doc_id", "split", TXT.tokens("text").alias("t")
    ).localCheckpoint()
    tg = (
        toks_arr.where(F.size("t") >= 3)
        .select(
            "doc_id",
            "split",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 2),"
                    " i -> struct(element_at(t, i) AS w1,"
                    " element_at(t, i + 1) AS w2,"
                    " element_at(t, i + 2) AS w3))"
                )
            ).alias("g"),
        )
        .select(
            "doc_id",
            "split",
            F.col("g.w1").alias("w1"),
            F.col("g.w2").alias("w2"),
            F.col("g.w3").alias("w3"),
        )
    )
    tgc = (
        tg.where(F.col("split") == "train")
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("n_tg"))
    )
    ctx12 = tgc.groupBy("w1", "w2").agg(
        F.sum("n_tg").alias("c12"), F.count(F.lit(1)).alias("n1p12")
    )
    a23 = tgc.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("n1p_23"))
    mid = a23.groupBy("w2").agg(
        F.sum("n1p_23").alias("n2mid"), F.count(F.lit(1)).alias("n1p_2dot")
    )
    cont = a23.groupBy("w3").agg(F.count(F.lit(1)).alias("n1p_3"))
    nbb = a23.agg(F.count(F.lit(1)).alias("n_bb"))
    scored = (
        tg.where(F.col("split") == "test")
        .join(tgc, ["w1", "w2", "w3"], "left")
        .join(ctx12, ["w1", "w2"], "left")
        .join(a23, ["w2", "w3"], "left")
        .join(mid, "w2", "left")
        .join(cont, "w3", "left")
        .crossJoin(F.broadcast(nbb))
        .selectExpr(
            "doc_id",
            # lower level p_low = numL/denL (DECIMAL(38,0) headroom)
            """CASE WHEN n2mid IS NOT NULL THEN
                 GREATEST(CAST(GREATEST(4 * coalesce(n1p_23, 0) - 3, 0)
                   AS DECIMAL(38,0)) * n_bb
                   + CAST(3 AS DECIMAL(38,0)) * n1p_2dot
                     * coalesce(n1p_3, 0), CAST(1 AS DECIMAL(38,0)))
               ELSE CAST(GREATEST(coalesce(n1p_3, 0), 1) AS DECIMAL(38,0))
               END AS num_l""",
            """CASE WHEN n2mid IS NOT NULL THEN
                 CAST(4 AS DECIMAL(38,0)) * n2mid * n_bb
               ELSE CAST(n_bb AS DECIMAL(38,0)) END AS den_l""",
            "c12",
            "n1p12",
            "coalesce(n_tg, 0) AS n_tg0",
        )
        .selectExpr(
            "doc_id",
            """CASE WHEN c12 IS NOT NULL THEN
                 GREATEST(CAST(GREATEST(4 * n_tg0 - 3, 0) AS DECIMAL(38,0))
                   * den_l + CAST(3 AS DECIMAL(38,0)) * n1p12 * num_l,
                   CAST(1 AS DECIMAL(38,0)))
               ELSE num_l END AS num""",
            """CASE WHEN c12 IS NOT NULL THEN
                 CAST(4 AS DECIMAL(38,0)) * c12 * den_l
               ELSE den_l END AS den""",
            "IF(c12 IS NULL, 1, 0) AS oov_ctx",
        )
        .selectExpr(
            "doc_id",
            f"length(bin(CAST(LEAST(den DIV num, {_KN3_CLAMP}) AS BIGINT)))"
            " AS bits",
            "oov_ctx",
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
        F.expr(
            "CAST((2000000 * SUM(bits) + COUNT(*)) DIV (2 * COUNT(*))"
            " AS DOUBLE) / CAST(1000000 AS DOUBLE)"
        ).alias("mean_kn3_bits"),
        F.max("bits").cast("bigint").alias("max_kn3_bits"),
        F.expr(
            "CAST((2000000 * SUM(oov_ctx) + COUNT(*)) DIV (2 * COUNT(*))"
            " AS DOUBLE) / CAST(1000000 AS DOUBLE)"
        ).alias("oov_ctx_rate"),
    )


_KN3_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"

KN_TRIGRAM_ORACLE = f"""
WITH s AS (
  SELECT doc_id, {_KN3_TOKS} AS t,
         CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100 < 80
              THEN 'train'
              WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100 < 90
              THEN 'val' ELSE 'test' END AS split
  FROM documents
), tg AS (
  SELECT doc_id, split, g[1] AS w1, g[2] AS w2, g[3] AS w3
  FROM (SELECT doc_id, split,
               unnest(list_zip(t[1:len(t)-2], t[2:len(t)-1], t[3:len(t)])) AS g
        FROM s WHERE len(t) >= 3)
), tgc AS (
  SELECT w1, w2, w3, COUNT(*) AS n_tg
  FROM tg WHERE split = 'train' GROUP BY w1, w2, w3
), ctx12 AS (
  SELECT w1, w2, SUM(n_tg) AS c12, COUNT(*) AS n1p12 FROM tgc GROUP BY w1, w2
), a23 AS (
  SELECT w2, w3, COUNT(*) AS n1p_23 FROM tgc GROUP BY w2, w3
), mid AS (
  SELECT w2, SUM(n1p_23) AS n2mid, COUNT(*) AS n1p_2dot FROM a23 GROUP BY w2
), cont AS (
  SELECT w3, COUNT(*) AS n1p_3 FROM a23 GROUP BY w3
), nbb AS (
  SELECT COUNT(*) AS n_bb FROM a23
), lower_lvl AS (
  SELECT t.doc_id,
         CASE WHEN mid.n2mid IS NOT NULL THEN
           GREATEST(CAST(GREATEST(4 * coalesce(a23.n1p_23, 0) - 3, 0)
             AS HUGEINT) * nbb.n_bb
             + CAST(3 AS HUGEINT) * mid.n1p_2dot * coalesce(cont.n1p_3, 0),
             CAST(1 AS HUGEINT))
         ELSE CAST(GREATEST(coalesce(cont.n1p_3, 0), 1) AS HUGEINT)
         END AS num_l,
         CASE WHEN mid.n2mid IS NOT NULL THEN
           CAST(4 AS HUGEINT) * mid.n2mid * nbb.n_bb
         ELSE CAST(nbb.n_bb AS HUGEINT) END AS den_l,
         ctx12.c12 AS c12, ctx12.n1p12 AS n1p12,
         coalesce(tgc.n_tg, 0) AS n_tg0
  FROM tg t
  LEFT JOIN tgc ON t.w1 = tgc.w1 AND t.w2 = tgc.w2 AND t.w3 = tgc.w3
  LEFT JOIN ctx12 ON t.w1 = ctx12.w1 AND t.w2 = ctx12.w2
  LEFT JOIN a23 ON t.w2 = a23.w2 AND t.w3 = a23.w3
  LEFT JOIN mid ON t.w2 = mid.w2
  LEFT JOIN cont ON t.w3 = cont.w3
  CROSS JOIN nbb
  WHERE t.split = 'test'
), ratio AS (
  SELECT doc_id,
         CASE WHEN c12 IS NOT NULL THEN
           GREATEST(CAST(GREATEST(4 * n_tg0 - 3, 0) AS HUGEINT) * den_l
             + CAST(3 AS HUGEINT) * n1p12 * num_l, CAST(1 AS HUGEINT))
         ELSE num_l END AS num,
         CASE WHEN c12 IS NOT NULL THEN CAST(4 AS HUGEINT) * c12 * den_l
         ELSE den_l END AS den,
         CASE WHEN c12 IS NULL THEN 1 ELSE 0 END AS oov_ctx
  FROM lower_lvl
), scored AS (
  SELECT doc_id,
         length(bin(CAST(LEAST(den // num, {_KN3_CLAMP}) AS BIGINT))) AS bits,
         oov_ctx
  FROM ratio
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       CAST((2000000 * SUM(bits) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS mean_kn3_bits,
       CAST(MAX(bits) AS BIGINT) AS max_kn3_bits,
       CAST((2000000 * SUM(oov_ctx) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS oov_ctx_rate
FROM scored GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Per-nation Lorenz concentration curves (grouped two-phase rank)
# --------------------------------------------------------------------------


def nation_revenue_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-NATION revenue concentration: each nation's customers ranked
    ascending by lifetime revenue and cut into 5 rank quintiles, with
    the quintile's revenue share and the cumulative share at its upper
    edge — 25 nations × 5 rows, the comparative-concentration sheet
    next to the global ``revenue_lorenz_deciles`` ("is revenue more
    top-heavy in some markets?").

    Scale shape: ``two_phase_rank`` with ``group_cols=['nation']`` —
    the grouped form of the exact distributed rank (range partition on
    (nation, revenue), per-(partition, nation) offsets; no
    single-partition window even though every nation's customer list is
    data-sized).  The nation dim broadcasts; shares use the half-up
    device over exact DECIMAL sums."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = orders.groupBy("o_custkey").agg(
        F.expr(
            "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
            " AS DECIMAL(19,0))) AS DECIMAL(19,0))"
        ).alias("rev_cents")
    )
    revn = (
        rev.join(
            customer.select("c_custkey", "c_nationkey"),
            rev["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("n_name").alias("nation"), "o_custkey", "rev_cents")
    )
    ranked = two_phase_rank(
        revn,
        order_by=[("rev_cents", "asc"), ("o_custkey", "asc")],
        group_cols=["nation"],
        sum_col="rev_cents",
        rank_col="rk",
        total_col="n_grp",
        cum_col="cum_cents",
        sum_total_col="total_cents",
    )
    return (
        ranked.withColumn(
            "quintile", F.expr("CAST((rk - 1) * 5 DIV n_grp AS INT) + 1")
        )
        .groupBy("nation", "quintile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.expr("CAST(SUM(rev_cents) AS BIGINT)").alias("quintile_cents"),
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


NATION_LORENZ_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
              AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS rev_cents
  FROM orders GROUP BY o_custkey
), revn AS (
  SELECT n.n_name AS nation, r.o_custkey, r.rev_cents
  FROM rev r
  JOIN customer c ON r.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
), ranked AS (
  SELECT nation, rev_cents,
         row_number() OVER (PARTITION BY nation
                            ORDER BY rev_cents, o_custkey) AS rk,
         COUNT(*) OVER (PARTITION BY nation) AS n_grp,
         CAST(SUM(rev_cents) OVER (PARTITION BY nation
              ORDER BY rev_cents, o_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DECIMAL(38,0)) AS cum_cents,
         CAST(SUM(rev_cents) OVER (PARTITION BY nation)
              AS DECIMAL(38,0)) AS total_cents
  FROM revn
)
SELECT nation, CAST((rk - 1) * 5 // n_grp AS INT) + 1 AS quintile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(rev_cents) AS BIGINT) AS quintile_cents,
       CAST((2000000 * CAST(SUM(rev_cents) AS HUGEINT)
             + CAST(MAX(total_cents) AS HUGEINT))
            // (2 * CAST(MAX(total_cents) AS HUGEINT)) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS revenue_share,
       CAST((2000000 * CAST(MAX(cum_cents) AS HUGEINT)
             + CAST(MAX(total_cents) AS HUGEINT))
            // (2 * CAST(MAX(total_cents) AS HUGEINT)) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS cum_share
FROM ranked GROUP BY nation, 2
"""


# --------------------------------------------------------------------------
# Isotonic recalibration (PAV) of the IRLS logistic model
# --------------------------------------------------------------------------


def logistic_isotonic_recalibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Isotonic (PAV) recalibration of the 2-step IRLS logistic model:
    the monotone step function closest (L2, count-weighted) to the
    per-bin observed positive rates of ``logistic_calibration_curve`` —
    the standard fix when the reliability diagram shows mis-calibrated
    scores (Zadrozny & Elkan, KDD'02).

    PAV via the minimax identity on the BOUNDED bin grid:
    ``iso(i) = max_{a≤i} min_{b≥a} (Σ_{j=a..b} pos_j / Σ_{j=a..b} n_j)``
    — the closed form of pool-adjacent-violators, computed relationally
    over the ≤ 20² interval grid (data-independent) instead of the
    sequential pooling loop.  Interval rates are single IEEE divisions
    of exact integer sums (correctly rounded in any engine), so the
    min/max folds are cross-engine exact; the output rounds once.

    Scale shape: the model fit + scoring is the existing one-pass IRLS
    plan; everything after the 20-row bin aggregate is constant-size
    work.  Returns ``(bin, n, observed_rate, iso_rate)`` with
    ``iso_rate`` monotone nondecreasing in ``bin`` by construction."""
    from df_to_azure_spark.plans import pipeline8 as PL8

    # rebuild the binned aggregate (bin, n, n_pos) from the shared model
    # pieces — the calibration query's OUTPUT rounds its rates, which
    # PAV must not consume
    li = load_table(spark, sf_dir, "lineitem")
    feats = li.selectExpr(
        *[s.strip() for s in PL8._LOGIT_FEATURES.strip().split(",\n")]
    )
    it1_sums = feats.agg(
        *[
            F.expr(e.strip())
            for e in PL8._IT1_SUMS.strip().rstrip(",").split(",\n")
        ]
    )
    c1 = PL8._cramer3_text(PL8._IT1_A, PL8._IT1_R)
    it1 = it1_sums.selectExpr(
        "n", f"{c1['x0']} AS b0", f"{c1['x1']} AS b1", f"{c1['x2']} AS b2"
    )
    scored = feats.crossJoin(F.broadcast(it1)).selectExpr(
        "n", "b0", "b1", "b2", "x1", "x2", "y", f"{PL8._P_EXPR} AS p"
    ).selectExpr(
        "n", "b0", "b1", "b2", "x1", "x2", "y", "p",
        "CAST(ROUND(p * (1 - p), 12) AS DECIMAL(14,12)) AS w",
    )
    it2_sums = scored.groupBy("n", "b0", "b1", "b2").agg(
        *[
            F.expr(e.strip())
            for e in PL8._IT2_SUMS.strip().rstrip(",").split(",\n")
        ]
    )
    c2 = PL8._cramer3_text(PL8._IT2_A, PL8._IT2_R)
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
    from df_to_azure_spark.functions.calibration import pav_isotonic

    bins = PL8._CAL_BINS
    agg = (
        rescored.selectExpr(
            "y",
            f"CAST(LEAST(CAST(FLOOR(CAST(p AS DOUBLE) * {bins})"
            f" AS INT), {bins - 1}) AS BIGINT) AS bin",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr("CAST(SUM(y) AS BIGINT)").alias("n_pos"),
        )
    )
    return pav_isotonic(agg, "bin", "n", "n_pos").selectExpr(
        "bin",
        "n",
        "CAST((2000000 * n_pos + n) DIV (2 * n) AS DOUBLE)"
        " / CAST(1000000 AS DOUBLE) AS observed_rate",
        "iso_rate",
    )


def _isotonic_oracle() -> str:
    from df_to_azure_spark.functions.calibration import pav_isotonic_ctes
    from df_to_azure_spark.plans.pipeline8 import (
        _CAL_BINS,
        _IT1_A,
        _IT1_R,
        _IT1_SUMS,
        _IT2_A,
        _IT2_R,
        _IT2_SUMS,
        _LOGIT_FEATURES,
        _P_EXPR,
        _cramer3_text,
    )

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
), agg AS (
  SELECT CAST(LEAST(CAST(FLOOR(CAST(p AS DOUBLE) * {_CAL_BINS}) AS INT),
              {_CAL_BINS - 1}) AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS n_pos
  FROM rescored GROUP BY 1
), {pav_isotonic_ctes('agg', 'bin', 'n', 'n_pos')}
SELECT g.bin, g.n,
       CAST((2000000 * g.n_pos + g.n) // (2 * g.n) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS observed_rate,
       i.iso_rate AS iso_rate
FROM agg g JOIN pav_iso i ON g.bin = i.bin
"""


ISOTONIC_RECAL_ORACLE = _isotonic_oracle()

# --------------------------------------------------------------------------
# Exact Spearman rank correlation over bounded value domains
# --------------------------------------------------------------------------


def discount_quantity_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware Spearman rank correlation between ``l_discount``
    and ``l_quantity`` — "do bigger orders get bigger discounts" as a
    RANK statistic, immune to the columns' scales and outliers (the
    nonparametric sibling of the Pearson fits in pipeline5/6).

    Exactness device: both value domains are BOUNDED (11 discounts, 50
    quantities), so the tie-averaged rank of every value is an exact
    HALF-INTEGER computable from the value-count table alone —
    ``2·avg_rank(v) = 2·cum_before(v) + cnt(v) + 1`` — and no row-level
    rank pass exists at all.  With A = 2·rank_x, B = 2·rank_y (integers)
    the tie-aware Spearman is
    ``rho = (S_AB − n(n+1)²) / sqrt((S_AA − n(n+1)²)(S_BB − n(n+1)²))``
    where ``S_AB = Σ cnt(x,y)·A(x)·B(y)`` etc. — every term an exact
    DECIMAL(38,0)/HUGEINT integer (the 4s from the half-integer doubling
    cancel); the only floating point is the final sqrt + divide, then
    one ROUND(6).

    Plan: ONE joint-count shuffle (≤ 11×50 output rows); the marginal
    rank tables and the final fold are constant-size.  At 100 TB the
    joint count is the whole cost — a single map-side-combined
    aggregation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_discount", "l_quantity"
    )
    joint = li.groupBy("l_discount", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    margx = joint.groupBy("l_discount").agg(F.sum("cnt").alias("cx"))
    margy = joint.groupBy("l_quantity").agg(F.sum("cnt").alias("cy"))
    # bounded: windows run over the ≤ 11-row / ≤ 50-row value-domain
    # marginal frames, never the data
    wx = W.orderBy("l_discount")
    wy = W.orderBy("l_quantity")
    ax = margx.withColumn("cumx", F.sum("cx").over(wx)).selectExpr(
        "l_discount",
        "CAST(2 * (cumx - cx) + cx + 1 AS DECIMAL(38,0)) AS ax",
    )
    ay = margy.withColumn("cumy", F.sum("cy").over(wy)).selectExpr(
        "l_quantity",
        "CAST(2 * (cumy - cy) + cy + 1 AS DECIMAL(38,0)) AS ay",
    )
    scored = joint.join(ax, "l_discount").join(ay, "l_quantity")
    sums = scored.agg(
        F.expr("CAST(SUM(cnt) AS BIGINT)").alias("n"),
        F.expr(
            "CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * ax * ay)"
            " AS DECIMAL(38,0))"
        ).alias("s_ab"),
        F.expr(
            "CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * ax * ax)"
            " AS DECIMAL(38,0))"
        ).alias("s_aa"),
        F.expr(
            "CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * ay * ay)"
            " AS DECIMAL(38,0))"
        ).alias("s_bb"),
    )
    return sums.selectExpr(
        "n AS n_rows",
        "ROUND(CAST(s_ab - CAST(n AS DECIMAL(38,0)) * (n + 1) * (n + 1)"
        " AS DOUBLE)"
        " / SQRT(CAST(s_aa - CAST(n AS DECIMAL(38,0)) * (n + 1) * (n + 1)"
        " AS DOUBLE)"
        " * CAST(s_bb - CAST(n AS DECIMAL(38,0)) * (n + 1) * (n + 1)"
        " AS DOUBLE)), 6) AS spearman_rho",
    )


SPEARMAN_ORACLE = """
WITH joint AS (
  SELECT l_discount, l_quantity, COUNT(*) AS cnt
  FROM lineitem GROUP BY l_discount, l_quantity
), margx AS (
  SELECT l_discount, SUM(cnt) AS cx FROM joint GROUP BY l_discount
), margy AS (
  SELECT l_quantity, SUM(cnt) AS cy FROM joint GROUP BY l_quantity
), ax AS (
  SELECT l_discount,
         CAST(2 * (SUM(cx) OVER (ORDER BY l_discount
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cx)
             + cx + 1 AS HUGEINT) AS ax
  FROM margx
), ay AS (
  SELECT l_quantity,
         CAST(2 * (SUM(cy) OVER (ORDER BY l_quantity
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cy)
             + cy + 1 AS HUGEINT) AS ay
  FROM margy
), scored AS (
  SELECT j.cnt, ax.ax, ay.ay
  FROM joint j JOIN ax USING (l_discount) JOIN ay USING (l_quantity)
), sums AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(CAST(cnt AS HUGEINT) * ax * ay) AS HUGEINT) AS s_ab,
         CAST(SUM(CAST(cnt AS HUGEINT) * ax * ax) AS HUGEINT) AS s_aa,
         CAST(SUM(CAST(cnt AS HUGEINT) * ay * ay) AS HUGEINT) AS s_bb
  FROM scored
)
SELECT n AS n_rows,
       ROUND(CAST(s_ab - CAST(n AS HUGEINT) * (n + 1) * (n + 1) AS DOUBLE)
         / SQRT(CAST(s_aa - CAST(n AS HUGEINT) * (n + 1) * (n + 1) AS DOUBLE)
         * CAST(s_bb - CAST(n AS HUGEINT) * (n + 1) * (n + 1) AS DOUBLE)), 6)
         AS spearman_rho
FROM sums
"""

def discount_quantity_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware Kendall τ-b between ``l_discount`` and
    ``l_quantity`` — the concordance-probability sibling of
    ``discount_quantity_spearman`` (τ-b is the standard companion
    report: same monotone-association question, pair-counting instead
    of rank-moment form, more robust to a few extreme ranks).

    Exactness device: with BOUNDED value domains the concordant /
    discordant pair counts are sums over the joint-count grid —
    ``C = Σ_cells cnt·(rows strictly greater in both)`` counts every
    concordant pair exactly once from its lower cell, and the
    "strictly greater" lookup is a ≤ (11·50)² broadcast range join of
    the grid against itself (data-independent size).  Tie corrections
    come from the marginals; with doubled forms ``N0d = n(n−1)``,
    ``N1d = Σ tx(tx−1)``, ``N2d = Σ ty(ty−1)``:
    ``τ_b = 2(C−D)/sqrt((N0d−N1d)·(N0d−N2d))`` — every count an exact
    DECIMAL(38,0)/HUGEINT integer, one final sqrt+divide, ROUND(6).
    C and D are emitted as BIGINT (exact up to ~4.3e9 input rows; the
    τ itself rides decimals throughout).

    Plan: ONE joint-count shuffle; the grid self-join and the three
    1-row folds are constant-size."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_discount", "l_quantity"
    )
    joint = li.groupBy("l_discount", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    g2 = joint.select(
        F.col("l_discount").alias("x2"),
        F.col("l_quantity").alias("y2"),
        F.col("cnt").alias("cnt2"),
    )
    # bounded grid self-join: both sides ≤ |discount|×|quantity| cells
    pairs = joint.join(F.broadcast(g2), F.col("x2") > F.col("l_discount"))
    cd = pairs.agg(
        F.expr(
            "CAST(SUM(CASE WHEN y2 > l_quantity THEN"
            " CAST(cnt AS DECIMAL(38,0)) * cnt2 ELSE CAST(0 AS DECIMAL(38,0))"
            " END) AS DECIMAL(38,0))"
        ).alias("c_pairs"),
        F.expr(
            "CAST(SUM(CASE WHEN y2 < l_quantity THEN"
            " CAST(cnt AS DECIMAL(38,0)) * cnt2 ELSE CAST(0 AS DECIMAL(38,0))"
            " END) AS DECIMAL(38,0))"
        ).alias("d_pairs"),
    )
    tie_x = (
        joint.groupBy("l_discount")
        .agg(F.sum("cnt").alias("cx"))
        .agg(
            F.expr("CAST(SUM(cx) AS DECIMAL(38,0))").alias("n"),
            F.expr(
                "CAST(SUM(CAST(cx AS DECIMAL(38,0)) * (cx - 1))"
                " AS DECIMAL(38,0))"
            ).alias("n1d"),
        )
    )
    tie_y = (
        joint.groupBy("l_quantity")
        .agg(F.sum("cnt").alias("cy"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(cy AS DECIMAL(38,0)) * (cy - 1))"
                " AS DECIMAL(38,0))"
            ).alias("n2d"),
        )
    )
    return (
        cd.crossJoin(F.broadcast(tie_x))
        .crossJoin(F.broadcast(tie_y))
        .selectExpr(
            "CAST(n AS BIGINT) AS n_rows",
            "CAST(c_pairs AS BIGINT) AS n_concordant",
            "CAST(d_pairs AS BIGINT) AS n_discordant",
            "ROUND(CAST(2 AS DOUBLE) * CAST(c_pairs - d_pairs AS DOUBLE)"
            " / SQRT(CAST(n * (n - 1) - n1d AS DOUBLE)"
            " * CAST(n * (n - 1) - n2d AS DOUBLE)), 6) AS kendall_tau_b",
        )
    )


KENDALL_ORACLE = """
WITH joint AS (
  SELECT l_discount, l_quantity, COUNT(*) AS cnt
  FROM lineitem GROUP BY l_discount, l_quantity
), pairs AS (
  SELECT g.cnt AS cnt, g.l_quantity AS y, g2.l_quantity AS y2,
         g2.cnt AS cnt2
  FROM joint g JOIN joint g2 ON g2.l_discount > g.l_discount
), cd AS (
  SELECT CAST(SUM(CASE WHEN y2 > y THEN CAST(cnt AS HUGEINT) * cnt2
              ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS c_pairs,
         CAST(SUM(CASE WHEN y2 < y THEN CAST(cnt AS HUGEINT) * cnt2
              ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS d_pairs
  FROM pairs
), tie_x AS (
  SELECT CAST(SUM(cx) AS HUGEINT) AS n,
         CAST(SUM(CAST(cx AS HUGEINT) * (cx - 1)) AS HUGEINT) AS n1d
  FROM (SELECT SUM(cnt) AS cx FROM joint GROUP BY l_discount)
), tie_y AS (
  SELECT CAST(SUM(CAST(cy AS HUGEINT) * (cy - 1)) AS HUGEINT) AS n2d
  FROM (SELECT SUM(cnt) AS cy FROM joint GROUP BY l_quantity)
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(c_pairs AS BIGINT) AS n_concordant,
       CAST(d_pairs AS BIGINT) AS n_discordant,
       ROUND(CAST(2 AS DOUBLE) * CAST(c_pairs - d_pairs AS DOUBLE)
         / SQRT(CAST(n * (n - 1) - n1d AS DOUBLE)
         * CAST(n * (n - 1) - n2d AS DOUBLE)), 6) AS kendall_tau_b
FROM cd, tie_x, tie_y
"""

# --------------------------------------------------------------------------
# Isotonic recalibration of the learned quality classifier (2nd consumer)
# --------------------------------------------------------------------------


def quality_isotonic_recalibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Isotonic (PAV) recalibration of the learned document-quality
    classifier against the rule-based Gopher labels — the second
    consumer of ``calibration.pav_isotonic`` (the first recalibrates
    the IRLS order-returns model): score deciles from the exact
    distributed rank, each decile's empirical keep-rate, and the
    monotone PAV fit that a deployment would look scores up against.
    If the raw ``keep_rate`` column is already monotone the fit equals
    it; where the classifier ranks documents out of order, PAV pools
    the offending deciles — the pooled steps ARE the diagnosis.

    Exactness: bins are (n, n_keep) integer pairs; mean predicted
    probability is the same DECIMAL(18,6)-sum device as
    ``classifier_calibration_bins``; PAV per the module contract."""
    from df_to_azure_spark.functions import distrank as DR
    from df_to_azure_spark.functions.calibration import pav_isotonic
    from df_to_azure_spark.plans.pipeline import gopher_quality_filter
    from df_to_azure_spark.plans.pipeline2 import doc_classifier_scores

    scores = doc_classifier_scores(spark, sf_dir).select(
        "doc_id", "quality_prob"
    )
    labels = gopher_quality_filter(spark, sf_dir).select("doc_id", "keep")
    j = scores.join(labels, "doc_id")
    ranked = DR.two_phase_rank(
        j, [("quality_prob", "asc"), ("doc_id", "asc")]
    )
    binned = ranked.withColumn(
        "decile", DR.ntile_from_rank("__rn", "__grp_n", 10).cast("bigint")
    )
    agg = binned.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(
            "CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_keep"),
        F.expr(
            "CAST(SUM(CAST(quality_prob AS DECIMAL(18,6)))"
            " AS DECIMAL(38,6))"
        ).alias("sum_prob"),
    )
    return pav_isotonic(
        agg, "decile", "n", "n_keep", out_col="iso_keep_rate"
    ).selectExpr(
        "decile",
        "n",
        "ROUND(CAST(sum_prob AS DOUBLE) / n, 6) AS mean_prob",
        "ROUND(CAST(n_keep AS DOUBLE) / n, 6) AS keep_rate",
        "iso_keep_rate",
    )


def _quality_isotonic_oracle() -> str:
    from df_to_azure_spark.functions.calibration import pav_isotonic_ctes
    from df_to_azure_spark.plans.pipeline import GOPHER_ORACLE
    from df_to_azure_spark.plans.pipeline2 import CLASSIFIER_ORACLE

    return f"""
WITH s AS MATERIALIZED (
  SELECT doc_id, quality_prob FROM ({CLASSIFIER_ORACLE}) t
), g AS MATERIALIZED (
  SELECT doc_id, keep FROM ({GOPHER_ORACLE}) t
), j AS (
  SELECT s.doc_id, s.quality_prob, g.keep FROM s JOIN g USING (doc_id)
), b AS (
  SELECT quality_prob, keep,
         CAST(ntile(10) OVER (ORDER BY quality_prob, doc_id) AS BIGINT)
           AS decile
  FROM j
), agg AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         CAST(SUM(CAST(quality_prob AS DECIMAL(18,6))) AS DECIMAL(38,6))
           AS sum_prob
  FROM b GROUP BY decile
), {pav_isotonic_ctes('agg', 'decile', 'n', 'n_keep')}
SELECT a.decile, a.n,
       ROUND(CAST(a.sum_prob AS DOUBLE) / a.n, 6) AS mean_prob,
       ROUND(CAST(a.n_keep AS DOUBLE) / a.n, 6) AS keep_rate,
       i.iso_rate AS iso_keep_rate
FROM agg a JOIN pav_iso i ON a.decile = i.decile
"""


QUALITY_ISOTONIC_ORACLE = _quality_isotonic_oracle()
