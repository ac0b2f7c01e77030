"""Round-8 extension wave: running-record analytics on the new
``two_phase_cummax`` prefix-max primitive (record-high detection over
the data-sized order stream; max drawdown of the daily revenue series),
attribute-filtered ANN (label-constrained kNN — the filter becomes the
join key, not a post-filter), a PPJoin-style prefix-filtered set-
similarity join whose oracle is the UNFILTERED all-pairs ground truth
(hash-equality proves the filter lossless), and a split-conformal
coverage audit (distribution-free calibration, Vovk et al. 2005 /
Angelopoulos & Bates 2021).

Cross-engine policy unchanged: integer cents / exact half-up integer-
division ratios everywhere a quotient is emitted, every numeric
constant explicitly typed, ties always broken by a unique key.  No
counterpart exists in the reference (zypp-io/df_to_azure is pandas +
Azure orchestration with no relational surface,
`/root/reference/df_to_azure/export.py`); engine-extension per the
training-data brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from df_to_azure_spark.functions import similarity as SIM
from df_to_azure_spark.functions.distrank import two_phase_cummax, two_phase_rank
from df_to_azure_spark.sources import load_table

# --------------------------------------------------------------------------
# Running record highs over the order stream (two_phase_cummax, data-sized)
# --------------------------------------------------------------------------


def order_record_highs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order-year: how many orders set a NEW all-time price record
    (strictly above every earlier order in ``(o_orderdate, o_orderkey)``
    order), and the all-time record as of year end — the running-record
    watermark a monitoring pipeline keeps over an append-only fact
    stream.

    The running max over the data-sized order stream rides
    ``two_phase_cummax(inclusive=False)`` — the exclusive prefix-max —
    so no single-partition WindowExec ever materializes: a row is a
    record iff its price exceeds the prefix (or the prefix is NULL,
    the global first row).  Money stays integer cents end-to-end; the
    year-end record is a ≤|years|² triangular join over the per-year
    max frame, never a window.  Scale: one range shuffle + one bounded
    counting job (the cummax), one keyed agg to years, and a
    calendar-bounded triangle."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(date_part('year', o_orderdate) AS INT)").alias("yr"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
        "o_orderdate",
        "o_orderkey",
    )
    pre = two_phase_cummax(
        orders,
        [("o_orderdate", "asc"), ("o_orderkey", "asc")],
        "cents",
        out_col="prevmax",
        inclusive=False,
    )
    per_yr = pre.groupBy("yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.expr(
            "CAST(SUM(CASE WHEN prevmax IS NULL OR cents > prevmax"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_records"),
        F.max("cents").alias("yr_max"),
    )
    later = per_yr.select(F.col("yr").alias("yr2"), F.col("yr_max").alias("mx2"))
    return (
        per_yr.join(F.broadcast(later), F.col("yr2") <= F.col("yr"))
        .groupBy("yr", "n_orders", "n_records")
        .agg(F.max("mx2").alias("record_high_cents"))
    )


RECORD_HIGHS_ORACLE = """
WITH base AS (
  SELECT CAST(date_part('year', o_orderdate) AS INT) AS yr,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         o_orderdate, o_orderkey
  FROM orders
), pre AS (
  SELECT yr, cents,
         MAX(cents) OVER (ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
  FROM base
), per_yr AS (
  SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CASE WHEN prevmax IS NULL OR cents > prevmax
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_records,
         MAX(cents) AS yr_max
  FROM pre GROUP BY yr
)
SELECT a.yr, a.n_orders, a.n_records, MAX(b.yr_max) AS record_high_cents
FROM per_yr a JOIN per_yr b ON b.yr <= a.yr
GROUP BY a.yr, a.n_orders, a.n_records
"""


# --------------------------------------------------------------------------
# Max drawdown of the daily revenue series
# --------------------------------------------------------------------------


def revenue_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst peak-to-trough drawdown of the daily revenue series — the
    risk statistic every financial monitor keeps next to the Bollinger
    bands: ``dd_t = (peak_t − rev_t)/peak_t`` with ``peak_t`` the
    running max of daily revenue, reported at its earliest attaining
    day.

    The running peak rides ``two_phase_cummax`` over the calendar-
    bounded day grid (pre-aggregated FIRST, so the cummax input is
    |days|, never |orders|); the drawdown ratio is the exact half-up
    integer-division device ``(2·a·10⁶ + b) DIV (2·b)`` on integer
    cents — no double quotient ever crosses the engine boundary.  The
    argmax extraction is two 1-row broadcast joins."""
    from df_to_azure_spark.plans.pipeline5 import _daily_revenue

    daily = _daily_revenue(spark, sf_dir).select(
        "d", F.expr("CAST(rev * 100 AS BIGINT)").alias("cents")
    )
    peaked = two_phase_cummax(
        daily, [("d", "asc")], "cents", out_col="peak_cents", inclusive=True
    )
    dd = peaked.withColumn(
        "dd6",
        F.expr(
            "CAST((2000000 * (peak_cents - cents) + peak_cents)"
            " DIV (2 * peak_cents) AS BIGINT)"
        ),
    )
    mx = dd.agg(F.max("dd6").alias("mxdd"))
    attain = (
        dd.join(F.broadcast(mx), F.col("dd6") == F.col("mxdd"))
        .agg(F.min("d").alias("trough_d"))
    )
    return (
        dd.join(F.broadcast(attain), F.col("d") == F.col("trough_d"))
        .select(
            "trough_d",
            F.col("cents").alias("trough_cents"),
            "peak_cents",
            F.expr("CAST(dd6 AS DOUBLE) / CAST(1000000 AS DOUBLE)").alias(
                "max_drawdown"
            ),
        )
    )


MAX_DRAWDOWN_ORACLE = """
WITH daily AS (
  SELECT CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS d,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(24,2))
              * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1
), peaked AS (
  SELECT d, cents,
         MAX(cents) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_cents
  FROM daily
), dd AS (
  SELECT d, cents, peak_cents,
         (2000000 * (peak_cents - cents) + peak_cents)
           // (2 * peak_cents) AS dd6
  FROM peaked
), attain AS (
  SELECT MIN(d) AS trough_d FROM dd
  WHERE dd6 = (SELECT MAX(dd6) FROM dd)
)
SELECT d AS trough_d, cents AS trough_cents, peak_cents,
       CAST(dd6 AS DOUBLE) / CAST(1000000 AS DOUBLE) AS max_drawdown
FROM dd JOIN attain ON dd.d = attain.trough_d
"""


# --------------------------------------------------------------------------
# Attribute-filtered kNN: the filter becomes the join key
# --------------------------------------------------------------------------


def filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-constrained exact kNN: each query's neighbors are searched
    ONLY among corpus vectors sharing its ``label`` — the filtered-ANN
    shape every production vector store implements (metadata predicate
    + vector search).

    The predicate is pushed INTO the join: label equality turns the
    broadcast nested-loop scan of ``cosine_topk`` into a broadcast HASH
    join keyed on the label, so each corpus row is scored against only
    the queries of its own class — candidate volume drops by the label
    selectivity before a single dot product runs, the relational
    analogue of an ANN index's filtered posting lists.  Scale: corpus-
    linear scan, query set broadcast (bounded), per-query top-k window
    partitioned by query id."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        SIM._as_double("embedding").alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        "label",
        SIM._as_double("embedding").alias("cv"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("label") == F.col("qlabel"))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "label",
            "neighbor_id",
            F.round(SIM.cosine(F.col("qv"), F.col("cv")), 8).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 10)
        .select("query_id", "label", "rank", "neighbor_id", "cos_sim")
    )


def _filtered_knn_oracle() -> str:
    from df_to_azure_spark.plans.training_data import _dot_sql

    cos = (
        f"round({_dot_sql('qv', 'cv')} / "
        f"(sqrt({_dot_sql('qv', 'qv')}) * sqrt({_dot_sql('cv', 'cv')})), 8)"
    )
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS qlabel,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS neighbor_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
), scored AS (
  SELECT query_id, c.label, neighbor_id, {cos} AS cos_sim
  FROM c JOIN q ON c.label = q.qlabel
  WHERE query_id <> neighbor_id
)
SELECT query_id, label, CAST(rank AS INT) AS rank, neighbor_id, cos_sim
FROM (
  SELECT query_id, label, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= 10
"""


# --------------------------------------------------------------------------
# Prefix-filtered set-similarity join (AllPairs/PPJoin family)
# --------------------------------------------------------------------------

_PF_TAU_NUM = 1  # Jaccard threshold tau = 1/2, kept rational for exact
_PF_TAU_DEN = 2  # integer filtering (J >= 1/2  <=>  3*inter >= sz_a+sz_b)


def prefix_filter_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity join with PREFIX FILTERING (Chaudhuri et al.
    ICDE'06 SSJoin; Bayardo et al. WWW'07 AllPairs; Xiao et al. WWW'08
    PPJoin): candidate pairs come only from docs sharing a shingle in
    each other's RAREST-FIRST PREFIX, not from the full posting join.

    Order every doc's distinct 3-shingles by ascending document
    frequency (ties on the shingle text — one global total order shared
    by all docs); with ``n`` shingles and threshold τ, any pair with
    ``J ≥ τ`` shares ≥ ``ceil(τ·n)`` shingles, so its FIRST common
    shingle (in the global order) must sit within the first
    ``n − ceil(τ·n) + 1`` of BOTH docs — the prefix-filter theorem.
    Joining prefixes only means the posting lists that drive the join
    are the *rarest* shingles: candidate volume collapses from
    Σ df² over all shingles to Σ df² over low-df prefix shingles — the
    property that keeps a 100 TB similarity self-join feasible where a
    plain posting join melts on boilerplate shingles.

    The filter is LOSSLESS, and the oracle proves it: the DuckDB side
    computes the UNFILTERED all-pairs ground truth (full posting join),
    so the driver's hash equality is a machine-checked proof that the
    prefix join dropped no qualifying pair.  Exactness: the Jaccard
    gate is pure-integer (``3·inter ≥ sz_a + sz_b`` for τ = 1/2) and
    the reported ratio uses the exact half-up integer-division device —
    no double ever decides membership.  Machinery lives in
    ``functions.dedup.prefix_filter_jaccard_join`` (reusable on any
    (id, text) frame)."""
    from df_to_azure_spark.functions.dedup import prefix_filter_jaccard_join

    docs = load_table(spark, sf_dir, "documents")
    return prefix_filter_jaccard_join(
        docs, shingle_n=3, tau_num=_PF_TAU_NUM, tau_den=_PF_TAU_DEN
    )


# The oracle is the UNFILTERED ground truth: full posting-list join, no
# prefix restriction.  Hash equality == machine-checked losslessness.
_PF_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"

PREFIX_FILTER_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, {_PF_TOKS} AS toks FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 1) + 1),
           i -> array_to_string(toks[i:i+2], ' ')))) AS s
  FROM toked WHERE len(toks) > 0
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(sa.sz AS BIGINT) AS sz_a,
       CAST(sb.sz AS BIGINT) AS sz_b,
       CAST((2000000 * n_inter + (sa.sz + sb.sz - n_inter))
            // (2 * (sa.sz + sb.sz - n_inter)) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE ({_PF_TAU_DEN} + {_PF_TAU_NUM}) * n_inter
      >= {_PF_TAU_NUM} * (sa.sz + sb.sz)
"""


def prefix_filter_jaccard_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decontamination screen: the A×B (R-S) form of the
    prefix-filtered set-similarity join — every (train, test) document
    pair with Jaccard ≥ τ over 3-shingle sets, where train/test is the
    scale-independent ``doc_id % 10`` split (test = bucket 7, the same
    split rule as ``semdedup_incremental``).  This is the exact
    companion to ``minhash_lsh_pairs_between``'s approximate screen:
    LSH nominates fast, this certifies — a contaminated test doc is one
    with ANY row here.

    Same lossless prefix + PPJoin positional filtering as the self-join
    (one shared global shingle order = document frequency over the
    UNION of both sides), and the oracle is again the UNFILTERED
    all-pairs ground truth between the splits, so hash equality is a
    machine-checked proof no qualifying pair was dropped.  Machinery:
    ``functions.dedup.prefix_filter_jaccard_between``."""
    from df_to_azure_spark.functions.dedup import (
        prefix_filter_jaccard_between as pf_between,
    )

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 7)
    test = docs.where(F.col("doc_id") % 10 == 7)
    return pf_between(
        train, test, shingle_n=3, tau_num=_PF_TAU_NUM, tau_den=_PF_TAU_DEN
    ).select(
        F.col("id_a").alias("train_id"),
        F.col("id_b").alias("test_id"),
        "n_inter",
        "sz_a",
        "sz_b",
        "jaccard",
    )


PREFIX_FILTER_BETWEEN_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, doc_id % 10 = 7 AS is_test, {_PF_TOKS} AS toks
  FROM documents
), sh AS (
  SELECT doc_id, is_test,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 1) + 1),
           i -> array_to_string(toks[i:i+2], ' ')))) AS s
  FROM toked WHERE len(toks) > 0
), sizes AS (
  SELECT doc_id, is_test, COUNT(*) AS sz FROM sh GROUP BY doc_id, is_test
), inter AS (
  SELECT a.doc_id AS train_id, b.doc_id AS test_id, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s
  WHERE NOT a.is_test AND b.is_test
  GROUP BY a.doc_id, b.doc_id
)
SELECT train_id, test_id,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(sa.sz AS BIGINT) AS sz_a,
       CAST(sb.sz AS BIGINT) AS sz_b,
       CAST((2000000 * n_inter + (sa.sz + sb.sz - n_inter))
            // (2 * (sa.sz + sb.sz - n_inter)) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = train_id AND NOT sa.is_test
JOIN sizes sb ON sb.doc_id = test_id AND sb.is_test
WHERE ({_PF_TAU_DEN} + {_PF_TAU_NUM}) * n_inter
      >= {_PF_TAU_NUM} * (sa.sz + sb.sz)
"""


# --------------------------------------------------------------------------
# Split-conformal coverage audit
# --------------------------------------------------------------------------

_CONF_ALPHA_NUM = 1   # alpha = 1/10 -> nominal coverage 90%
_CONF_ALPHA_DEN = 10


def conformal_coverage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration audit (Vovk et al. 2005; Angelopoulos
    & Bates 2021): split documents 50/50 by md5 into calibration and
    test, take the conformal quantile of the nonconformity score
    (``n_chars`` — any deterministic score works; the machinery is the
    point) on the calibration half — the ``k``-th smallest with
    ``k = ceil((n_cal + 1)(1 − α))`` — and report the fraction of TEST
    scores at or below it.  Exchangeability says that fraction lands
    near ``1 − α``; this is the distribution-free coverage audit an ML
    pipeline runs before shipping prediction sets.

    The order statistic rides ``two_phase_rank`` (never a global
    window); ``k`` and the coverage ratio are exact integer arithmetic
    (half-up device), the threshold is a 1-row broadcast."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").alias("score"),
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)"
            " AS INT) % 100"
        ).alias("b"),
    )
    calib = docs.where(F.col("b") < 50)
    test = docs.where(F.col("b") >= 50)

    ranked = two_phase_rank(calib, [("score", "asc"), ("doc_id", "asc")])
    # k = ceil((n+1)(1-alpha)) = ceil((n+1)(den-num)/den), exact int ceil
    kn = _CONF_ALPHA_DEN - _CONF_ALPHA_NUM
    thr = (
        ranked.where(
            F.expr(
                f"__rn = ((__grp_n + 1) * {kn} + {_CONF_ALPHA_DEN} - 1)"
                f" DIV {_CONF_ALPHA_DEN}"
            )
        )
        .select(
            F.col("__grp_n").cast("bigint").alias("n_calib"),
            F.col("__rn").cast("bigint").alias("k"),
            F.col("score").alias("threshold"),
        )
    )
    return (
        test.crossJoin(F.broadcast(thr))
        .agg(
            F.max("n_calib").alias("n_calib"),
            F.max("k").alias("k"),
            F.max("threshold").alias("threshold"),
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.expr(
                "CAST(SUM(CASE WHEN score <= threshold THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("n_covered"),
        )
        .withColumn(
            "coverage",
            F.expr(
                "CAST((2000000 * n_covered + n_test) DIV (2 * n_test)"
                " AS DOUBLE) / CAST(1000000 AS DOUBLE)"
            ),
        )
    )


CONFORMAL_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, n_chars AS score,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100 AS b
  FROM documents
), calib AS (
  SELECT doc_id, score FROM scored WHERE b < 50
), ranked AS (
  SELECT score,
         ROW_NUMBER() OVER (ORDER BY score, doc_id) AS rn,
         COUNT(*) OVER () AS n
  FROM calib
), thr AS (
  SELECT CAST(n AS BIGINT) AS n_calib, CAST(rn AS BIGINT) AS k,
         score AS threshold
  FROM ranked
  WHERE rn = ((n + 1) * {_CONF_ALPHA_DEN - _CONF_ALPHA_NUM}
              + {_CONF_ALPHA_DEN} - 1) // {_CONF_ALPHA_DEN}
)
SELECT MAX(n_calib) AS n_calib, MAX(k) AS k, MAX(threshold) AS threshold,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN score <= threshold THEN 1 ELSE 0 END) AS BIGINT)
         AS n_covered,
       CAST((2000000 * SUM(CASE WHEN score <= threshold THEN 1 ELSE 0 END)
             + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS coverage
FROM scored CROSS JOIN thr
WHERE b >= 50
"""


# --------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram surprisal (exact rational quantization)
# --------------------------------------------------------------------------


def doc_kneser_ney_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram scoring (Kneser & Ney, ICASSP'95;
    Chen & Goodman 1998) of the md5 TEST split against TRAIN counts —
    the smoothing upgrade over ``doc_bigram_surprisal``'s stupid
    backoff: absolute discounting ``max(c−D, 0)/c(w1·)`` plus the
    CONTINUATION probability ``N₁₊(·w2)/N₁₊(··)`` weighted by
    ``λ(w1) = D·N₁₊(w1·)/c(w1·)`` — the insight that 'Francisco' is
    frequent but only ever follows 'San'.

    Engine-exact quantization, same device as the surprisal family:
    with the discount kept RATIONAL (D = 3/4), ``p_KN`` is an exact
    integer ratio ``num/den`` with
    ``num = max(4c−3, 0)·N_bb + 3·N₁₊(w1·)·N₁₊(·w2)`` and
    ``den = 4·c(w1·)·N_bb``; the bit cost is
    ``bit_length(den div num)`` (≈ −log₂ p) — pure integer arithmetic,
    no transcendental ever crosses the engine boundary.  Unseen
    contexts back off to the bare continuation ratio (floored at
    1/N_bb).  Per-doc means use the exact half-up integer-division
    device.  (At 1e12-token counts the num/den products would ride
    DECIMAL(38,0); int64 headroom here is ~2^20×.)

    Plan: one bigram explode per split, three keyed train aggregates
    (all map-side combined, model-bounded by vocab²), one 1-row type
    total, then keyed left joins onto the test stream — AQE broadcasts
    the small sides; no driver-sized state."""
    from df_to_azure_spark.functions import text as TXT
    from df_to_azure_spark.functions.sampling import with_split

    docs = with_split(load_table(spark, sf_dir, "documents"), "doc_id")
    toks_arr = docs.select("doc_id", "split", TXT.tokens("text").alias("t"))
    bg = (
        toks_arr.where(F.size("t") >= 2)
        .select(
            "doc_id",
            "split",
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
                    " (a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("b"),
        )
        .select(
            "doc_id", "split", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
        )
    )
    bgc = (
        bg.where(F.col("split") == "train")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_bg"))
    )
    ctx = bgc.groupBy("w1").agg(
        F.sum("n_bg").alias("c_ctx"), F.count(F.lit(1)).alias("n1p_w1")
    )
    cont = bgc.groupBy("w2").agg(F.count(F.lit(1)).alias("n_cont"))
    nbb = bgc.agg(F.count(F.lit(1)).alias("n_bb"))
    scored = (
        bg.where(F.col("split") == "test")
        .join(bgc, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(nbb))
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN c_ctx IS NOT NULL THEN"
                " length(bin((4 * c_ctx * n_bb) DIV GREATEST("
                "   GREATEST(4 * coalesce(n_bg, 0) - 3, 0) * n_bb"
                "   + 3 * n1p_w1 * coalesce(n_cont, 0), 1)))"
                " ELSE length(bin(n_bb DIV GREATEST(coalesce(n_cont, 0), 1)))"
                " END"
            ).alias("bits"),
            F.expr("IF(c_ctx IS NULL, 1, 0)").alias("oov_ctx"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.expr(
            "CAST((2000000 * SUM(bits) + COUNT(*)) DIV (2 * COUNT(*))"
            " AS DOUBLE) / CAST(1000000 AS DOUBLE)"
        ).alias("mean_kn_bits"),
        F.max("bits").cast("bigint").alias("max_kn_bits"),
        F.expr(
            "CAST((2000000 * SUM(oov_ctx) + COUNT(*)) DIV (2 * COUNT(*))"
            " AS DOUBLE) / CAST(1000000 AS DOUBLE)"
        ).alias("oov_ctx_rate"),
    )


_KN_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"

KNESER_NEY_ORACLE = f"""
WITH s AS (
  SELECT doc_id, {_KN_TOKS} AS t,
         CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100 < 80
              THEN 'train'
              WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100 < 90
              THEN 'val' ELSE 'test' END AS split
  FROM documents
), bg AS (
  SELECT doc_id, split, b[1] AS w1, b[2] AS w2
  FROM (SELECT doc_id, split,
               unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS b
        FROM s WHERE len(t) >= 2)
), bgc AS (
  SELECT w1, w2, COUNT(*) AS n_bg FROM bg WHERE split = 'train' GROUP BY w1, w2
), ctx AS (
  SELECT w1, SUM(n_bg) AS c_ctx, COUNT(*) AS n1p_w1 FROM bgc GROUP BY w1
), cont AS (
  SELECT w2, COUNT(*) AS n_cont FROM bgc GROUP BY w2
), nbb AS (
  SELECT COUNT(*) AS n_bb FROM bgc
), scored AS (
  SELECT b.doc_id,
         CASE WHEN ctx.c_ctx IS NOT NULL THEN
              length(bin(CAST((4 * ctx.c_ctx * nbb.n_bb) // GREATEST(
                GREATEST(4 * coalesce(bgc.n_bg, 0) - 3, 0) * nbb.n_bb
                + 3 * ctx.n1p_w1 * coalesce(cont.n_cont, 0), 1) AS BIGINT)))
         ELSE length(bin(CAST(nbb.n_bb // GREATEST(coalesce(cont.n_cont, 0), 1)
                              AS BIGINT)))
         END AS bits,
         CASE WHEN ctx.c_ctx IS NULL THEN 1 ELSE 0 END AS oov_ctx
  FROM bg b
  LEFT JOIN bgc ON b.w1 = bgc.w1 AND b.w2 = bgc.w2
  LEFT JOIN ctx ON b.w1 = ctx.w1
  LEFT JOIN cont ON b.w2 = cont.w2
  CROSS JOIN nbb
  WHERE b.split = 'test'
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST((2000000 * SUM(bits) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS mean_kn_bits,
       CAST(MAX(bits) AS BIGINT) AS max_kn_bits,
       CAST((2000000 * SUM(oov_ctx) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS oov_ctx_rate
FROM scored GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Markov next-event prediction: top-1 accuracy eval on held-out users
# --------------------------------------------------------------------------


def markov_top1_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the first-order Markov next-event model: train the
    (from → to) transition counts on the md5 TRAIN half of users,
    predict each held-out transition as the train-side argmax next
    type, and report per-context top-1 accuracy — the eval loop a
    personalization pipeline runs before shipping
    ``event_transition_matrix`` as a recommender.

    Split is BY USER (the model must not see a test user's history);
    ordering within a user is (ts, event_id), same determinism contract
    as ``event_transition_matrix``; the argmax ties break (count DESC,
    to_type ASC) via a row_number over the type×type frame (bounded
    ~25 rows — the portable tie-break, not max_by).  Accuracy is the
    exact half-up integer-division device.  Scale: ONE user_id shuffle
    for the lag window, two type-domain-bounded aggregates, and a
    broadcast of the 5-row prediction table onto the test stream."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 4), 16, 10)"
            " AS INT) % 100"
        ).alias("b"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.withColumn("from_type", F.lag("event_type").over(w)).where(
        F.col("from_type").isNotNull()
    )
    train = (
        trans.where(F.col("b") < 50)
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    pred = (
        train.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("from_type").orderBy(F.desc("n"), F.asc("to_type"))
            ),
        )
        .where(F.col("rk") == 1)
        .select("from_type", F.col("to_type").alias("top_prediction"))
    )
    test = trans.where(F.col("b") >= 50).select("from_type", "event_type")
    return (
        test.join(F.broadcast(pred), "from_type", "left")
        .groupBy("from_type")
        .agg(
            F.max("top_prediction").alias("top_prediction"),
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.expr(
                "CAST(SUM(CASE WHEN event_type = top_prediction THEN 1"
                " ELSE 0 END) AS BIGINT)"
            ).alias("n_correct"),
        )
        .withColumn(
            "accuracy",
            F.expr(
                "CAST((2000000 * n_correct + n_test) DIV (2 * n_test)"
                " AS DOUBLE) / CAST(1000000 AS DOUBLE)"
            ),
        )
    )


MARKOV_TOP1_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type, ts, event_id,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::INTEGER % 100 AS b
  FROM events
), trans AS (
  SELECT b, from_type, event_type
  FROM (
    SELECT b, user_id, event_type, lag(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS from_type
    FROM ev
  )
  WHERE from_type IS NOT NULL
), train AS (
  SELECT from_type, event_type AS to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM trans WHERE b < 50 GROUP BY from_type, event_type
), pred AS (
  SELECT from_type, to_type AS top_prediction
  FROM (
    SELECT from_type, to_type,
           ROW_NUMBER() OVER (PARTITION BY from_type
                              ORDER BY n DESC, to_type ASC) AS rk
    FROM train
  )
  WHERE rk = 1
)
SELECT t.from_type, MAX(p.top_prediction) AS top_prediction,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN t.event_type = p.top_prediction THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       CAST((2000000 * SUM(CASE WHEN t.event_type = p.top_prediction THEN 1
                           ELSE 0 END) + COUNT(*)) // (2 * COUNT(*))
            AS DOUBLE) / CAST(1000000 AS DOUBLE) AS accuracy
FROM trans t LEFT JOIN pred p ON t.from_type = p.from_type
WHERE t.b >= 50
GROUP BY t.from_type
"""


# --------------------------------------------------------------------------
# End-to-end dedup funnel report
# --------------------------------------------------------------------------

_FUNNEL_MIN_CHARS = 100


def dedup_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation FUNNEL as one auditable frame — what every
    training-data pipeline reports after a run: documents surviving
    each stage, and what each stage removed.

      0_raw      → the incoming corpus
      1_exact    → md5 fingerprint dedup (keep the min doc_id per hash)
      2_neardup  → near-dup clusters over the survivors via the
                   prefix-filtered Jaccard join (τ = 1/2) + connected
                   components; keep each cluster's min id
      3_minlen   → drop survivors under {MIN} chars (the cheap quality
                   gate that runs last, after dedup spent its budget)

    Every stage reuses a registered, independently oracle-checked
    operator (exact_dedup groups, ``prefix_filter_jaccard_join``,
    ``connected_components``); the funnel's own oracle replays all
    four stages in SQL — the near-dup stage through the UNFILTERED
    all-pairs ground truth plus a recursive-CTE min-label reachability
    — so the single hash check pins the whole composition, not just
    the stage counts in isolation.  Scale: each stage is the already-
    audited plan of its operator; the funnel adds only four 1-row
    count aggregates and two semi/anti joins on doc_id."""
    from df_to_azure_spark.functions.dedup import prefix_filter_jaccard_join
    from df_to_azure_spark.functions.graph import connected_components

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    keeps = docs.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    surv1 = docs.join(keeps.select("doc_id"), "doc_id", "semi")
    pairs = prefix_filter_jaccard_join(
        surv1, shingle_n=3, tau_num=1, tau_den=2
    ).select("id_a", "id_b")
    removed2 = (
        connected_components(pairs)
        .where(F.col("node") != F.col("component"))
        .select(F.col("node").alias("doc_id"))
    )
    surv2 = surv1.join(removed2, "doc_id", "anti")
    surv3 = surv2.where(F.col("n_chars") >= _FUNNEL_MIN_CHARS)

    def cnt(df, name):
        return df.agg(F.count(F.lit(1)).cast("bigint").alias(name))

    c0, c1 = cnt(docs, "c0"), cnt(surv1, "c1")
    c2, c3 = cnt(surv2, "c2"), cnt(surv3, "c3")
    all_counts = c0.crossJoin(c1).crossJoin(c2).crossJoin(c3)
    stages = [
        ("0_raw", "c0", None),
        ("1_exact", "c1", "c0"),
        ("2_neardup", "c2", "c1"),
        ("3_minlen", "c3", "c2"),
    ]
    outs = []
    for name, cur, prev in stages:
        removed = f"{prev} - {cur}" if prev else "CAST(0 AS BIGINT)"
        outs.append(
            all_counts.select(
                F.lit(name).alias("stage"),
                F.col(cur).alias("n_docs"),
                F.expr(f"CAST({removed} AS BIGINT)").alias("n_removed"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


dedup_funnel_report.__doc__ = dedup_funnel_report.__doc__.replace(
    "{MIN}", str(_FUNNEL_MIN_CHARS)
)


DEDUP_FUNNEL_ORACLE = f"""
WITH RECURSIVE fp AS (
  SELECT doc_id, text, n_chars, md5(text) AS fp FROM documents
), keeps AS (
  SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY fp
), surv1 AS (
  SELECT f.doc_id, f.text, f.n_chars
  FROM fp f JOIN keeps k ON f.doc_id = k.doc_id
), toked AS (
  SELECT doc_id, {_PF_TOKS} AS toks FROM surv1
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 1) + 1),
           i -> array_to_string(toks[i:i+2], ' ')))) AS s
  FROM toked WHERE len(toks) > 0
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE 3 * n_inter >= sa.sz + sb.sz
), e AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM pairs
), reach(node, lbl) AS (
  SELECT DISTINCT u, u FROM e
  UNION
  SELECT e.v, r.lbl FROM e JOIN reach r ON e.u = r.node
), comp AS (
  SELECT node, MIN(lbl) AS component FROM reach GROUP BY node
), removed2 AS (
  SELECT node AS doc_id FROM comp WHERE node <> component
), surv2 AS (
  SELECT s.doc_id, s.n_chars FROM surv1 s
  WHERE NOT EXISTS (SELECT 1 FROM removed2 r WHERE r.doc_id = s.doc_id)
), surv3 AS (
  SELECT doc_id FROM surv2 WHERE n_chars >= {_FUNNEL_MIN_CHARS}
), counts AS (
  SELECT (SELECT COUNT(*) FROM fp) AS c0,
         (SELECT COUNT(*) FROM surv1) AS c1,
         (SELECT COUNT(*) FROM surv2) AS c2,
         (SELECT COUNT(*) FROM surv3) AS c3
)
SELECT '0_raw' AS stage, CAST(c0 AS BIGINT) AS n_docs,
       CAST(0 AS BIGINT) AS n_removed FROM counts
UNION ALL
SELECT '1_exact', CAST(c1 AS BIGINT), CAST(c0 - c1 AS BIGINT) FROM counts
UNION ALL
SELECT '2_neardup', CAST(c2 AS BIGINT), CAST(c1 - c2 AS BIGINT) FROM counts
UNION ALL
SELECT '3_minlen', CAST(c3 AS BIGINT), CAST(c2 - c3 AS BIGINT) FROM counts
"""
