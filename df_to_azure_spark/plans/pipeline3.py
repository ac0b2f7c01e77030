"""Round-7 query wave: distributed heavy hitters (Misra-Gries candidates
+ exact verify), sparse TF-IDF cosine similarity pairs (shingle terms),
bounded k-core peeling over the co-purchase graph, per-source length
quantiles through the grouped two-phase rank, BPE merge training with an
unrolled-iteration oracle, merge_asof-parity as-of joins (forward +
tolerance, nearest), exact-decimal embedding covariance + the PCA
quality tripwire, classifier calibration bins, a one-scan correlation
matrix, categorical mutual information, KMV bottom-k set Jaccard across
sources, and per-document n-gram novelty.

Every query is paired with a DuckDB oracle that reproduces the result
bit-for-bit (same cross-engine policy as ``pipeline2``: integer/decimal
math wherever possible, one ROUND after each transcendental,
DECIMAL(28,N) sums so aggregation order never matters, every numeric
constant explicitly DOUBLE).

No counterpart exists in the reference (zypp-io/df_to_azure is pandas +
Azure REST orchestration, ``df_to_azure/export.py``); these are
engine-extension surface for the large-scale training-data brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from df_to_azure_spark.functions import distrank as DR
from df_to_azure_spark.functions import text as TXT
from df_to_azure_spark.sources import load_table
from df_to_azure_spark.plans.training_data import _TOKS

# --------------------------------------------------------------------------
# Heavy hitters: Misra-Gries candidate pass + exact verification
# --------------------------------------------------------------------------

_HH_PHI_NUM = 1
_HH_PHI_DEN = 100


def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens exceeding 1% of the corpus token stream, with exact counts
    — via the two-pass distributed Misra-Gries shape
    (``sketch.heavy_hitters_exact``): per-partition mergeable summaries
    bound the candidate set, an exact counting pass restricted to the
    candidates produces the answer.  The final output is exact (and
    partitioning-invariant), so the sketch is pure plan-shape insurance
    — the thing that keeps a 100 TB token stream from hash-aggregating
    billions of distinct keys."""
    from df_to_azure_spark.functions.sketch import heavy_hitters_exact

    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(TXT.tokens("text")).alias("tok")
    )
    return heavy_hitters_exact(
        toks, "tok", phi_num=_HH_PHI_NUM, phi_den=_HH_PHI_DEN
    )


HEAVY_HITTER_ORACLE = f"""
WITH toks AS (
  SELECT tok FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
  WHERE tok IS NOT NULL
), tot AS (
  SELECT COUNT(*) AS n FROM toks
), c AS (
  SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
)
SELECT tok, CAST(cnt AS BIGINT) AS cnt,
       ROUND(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share
FROM c CROSS JOIN tot
WHERE cnt * {_HH_PHI_DEN} > n * {_HH_PHI_NUM}
"""


# --------------------------------------------------------------------------
# Sparse TF-IDF cosine pairs (shingle terms)
# --------------------------------------------------------------------------

_TFIDF_TOP_M = 15
_TFIDF_THRESHOLD = 0.35
_TFIDF_SHINGLE_N = 3


def doc_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topical near-dup pairs by sparse TF-IDF cosine over 3-gram
    shingle terms (``dedup.tfidf_cosine_pairs``) — the weighted lexical
    similarity between exact Jaccard and the dense ANN family.  Shingle
    terms (not unigrams) because this corpus' unigram vocabulary is
    tiny: unigram posting lists would span the corpus and the pair join
    would degenerate toward all-pairs."""
    from df_to_azure_spark.functions.dedup import tfidf_cosine_pairs

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(
        docs,
        top_m=_TFIDF_TOP_M,
        threshold=_TFIDF_THRESHOLD,
        term_shingle_n=_TFIDF_SHINGLE_N,
    )


# mirrors text.shingles(): n-grams WITH repeats, short docs fall back to
# one whole-doc shingle (greatest(len-2, 1) positions)
_SHINGLE_TERMS = """
  SELECT doc_id,
         unnest(list_transform(
           range(1, greatest(len(toks) - 2, 1) + 1),
           i -> array_to_string(toks[i:i+2], ' '))) AS tok
  FROM (SELECT doc_id, {toks} AS toks FROM documents)
  WHERE len(toks) > 0
""".format(toks=_TOKS)

TFIDF_COSINE_ORACLE = f"""
WITH g AS (
{_SHINGLE_TERMS}
), per_tok AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM g GROUP BY doc_id, tok
), dfreq AS (
  SELECT tok, COUNT(*) AS df_tok FROM per_tok GROUP BY tok
), w AS (
  SELECT doc_id, tok,
         ROUND(tf * ROUND(LN(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                             / CAST(df_tok AS DOUBLE)), 12), 8) AS w
  FROM per_tok JOIN dfreq USING (tok)
), kept AS (
  SELECT doc_id, tok, w FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY w DESC, tok) AS rk
    FROM w
  ) WHERE rk <= {_TFIDF_TOP_M}
), nrm AS (
  SELECT doc_id,
         ROUND(SQRT(CAST(SUM(CAST(ROUND(w * w, 10) AS DECIMAL(28,10)))
                    AS DOUBLE)), 12) AS nrm
  FROM kept GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared_terms,
         CAST(SUM(CAST(ROUND(a.w * b.w, 10) AS DECIMAL(28,10))) AS DOUBLE)
           AS dot
  FROM kept a JOIN kept b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, n_shared_terms,
       ROUND(dot / (x.nrm * y.nrm), 6) AS cosine
FROM dots JOIN nrm x ON dots.id_a = x.doc_id
          JOIN nrm y ON dots.id_b = y.doc_id
WHERE ROUND(dot / (x.nrm * y.nrm), 6) >= {_TFIDF_THRESHOLD}
"""


# --------------------------------------------------------------------------
# k-core peeling over the co-purchase graph
# --------------------------------------------------------------------------

_KCORE_K = 2
_KCORE_ITERS = 6


def part_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the part co-purchase graph after 6 peeling rounds
    (``graph.kcore``): every part still co-purchased with ≥2 distinct
    partners once the degree-1 fringe is iteratively stripped — the
    standard densest-region screen next to PageRank and the triangle
    family.  6 rounds reaches the fixpoint at both test scale factors
    (asserted in tests); the oracle unrolls exactly the same 6 rounds,
    so parity holds even where convergence is slower."""
    from df_to_azure_spark.functions.graph import kcore
    from df_to_azure_spark.plans.pipeline2 import _part_edges

    return kcore(
        _part_edges(spark, sf_dir).localCheckpoint(),
        k=_KCORE_K,
        iters=_KCORE_ITERS,
    )


def _kcore_oracle(k: int, iters: int) -> str:
    from df_to_azure_spark.plans.pipeline2 import _PR_MAX_BASKET, _PR_MIN_SUPPORT

    # every unrolled level references its predecessor 3x (degree CTE +
    # two IN subqueries); without MATERIALIZED, DuckDB inlines CTEs and
    # the base scan re-evaluates 3^iters times — the same lazy-plan
    # regrowth trap as Spark's unrolled greedy loops
    ctes = [
        f"""li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sized AS MATERIALIZED (
  SELECT l_orderkey FROM li GROUP BY l_orderkey
  HAVING COUNT(*) <= {_PR_MAX_BASKET}
), e0 AS MATERIALIZED (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN sized s ON a.l_orderkey = s.l_orderkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_PR_MIN_SUPPORT}
)"""
    ]
    for i in range(iters):
        ctes.append(
            f"""n{i + 1} AS MATERIALIZED (
  SELECT node FROM (
    SELECT a AS node FROM e{i} UNION ALL SELECT b FROM e{i}
  ) GROUP BY node HAVING COUNT(*) >= {k}
), e{i + 1} AS MATERIALIZED (
  SELECT a, b FROM e{i}
  WHERE a IN (SELECT node FROM n{i + 1})
    AND b IN (SELECT node FROM n{i + 1})
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node, CAST(COUNT(*) AS BIGINT) AS core_deg
FROM (SELECT a AS node FROM e{iters} UNION ALL SELECT b FROM e{iters})
GROUP BY node
"""
    )


PART_KCORE_ORACLE = _kcore_oracle(_KCORE_K, _KCORE_ITERS)


# --------------------------------------------------------------------------
# Per-source length quantiles via the GROUPED two-phase rank
# --------------------------------------------------------------------------


def source_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length profile — exact ``rank`` /
    ``percent_rank`` / ``cume_dist`` plus the decile, partitioned by
    source — through ``distrank.two_phase_rank(group_cols=['source'])``
    + ``with_rank_family`` + ``ntile_from_rank``.  This is the grouped
    form of the two-phase rank: per-key quantile normalization over
    groups that are individually too large for a fat single partition
    (a handful of sources × millions of docs each is exactly the skew
    shape that melts ``Window.partitionBy(source).orderBy(...)`` on one
    straggler task)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    ranked = DR.two_phase_rank(
        docs,
        [("n_chars", "asc"), ("doc_id", "asc")],
        group_cols=["source"],
    )
    fam = DR.with_rank_family(ranked, ["n_chars"], group_cols=["source"])
    return fam.select(
        "source",
        "doc_id",
        "n_chars",
        F.col("__rank").alias("rnk"),
        F.round("__pct_rank", 8).alias("pct_rank"),
        F.round("__cume_dist", 8).alias("cume"),
        DR.ntile_from_rank("__rn", "__grp_n", 10).cast("int").alias("decile"),
    )


SOURCE_LENGTH_QUANTILES_ORACLE = """
SELECT source, doc_id, n_chars,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       ROUND(CAST(percent_rank() OVER w AS DOUBLE), 8) AS pct_rank,
       ROUND(CAST(cume_dist() OVER w AS DOUBLE), 8) AS cume,
       CAST(ntile(10) OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS INT) AS decile
FROM documents
WINDOW w AS (PARTITION BY source ORDER BY n_chars)
"""


# --------------------------------------------------------------------------
# BPE merge training (unrolled-iteration oracle)
# --------------------------------------------------------------------------

_BPE_MERGES = 8


def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 BPE merge rules learned from the corpus
    (``text.bpe_train_merges``) — tokenizer training as a fixed chain
    of vocab-table plans, every winner chosen inside the plan (top-1
    broadcast), nothing collected.  The oracle unrolls the same 8
    steps; the doubled-boundary literal ``replace`` (see
    ``bpe_train_merges``) gives both engines identical canonical
    non-overlapping leftmost merge application, including shared
    boundary spaces in symbol runs (``a a a a`` -> ``aa aa``)."""
    from df_to_azure_spark.functions.text import bpe_train_merges

    docs = load_table(spark, sf_dir, "documents")
    return bpe_train_merges(docs, _BPE_MERGES)


def _bpe_oracle(n_merges: int) -> str:
    ctes = [
        f"""v0 AS MATERIALIZED (
  SELECT word, COUNT(*) AS n_w,
         ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '</w> ' AS seq
  FROM (SELECT unnest({_TOKS}) AS word FROM documents)
  GROUP BY word
)"""
    ]
    for i in range(1, n_merges + 1):
        ctes.append(
            f"""p{i} AS MATERIALIZED (
  SELECT split_part(pr, ' ', 1) AS l, split_part(pr, ' ', 2) AS r,
         CAST(SUM(n_w) AS BIGINT) AS freq
  FROM (
    SELECT n_w,
           unnest(list_transform(generate_series(1, len(t) - 1),
                                 j -> t[j] || ' ' || t[j + 1])) AS pr
    FROM (SELECT n_w, string_split(trim(seq, ' '), ' ') AS t FROM v{i - 1})
  ) GROUP BY 1, 2
), m{i} AS MATERIALIZED (
  SELECT {i} AS step, l, r, l || r AS merged, freq
  FROM p{i} ORDER BY freq DESC, l, r LIMIT 1
), v{i} AS MATERIALIZED (
  SELECT word, n_w,
         replace(replace(replace(seq, ' ', '  '),
                         ' ' || m.l || '  ' || m.r || ' ',
                         ' ' || m.merged || ' '), '  ', ' ') AS seq
  FROM v{i - 1} CROSS JOIN m{i} m
)"""
        )
    union = " UNION ALL ".join(
        f"SELECT * FROM m{i}" for i in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(step AS INT) AS step, l AS "left", r AS "right", merged, freq
FROM ({union})
"""
    )


BPE_MERGES_ORACLE = _bpe_oracle(_BPE_MERGES)


# --------------------------------------------------------------------------
# merge_asof parity: forward + tolerance, nearest
# --------------------------------------------------------------------------


def _purchase_view_frames(spark: SparkSession, sf_dir: str):
    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id")
    )
    return purchases, views


def purchases_asof_forward_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: each purchase matched to the user's
    EARLIEST view at-or-after it, nulled when that view is more than two
    hours out — pandas ``merge_asof(direction='forward', tolerance=...)``
    parity over the same union+window carry as the backward form (the
    tolerance is a post-mask expression, not a different plan)."""
    from df_to_azure_spark.operators.asof import asof_join

    purchases, views = _purchase_view_frames(spark, sf_dir)
    out = asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["view_event_id"],
        direction="forward", tolerance="INTERVAL 2 HOURS",
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("view_event_id_asof").alias("view_event_id"),
        F.col("ts_asof").alias("view_ts"),
    )


ASOF_FORWARD_TOL_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
), j AS (
  SELECT p.event_id, p.user_id, p.ts,
         v.event_id AS vid, v.ts AS vts
  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts >= p.ts
)
SELECT event_id, user_id, ts,
       CASE WHEN vts IS NOT NULL AND vts - ts <= INTERVAL 2 HOURS
            THEN vid END AS view_event_id,
       CASE WHEN vts IS NOT NULL AND vts - ts <= INTERVAL 2 HOURS
            THEN vts END AS view_ts
FROM j
"""


def purchases_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of: each purchase matched to the temporally CLOSEST
    view either side, backward winning ties (pandas' rule).  Both
    carries run over ONE keyed union — two in-partition sorts, no second
    shuffle."""
    from df_to_azure_spark.operators.asof import asof_join

    purchases, views = _purchase_view_frames(spark, sf_dir)
    out = asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["view_event_id"], direction="nearest",
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("view_event_id_asof").alias("view_event_id"),
        F.col("ts_asof").alias("view_ts"),
    )


ASOF_NEAREST_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
), b AS (
  SELECT p.event_id, v.event_id AS bid, v.ts AS bts
  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
), f AS (
  SELECT p.event_id, v.event_id AS fid, v.ts AS fts
  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts >= p.ts
)
SELECT p.event_id, p.user_id, p.ts,
       CASE WHEN bts IS NOT NULL AND (fts IS NULL OR p.ts - bts <= fts - p.ts)
            THEN bid
            WHEN fts IS NOT NULL THEN fid END AS view_event_id,
       CASE WHEN bts IS NOT NULL AND (fts IS NULL OR p.ts - bts <= fts - p.ts)
            THEN bts
            WHEN fts IS NOT NULL THEN fts END AS view_ts
FROM p
LEFT JOIN b ON p.event_id = b.event_id
LEFT JOIN f ON p.event_id = f.event_id
"""


# --------------------------------------------------------------------------
# PCA surface: exact-decimal covariance + all-Spark quality tripwire
# --------------------------------------------------------------------------

_COV_DIMS = 8


def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sample covariance of the first 8 embedding dimensions in
    ONE fused aggregation scan — the declarative, oracle-exact twin of
    what ``similarity.pca_fit``'s numpy kernel computes at full width.
    Exactness: per-row products ROUND(12) into DECIMAL(38,12) sums
    (aggregation-order-free), the final ``(Sxy − Sx·Sy/n)/(n−1)`` in
    DOUBLE with every operand explicitly cast, output ROUND(8)."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = _COV_DIMS
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(d):
        aggs.append(
            F.expr(
                f"SUM(CAST(ROUND(CAST(embedding[{i}] AS DOUBLE), 12)"
                f" AS DECIMAL(38,12)))"
            ).alias(f"s{i}")
        )
    for i in range(d):
        for j in range(i, d):
            aggs.append(
                F.expr(
                    f"SUM(CAST(ROUND(CAST(embedding[{i}] AS DOUBLE)"
                    f" * CAST(embedding[{j}] AS DOUBLE), 12)"
                    f" AS DECIMAL(38,12)))"
                ).alias(f"p{i}_{j}")
            )
    wide = emb.agg(*aggs)
    cells = ", ".join(
        f"named_struct('i', {i}, 'j', {j}, 'cov',"
        f" ROUND((CAST(p{i}_{j} AS DOUBLE)"
        f" - CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE) / CAST(n AS DOUBLE))"
        f" / CAST(n - 1 AS DOUBLE), 8))"
        for i in range(d)
        for j in range(i, d)
    )
    return wide.select(
        F.explode(F.expr(f"array({cells})")).alias("c")
    ).select(
        F.col("c.i").cast("int").alias("i"),
        F.col("c.j").cast("int").alias("j"),
        F.col("c.cov").alias("cov"),
    )


def _cov_oracle(d: int) -> str:
    sums = ", ".join(
        f"SUM(CAST(ROUND(CAST(embedding[{i + 1}] AS DOUBLE), 12)"
        f" AS DECIMAL(38,12))) AS s{i}"
        for i in range(d)
    )
    prods = ", ".join(
        f"SUM(CAST(ROUND(CAST(embedding[{i + 1}] AS DOUBLE)"
        f" * CAST(embedding[{j + 1}] AS DOUBLE), 12)"
        f" AS DECIMAL(38,12))) AS p{i}_{j}"
        for i in range(d)
        for j in range(i, d)
    )
    cells = " UNION ALL ".join(
        f"SELECT {i} AS i, {j} AS j,"
        f" ROUND((CAST(p{i}_{j} AS DOUBLE)"
        f" - CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE) / CAST(n AS DOUBLE))"
        f" / CAST(n - 1 AS DOUBLE), 8) AS cov FROM w"
        for i in range(d)
        for j in range(i, d)
    )
    return f"""
WITH w AS MATERIALIZED (
  SELECT COUNT(*) AS n, {sums}, {prods} FROM embeddings
)
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j, cov FROM ({cells})
"""


EMBEDDING_COVARIANCE_ORACLE = _cov_oracle(_COV_DIMS)


def pca_quality_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tripwire over the full numpy-kernel PCA path
    (``similarity.pca_fit``/``pca_project``): emits a row ONLY when a
    mathematical invariant fails — expected empty, so the empty-set
    oracle makes the driver hash-check prove them all.  Checks:
    components orthonormal (k=8 and k=16 fits), eigenvalues descending,
    per-coordinate projected sample variance equals its eigenvalue
    (Spark-side var_samp over the projections vs the driver-fit model),
    and nested-basis energy monotonicity Σ||proj16||² ≥ Σ||proj8||²
    (Pythagoras over orthonormal bases — the reconstruction-error
    ordering without materializing reconstructions)."""
    import numpy as np

    from df_to_azure_spark.functions.similarity import pca_fit, pca_project

    emb = load_table(spark, sf_dir, "embeddings")
    dim = 64
    driver_viol: list[tuple[str, float]] = []
    models = {}
    for k in (8, 16):
        mean, comps, evals = pca_fit(emb, dim=dim, k=k)
        models[k] = (mean, comps, evals)
        W = np.array(comps)
        ortho_err = float(np.max(np.abs(W @ W.T - np.eye(k))))
        if ortho_err > 1e-6:
            driver_viol.append((f"ortho_k{k}", ortho_err))
        if any(evals[i] < evals[i + 1] - 1e-12 for i in range(k - 1)):
            driver_viol.append((f"eval_order_k{k}", float(min(evals))))
    schema = "chk string, detail double"
    out = spark.createDataFrame(driver_viol, schema)

    mean8, comps8, evals8 = models[8]
    proj8 = pca_project(emb, mean8, comps8)
    var_rows = proj8.agg(
        *[F.var_samp(F.col("proj")[i]).alias(f"v{i}") for i in range(8)],
        F.expr(
            "SUM(aggregate(proj, CAST(0 AS DOUBLE), (a, x) -> a + x * x))"
        ).alias("energy"),
    )
    ev_lit = ", ".join(repr(float(v)) for v in evals8)
    var_viol = var_rows.select(
        F.explode(
            F.expr(
                "filter(zip_with("
                f"array({', '.join(f'v{i}' for i in range(8))}),"
                f" array({ev_lit}),"
                " (v, e) -> named_struct('chk', 'proj_var', 'detail',"
                " abs(v - e), 'e', e)),"
                " s -> s.detail > CAST(1e-6 AS DOUBLE)"
                " * greatest(s.e, CAST(1 AS DOUBLE)))"
            )
        ).alias("s")
    ).select(F.col("s.chk").alias("chk"), F.col("s.detail").alias("detail"))

    mean16, comps16, _ = models[16]
    e8 = var_rows.select(F.col("energy").alias("e8"))
    e16 = pca_project(emb, mean16, comps16).agg(
        F.expr(
            "SUM(aggregate(proj, CAST(0 AS DOUBLE), (a, x) -> a + x * x))"
        ).alias("e16")
    )
    energy_viol = (
        e8.crossJoin(e16)
        .where(F.col("e16") < F.col("e8") - F.lit(1e-6))
        .select(
            F.lit("energy_monotone").alias("chk"),
            (F.col("e8") - F.col("e16")).alias("detail"),
        )
    )
    return out.unionByName(var_viol).unionByName(energy_viol)


PCA_QUALITY_ORACLE = """
SELECT CAST(NULL AS VARCHAR) AS chk, CAST(NULL AS DOUBLE) AS detail
WHERE 1 = 0
"""


# --------------------------------------------------------------------------
# Classifier calibration bins (distrank deciles, learned vs rule filter)
# --------------------------------------------------------------------------


def classifier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration table for the learned quality classifier against the
    rule-based Gopher filter: documents bucketed into global score
    deciles (via the two-phase exact rank — no single-partition ntile
    window), each bin reporting mean predicted probability and the
    empirical Gopher keep-rate.  The standard reliability-diagram input
    for 'can the cheap learned filter replace the expensive rule
    cascade'.  Exactness: probabilities are 6-dp doubles summed as
    DECIMAL(18,6) (order-free), one double division per bin."""
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
        "decile", DR.ntile_from_rank("__rn", "__grp_n", 10).cast("int")
    )
    return binned.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(
            "ROUND(CAST(SUM(CAST(quality_prob AS DECIMAL(18,6))) AS DOUBLE)"
            " / COUNT(*), 6)"
        ).alias("mean_prob"),
        F.expr(
            "ROUND(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)"
            " / COUNT(*), 6)"
        ).alias("keep_rate"),
    )


def _calibration_oracle() -> str:
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
         ntile(10) OVER (ORDER BY quality_prob, doc_id) AS decile
  FROM j
)
SELECT CAST(decile AS INT) AS decile, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(quality_prob AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS mean_prob,
       ROUND(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS keep_rate
FROM b GROUP BY decile
"""


CALIBRATION_ORACLE = _calibration_oracle()


# --------------------------------------------------------------------------
# One-scan correlation matrix + categorical mutual information
# --------------------------------------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson matrix over lineitem's four measures in ONE
    fused aggregation scan (``profile.corr_matrix``) — 10 cells
    (diagonal included as the 1.0 self-check), exact DECIMAL sufficient
    sums, one double expression per cell."""
    from df_to_azure_spark.functions.profile import corr_matrix

    li = load_table(spark, sf_dir, "lineitem")
    return corr_matrix(li, _CORR_COLS, scale=2)


def _corr_matrix_oracle(cols: list[str], scale: int) -> str:
    d = len(cols)
    s2 = 2 * scale
    sums = ", ".join(
        f"SUM(CAST({c} AS DECIMAL(18,{scale}))) AS s{i}"
        for i, c in enumerate(cols)
    )
    prods = ", ".join(
        f"SUM(CAST(CAST({cols[i]} AS DECIMAL(18,{scale}))"
        f" * CAST({cols[j]} AS DECIMAL(18,{scale}))"
        f" AS DECIMAL(38,{s2}))) AS p{i}_{j}"
        for i in range(d)
        for j in range(i, d)
    )
    def _var(i: int) -> str:
        return (
            f"(CAST(n AS DOUBLE) * CAST(p{i}_{i} AS DOUBLE)"
            f" - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE))"
        )

    cells = " UNION ALL ".join(
        f"SELECT '{cols[i]}' AS col_a, '{cols[j]}' AS col_b,"
        f" CASE WHEN {_var(i)} = 0.0 OR {_var(j)} = 0.0 THEN NULL"
        f" ELSE ROUND((CAST(n AS DOUBLE) * CAST(p{i}_{j} AS DOUBLE)"
        f"        - CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE))"
        f" / SQRT({_var(i)} * {_var(j)}), 6) END"
        " AS corr FROM w"
        for i in range(d)
        for j in range(i, d)
    )
    return f"""
WITH w AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, {sums}, {prods} FROM lineitem
)
SELECT col_a, col_b, corr FROM ({cells})
"""


LINEITEM_CORR_ORACLE = _corr_matrix_oracle(_CORR_COLS, 2)


def priority_status_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between order priority and status —
    the information-theoretic companion to ``priority_status_chi2``
    (dependence strength on a comparable scale, bounded by the smaller
    marginal entropy, which is emitted alongside for normalization).
    One joint-count scan; margins and the total DERIVE from the joint
    frame (no second scan).  Exactness: probabilities are double
    divisions of exact counts, ROUND(12) after the one LN, per-cell
    terms ROUND(12) into DECIMAL(28,12) before the sum, output
    ROUND(6)."""
    orders = load_table(spark, sf_dir, "orders")
    joint = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("c_ab")
    )
    ma = joint.groupBy("o_orderpriority").agg(F.sum("c_ab").alias("c_a"))
    mb = joint.groupBy("o_orderstatus").agg(F.sum("c_ab").alias("c_b"))
    tot = joint.agg(F.sum("c_ab").alias("n"))
    term = (
        "CAST(ROUND((CAST(c_ab AS DOUBLE) / CAST(n AS DOUBLE))"
        " * ROUND(LN(CAST(c_ab AS DOUBLE) * CAST(n AS DOUBLE)"
        "            / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))), 12),"
        " 12) AS DECIMAL(28,12))"
    )
    h_term = (
        "CAST(ROUND(-(CAST({c} AS DOUBLE) / CAST(n AS DOUBLE))"
        " * ROUND(LN(CAST({c} AS DOUBLE) / CAST(n AS DOUBLE)), 12), 12)"
        " AS DECIMAL(28,12))"
    )
    mi = (
        joint.join(F.broadcast(ma), "o_orderpriority")
        .join(F.broadcast(mb), "o_orderstatus")
        .crossJoin(F.broadcast(tot))
        .agg(F.expr(f"ROUND(CAST(SUM({term}) AS DOUBLE), 6)").alias("mi_nats"))
    )
    h_a = ma.crossJoin(F.broadcast(tot)).agg(
        F.expr(
            f"ROUND(CAST(SUM({h_term.format(c='c_a')}) AS DOUBLE), 6)"
        ).alias("h_priority")
    )
    h_b = mb.crossJoin(F.broadcast(tot)).agg(
        F.expr(
            f"ROUND(CAST(SUM({h_term.format(c='c_b')}) AS DOUBLE), 6)"
        ).alias("h_status")
    )
    return mi.crossJoin(h_a).crossJoin(h_b)


MUTUAL_INFO_ORACLE = """
WITH joint AS MATERIALIZED (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS c_ab
  FROM orders GROUP BY 1, 2
), ma AS (
  SELECT o_orderpriority, SUM(c_ab) AS c_a FROM joint GROUP BY 1
), mb AS (
  SELECT o_orderstatus, SUM(c_ab) AS c_b FROM joint GROUP BY 1
), tot AS (
  SELECT SUM(c_ab) AS n FROM joint
), mi AS (
  SELECT ROUND(CAST(SUM(
    CAST(ROUND((CAST(c_ab AS DOUBLE) / CAST(n AS DOUBLE))
      * ROUND(LN(CAST(c_ab AS DOUBLE) * CAST(n AS DOUBLE)
                 / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))), 12), 12)
      AS DECIMAL(28,12))) AS DOUBLE), 6) AS mi_nats
  FROM joint
  JOIN ma USING (o_orderpriority)
  JOIN mb USING (o_orderstatus)
  CROSS JOIN tot
), ha AS (
  SELECT ROUND(CAST(SUM(
    CAST(ROUND(-(CAST(c_a AS DOUBLE) / CAST(n AS DOUBLE))
      * ROUND(LN(CAST(c_a AS DOUBLE) / CAST(n AS DOUBLE)), 12), 12)
      AS DECIMAL(28,12))) AS DOUBLE), 6) AS h_priority
  FROM ma CROSS JOIN tot
), hb AS (
  SELECT ROUND(CAST(SUM(
    CAST(ROUND(-(CAST(c_b AS DOUBLE) / CAST(n AS DOUBLE))
      * ROUND(LN(CAST(c_b AS DOUBLE) / CAST(n AS DOUBLE)), 12), 12)
      AS DECIMAL(28,12))) AS DOUBLE), 6) AS h_status
  FROM mb CROSS JOIN tot
)
SELECT mi_nats, h_priority, h_status FROM mi CROSS JOIN ha CROSS JOIN hb
"""


# --------------------------------------------------------------------------
# KMV bottom-k set-overlap audit across sources
# --------------------------------------------------------------------------

_KMV_J_K = 64


def kmv_source_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source shingle-vocabulary overlap, exact AND by KMV
    bottom-k sketch (``sketch.kmv_set_jaccard``) — the mergeable-sketch
    audit for 'how much template boilerplate do these sources share'
    when the per-source sets are too big to intersect exactly.  The
    deterministic md5 hash makes the estimate itself oracle-checkable
    next to the exact value it approximates."""
    from df_to_azure_spark.functions.sketch import kmv_set_jaccard

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "source", F.explode(TXT.shingles("text", 3)).alias("shingle")
    )
    return kmv_set_jaccard(sh, "source", "shingle", k=_KMV_J_K)


KMV_SOURCE_JACCARD_ORACLE = f"""
WITH sh AS MATERIALIZED (
  SELECT DISTINCT source AS s, tok AS it FROM (
    SELECT source,
           unnest(list_transform(
             range(1, greatest(len(toks) - 2, 1) + 1),
             i -> array_to_string(toks[i:i+2], ' '))) AS tok
    FROM (SELECT source, {_TOKS} AS toks FROM documents)
    WHERE len(toks) > 0
  )
), hx AS (
  SELECT s, it,
         ('0x' || substr(md5(it), 1, 12))::BIGINT
           / CAST({float(1 << 48)} AS DOUBLE) AS h
  FROM sh
), names AS (
  SELECT DISTINCT s FROM sh
), pairs AS (
  SELECT a.s AS set_a, b.s AS set_b
  FROM names a JOIN names b ON a.s < b.s
), memb AS MATERIALIZED (
  SELECT set_a, set_b, it, h,
         MAX(fa) AS in_a, MAX(fb) AS in_b
  FROM (
    SELECT p.set_a, p.set_b, hx.it, hx.h, 1 AS fa, 0 AS fb
    FROM hx JOIN pairs p ON hx.s = p.set_a
    UNION ALL
    SELECT p.set_a, p.set_b, hx.it, hx.h, 0 AS fa, 1 AS fb
    FROM hx JOIN pairs p ON hx.s = p.set_b
  ) GROUP BY set_a, set_b, it, h
), bottom AS (
  SELECT set_a, set_b, in_a, in_b FROM (
    SELECT *, row_number() OVER (PARTITION BY set_a, set_b
                                 ORDER BY h, it) AS rn
    FROM memb
  ) WHERE rn <= {_KMV_J_K}
), exact AS (
  SELECT set_a, set_b, CAST(COUNT(*) AS BIGINT) AS n_union,
         CAST(SUM(in_a * in_b) AS BIGINT) AS n_inter
  FROM memb GROUP BY set_a, set_b
), sk AS (
  SELECT set_a, set_b, COUNT(*) AS n_bottom, SUM(in_a * in_b) AS k_inter
  FROM bottom GROUP BY set_a, set_b
)
SELECT exact.set_a, exact.set_b, n_union, n_inter,
       ROUND(CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE), 6)
         AS jaccard_exact,
       ROUND(CAST(k_inter AS DOUBLE) / CAST(n_bottom AS DOUBLE), 6)
         AS jaccard_kmv
FROM exact JOIN sk USING (set_a, set_b)
"""


# --------------------------------------------------------------------------
# Per-document n-gram novelty (inverse boilerplate share)
# --------------------------------------------------------------------------


def doc_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a document's DISTINCT
    3-gram shingles that appear in no other document — the cheap
    'how much of this is boilerplate' signal a corpus-curation pass
    ranks on before the expensive near-dup machinery runs.

    Plan: the shingle expression (interpreted HOF transform — measured
    ~3 s per evaluation at sf0.1, dwarfing every downstream agg) is
    evaluated ONCE and the exploded (doc, shingle) frame pinned; a
    df=1 shingle has exactly one owner, recoverable from the df
    aggregation itself (``min(doc_id)`` of a 1-row group), so nothing
    joins back against the exploded frame.  Per-doc totals are a second
    small agg of the same pinned frame; exact integer counts, one
    ROUND(6) division."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(TXT.shingles("text", 3))).alias("s"),
    ).localCheckpoint()
    totals = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    uniq = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df_s"), F.min("doc_id").alias("owner"))
        .where(F.col("df_s") == 1)
        .groupBy(F.col("owner").alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_unique"))
    )
    return (
        totals.join(uniq, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_unique"), F.lit(0))
            .cast("bigint")
            .alias("n_unique"),
        )
        .withColumn(
            "novelty",
            F.expr(
                "ROUND(CAST(n_unique AS DOUBLE)"
                " / CAST(n_shingles AS DOUBLE), 6)"
            ),
        )
    )


DOC_NOVELTY_ORACLE = f"""
WITH sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, tok AS s FROM (
{_SHINGLE_TERMS}
  )
), dfreq AS (
  SELECT s, COUNT(*) AS df_s FROM sh GROUP BY s
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN df_s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       ROUND(CAST(SUM(CASE WHEN df_s = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS novelty
FROM sh JOIN dfreq USING (s)
GROUP BY doc_id
"""
