"""Round-4 second-session query wave: semantic dedup (SemDeDup, full +
incremental), data-selection importance weights (DSIR), hashed linear
quality-model scoring, graph analytics (fixed-iteration PageRank,
degree-ordered triangle counting), Z-order clustering keys, OOV rate vs
a top-V vocab, CDC apply-changes state fold, declarative expectations,
recursive-CTE hierarchy rollup, hourly linear interpolation, governance
(masked export, k-anonymity), temperature-weighted source mixture,
Laplace-mechanism count release, strict 3-step funnel, and leave-one-out
target encoding.

Every query is paired with a DuckDB oracle that reproduces the result
bit-for-bit (the cross-engine policy: integer/decimal math wherever
possible, one ROUND after each transcendental, DECIMAL(28,12) sums so
aggregation order never matters, every numeric constant explicitly
DOUBLE — decimal-literal division rules differ between engines).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from df_to_azure_spark.functions import distrank as DR
from df_to_azure_spark.functions import graph as G
from df_to_azure_spark.functions import similarity as SIM
from df_to_azure_spark.functions import text as TXT
from df_to_azure_spark.operators.zorder import column_minmax, zorder_key
from df_to_azure_spark.sources import load_table

# monotone counter for per-call temp-view/UDTF names (concurrency safety)
_VIEW_SEQ = itertools.count()

# DuckDB token fragment mirroring functions.text.tokens
_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"


# --------------------------------------------------------------------------
# SemDeDup: cluster-then-prune semantic deduplication over embeddings
# --------------------------------------------------------------------------

_SEM_N_CENTROIDS = 16
_SEM_THRESHOLD = 0.4  # synthetic Gaussian vectors top out at cos~0.5;
# 0.4 exercises the prune path on the graded corpus (production corpora
# with real duplicates use the paper's 0.9+)
_SEM_CAP = 100_000


def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: every vector labeled with its
    coarse cluster and a keep/prune verdict (``similarity.semdedup``).
    Centroids are the k lowest-id DATA EXEMPLARS (norm-matched to the
    corpus, so clusters stay balanced — random Gaussian centroids
    degenerate to one giant cluster on unit-norm data and make the
    within-cluster join quadratic); assignment is map-side, the only
    data shuffles are the rank window and the within-cluster candidate
    join — the semantic-dedup path that scales where the exact
    ``embedding_neardup_pairs`` cross join cannot."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = SIM.exemplar_centroids(emb, _SEM_N_CENTROIDS)
    out = SIM.semdedup(
        emb,
        cents,
        threshold=_SEM_THRESHOLD,
        hot_cluster_cap=_SEM_CAP,
    )
    return out.select(F.col("id").alias("vec_id"), "cid", "kept")


def _semdedup_oracle() -> str:
    from df_to_azure_spark.plans.training_data import _dot_sql

    return f"""
WITH v AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), c AS (
  SELECT id AS ccid, v AS cv, {_dot_sql('v', 'v')} AS c2
  FROM v WHERE id < {_SEM_N_CENTROIDS}
), d AS (
  SELECT v.id, c.ccid,
         {_dot_sql('v.v', 'v.v')} - 2.0 * {_dot_sql('v.v', 'c.cv')} + c.c2 AS dd
  FROM v CROSS JOIN c
), assigned AS (
  SELECT id, CAST(ccid AS INT) AS cid FROM (
    SELECT id, ccid, row_number() OVER (PARTITION BY id ORDER BY dd, ccid) AS rn
    FROM d
  ) WHERE rn = 1
), ranked AS (
  SELECT a.id, v.v, a.cid,
         row_number() OVER (PARTITION BY a.cid ORDER BY a.id) AS rk
  FROM assigned a JOIN v ON a.id = v.id
), capped AS (
  SELECT id, v, cid, sqrt({_dot_sql('v', 'v')}) AS nrm FROM ranked
  WHERE rk <= {_SEM_CAP}
), dropped AS (
  SELECT DISTINCT b.id AS id
  FROM capped a JOIN capped b ON a.cid = b.cid AND a.id < b.id
  WHERE round({_dot_sql('a.v', 'b.v')} / (a.nrm * b.nrm), 8) >= {_SEM_THRESHOLD!r}
)
SELECT r.id AS vec_id, r.cid, d.id IS NULL AS kept
FROM ranked r LEFT JOIN dropped d ON r.id = d.id
"""


SEMDEDUP_ORACLE = _semdedup_oracle()


# --------------------------------------------------------------------------
# PageRank (fixed iterations) over the part co-occurrence graph
# --------------------------------------------------------------------------

_PR_ITERS = 3
_PR_DAMPING = 0.85
_PR_MAX_BASKET = 1000
_PR_MIN_SUPPORT = 2


def _part_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric co-purchase edges: part pairs sharing >= MIN_SUPPORT
    orders (same basket projection + mega-basket cap as
    ``pipeline.part_cooccurrence``).

    Formulated as ONE basket aggregation (``collect_set`` dedups the
    (order, part) projection inside the same shuffle) plus in-row array
    pair expansion — 2 shuffles total vs 4 for the previous
    dedup → size-semijoin → self-join chain, identical pair semantics
    (sorted array ⇒ pa < pb; singleton baskets contribute nothing either
    way).  Per-row expansion is bounded by the mega-basket cap (≤ cap²/2
    pairs from one row) — exactly the blowup the cap bounds at 100 TB."""
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .where((F.size("parts") >= 2) & (F.size("parts") <= _PR_MAX_BASKET))
    )
    pair_structs = F.flatten(
        F.transform(
            "parts",
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + 2, F.size("parts")),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("pr"))
        .select(F.col("pr.pa").alias("pa"), F.col("pr.pb").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= _PR_MIN_SUPPORT)
    )
    return pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).union(
        pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )


def part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over co-purchased parts — which parts anchor the
    co-occurrence graph.  The one driver action is the bounded node
    count (one long); the 3 unrolled iterations are a fixed chain of
    edge-list joins, reproduced step-for-step by the SQL oracle."""
    # the edge list feeds nodes, degrees, the node count AND every
    # iteration's contribution join — checkpoint it so the distinct +
    # basket-capped self-join runs once, not once per consumer (on a
    # cluster this is the checkpoint-to-storage between stages)
    edges = _part_edges(spark, sf_dir).localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    # checkpoint='local': pin the nodes/degree-edge frames the unrolled
    # chain re-reads each iteration (A/B 4.41 -> 3.64 s median, rows
    # identical; see graph.pagerank docstring)
    return G.pagerank(
        edges, n_nodes=n, iters=_PR_ITERS, damping=_PR_DAMPING,
        checkpoint="local",
    ).select(F.col("node").alias("part_id"), "rank")


def _pagerank_oracle() -> str:
    d = _PR_DAMPING
    iters = []
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        iters.append(f"""
c{i} AS (
  SELECT e.dst AS node, SUM(CAST(ROUND(r.r / dg.deg, 12) AS DECIMAL(28,12))) AS s
  FROM edges e JOIN {prev} r ON e.src = r.node JOIN deg dg ON e.src = dg.node
  GROUP BY e.dst
), r{i} AS (
  SELECT n.node,
         ROUND((CAST(1 AS DOUBLE) - CAST({d!r} AS DOUBLE)) / (SELECT n FROM nn)
               + CAST({d!r} AS DOUBLE)
                 * COALESCE(CAST(c{i}.s AS DOUBLE), CAST(0 AS DOUBLE)), 12) AS r
  FROM nodes n LEFT JOIN c{i} ON n.node = c{i}.node
)""")
        prev = f"r{i}"
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sized AS (
  SELECT l_orderkey FROM li GROUP BY l_orderkey
  HAVING COUNT(*) <= {_PR_MAX_BASKET}
), pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN sized s ON a.l_orderkey = s.l_orderkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_PR_MIN_SUPPORT}
), edges AS (
  SELECT pa AS src, pb AS dst FROM pairs
  UNION ALL SELECT pb AS src, pa AS dst FROM pairs
), nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  )
), nn AS (SELECT COUNT(*) AS n FROM nodes),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (
  SELECT node, ROUND(CAST(1 AS DOUBLE) / (SELECT n FROM nn), 12) AS r
  FROM nodes
),{",".join(iters)}
SELECT node AS part_id, ROUND(r, 8) AS rank FROM {prev}
"""


PART_PAGERANK_ORACLE = _pagerank_oracle()


# --------------------------------------------------------------------------
# DSIR: hashed-unigram importance weights for data selection
# --------------------------------------------------------------------------

_DSIR_TARGET_SOURCE = "src0"


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS'23)
    reduced to its unigram-LM core: per-document importance weight
    ``sum_tok [ln p_target(tok) - ln p_raw(tok)]`` with add-1 smoothing,
    where the target domain is ``source = 'src0'`` and raw is the whole
    corpus.  Documents with weight >= 0 look more target-like than
    average — the resampling score DSIR feeds to its Gumbel top-k draw.

    Plan: one token explode feeds BOTH count aggregations (target via a
    filtered count — no second scan); per-token log-ratios are rounded
    to 6 dp (the single transcendental, same policy as ``doc_tfidf``)
    then joined back onto the exploded tokens by token — a
    vocabulary-sized shuffle join, never a driver-side vocabulary — and
    summed per doc as DECIMAL(28,12), so the result is independent of
    aggregation order.  At 100 TB: two shuffles (token counts, per-doc
    sum) plus the token join; no state grows with corpus size except the
    token-count table itself, which is exactly the model DSIR trains.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(TXT.tokens("text")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("r_cnt"),
        F.count(F.when(F.col("source") == _DSIR_TARGET_SOURCE, 1)).alias("t_cnt"),
    )
    totals = counts.agg(
        F.sum("r_cnt").alias("r_tot"),
        F.sum("t_cnt").alias("t_tot"),
        F.count(F.lit(1)).alias("v"),
    )
    scored = counts.crossJoin(F.broadcast(totals)).select(
        "tok",
        F.expr(
            "ROUND(LN((CAST(t_cnt AS DOUBLE) + CAST(1 AS DOUBLE))"
            " / CAST(t_tot + v AS DOUBLE)) "
            "- LN((CAST(r_cnt AS DOUBLE) + CAST(1 AS DOUBLE))"
            " / CAST(r_tot + v AS DOUBLE)), 6)"
        ).alias("w"),
    )
    return (
        toks.join(scored, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.expr(
                "ROUND(CAST(SUM(CAST(w AS DECIMAL(28,12))) AS DOUBLE), 6)"
            ).alias("dsir_logratio"),
        )
        .withColumn("target_like", F.col("dsir_logratio") >= 0.0)
    )


DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, unnest({_TOKS}) AS tok FROM documents
), counts AS (
  SELECT tok, COUNT(*) AS r_cnt,
         COUNT(*) FILTER (source = '{_DSIR_TARGET_SOURCE}') AS t_cnt
  FROM toks GROUP BY tok
), totals AS (
  SELECT SUM(r_cnt) AS r_tot, SUM(t_cnt) AS t_tot, COUNT(*) AS v FROM counts
), scored AS (
  SELECT tok,
         ROUND(LN((CAST(t_cnt AS DOUBLE) + CAST(1 AS DOUBLE))
                  / CAST(t_tot + v AS DOUBLE))
             - LN((CAST(r_cnt AS DOUBLE) + CAST(1 AS DOUBLE))
                  / CAST(r_tot + v AS DOUBLE)), 6) AS w
  FROM counts CROSS JOIN totals
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(CAST(w AS DECIMAL(28,12))) AS DOUBLE), 6) AS dsir_logratio,
       ROUND(CAST(SUM(CAST(w AS DECIMAL(28,12))) AS DOUBLE), 6) >= 0.0
         AS target_like
FROM toks JOIN scored USING (tok)
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Hashed linear quality-classifier scoring (fastText-style inference)
# --------------------------------------------------------------------------

_CLS_MOD = 1_000_003


def doc_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear text-classifier INFERENCE at corpus scale: every token
    hashes to a weight (hashing-trick lookup — no vocabulary broadcast),
    the document logit is the mean token weight, and the quality
    probability is its sigmoid.  This is the serving path of a
    fastText / logistic quality filter (the CCNet/GPT-3 "learned filter"
    stage): swap the hash-derived pseudo-weights for trained ones (a
    ``MOD``-sized broadcast array) and nothing else changes.

    The pseudo-weights here are ``(md5_32(tok) mod M) / M - 0.5`` —
    uniform in [-0.5, 0.5), deterministic integer math.  The per-doc
    mean stays EXACT until the last step: the integer residues are
    summed as BIGINT (order-independent) and the ``/M - 0.5`` shift is
    applied once to the aggregate, so the only inexact ops are two
    divisions on identical operands plus the final sigmoid — the whole
    scoring pipeline (hash -> weight -> mean -> sigmoid -> threshold)
    is oracle-checked end to end.  Plan: explode + per-doc aggregate,
    one shuffle; weights are computed inline per token, so the hot path
    is pure codegen."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(TXT.tokens("text")).alias("tok"))
    h = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
    per_doc = (
        toks.withColumn("hm", h % _CLS_MOD)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.expr(
                "ROUND(CAST(SUM(hm) AS DOUBLE) / COUNT(*)"
                f" / {float(_CLS_MOD)!r} - 0.5, 8)"
            ).alias("logit"),
        )
    )
    score = F.expr("ROUND(1.0 / (1.0 + EXP(-logit)), 6)")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "logit",
        score.alias("quality_prob"),
        (score >= 0.5).alias("quality_pass"),
    )


CLASSIFIER_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
), hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT % {_CLS_MOD} AS hm
  FROM toks
), per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         ROUND(CAST(SUM(hm) AS DOUBLE) / COUNT(*)
               / {float(_CLS_MOD)!r} - 0.5, 8) AS logit
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, n_tokens, logit,
       ROUND(1.0 / (1.0 + EXP(-logit)), 6) AS quality_prob,
       ROUND(1.0 / (1.0 + EXP(-logit)), 6) >= 0.5 AS quality_pass
FROM per_doc
"""


# --------------------------------------------------------------------------
# Z-order clustering keys (multi-column data skipping)
# --------------------------------------------------------------------------

_Z_BITS = 8
_Z_COLS = ["o_custkey", "o_totalprice"]


def zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton keys for orders on (custkey, totalprice) — the value
    ``operators.zorder.zorder_layout`` sorts by when re-clustering a
    table for two-column data skipping.  Registering the key itself
    makes the bit-interleave math (quantize -> shift/mask chain, pure
    codegen) oracle-checked; the physical layout effect (narrow per-file
    min/max on BOTH columns) is plan-asserted in ``tests/test_zorder``.
    The min/max normalization stats come from one bounded aggregate
    (2 scalars per column)."""
    orders = load_table(spark, sf_dir, "orders")
    stats = column_minmax(orders, _Z_COLS)
    return orders.select(
        "o_orderkey", zorder_key(_Z_COLS, stats, bits=_Z_BITS).alias("zkey")
    )


def _zorder_oracle() -> str:
    max_q = (1 << _Z_BITS) - 1
    qs = []
    for j, c in enumerate(_Z_COLS):
        span = f"(CASE WHEN mx{j} - mn{j} = 0 THEN 1.0 ELSE mx{j} - mn{j} END)"
        qs.append(
            f"least(CAST({max_q} AS BIGINT), greatest(CAST(0 AS BIGINT), "
            f"CAST(trunc((CAST({c} AS DOUBLE) - mn{j}) * {float(max_q)!r} "
            f"/ {span}) AS BIGINT))) AS q{j}"
        )
    terms = []
    n = len(_Z_COLS)
    for i in range(_Z_BITS):
        for j in range(n):
            terms.append(f"(((q{j} >> {i}) & 1) << {i * n + j})")
    stats = ", ".join(
        f"MIN(CAST({c} AS DOUBLE)) AS mn{j}, MAX(CAST({c} AS DOUBLE)) AS mx{j}"
        for j, c in enumerate(_Z_COLS)
    )
    return f"""
WITH s AS (SELECT {stats} FROM orders),
q AS (
  SELECT o_orderkey, {", ".join(qs)}
  FROM orders CROSS JOIN s
)
SELECT o_orderkey, CAST({" + ".join(terms)} AS BIGINT) AS zkey FROM q
"""


ZORDER_KEYS_ORACLE = _zorder_oracle()


# --------------------------------------------------------------------------
# Vocabulary coverage: per-document OOV rate against a top-V vocab
# --------------------------------------------------------------------------

_OOV_VOCAB_SIZE = 25


def doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's top-V
    terms — the tokenizer-fit diagnostic run before committing a vocab:
    a doc whose tokens mostly fall outside the vocabulary will shatter
    into char-level pieces at training time.  Deterministic vocab rule:
    top V by count, ties to the lexicographically smaller term.

    Scale contrast with ``dsir_importance_weights``: the vocab is a
    BOUNDED model artifact (V rows), so the per-token membership probe
    is a broadcast semi-join — no vocabulary-sized shuffle; the only
    full shuffles are the initial term count and the per-doc aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(TXT.tokens("text")).alias("tok"))

    # Top-V selection via orderBy+limit — Spark plans this as
    # TakeOrderedAndProject (per-partition top-V, then a V-row merge on
    # the driver), so the distinct-token frame is never funneled through
    # a single-partition global window.  The (count DESC, tok ASC) total
    # order makes limit(V) equivalent to the rank<=V rule.
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(_OOV_VOCAB_SIZE)
        .select("tok")
    )
    flagged = toks.join(
        F.broadcast(vocab).withColumn("__in", F.lit(1)), "tok", "left"
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.count(F.when(F.col("__in").isNull(), 1)).cast("bigint").alias("n_oov"),
        F.expr(
            "ROUND(CAST(COUNT(CASE WHEN __in IS NULL THEN 1 END) AS DOUBLE)"
            " / COUNT(*), 6)"
        ).alias("oov_rate"),
    )


OOV_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
), vocab AS (
  SELECT tok FROM (
    SELECT tok, row_number() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
    FROM toks GROUP BY tok
  ) WHERE rk <= {_OOV_VOCAB_SIZE}
), flagged AS (
  SELECT t.doc_id, CASE WHEN v.tok IS NULL THEN 1 END AS oov
  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(oov) AS BIGINT) AS n_oov,
       ROUND(CAST(COUNT(oov) AS DOUBLE) / COUNT(*), 6) AS oov_rate
FROM flagged GROUP BY doc_id
"""


def semdedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest SemDeDup: a 10% batch (``vec_id % 10 = 7`` —
    scale-independent split rule) judged against the settled 90% corpus
    only (``similarity.semdedup_between``).  Per-batch cost stays flat as
    the ingest history grows — the production companion to the full
    ``semdedup_prune`` rebuild, same contract as
    ``incremental_neardup_pairs`` for MinHash."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = SIM.exemplar_centroids(emb, _SEM_N_CENTROIDS)
    new = emb.where(F.col("vec_id") % 10 == 7)
    corpus = emb.where(F.col("vec_id") % 10 != 7)
    out = SIM.semdedup_between(new, corpus, cents, threshold=_SEM_THRESHOLD)
    return out.select(F.col("id").alias("vec_id"), "cid", "kept")


def _semdedup_incremental_oracle() -> str:
    from df_to_azure_spark.plans.training_data import _dot_sql

    return f"""
WITH v AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), c AS (
  SELECT id AS ccid, v AS cv, {_dot_sql('v', 'v')} AS c2
  FROM v WHERE id < {_SEM_N_CENTROIDS}
), d AS (
  SELECT v.id, c.ccid,
         {_dot_sql('v.v', 'v.v')} - 2.0 * {_dot_sql('v.v', 'c.cv')} + c.c2 AS dd
  FROM v CROSS JOIN c
), assigned AS (
  SELECT d.id, CAST(ccid AS INT) AS cid, v.v,
         sqrt({_dot_sql('v.v', 'v.v')}) AS nrm
  FROM (
    SELECT id, ccid, row_number() OVER (PARTITION BY id ORDER BY dd, ccid) AS rn
    FROM d
  ) d JOIN v ON d.id = v.id
  WHERE rn = 1
), news AS (
  SELECT * FROM assigned WHERE id % 10 = 7
), corp AS (
  SELECT * FROM assigned WHERE id % 10 <> 7
), dropped AS (
  SELECT DISTINCT n.id
  FROM news n JOIN corp b ON n.cid = b.cid
  WHERE round({_dot_sql('n.v', 'b.v')} / (n.nrm * b.nrm), 8)
        >= {_SEM_THRESHOLD!r}
)
SELECT n.id AS vec_id, n.cid, d.id IS NULL AS kept
FROM news n LEFT JOIN dropped d ON n.id = d.id
"""


SEMDEDUP_INCREMENTAL_ORACLE = _semdedup_incremental_oracle()


# --------------------------------------------------------------------------
# CDC apply-changes: fold an out-of-order change feed into table state
# --------------------------------------------------------------------------

_CDC_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]


def cdc_orders_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``operators.cdc.apply_changes`` end to end: a deterministic
    synthetic change feed derived from orders — an update wave (seq 1,
    keys %7), a later overriding wave (seq 2, keys %21 ⊂ %7), tombstones
    (seq 3, keys %13) and inserts under fresh keys (%29, key+10^9) —
    folded into the new table state.  Latest-sequence-wins (tombstone on
    ties), so the %21 keys show +20 not +10 and any %13 key is gone even
    if also updated."""
    from df_to_azure_spark.operators.cdc import apply_changes

    base = load_table(spark, sf_dir, "orders").select(*_CDC_COLS)
    key = F.col("o_orderkey")
    tp = F.col("o_totalprice")
    ten = F.expr("CAST(10 AS DOUBLE)")
    twenty = F.expr("CAST(20 AS DOUBLE)")
    u1 = (
        base.where(key % 7 == 0)
        .withColumn("o_totalprice", tp + ten)
        .withColumn("seq", F.lit(1))
        .withColumn("op", F.lit("U"))
    )
    u2 = (
        base.where(key % 21 == 0)
        .withColumn("o_totalprice", tp + twenty)
        .withColumn("seq", F.lit(2))
        .withColumn("op", F.lit("U"))
    )
    d = (
        base.where(key % 13 == 0)
        .withColumn("seq", F.lit(3))
        .withColumn("op", F.lit("D"))
    )
    ins = (
        base.where(key % 29 == 0)
        .withColumn("o_orderkey", key + 1_000_000_000)
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn("seq", F.lit(1))
        .withColumn("op", F.lit("U"))
    )
    changes = u1.unionByName(u2).unionByName(d).unionByName(ins)
    return apply_changes(base, changes, ["o_orderkey"])


CDC_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
), changes AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + CAST(10 AS DOUBLE) AS o_totalprice, 1 AS seq, 'U' AS op
  FROM base WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + CAST(20 AS DOUBLE), 2, 'U'
  FROM base WHERE o_orderkey % 21 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 3, 'D'
  FROM base WHERE o_orderkey % 13 = 0
  UNION ALL
  SELECT o_orderkey + 1000000000, o_custkey, 'N', o_totalprice, 1, 'U'
  FROM base WHERE o_orderkey % 29 = 0
), latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY o_orderkey ORDER BY seq DESC, op ASC
    ) AS rn
    FROM changes
  ) WHERE rn = 1
)
SELECT b.o_orderkey, b.o_custkey, b.o_orderstatus, b.o_totalprice
FROM base b LEFT JOIN latest l ON b.o_orderkey = l.o_orderkey
WHERE l.o_orderkey IS NULL
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM latest WHERE op <> 'D'
"""


# --------------------------------------------------------------------------
# Data-quality expectations: declarative rules, one fused validation scan
# --------------------------------------------------------------------------


def orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``operators.expectations`` over orders: five rules (not-null key,
    price range, status set, priority regex, cross-column date sanity)
    compiled into ONE fused aggregate — the report costs one scan no
    matter how many rules are declared."""
    from df_to_azure_spark.operators import expectations as E

    orders = load_table(spark, sf_dir, "orders")
    rules = [
        E.not_null("o_custkey"),
        E.in_range("o_totalprice", 0, 1_000_000),
        E.in_set("o_orderstatus", ["F", "O", "P"]),
        E.matches("o_orderpriority", "^[1-5]-"),
        E.Expectation(
            "orderdate_not_future",
            F.col("o_orderdate") <= F.lit("2026-01-01").cast("timestamp"),
        ),
    ]
    return E.evaluate_expectations(orders, rules)


EXPECTATIONS_ORACLE = """
WITH agg AS (
  SELECT COUNT(*) AS n_rows,
    COUNT(CASE WHEN NOT COALESCE(o_custkey IS NOT NULL, FALSE) THEN 1 END) AS v1,
    COUNT(CASE WHEN NOT COALESCE(o_totalprice >= 0 AND o_totalprice <= 1000000, FALSE) THEN 1 END) AS v2,
    COUNT(CASE WHEN NOT COALESCE(o_orderstatus IN ('F', 'O', 'P'), FALSE) THEN 1 END) AS v3,
    COUNT(CASE WHEN NOT COALESCE(regexp_matches(o_orderpriority, '^[1-5]-'), FALSE) THEN 1 END) AS v4,
    COUNT(CASE WHEN NOT COALESCE(o_orderdate <= TIMESTAMP '2026-01-01', FALSE) THEN 1 END) AS v5
  FROM orders
)
SELECT rule, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS pass
FROM (
  SELECT 'o_custkey_not_null' AS rule, n_rows, v1 AS n_violations FROM agg
  UNION ALL SELECT 'o_totalprice_in_range', n_rows, v2 FROM agg
  UNION ALL SELECT 'o_orderstatus_in_set', n_rows, v3 FROM agg
  UNION ALL SELECT 'o_orderpriority_matches', n_rows, v4 FROM agg
  UNION ALL SELECT 'orderdate_not_future', n_rows, v5 FROM agg
)
"""


# --------------------------------------------------------------------------
# Triangle counting (degree-ordered orientation) over the same part graph
# --------------------------------------------------------------------------


def part_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``graph.triangle_count`` over the co-purchase graph — global
    triangle/wedge counts (the clustering-coefficient numerator).  The
    degree-ordered orientation is replayed exactly by the SQL twin, so
    the join-shaped counting plan is hash-gated end to end."""
    from df_to_azure_spark.functions.graph import triangle_count

    return triangle_count(_part_edges(spark, sf_dir).localCheckpoint())


PART_TRIANGLES_ORACLE = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sized AS (
  SELECT l_orderkey FROM li GROUP BY l_orderkey
  HAVING COUNT(*) <= {_PR_MAX_BASKET}
), pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN sized s ON a.l_orderkey = s.l_orderkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_PR_MIN_SUPPORT}
), und AS (
  SELECT pa AS a, pb AS b FROM pairs
), deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
), ori AS (
  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
              THEN u.a ELSE u.b END AS u,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
              THEN u.b ELSE u.a END AS v
  FROM und u
  JOIN deg da ON u.a = da.node
  JOIN deg db ON u.b = db.node
), wed AS (
  SELECT w1.v AS x, w2.v AS y
  FROM ori w1 JOIN ori w2 ON w1.u = w2.u AND w1.v < w2.v
), clos AS (
  SELECT least(u, v) AS x, greatest(u, v) AS y FROM ori
)
SELECT CAST((SELECT COUNT(*) FROM wed w
             WHERE EXISTS (SELECT 1 FROM clos c WHERE c.x = w.x AND c.y = w.y))
       AS BIGINT) AS n_triangles,
       CAST((SELECT COUNT(*) FROM wed) AS BIGINT) AS n_wedges
"""


# --------------------------------------------------------------------------
# Recursive CTE surface: hierarchy walk + subtree rollup
# --------------------------------------------------------------------------


def supplier_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE surface (Spark 4 ``WITH RECURSIVE``): walk a
    derived supplier hierarchy (parent = ``suppkey div 7``, a
    deterministic org-chart stand-in — TPC-H has no native hierarchy)
    and roll account balances up every subtree: for each ancestor, the
    descendant count and exact subtree balance.  The recursion emits one
    ``(node, ancestor)`` row per chain step — the transitive-closure
    frame a BOM explosion or org rollup needs; balances sum as
    DECIMAL(28,6) so the rollup is aggregation-order-exact.

    Scale note: recursion depth is O(log key-space) (~6 here); each
    step is one self-join the engine executes iteratively — rows grow
    as nodes × depth, the honest cost of closure materialization."""
    # per-call view name: two concurrent calls in one session must not
    # clobber each other between createOrReplaceTempView and spark.sql
    view = f"__suppliers_v_{next(_VIEW_SEQ)}"
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView(view)
    try:
        # spark.sql resolves the view eagerly; drop it so per-call names
        # don't accumulate in a long-lived session's catalog
        return spark.sql(
            f"""
            WITH RECURSIVE chain AS (
              SELECT s_suppkey AS node, s_suppkey AS anc FROM {view}
              UNION ALL
              SELECT node, anc DIV 7 AS anc FROM chain WHERE anc > 0
            )
            SELECT c.anc AS anc_suppkey,
                   CAST(COUNT(*) AS BIGINT) AS n_desc,
                   CAST(SUM(CAST(s.s_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                     AS subtree_acctbal
            FROM chain c JOIN {view} s ON c.node = s.s_suppkey
            GROUP BY c.anc
            """
        )
    finally:
        spark.catalog.dropTempView(view)


HIERARCHY_ORACLE = """
WITH RECURSIVE chain AS (
  SELECT s_suppkey AS node, s_suppkey AS anc FROM supplier
  UNION ALL
  SELECT node, anc // 7 AS anc FROM chain WHERE anc > 0
)
SELECT c.anc AS anc_suppkey,
       CAST(COUNT(*) AS BIGINT) AS n_desc,
       CAST(SUM(CAST(s.s_acctbal AS DECIMAL(28,6))) AS DOUBLE)
         AS subtree_acctbal
FROM chain c JOIN supplier s ON c.node = s.s_suppkey
GROUP BY c.anc
"""


# --------------------------------------------------------------------------
# Time-series linear interpolation on the dense hourly grid
# --------------------------------------------------------------------------


def events_hourly_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation — the third imputation mode next to
    zero-fill (``events_hourly_gapfill``) and carry-forward
    (``events_value_ffill``): hours with no events get the straight line
    between the neighboring observed hourly means, the standard
    resample-and-interpolate for sensor/metric series.

    Plan: aggregate FIRST (sparse hourly means, decimal-exact), then
    join onto the generated dense grid, then ONE window per direction
    (last/first IGNORE NULLS carrying both the value and its hour) —
    no self-joins, no per-gap loops; edge gaps clamp to the nearest
    observed value.  The interpolation weight is integer epoch-hour
    arithmetic, so the one double multiply is engine-exact."""
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.expr(
            "ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)"
            " / COUNT(*), 6)"
        ).alias("v")
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.expr("sequence(lo, hi, INTERVAL 1 HOUR)")).alias("hour")
    )
    event_types = events.select("event_type").distinct()
    full = grid.join(F.broadcast(event_types)).join(
        hourly, ["hour", "event_type"], "left"
    )
    wb = W.partitionBy("event_type").orderBy("hour").rowsBetween(
        W.unboundedPreceding, 0
    )
    wf = W.partitionBy("event_type").orderBy("hour").rowsBetween(
        0, W.unboundedFollowing
    )
    eh = F.unix_timestamp("hour")
    known_h = F.when(F.col("v").isNotNull(), eh)
    ann = full.select(
        "hour",
        "event_type",
        "v",
        eh.alias("eh"),
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(known_h, ignorenulls=True).over(wb).alias("ph"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(known_h, ignorenulls=True).over(wf).alias("nh"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.expr(
                "ROUND(pv + (nv - pv) * (CAST(eh - ph AS DOUBLE) / (nh - ph)), 6)"
            )
        )
    )
    return ann.select(
        "hour", "event_type", F.col("v").alias("v_known"),
        interp.alias("v_interp"),
    )


INTERPOLATE_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6)
           AS v
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
), grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
), filled AS (
  SELECT g.hour, t.event_type, h.v
  FROM grid g
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
  LEFT JOIN hourly h ON h.hour = g.hour AND h.event_type = t.event_type
), ann AS (
  SELECT hour, event_type, v, epoch(hour) AS eh,
    LAST_VALUE(v IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY hour
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    LAST_VALUE(CASE WHEN v IS NOT NULL THEN epoch(hour) END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY hour
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
    FIRST_VALUE(v IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY hour
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN epoch(hour) END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY hour
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM filled
)
SELECT hour, event_type, v AS v_known,
  CASE WHEN v IS NOT NULL THEN v
       WHEN pv IS NULL THEN nv
       WHEN nv IS NULL THEN pv
       ELSE ROUND(pv + (nv - pv) * (CAST(eh - ph AS DOUBLE) / (nh - ph)), 6)
  END AS v_interp
FROM ann
"""


# --------------------------------------------------------------------------
# Governance: masking export + k-anonymity risk report
# --------------------------------------------------------------------------


def customer_masked_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-masked export of the customer table — the governance shape for
    sharing data outside its trust boundary: direct identifiers are
    masked (letters→X/x, digits→n — the ``F.mask`` convention, emitted
    as explicit regex rewrites so the rule is engine-portable), the key
    is replaced by a keyed-hash pseudonym (joinable across masked
    exports, not reversible), and quasi-identifiers are generalized
    (balance → coarse band) rather than dropped.  All map-side
    expressions — masking a 100 TB table is scan-speed."""
    cust = load_table(spark, sf_dir, "customer")
    masked_name = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("c_name"), "[A-Z]", "X"), "[a-z]", "x"
        ),
        "[0-9]",
        "n",
    )
    pseudonym = F.md5(F.concat(F.lit("pepper-2026:"), F.col("c_custkey")))
    band = (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("bigint")
    return cust.select(
        pseudonym.alias("customer_pseudonym"),
        masked_name.alias("c_name_masked"),
        F.col("c_nationkey"),
        band.alias("acctbal_band"),
        F.col("c_mktsegment"),
    )


MASKED_EXPORT_ORACLE = """
SELECT md5('pepper-2026:' || CAST(c_custkey AS VARCHAR)) AS customer_pseudonym,
       regexp_replace(regexp_replace(regexp_replace(
         c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
         AS c_name_masked,
       c_nationkey,
       CAST(FLOOR(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_band,
       c_mktsegment
FROM customer
"""


_KANON_K = 5


def customer_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk report over the masked export's quasi-identifier
    tuple (nation, balance band, segment): every equivalence class with
    its size and whether it violates k=5 — the classes a release
    process must suppress or generalize further, since a member of a
    size-1 class is re-identifiable from the quasi-identifiers alone.
    One hash aggregate on the QI tuple; at 100 TB this is the same
    shape as any groupBy-count."""
    cust = load_table(spark, sf_dir, "customer")
    band = (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("bigint")
    return (
        cust.select(
            "c_nationkey",
            band.alias("acctbal_band"),
            "c_mktsegment",
        )
        .groupBy("c_nationkey", "acctbal_band", "c_mktsegment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("class_size"))
        .withColumn("violates_k", F.col("class_size") < _KANON_K)
    )


KANONYMITY_ORACLE = f"""
SELECT c_nationkey,
       CAST(FLOOR(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_band,
       c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS class_size,
       COUNT(*) < {_KANON_K} AS violates_k
FROM customer
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# Temperature-weighted source mixture (multilingual sampling standard)
# --------------------------------------------------------------------------

_MIX_ALPHA = 0.7


def source_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-reweighted sampling proportions per source:
    ``q_s ∝ p_s^α`` with α=0.7 — the standard that upsamples the tail
    (small sources/languages) without flattening the head (mBERT/XLM-R
    convention).  ``p_s`` is each source's share of corpus tokens.

    Exactness: token counts are exact integers; the one ``POW`` per
    source is rounded at 6 dp, and the normalizing sum over the BOUNDED
    source domain is DECIMAL-exact.  One token-count aggregate + one
    broadcast of the per-source table — nothing else scales with the
    corpus."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.sum(TXT.token_count("text")).cast("bigint").alias("n_tokens")
    )
    totals = per_source.agg(F.sum("n_tokens").alias("t_tokens"))
    powed = per_source.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_tokens",
        F.expr(
            f"ROUND(POW(CAST(n_tokens AS DOUBLE) / t_tokens, {_MIX_ALPHA!r}), 6)"
        ).alias("p_alpha"),
    )
    z = powed.agg(
        F.expr("SUM(CAST(p_alpha AS DECIMAL(28,12)))").alias("z")
    )
    return powed.crossJoin(F.broadcast(z)).select(
        "source",
        "n_tokens",
        F.expr("ROUND(p_alpha / CAST(z AS DOUBLE), 6)").alias("mix_weight"),
    )


TEMPERATURE_MIX_ORACLE = f"""
WITH per_source AS (
  SELECT source,
         CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), totals AS (SELECT SUM(n_tokens) AS t_tokens FROM per_source),
powed AS (
  SELECT source, n_tokens,
         ROUND(POW(CAST(n_tokens AS DOUBLE) / t_tokens, {_MIX_ALPHA!r}), 6)
           AS p_alpha
  FROM per_source CROSS JOIN totals
), z AS (SELECT SUM(CAST(p_alpha AS DECIMAL(28,12))) AS z FROM powed)
SELECT source, n_tokens, ROUND(p_alpha / CAST(z AS DOUBLE), 6) AS mix_weight
FROM powed CROSS JOIN z
"""


# --------------------------------------------------------------------------
# Laplace-mechanism count release (deterministic noise derivation)
# --------------------------------------------------------------------------

_DP_EPSILON = 1.0


def dp_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism count release per market segment: noisy_count =
    count + Lap(1/ε) via inverse-CDF, ε=1 (sensitivity 1 per customer).

    The noise draw here is derived from a keyed hash of the group
    (``u = (md5_32(key) mod M)/M - 0.5``, ``noise = -b·sign(u)·ln(1-2|u|)``)
    instead of an RNG — the same determinism trade as the Poissonized
    bootstrap: it makes the MECHANISM (sensitivity math, inverse-CDF
    transform, post-processing) engine-reproducible and oracle-checked,
    while a production release would swap in a sealed RNG draw per
    query (hash-derived noise is predictable to anyone who knows the
    key, so this exact form is NOT a privacy guarantee).  Map-side after
    one count aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    counts = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    b = 1.0 / _DP_EPSILON
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("dp-seed:"), F.col("c_mktsegment"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    mod = 1_000_003
    # +1 / +2 keeps u strictly inside (-0.5, 0.5): u = -0.5 exactly
    # (h % mod == 0) would put LN(1 - 2|u|) at LN(0) = -inf
    u = F.expr(f"(h % {mod} + 1) / {float(mod + 2)!r} - 0.5")
    noise = F.expr(
        f"ROUND(-{b!r} * SIGN(u) * LN(1.0 - 2.0 * ABS(u)), 6)"
    )
    return (
        counts.withColumn("h", h)
        .withColumn("u", u)
        .withColumn("noise", noise)
        .select(
            "c_mktsegment",
            "true_count",
            F.expr("ROUND(true_count + noise, 6)").alias("released_count"),
        )
    )


DP_COUNTS_ORACLE = f"""
WITH counts AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM customer GROUP BY c_mktsegment
), seeded AS (
  SELECT c_mktsegment, true_count,
         ('0x' || substr(md5('dp-seed:' || c_mktsegment), 1, 8))::BIGINT
           AS h
  FROM counts
), noised AS (
  SELECT c_mktsegment, true_count,
         (h % {1_000_003} + 1) / {float(1_000_005)!r} - 0.5 AS u
  FROM seeded
)
SELECT c_mktsegment, true_count,
       ROUND(true_count +
             ROUND(-{1.0!r} * SIGN(u) * LN(1.0 - 2.0 * ABS(u)), 6), 6)
         AS released_count
FROM noised
"""


# --------------------------------------------------------------------------
# Strict-order funnel (view -> click -> purchase) and LOO target encoding
# --------------------------------------------------------------------------


def funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-sequence funnel: per user, the first view, the first click
    AFTER that view, the first purchase AFTER that click — stage
    timestamps must be strictly ordered, so a click preceding any view
    does not count (the sequencing discipline ``funnel_view_to_purchase``
    does not impose).  Output is the stage-count matrix with conversion
    rates.

    Plan: three conditional min-aggregations chained by user-key joins —
    each stage is one shuffle on user_id over an already-filtered event
    slice; no window over full event history, no per-user explode."""
    events = load_table(spark, sf_dir, "events")
    v = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        events.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_full_funnel")))
    )
    return counts.select(
        F.col("n_view").cast("bigint").alias("n_view"),
        F.col("n_view_click").cast("bigint").alias("n_view_click"),
        F.col("n_full_funnel").cast("bigint").alias("n_full_funnel"),
        F.expr(
            "ROUND(CAST(n_view_click AS DOUBLE) / n_view, 6)"
        ).alias("view_to_click_rate"),
        F.expr(
            "ROUND(CAST(n_full_funnel AS DOUBLE) / n_view_click, 6)"
        ).alias("click_to_purchase_rate"),
    )


FUNNEL3_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.v_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_full_funnel,
       ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
             / (SELECT COUNT(*) FROM v), 6) AS view_to_click_rate,
       ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
             / (SELECT COUNT(*) FROM c), 6) AS click_to_purchase_rate
"""


def orders_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target (mean) encoding of the order-priority
    category against total price — the ML featurization that replaces a
    categorical with its target mean WITHOUT leaking each row's own
    label into its feature: ``(group_sum − x) / (group_n − 1)``.

    Exactness: the group sum is DECIMAL (order-independent); the
    per-row subtraction/division are identical doubles.  Singleton
    groups yield NULL (no peers to average — the honest answer, not 0).
    One window shuffle on the category, no self-join."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    wp = W.partitionBy("o_orderpriority")
    gs = F.expr("SUM(CAST(o_totalprice AS DECIMAL(28,6)))").over(wp)
    gn = F.count(F.lit(1)).over(wp)
    loo = F.when(
        gn > 1,
        F.expr(
            "ROUND((CAST(gs AS DOUBLE) - o_totalprice) / (gn - 1), 6)"
        ),
    )
    return (
        orders.select(
            "o_orderkey", "o_orderpriority", "o_totalprice",
            gs.alias("gs"), gn.alias("gn"),
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            loo.alias("priority_target_enc"),
        )
    )


TARGET_ENCODING_ORACLE = """
WITH g AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         SUM(CAST(o_totalprice AS DECIMAL(28,6)))
           OVER (PARTITION BY o_orderpriority) AS gs,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS gn
  FROM orders
)
SELECT o_orderkey, o_orderpriority,
       CASE WHEN gn > 1
            THEN ROUND((CAST(gs AS DOUBLE) - o_totalprice) / (gn - 1), 6)
       END AS priority_target_enc
FROM g
"""


# --------------------------------------------------------------------------
# RFM segmentation and ABC (Pareto) classification — canonical BI shapes
# --------------------------------------------------------------------------


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency (days since last order,
    against the global max order date), frequency (order count) and
    monetary (exact decimal revenue), each quartiled with ``ntile(4)``
    into the classic 3-digit RFM code.  Tie-breaks ride the customer key
    so the ntile assignment is a total order — identical across engines
    and partitionings.  The three global quartile codes are computed by
    the exact two-phase distributed rank (``functions.distrank``):
    range-repartition on each dimension, per-partition offsets, ntile
    from ``(global_rank, total)`` arithmetic — bit-identical to a global
    ``ntile(4)`` window with NO single-partition WindowExec, so the plan
    stays parallel at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    d = _rfm_quartiles(_rfm_per_cust(orders))
    return d.select(
        "o_custkey", "r_days", "n_orders", "monetary", "r_q", "f_q", "m_q"
    ).withColumn(
        "rfm_code",
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q")).cast("int"),
    )


def _rfm_per_cust(orders: DataFrame) -> DataFrame:
    """Per-customer R/F/M raw dimensions over an orders slice: recency
    against the SLICE's own max order date (1-row broadcast), exact
    decimal monetary total."""
    mx = orders.agg(F.max("o_orderdate").alias("mx"))
    return (
        orders.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.min(
                F.datediff(F.col("mx"), F.col("o_orderdate"))
            ).cast("bigint").alias("r_days"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)"
            ).alias("monetary"),
        )
    )


def _rfm_quartiles(per_cust: DataFrame) -> DataFrame:
    """Quartile-code each RFM dimension with the exact two-phase
    distributed ntile (customer-key tie-break = total order)."""
    d = per_cust
    for dim, direction, q_col in (
        ("r_days", "asc", "r_q"),
        ("n_orders", "desc", "f_q"),
        ("monetary", "desc", "m_q"),
    ):
        d = DR.two_phase_rank(d, [(dim, direction), ("o_custkey", "asc")])
        d = d.withColumn(
            q_col, DR.ntile_from_rank("__rn", "__grp_n", 4).cast("bigint")
        ).drop("__rn", "__grp_n")
    return d


RFM_ORACLE = """
WITH mx AS (SELECT MAX(o_orderdate) AS mx FROM orders),
per_cust AS (
  SELECT o_custkey,
         CAST(MIN(date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(mx AS DATE))) AS BIGINT) AS r_days,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS monetary
  FROM orders CROSS JOIN mx GROUP BY o_custkey
)
SELECT o_custkey, r_days, n_orders, monetary,
       ntile(4) OVER (ORDER BY r_days ASC, o_custkey ASC) AS r_q,
       ntile(4) OVER (ORDER BY n_orders DESC, o_custkey ASC) AS f_q,
       ntile(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_q,
       CAST(ntile(4) OVER (ORDER BY r_days ASC, o_custkey ASC) * 100
            + ntile(4) OVER (ORDER BY n_orders DESC, o_custkey ASC) * 10
            + ntile(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS INT)
         AS rfm_code
FROM per_cust
"""


_RFM_SPLIT_DATE = "1995-06-01"


def rfm_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segment-migration matrix: the churn artifact a marketing
    analyst asks for right after ``customer_rfm_segments`` — how
    customers MOVE between RFM segments across two periods.  The order
    history splits at a fixed date; each period independently computes
    the 3-digit RFM code (recency against that period's own max order
    date, quartiles via the exact two-phase distributed ntile —
    ``functions.distrank``, no single-partition window); customers
    active in BOTH periods inner-join on the customer key and the
    matrix is one (code_p1, code_p2) count — at most 64x64 cells
    regardless of data size.

    Scale shape: two independent aggregate+rank chains (each the
    audited ``customer_rfm_segments`` plan), one customer-keyed
    equi-join, one bounded-domain count.  Period membership is a
    pushdown-able date predicate on the scan.  Single-period-only
    customers (churned / newly acquired) are intentionally excluded —
    they have no transition; their counts are readable from the
    per-period segment frames."""
    orders = load_table(spark, sf_dir, "orders")
    split = F.lit(_RFM_SPLIT_DATE).cast("date")

    def codes(sliced: DataFrame, out: str) -> DataFrame:
        d = _rfm_quartiles(_rfm_per_cust(sliced))
        return d.select(
            "o_custkey",
            (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
            .cast("int")
            .alias(out),
        )

    p1 = codes(orders.where(F.col("o_orderdate") < split), "rfm_p1")
    p2 = codes(orders.where(F.col("o_orderdate") >= split), "rfm_p2")
    return (
        p1.join(p2, "o_custkey")
        .groupBy("rfm_p1", "rfm_p2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
    )


def _rfm_period_code_sql(pred: str) -> str:
    return f"""
  SELECT o_custkey,
         CAST(ntile(4) OVER (ORDER BY r_days ASC, o_custkey ASC) * 100
              + ntile(4) OVER (ORDER BY n_orders DESC, o_custkey ASC) * 10
              + ntile(4) OVER (ORDER BY monetary DESC, o_custkey ASC)
              AS INT) AS code
  FROM (
    SELECT o_custkey,
           CAST(MIN(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(mx AS DATE))) AS BIGINT) AS r_days,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
             AS monetary
    FROM (SELECT * FROM orders WHERE {pred}) o
    CROSS JOIN (SELECT MAX(o_orderdate) AS mx FROM orders WHERE {pred})
    GROUP BY o_custkey
  )"""


RFM_MIGRATION_ORACLE = f"""
WITH p1 AS ({_rfm_period_code_sql(
    f"CAST(o_orderdate AS DATE) < DATE '{_RFM_SPLIT_DATE}'")}
), p2 AS ({_rfm_period_code_sql(
    f"CAST(o_orderdate AS DATE) >= DATE '{_RFM_SPLIT_DATE}'")}
)
SELECT p1.code AS rfm_p1, p2.code AS rfm_p2,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM p1 JOIN p2 USING (o_custkey)
GROUP BY 1, 2
"""


def part_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: parts ranked by revenue, cumulative
    share of total revenue (exact decimal running sum — the share is the
    ONLY double), class A up to 80%, B to 95%, C beyond — the inventory
    prioritization standard.  One aggregate shuffle, then the exact
    two-phase distributed running sum (``functions.distrank``): range
    repartition on (revenue desc, partkey), per-partition decimal prefix
    offsets, cum = offset + local cumsum — bit-identical to the global
    ordered window with no single-partition stage, and the grand total
    falls out of the same offset pass (no second scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.expr(
            "SUM(CAST(l_extendedprice * (1.0 - l_discount)"
            " AS DECIMAL(28,6)))"
        ).alias("rev_dec")
    )
    ranked = DR.two_phase_rank(
        rev,
        [("rev_dec", "desc"), ("l_partkey", "asc")],
        sum_col="rev_dec",
        cum_col="cum",
        sum_total_col="tot",
    )
    share = F.expr("ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 8)")
    out = ranked.select(
        "l_partkey",
        F.expr("CAST(rev_dec AS DOUBLE)").alias("revenue"),
        share.alias("cum_share"),
    )
    return out.withColumn(
        "abc_class",
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C"),
    )


ABC_ORACLE = """
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)))
           AS rev_dec
  FROM lineitem GROUP BY l_partkey
), tot AS (SELECT SUM(rev_dec) AS tot FROM rev),
c AS (
  SELECT l_partkey, rev_dec,
         SUM(rev_dec) OVER (ORDER BY rev_dec DESC, l_partkey ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM rev
)
SELECT l_partkey, CAST(rev_dec AS DOUBLE) AS revenue,
       ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 8) AS cum_share,
       CASE WHEN ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 8) <= 0.8
            THEN 'A'
            WHEN ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 8) <= 0.95
            THEN 'B'
            ELSE 'C' END AS abc_class
FROM c CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# Cross-table FK integrity matrix and the corpus dataset card
# --------------------------------------------------------------------------

_FK_RELATIONS = [
    ("lineitem.l_orderkey", "orders.o_orderkey"),
    ("lineitem.l_partkey", "part.p_partkey"),
    ("lineitem.l_suppkey", "supplier.s_suppkey"),
    ("orders.o_custkey", "customer.c_custkey"),
    ("customer.c_nationkey", "nation.n_nationkey"),
    ("supplier.s_nationkey", "nation.n_nationkey"),
    ("nation.n_regionkey", "region.r_regionkey"),
]


def fk_integrity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity sweep across EVERY foreign key of the star
    schema in one result: per relation, the child row count and how many
    child rows point at a missing parent — the single gate a load
    pipeline checks after ingest (``fk_orphan_check`` is the one-edge
    version).  Each relation is ONE key-projected LEFT OUTER join +
    fused aggregate — ``count(*)`` gives the child rows, counting null
    parent keys gives the orphans, so every child table is scanned once
    per relation (not twice as a separate COUNT + anti-join would) —
    and the seven little aggregates union into one frame.  Parents are
    dedup-projected dimension keys (broadcast at any realistic scale)."""
    out = None
    for child, parent in _FK_RELATIONS:
        c_tbl, c_col = child.split(".")
        p_tbl, p_col = parent.split(".")
        ch = load_table(spark, sf_dir, c_tbl).select(c_col)
        pa = load_table(spark, sf_dir, p_tbl).select(p_col).distinct()
        rel = (
            ch.join(pa, ch[c_col] == pa[p_col], "left_outer")
            .agg(
                F.count(F.lit(1)).alias("n_child_rows"),
                F.count(F.when(pa[p_col].isNull(), 1)).alias("n_orphans"),
            )
            .select(
                F.lit(f"{child}->{parent}").alias("relation"),
                F.col("n_child_rows").cast("bigint").alias("n_child_rows"),
                F.col("n_orphans").cast("bigint").alias("n_orphans"),
                (F.col("n_orphans") == 0).alias("intact"),
            )
        )
        out = rel if out is None else out.unionByName(rel)
    return out


def _fk_matrix_oracle() -> str:
    parts = []
    for child, parent in _FK_RELATIONS:
        c_tbl, c_col = child.split(".")
        p_tbl, p_col = parent.split(".")
        parts.append(f"""
SELECT '{child}->{parent}' AS relation,
       CAST((SELECT COUNT(*) FROM {c_tbl}) AS BIGINT) AS n_child_rows,
       CAST((SELECT COUNT(*) FROM {c_tbl} c
             LEFT JOIN (SELECT DISTINCT {p_col} FROM {p_tbl}) p
               ON c.{c_col} = p.{p_col}
             WHERE p.{p_col} IS NULL) AS BIGINT) AS n_orphans,
       (SELECT COUNT(*) FROM {c_tbl} c
        LEFT JOIN (SELECT DISTINCT {p_col} FROM {p_tbl}) p
          ON c.{c_col} = p.{p_col}
        WHERE p.{p_col} IS NULL) = 0 AS intact""")
    return "\nUNION ALL\n".join(parts)


FK_MATRIX_ORACLE = _fk_matrix_oracle()


def documents_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row dataset card a training corpus ships with (the
    HF-datasheet stats block): document and exact token counts, the
    exact-duplicate rate, language-distribution entropy (nats), and
    mean document length.  Everything reduces to exact integer
    sufficient statistics; the entropy's per-language ``p·ln p`` terms
    are the only transcendentals (ROUND 6, decimal-summed over the
    bounded language domain).  Two scans total (corpus stats + language
    histogram): the corpus total rides the histogram as a window over
    the grouped frame — bounded by the language domain, so the
    unpartitioned window is over ~tens of rows, never data-sized — and
    no joins against data-sized state."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    base = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(TXT.token_count("text")).cast("bigint").alias("n_tokens"),
        F.countDistinct(F.md5("text")).cast("bigint").alias("n_distinct_texts"),
    )
    lang_terms = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("nt", F.sum("n").over(W.partitionBy()))
        .select(
            F.expr(
                "CAST(ROUND(-(n / CAST(nt AS DOUBLE))"
                " * LN(n / CAST(nt AS DOUBLE)), 6) AS DECIMAL(28,12))"
            ).alias("term")
        )
        .agg(F.expr("ROUND(CAST(SUM(term) AS DOUBLE), 6)").alias("lang_entropy"))
    )
    return base.crossJoin(F.broadcast(lang_terms)).select(
        "n_docs",
        "n_tokens",
        (F.col("n_docs") - F.col("n_distinct_texts")).cast("bigint").alias(
            "n_exact_dups"
        ),
        F.expr(
            "ROUND((n_docs - n_distinct_texts) / CAST(n_docs AS DOUBLE), 6)"
        ).alias("dup_rate"),
        "lang_entropy",
        F.expr("ROUND(n_tokens / CAST(n_docs AS DOUBLE), 4)").alias(
            "mean_doc_tokens"
        ),
    )


DATASET_CARD_ORACLE = f"""
WITH base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
  FROM documents
), lt AS (
  SELECT CAST(ROUND(-(n / CAST(nt AS DOUBLE)) * LN(n / CAST(nt AS DOUBLE)), 6)
              AS DECIMAL(28,12)) AS term
  FROM (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang)
  CROSS JOIN (SELECT COUNT(*) AS nt FROM documents)
), ent AS (
  SELECT ROUND(CAST(SUM(term) AS DOUBLE), 6) AS lang_entropy FROM lt
)
SELECT n_docs, n_tokens,
       CAST(n_docs - n_distinct_texts AS BIGINT) AS n_exact_dups,
       ROUND((n_docs - n_distinct_texts) / CAST(n_docs AS DOUBLE), 6)
         AS dup_rate,
       lang_entropy,
       ROUND(n_tokens / CAST(n_docs AS DOUBLE), 4) AS mean_doc_tokens
FROM base CROSS JOIN ent
"""


# --------------------------------------------------------------------------
# BM25 retrieval scoring — the lexical ranking baseline next to the
# embedding ANN stack
# --------------------------------------------------------------------------

_BM25_TERMS = ("join", "hash", "vector")
_BM25_K1 = "CAST(1.2 AS DOUBLE)"
_BM25_B = "CAST(0.75 AS DOUBLE)"


def doc_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (Robertson et al., TREC-3) over whitespace tokens for a
    fixed query — the exact lexical-retrieval baseline a RAG/eval
    pipeline ranks against its embedding ANN results.  Lucene's
    non-negative idf variant ``LN(1 + (N - df + 0.5)/(df + 0.5))``.

    Exactness policy: every constant CAST to DOUBLE in both engines, one
    ROUND(6) after the LN, per-(doc, term) weights ROUND(12) into
    DECIMAL(28,12) before the per-doc sum so aggregation order never
    matters.  Plan: one explode filtered to the query terms (tf), one
    narrow token-count projection (dl: doc length + the 1-row corpus
    stats), term df from the tf frame itself — no data-sized state
    beyond the (matched-doc × query-term) frame, everything keyed and
    parallel."""
    docs = load_table(spark, sf_dir, "documents")
    qt = spark.createDataFrame(
        [(0, t) for t in _BM25_TERMS], "query_id: int, term: string"
    )
    return TXT.bm25_scores(docs, qt, k1=1.2, b=0.75).select(
        "doc_id", "n_terms", "bm25"
    )


_BM25_IN = ", ".join(f"'{t}'" for t in _BM25_TERMS)

BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
), dl AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS dl FROM documents
), stats AS (
  SELECT COUNT(*) AS n, SUM(dl) AS sum_dl FROM dl
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
  WHERE tok IN ({_BM25_IN}) GROUP BY doc_id, tok
), dfreq AS (
  SELECT tok, COUNT(*) AS dft FROM tf GROUP BY tok
), idf AS (
  SELECT tok,
         ROUND(LN(CAST(1 AS DOUBLE)
               + (CAST(n AS DOUBLE) - CAST(dft AS DOUBLE) + CAST(0.5 AS DOUBLE))
               / (CAST(dft AS DOUBLE) + CAST(0.5 AS DOUBLE))), 6) AS idf,
         CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE) AS avgdl
  FROM dfreq CROSS JOIN stats
), terms AS (
  SELECT t.doc_id,
         CAST(ROUND(i.idf * (CAST(t.tf AS DOUBLE) * ({_BM25_K1} + CAST(1 AS DOUBLE)))
              / (CAST(t.tf AS DOUBLE) + {_BM25_K1} * (CAST(1 AS DOUBLE) - {_BM25_B}
                 + {_BM25_B} * CAST(d.dl AS DOUBLE) / i.avgdl)), 12)
              AS DECIMAL(28,12)) AS w
  FROM tf t JOIN idf i USING (tok) JOIN dl d USING (doc_id)
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
       ROUND(CAST(SUM(w) AS DOUBLE), 6) AS bm25
FROM terms GROUP BY doc_id
"""


def part_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part local clustering coefficient over the co-purchase graph
    (``graph.local_clustering_coefficient``): parts whose co-purchase
    neighborhoods are near-cliques anchor coherent product communities;
    low-lcc high-degree parts are cross-category hubs.  Same capped,
    min-support edge build as ``part_pagerank``; the SQL twin replays
    the degree-ordered triangle enumeration exactly."""
    from df_to_azure_spark.functions.graph import local_clustering_coefficient

    return local_clustering_coefficient(
        _part_edges(spark, sf_dir).localCheckpoint()
    )


PART_CLUSTERING_ORACLE = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sized AS (
  SELECT l_orderkey FROM li GROUP BY l_orderkey
  HAVING COUNT(*) <= {_PR_MAX_BASKET}
), pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN sized s ON a.l_orderkey = s.l_orderkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_PR_MIN_SUPPORT}
), und AS (
  SELECT pa AS a, pb AS b FROM pairs
), deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
), ori AS (
  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
              THEN u.a ELSE u.b END AS u,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
              THEN u.b ELSE u.a END AS v
  FROM und u
  JOIN deg da ON u.a = da.node
  JOIN deg db ON u.b = db.node
), wed AS (
  SELECT w1.u AS p, w1.v AS x, w2.v AS y
  FROM ori w1 JOIN ori w2 ON w1.u = w2.u AND w1.v < w2.v
), tri AS (
  SELECT p, x, y FROM wed w
  WHERE EXISTS (SELECT 1 FROM ori c
                WHERE least(c.u, c.v) = w.x AND greatest(c.u, c.v) = w.y)
), tn AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
    SELECT p AS node FROM tri
    UNION ALL SELECT x FROM tri
    UNION ALL SELECT y FROM tri
  ) GROUP BY node
)
SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
       CAST(COALESCE(tn.n_tri, 0) AS BIGINT) AS n_tri,
       CASE WHEN d.deg >= 2 THEN
         ROUND(CAST(2 AS DOUBLE) * CAST(COALESCE(tn.n_tri, 0) AS DOUBLE)
               / (CAST(d.deg AS DOUBLE) * CAST(d.deg - 1 AS DOUBLE)), 6)
       ELSE CAST(0 AS DOUBLE) END AS lcc
FROM deg d LEFT JOIN tn ON d.node = tn.node
"""
