"""Frozen pre-round-14 variants used as the A side of interleaved A/B
probes (see probes/ab_r14.py).  Each function replays the OLD plan shape
byte-for-byte so the probe measures exactly the structural change under
test; the B side is the live library code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from df_to_azure_spark.functions.similarity import (
    _as_double,
    _pin,
    cosine,
    hyperplane_bucket,
    ivf_assign,
)
from df_to_azure_spark.sources.tables import load_table


def old_nn_descent_graph(
    corpus: DataFrame,
    centroids=None,
    k: int = 5,
    init_cap: int = 8,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: str = "persist",
    planes=None,
) -> DataFrame:
    """Pre-r14 nn_descent_graph: distinct + self-join pair generation."""
    cell = (
        ivf_assign(F.col("vv"), centroids)
        if centroids is not None
        else hyperplane_bucket(F.col("vv"), planes)
    )
    v = _pin(
        corpus.select(
            F.col(id_col).alias("nid"), _as_double(vec_col).alias("vv")
        ).select("nid", "vv", cell.alias("cid")),
        checkpoint,
    )
    ranked = v.select("cid", "nid").withColumn(
        "rn", F.row_number().over(W.partitionBy("cid").orderBy("nid"))
    )
    sizes = ranked.groupBy("cid").agg(F.count(F.lit(1)).cast("int").alias("m"))
    ring = (
        ranked.join(sizes, "cid")
        .select(
            "cid",
            F.col("nid").alias("u"),
            "rn",
            "m",
            F.explode(F.sequence(F.lit(1), F.lit(init_cap))).alias("o"),
        )
        .where(F.col("o") <= F.col("m") - 1)
        .select(
            "cid", "u",
            (((F.col("rn") - 1 + F.col("o")) % F.col("m")) + 1).alias("trn"),
        )
        .join(
            ranked.select(
                "cid", F.col("nid").alias("w"), F.col("rn").alias("trn")
            ),
            ["cid", "trn"],
        )
        .select("u", "w")
    )

    vu = v.select(F.col("nid").alias("u"), F.col("vv").alias("uv"))
    vw = v.select(F.col("nid").alias("w"), F.col("vv").alias("wv"))

    def _score(pairs: DataFrame) -> DataFrame:
        return (
            pairs.join(vu, "u")
            .join(vw, "w")
            .select(
                "u", "w",
                F.round(cosine(F.col("uv"), F.col("wv")), 8).alias("cos_sim"),
            )
        )

    def _topk(scored: DataFrame) -> DataFrame:
        wq = W.partitionBy("u").orderBy(F.desc("cos_sim"), F.asc("w"))
        return (
            scored.withColumn("rank", F.row_number().over(wq))
            .where(F.col("rank") <= k)
        )

    b = _pin(_topk(_score(ring)), checkpoint)
    for _ in range(rounds):
        rev = _topk(
            b.select(
                F.col("w").alias("u"), F.col("u").alias("w"), "cos_sim"
            )
        )
        l_nbrs = (
            b.select(F.col("u").alias("node"), F.col("w").alias("nbr"))
            .union(rev.select(F.col("u").alias("node"), F.col("w").alias("nbr")))
            .distinct()
        )
        co = (
            l_nbrs.alias("a")
            .join(l_nbrs.alias("b"), "node")
            .select(F.col("a.nbr").alias("u"), F.col("b.nbr").alias("w"))
            .where(F.col("u") != F.col("w"))
        )
        pool = co.union(b.select("u", "w")).distinct()
        b = _pin(_topk(_score(pool)), checkpoint)
    return b.select(
        F.col("u").alias(id_col),
        F.col("rank").cast("int").alias("rank"),
        F.col("w").alias("neighbor_id"),
        "cos_sim",
    )


def old_nn_descent_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.plans import training_data as TD

    return old_nn_descent_graph(
        TD._nnd_view(spark, sf_dir), planes=TD._nnd_planes(), k=TD._NND_K,
        init_cap=TD._NND_CAP, rounds=TD._NND_ROUNDS, checkpoint="local",
    )


def old_tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_m: int = 15,
    threshold: float = 0.3,
    hot_df_cap=None,
    term_shingle_n=None,
) -> DataFrame:
    """Pre-r14 tfidf_cosine_pairs: dfreq groupBy + join back onto per_tok."""
    from df_to_azure_spark.functions.dedup import _spread, shingles, tokens

    term = (
        tokens(text_col)
        if term_shingle_n is None
        else shingles(text_col, term_shingle_n)
    )
    per_tok = (
        _spread(df).select(F.col(id_col), F.explode(term).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = per_tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df_tok"))
    if hot_df_cap is not None:
        dfreq = dfreq.where(F.col("df_tok") <= int(hot_df_cap))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_corpus"))
    weighted = (
        per_tok.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "w",
            F.expr(
                "ROUND(tf * ROUND(LN(CAST(n_corpus AS DOUBLE)"
                " / CAST(df_tok AS DOUBLE)), 12), 8)"
            ),
        )
        .select(id_col, "tok", "w")
    )
    win = W.partitionBy(id_col).orderBy(F.desc("w"), F.asc("tok"))
    kept = (
        weighted.withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") <= int(top_m))
        .drop("rk")
        .localCheckpoint()
    )
    norms = kept.groupBy(id_col).agg(
        F.expr(
            "ROUND(SQRT(CAST(SUM(CAST(ROUND(w * w, 10) AS DECIMAL(28,10)))"
            " AS DOUBLE)), 12)"
        ).alias("nrm")
    )
    a = kept.select(
        F.col(id_col).alias("id_a"), "tok", F.col("w").alias("w_a")
    )
    b = kept.select(
        F.col(id_col).alias("id_b"), "tok", F.col("w").alias("w_b")
    )
    dots = (
        a.join(b, "tok")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared_terms"),
            F.expr(
                "CAST(SUM(CAST(ROUND(w_a * w_b, 10) AS DECIMAL(28,10)))"
                " AS DOUBLE)"
            ).alias("dot"),
        )
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("nrm").alias("nrm_a"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("nrm").alias("nrm_b"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("cosine", F.expr("ROUND(dot / (nrm_a * nrm_b), 6)"))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "n_shared_terms", "cosine")
    )


def old_doc_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.plans import pipeline3 as PL3

    docs = load_table(spark, sf_dir, "documents")
    return old_tfidf_cosine_pairs(
        docs,
        top_m=PL3._TFIDF_TOP_M,
        threshold=PL3._TFIDF_THRESHOLD,
        term_shingle_n=PL3._TFIDF_SHINGLE_N,
    )


def old_nb_language_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r14 nb_language_confusion: vocab_n / t_l each re-tokenize the
    train split (3 tokenize passes over train instead of 1)."""
    from df_to_azure_spark.functions import text as TXT
    from df_to_azure_spark.plans.pipeline10 import _NB_DP, _SPLIT_SPARK

    docs = load_table(spark, sf_dir, "documents")
    split = F.expr(_SPLIT_SPARK)
    train = docs.where(split < 80)
    test = docs.where(split >= 80)

    train_tok = train.select("lang", F.explode(TXT.tokens("text")).alias("tok"))
    c_lw = train_tok.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    per_lang = train.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(TXT.token_count("text").cast("bigint")).alias("t_l"),
    )
    vocab_n = train_tok.agg(F.countDistinct("tok").cast("bigint").alias("v"))
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


def old_doc_kn_trigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r14 doc_kn_trigram_surprisal: the tokenize pass runs once per
    split side (train aggregation chain + test scoring stream)."""
    from df_to_azure_spark.functions import text as TXT
    from df_to_azure_spark.functions.sampling import with_split
    from df_to_azure_spark.plans.pipeline9 import _KN3_CLAMP

    docs = with_split(load_table(spark, sf_dir, "documents"), "doc_id")
    toks_arr = docs.select("doc_id", "split", TXT.tokens("text").alias("t"))
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


def old_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r14 dsir: the token explode is evaluated by both the count
    aggregation and the per-doc scoring join."""
    from df_to_azure_spark.functions import text as TXT
    from df_to_azure_spark.plans.pipeline2 import _DSIR_TARGET_SOURCE

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


def old_session_concurrency_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r14 session_concurrency_hourly: the clipped-segment frame
    (and the sessionize chain above it) is re-evaluated by all three
    consumers (two sweep-line union legs + the stats agg)."""
    from df_to_azure_spark.streaming.events import sessionize

    events = load_table(spark, sf_dir, "events")
    sessions = sessionize(events, gap_minutes=30)
    seg = (
        sessions
        .select(
            F.explode(
                F.sequence(
                    F.date_trunc("hour", F.col("session_start")),
                    F.date_trunc("hour", F.col("session_end")),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("hour"),
            "session_start",
            "session_end",
        )
        .select(
            "hour",
            F.greatest("session_start", F.col("hour")).alias("seg_start"),
            F.least(
                "session_end", F.col("hour") + F.expr("INTERVAL 1 HOUR")
            ).alias("seg_end"),
        )
    )
    bounds = seg.select(
        "hour", F.col("seg_start").alias("ts"), F.lit(1).alias("delta")
    ).unionAll(
        seg.select("hour", F.col("seg_end").alias("ts"), F.lit(-1).alias("delta"))
    )
    sweep = W.partitionBy("hour").orderBy(
        F.asc("ts"), F.desc("delta")
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    peaks = bounds.withColumn("running", F.sum("delta").over(sweep)).groupBy(
        "hour"
    ).agg(F.max("running").cast("bigint").alias("peak_concurrency"))
    stats = seg.groupBy("hour").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum(
            F.unix_micros("seg_end") - F.unix_micros("seg_start")
        ).cast("bigint").alias("busy_us"),
    )
    return stats.join(peaks, "hour").select(
        "hour", "n_segments", "peak_concurrency", "busy_us"
    )


def old_suffix_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r14 duplicate_spans_global: the positional-fingerprint explode
    is evaluated by both the occurrence count and the semi-join probe."""
    from df_to_azure_spark.functions.dedup import _spread, shingles

    df = load_table(spark, sf_dir, "documents")
    id_col, text_col, shingle_n, min_span_tokens = "doc_id", "text", 8, 12
    sh = _spread(df).select(
        F.col(id_col),
        F.posexplode(shingles(text_col, shingle_n)).alias("pos0", "s"),
    ).select(
        id_col,
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.conv(F.substring(F.md5("s"), 1, 12), 16, 10).cast("bigint").alias("h"),
    )
    dup = (
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .where(F.col("n_occ") >= 2)
        .select("h")
    )
    marked = sh.join(dup, "h", "left_semi").select(id_col, "pos")
    w = W.partitionBy(id_col).orderBy("pos")
    islands = marked.withColumn("isl", F.col("pos") - F.row_number().over(w))
    spans = islands.groupBy(id_col, "isl").agg(
        F.min("pos").alias("start_pos"),
        (F.count(F.lit(1)) + (shingle_n - 1)).cast("bigint").alias("span_tokens"),
    )
    return spans.where(F.col("span_tokens") >= min_span_tokens).select(
        id_col, "start_pos", "span_tokens"
    )


def nnd_search_ckpt_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current nn_descent_search_knn (checkpoint='local')."""
    from df_to_azure_spark.functions import similarity as SIM
    from df_to_azure_spark.plans import training_data as TD

    emb, graph, queries = TD._nnd_search_graph(spark, sf_dir)
    return SIM.nn_descent_search(
        emb, graph, queries, planes=TD._nnd_planes(), k=TD._NND_SEARCH_K,
        beam=TD._NND_SEARCH_BEAM, hops=TD._NND_SEARCH_HOPS, exclude_self=True,
        checkpoint="local",
    )


def nnd_search_ckpt_none(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate: checkpoint='none' (hop frames are query-batch-bounded)."""
    from df_to_azure_spark.functions import similarity as SIM
    from df_to_azure_spark.plans import training_data as TD

    emb, graph, queries = TD._nnd_search_graph(spark, sf_dir)
    return SIM.nn_descent_search(
        emb, graph, queries, planes=TD._nnd_planes(), k=TD._NND_SEARCH_K,
        beam=TD._NND_SEARCH_BEAM, hops=TD._NND_SEARCH_HOPS, exclude_self=True,
        checkpoint="none",
    )


def old_prefix_filter_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r14-session-2 prefix_filter_jaccard_join: doc sizes via a
    separate groupBy aggregation joined three times (ranking + both
    sides of the final gate)."""
    from df_to_azure_spark.functions.dedup import _spread, shingles
    from df_to_azure_spark.plans import pipeline7 as PL7

    df = load_table(spark, sf_dir, "documents")
    id_col, text_col = "doc_id", "text"
    shingle_n, tn, td = 3, PL7._PF_TAU_NUM, PL7._PF_TAU_DEN
    sh = _spread(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(text_col, shingle_n))).alias("s"),
    ).localCheckpoint()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_s"))
    ranked = (
        sh.join(dfreq, "s")
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy(id_col).orderBy(F.asc("df_s"), F.asc("s"))
            ),
        )
        .join(sizes, id_col)
        .where(F.expr(f"rk <= sz - (({tn} * sz + {td} - 1) DIV {td}) + 1"))
        .select(id_col, "s", "rk", "sz")
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (
                F.least(F.col("a.rk"), F.col("b.rk"))
                + F.least(
                    F.col("a.sz") - F.col("a.rk"),
                    F.col("b.sz") - F.col("b.rk"),
                )
            ).alias("ub_row"),
            (F.col("a.sz") + F.col("b.sz")).alias("sz_sum"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.min("ub_row").alias("ub"), F.min("sz_sum").alias("sz_sum"))
        .where(F.expr(f"({td} + {tn}) * ub >= {tn} * sz_sum"))
        .select("id_a", "id_b")
    )
    sa = sh.select(F.col(id_col).alias("id_a"), F.col("s").alias("s_a"))
    sb = sh.select(F.col(id_col).alias("doc_b"), F.col("s").alias("s_b"))
    inter = (
        cand.join(sa, "id_a")
        .join(
            sb,
            (F.col("id_b") == F.col("doc_b")) & (F.col("s_b") == F.col("s_a")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")),
            "id_b",
        )
        .where(F.expr(f"({td} + {tn}) * n_inter >= {tn} * (sz_a + sz_b)"))
    )
    return out.select(
        "id_a",
        "id_b",
        F.col("n_inter").cast("bigint").alias("n_inter"),
        F.col("sz_a").cast("bigint").alias("sz_a"),
        F.col("sz_b").cast("bigint").alias("sz_b"),
        F.expr(
            "CAST((2000000 * n_inter + (sz_a + sz_b - n_inter))"
            " DIV (2 * (sz_a + sz_b - n_inter)) AS DOUBLE)"
            " / CAST(1000000 AS DOUBLE)"
        ).alias("jaccard"),
    )


def old_bloom_join_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom-filter semi-join prefilter — THE shuffle-elimination
    device for 100 TB joins (ship a kilobyte bitset to the probe side
    instead of shuffling the probe table): build an
    ``m=4096``/``k=3`` filter over the BUILDING-segment
    customer keys, probe every ordering customer, and measure the
    false-positive rate against the exact semi-join, next to the
    ``(1−e^{{−kn/m}})^k`` theoretical rate.

    Portable like the other sketches: bit positions are md5 integer
    arithmetic, the bitset is the ≤ m-row distinct position frame
    (broadcast — exactly how the prefilter deploys), membership is
    ``COUNT(matched positions) = k`` per probe key.  Exact integers
    until the two output rates (one division each; EXP only in the
    theoretical rate, ROUND(6))."""
    build = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"))
        .distinct()
    )
    probe = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    ks = spark.range(3).select(F.col("id").cast("int").alias("j"))
    pos_expr = (
        "CAST(conv(substring(md5(CONCAT(CAST(j AS STRING), '#',"
        " CAST(key AS STRING))), 1, 12), 16, 10) AS BIGINT)"
        f" % {4096}"
    )
    bits = (
        build.crossJoin(F.broadcast(ks))
        .select(F.expr(pos_expr).alias("pos"))
        .distinct()
    )
    probed = (
        probe.crossJoin(F.broadcast(ks))
        .select("key", F.expr(pos_expr).alias("pos"))
        .join(F.broadcast(bits), "pos")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("hits"))
        .where(F.col("hits") == 3)
        .select("key")
    )
    truth = probe.join(build, "key", "left_semi")
    n_build = build.agg(F.count(F.lit(1)).cast("bigint").alias("n_build"))
    n_bits = bits.agg(F.count(F.lit(1)).cast("bigint").alias("n_bits_set"))
    stats = (
        probe.agg(F.count(F.lit(1)).cast("bigint").alias("n_probe"))
        .crossJoin(F.broadcast(probed.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pass"))))
        .crossJoin(F.broadcast(truth.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_true"))))
        .crossJoin(F.broadcast(n_build))
        .crossJoin(F.broadcast(n_bits))
    )
    return stats.select(
        "n_build",
        "n_bits_set",
        "n_probe",
        "n_true",
        "n_pass",
        F.expr("CAST(n_pass - n_true AS BIGINT)").alias("n_false_pos"),
        F.expr(
            "CASE WHEN n_probe = n_true THEN CAST(0 AS DOUBLE)"
            " ELSE ROUND(CAST(n_pass - n_true AS DOUBLE)"
            "      / CAST(n_probe - n_true AS DOUBLE), 6) END"
        ).alias("fp_rate"),
        F.expr(
            f"ROUND(POWER(CAST(1 AS DOUBLE) - EXP(-CAST({3} AS DOUBLE)"
            f" * CAST(n_build AS DOUBLE) / CAST({4096} AS DOUBLE)),"
            f" CAST({3} AS DOUBLE)), 6)"
        ).alias("fp_theoretical"),
    )



def old_ann_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r14-session-2 ann_index_build: both PQ codebook collects run
    serially on the driver BEFORE the thread pool starts the four
    builds."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    from df_to_azure_spark.functions import similarity as SIM
    from df_to_azure_spark.operators.lake import ParquetLake
    from df_to_azure_spark.plans import training_data as TD
    from df_to_azure_spark.plans import pipeline5 as PL5
    from df_to_azure_spark.plans.training_data import (
        _ivf_centroids,
        _lsh_knn_planes,
    )

    root = PL5._ann_index_root(sf_dir)
    lake = ParquetLake(spark, root)
    emb = load_table(spark, sf_dir, "embeddings")
    adc_books = SIM.sample_codebooks(emb, TD._PQ_M, TD._PQ_K)
    rr_books = SIM.sample_codebooks(emb, TD._PQ_RERANK_M, TD._PQ_RERANK_K)
    builds = [
        (SIM.lsh_index(emb, _lsh_knn_planes()), "lsh_index"),
        (SIM.ivf_index(emb, _ivf_centroids()), "ivf_index"),
        (
            SIM.pq_codes(emb, adc_books).withColumnRenamed(
                "vec_id", "neighbor_id"
            ),
            "pq_adc_codes",
        ),
        (
            SIM.pq_codes(emb, rr_books).withColumnRenamed(
                "vec_id", "neighbor_id"
            ),
            "pq_rerank_codes",
        ),
    ]
    with ThreadPoolExecutor(max_workers=len(builds)) as pool:
        futs = [
            pool.submit(lake.write, df, table, method="create")
            for df, table in builds
        ]
        for f in futs:
            f.result()
    with open(os.path.join(root, "COMPLETE"), "w") as fh:
        fh.write(
            f"v{PL5._ANN_INDEX_VERSION} tables={','.join(PL5._ANN_TABLES)}\n"
        )

    def _summary(table, variant, group_cols, checksum):
        df = lake.read(table)
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.countDistinct(*group_cols).cast("bigint").alias("n_groups"),
            F.sum(checksum).cast("bigint").alias("code_checksum"),
        ).select(F.lit(variant).alias("variant"), "*")

    def _pq_checksum(m):
        cs = F.col("code_0").cast("bigint")
        for i in range(1, m):
            cs = cs + F.col(f"code_{i}").cast("bigint") * F.lit(i + 1)
        return cs

    out = _summary("lsh_index", "lsh", [F.col("bucket")], F.col("bucket"))
    out = out.unionByName(
        _summary("ivf_index", "ivf", [F.col("cid")], F.col("cid").cast("bigint"))
    )
    out = out.unionByName(
        _summary(
            "pq_adc_codes",
            "pq_adc",
            [F.col(f"code_{i}") for i in range(TD._PQ_M)],
            _pq_checksum(TD._PQ_M),
        )
    )
    return out.unionByName(
        _summary(
            "pq_rerank_codes",
            "pq_rerank",
            [F.col(f"code_{i}") for i in range(TD._PQ_RERANK_M)],
            _pq_checksum(TD._PQ_RERANK_M),
        )
    )


def old_ann_retrieval_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r14-session-2 ann_retrieval_matrix: both PQ codebook collects
    run serially on the driver before the pin thread pool."""
    from concurrent.futures import ThreadPoolExecutor

    from df_to_azure_spark.functions import similarity as SIM
    from df_to_azure_spark.plans import pipeline5 as PL5
    from df_to_azure_spark.plans import training_data as TD
    from df_to_azure_spark.plans.training_data import (
        _ivf_centroids,
        _lsh_knn_planes,
    )

    K = PL5._IR_K
    lake = PL5._ensure_ann_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    adc_books = SIM.sample_codebooks(emb, TD._PQ_M, TD._PQ_K)
    rr_books = SIM.sample_codebooks(emb, TD._PQ_RERANK_M, TD._PQ_RERANK_K)
    pins = {
        "exact": lambda: SIM.cosine_topk(queries, emb, k=K).localCheckpoint(),
        "lsh": lambda: SIM.lsh_topk_from_index(
            queries, lake.read("lsh_index"), _lsh_knn_planes(), k=K
        ).localCheckpoint(),
        "ivf": lambda: SIM.ivf_topk_from_index(
            queries, lake.read("ivf_index"), _ivf_centroids(), k=K, nprobe=2
        ).localCheckpoint(),
        "pq_adc": lambda: SIM.pq_adc_topk_from_codes(
            queries, lake.read("pq_adc_codes"), adc_books, k=K
        ).localCheckpoint(),
        "pq_rerank": lambda: SIM.pq_rerank_topk_from_codes(
            queries, lake.read("pq_rerank_codes"), emb, rr_books,
            k=K, shortlist=TD._PQ_RERANK_C,
        ).localCheckpoint(),
    }
    with ThreadPoolExecutor(max_workers=len(pins)) as pool:
        futs = {name: pool.submit(fn) for name, fn in pins.items()}
        pinned = {name: f.result() for name, f in futs.items()}
    truth = pinned["exact"].select("query_id", "neighbor_id")
    variants = [
        ("lsh", pinned["lsh"]),
        ("ivf", pinned["ivf"]),
        ("pq_adc", pinned["pq_adc"]),
        ("pq_rerank", pinned["pq_rerank"]),
        (
            "hybrid_rrf",
            SIM.rrf_fuse([pinned["lsh"], pinned["ivf"]], k_const=60, topk=K),
        ),
    ]

    def _eval(name, cand):
        return (
            SIM.retrieval_metrics(truth, cand, k=K)
            .select(F.lit(name).alias("variant"), "*")
            .localCheckpoint()
        )

    with ThreadPoolExecutor(max_workers=len(variants)) as pool:
        evs = [pool.submit(_eval, name, cand) for name, cand in variants]
        frames = [f.result() for f in evs]
    out = frames[0]
    for m in frames[1:]:
        out = out.unionByName(m)
    return out


def old_w18_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file bloom indexes under the hash gate (round-14, verdict
    gap #2): customer gains a high-cardinality hashed ``uid`` and is
    committed UNCLUSTERED with ``bloom_columns=["uid"]`` — every
    file's zone map spans the whole uid range, so min/max pruning is
    useless by construction.  In-entry asserts pin both counts the
    verdict asked for: the same absent-key probe wrapped in an ``or``
    branch (bloom skips or-branches by contract) keeps ALL files —
    zone maps alone prune nothing — while the plain probe opens ≤ 2 of
    8 (k=7, ~1%% FPR per file).  A present-key probe's rows hash-check
    against DuckDB computing the same derived uid."""
    import os
    import shutil
    import tempfile

    from df_to_azure_spark.exceptions import PipelineRunError
    from df_to_azure_spark.operators.manifest import VersionedLake

    customer = load_table(spark, sf_dir, "customer").withColumn(
        "uid", F.expr("c_custkey * 2654435761 % 1000003")
    )
    root = os.path.join(
        tempfile.gettempdir(),
        "dfa_spark_vbloom",
        os.path.basename(sf_dir.rstrip("/")),
    )
    shutil.rmtree(root, ignore_errors=True)
    lake = VersionedLake(spark, root)
    lake.create(
        customer.repartition(8), "customer", bloom_columns=["uid"]
    )
    # the absent probe key must sit INSIDE every file's [min,max] so the
    # premise "zone maps alone keep all files" holds at every SF: at
    # sf0.001 a fixed low anchor (the old 54_321) fell below several
    # files' min and zone maps pruned on their own.  Anchoring near the
    # MEDIAN uid keeps the probe inside each file's envelope — every
    # file holds ~n/8 hash-scattered uids, so its range straddles the
    # median at any n.  Both driver reads are BOUNDED (guide §5 — the
    # former full distinct-uid collect was O(customers)): a mergeable
    # approx-percentile sketch for the anchor, then the first gap among
    # the 200 smallest uids above it (hash-scattered values gap within
    # a handful; the full-collect fallback is for the degenerate case
    # only).  The hash-checked output (present-key probe) is anchor-
    # independent; premise verified 8/8-zone-kept at all three SFs.
    mid = int(
        customer.agg(F.expr("approx_percentile(uid, 0.5, 10000)")).collect()[
            0
        ][0]
    )
    above = [
        r.uid
        for r in customer.select("uid")
        .where(F.col("uid") > mid)
        .distinct()
        .orderBy("uid")
        .limit(200)
        .collect()
    ]
    absent = None
    prev = mid
    for v in above:
        if v > prev + 1:
            absent = prev + 1
            break
        prev = v
    if absent is None:  # degenerate: 200 consecutive uids above the median
        uids = {r.uid for r in customer.select("uid").distinct().collect()}
        absent = next(v for v in range(mid + 1, 2_000_000) if v not in uids)
    lake.scan("customer", [("or", [[("uid", "=", absent)]])])
    zone_kept, total = lake.last_scan_files
    if zone_kept != total:
        raise PipelineRunError(
            f"bloom certification premise broke: zone maps alone kept "
            f"{zone_kept}/{total} files — the layout must make min/max "
            "pruning useless so the bloom is what does the work"
        )
    lake.scan("customer", [("uid", "=", absent)])
    bloom_kept, _ = lake.last_scan_files
    if bloom_kept > 2:
        raise PipelineRunError(
            f"bloom point-lookup pruning regressed: absent key opened "
            f"{bloom_kept}/{total} files (zone maps keep all {total})"
        )
    present = 42 * 2654435761 % 1000003
    return (
        lake.scan("customer", [("uid", "=", present)])
        .select(
            F.col("c_custkey").cast("bigint").alias("c_custkey"),
            F.col("uid").cast("bigint").alias("uid"),
        )
        .orderBy("c_custkey")
    )

