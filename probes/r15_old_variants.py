"""Frozen OLD implementations for round-15 interleaved A/B probes.

Each entry is a (spark, sf_dir) -> DataFrame callable reproducing the
pre-round-15 shape of a query under probe, so ab_r15.py can time
old-vs-new inside one session.  Copied verbatim from HEAD@398caa5 where
noted; kept out of the library so the probe can never leak into a query
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from df_to_azure_spark.functions import similarity as SIM
from df_to_azure_spark.functions.similarity import (
    _as_double,
    _pin,
    cosine,
    hyperplane_bucket,
    ivf_assign,
)


def nn_descent_graph_old(
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
    """similarity.nn_descent_graph as of HEAD@398caa5 — per-pair
    norm recomputation inside cosine()."""
    if (centroids is None) == (planes is None):
        raise ValueError("need exactly one of centroids/planes")
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
        nbrs = (
            b.select(F.col("u").alias("node"), F.col("w").alias("nbr"))
            .union(rev.select(F.col("u").alias("node"), F.col("w").alias("nbr")))
            .groupBy("node")
            .agg(F.collect_set("nbr").alias("nbrs"))
        )
        co = (
            nbrs.select(F.explode("nbrs").alias("u"), "nbrs")
            .select("u", F.explode("nbrs").alias("w"))
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


def nn_descent_knn_graph_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.plans import training_data as TD

    return nn_descent_graph_old(
        TD._nnd_view(spark, sf_dir), planes=TD._nnd_planes(), k=TD._NND_K,
        init_cap=TD._NND_CAP, rounds=TD._NND_ROUNDS, checkpoint="local",
    )


def ivf_pq_residual_knn_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    """plans.training_data.ivf_pq_residual_knn as of HEAD@398caa5 —
    codes + dtable each eagerly pinned (two extra serial jobs)."""
    from df_to_azure_spark.plans import training_data as TD
    from df_to_azure_spark.plans.training_data import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = TD._ivf_centroids()
    res = SIM.residual_frame(
        emb.where(F.col("vec_id") < TD._PQ_M * TD._PQ_K), cents
    )
    books = SIM.sample_codebooks(res, TD._PQ_M, TD._PQ_K, vec_col="rv")
    queries = emb.where(F.col("vec_id") < 5)
    codes = SIM.ivf_pq_codes(emb, cents, books)
    return _old_ivf_pq_residual_topk_from_codes(
        queries, codes.localCheckpoint(), cents, books, k=10,
        nprobe=TD._IVFPQ_NPROBE,
    )


def _old_ivf_pq_residual_topk_from_codes(
    queries, codes, centroids, codebooks, k=10, nprobe=1,
    id_col="vec_id", vec_col="embedding",
):
    """similarity.ivf_pq_residual_topk_from_codes as of HEAD@398caa5 —
    dtable eagerly localCheckpoint'd."""
    from df_to_azure_spark.functions.similarity import dot

    M = len(codebooks)
    sub = len(codebooks[0][0])
    spark = codes.sparkSession
    cent_rows = [(i, [float(x) for x in v]) for i, v in enumerate(centroids)]
    cent = spark.createDataFrame(cent_rows, "cid int, cent array<double>")
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    )
    qd = q.crossJoin(F.broadcast(cent)).select(
        "query_id", "qv", "cid", "cent",
        (
            dot(F.col("qv"), F.col("qv"))
            - 2.0 * dot(F.col("qv"), F.col("cent"))
            + dot(F.col("cent"), F.col("cent"))
        ).alias("cd"),
    )
    wp = W.partitionBy("query_id").orderBy(F.asc("cd"), F.asc("cid"))
    probes = (
        qd.withColumn("pr", F.row_number().over(wp))
        .where(F.col("pr") <= nprobe)
        .select(
            "query_id", "cid",
            F.zip_with("qv", "cent", lambda x, y: x - y).alias("qres"),
        )
    )
    cell_rows = [
        (m, j, [float(x) for x in c])
        for m, cents_ in enumerate(codebooks)
        for j, c in enumerate(cents_)
    ]
    cells = spark.createDataFrame(
        cell_rows, "m int, code int, cell array<double>"
    )
    sv = F.slice(F.col("qres"), F.col("m") * sub + 1, sub)
    dtable = (
        probes.crossJoin(F.broadcast(cells))
        .select(
            "query_id", "cid", "m", "code",
            (
                dot(sv, sv)
                - 2.0 * dot(sv, F.col("cell"))
                + dot(F.col("cell"), F.col("cell"))
            ).alias("d"),
        )
        .localCheckpoint()
    )
    K = len(codebooks[0])
    dmap = dtable.groupBy("query_id").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    (
                        (F.col("cid") * M + F.col("m")) * K + F.col("code")
                    ).alias("k"),
                    F.col("d").alias("v"),
                )
            )
        ).alias("dm")
    )
    scored = codes.join(F.broadcast(dmap))
    adc = F.element_at(
        F.col("dm"), (F.col("cid") * M + F.lit(0)) * K + F.col("code_0")
    )
    for m in range(1, M):
        adc = adc + F.element_at(
            F.col("dm"),
            (F.col("cid") * M + F.lit(m)) * K + F.col(f"code_{m}"),
        )
    scored = (
        scored.where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", F.round(adc, 8).alias("adc_dist")
        )
        .where(F.col("adc_dist").isNotNull())
    )
    w = W.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc_dist")
    )


def ivf_pq_residual_knn_nopin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-15 candidate B: no codes pin at all (checkpoint='none') —
    the whole query is ONE job; the encode subtree has a single
    consumer since the single-map search refactor."""
    from df_to_azure_spark.plans import training_data as TD
    from df_to_azure_spark.plans.training_data import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = TD._ivf_centroids()
    res = SIM.residual_frame(
        emb.where(F.col("vec_id") < TD._PQ_M * TD._PQ_K), cents
    )
    books = SIM.sample_codebooks(res, TD._PQ_M, TD._PQ_K, vec_col="rv")
    queries = emb.where(F.col("vec_id") < 5)
    return SIM.ivf_pq_residual_topk(
        queries, emb, cents, books, k=10, nprobe=TD._IVFPQ_NPROBE,
        checkpoint="none",
    )


def nb_language_confusion_r13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pipeline10.nb_language_confusion as of r13 (0b0e0cf) — train split
    tokenized THREE times (count table, vocabulary, per-language totals);
    for the 10x-scale A/B demonstrating the r14 single-tokenize fold."""
    from df_to_azure_spark.functions import text as TXT
    from df_to_azure_spark.plans.pipeline10 import (
        _NB_DP,
        _SPLIT_SPARK,
        load_table,
    )

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
    )
