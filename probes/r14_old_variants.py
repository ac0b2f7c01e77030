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
