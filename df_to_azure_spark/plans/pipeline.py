"""Corpus-preparation pipeline queries — the operations that sit between
raw documents and a training shard: vocabulary statistics, repetition-
based quality signals, PII-style redaction, and a composed filter →
dedup → split pipeline.  All JVM-side column expressions (no UDFs);
every query is DuckDB-oracle-paired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from df_to_azure_spark.functions import text as TXT
from df_to_azure_spark.plans.training_data import _TOKS
from df_to_azure_spark.sources import load_table


def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide vocabulary: token → document frequency + total count,
    top 50 by count.  Plan: explode → one shuffle on token with map-side
    partial aggregation → TakeOrdered top-k (never a full sort).  At
    100 TB the combiner collapses each task's token multiset before the
    exchange, so shuffle volume is bounded by |vocab| per task, not by
    corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TXT.tokens("text")).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_total"), F.asc("tok"))
        .limit(50)
    )


VOCAB_ORACLE = f"""
SELECT tok, COUNT(*) AS n_total, COUNT(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
GROUP BY tok
ORDER BY n_total DESC, tok
LIMIT 50
"""


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (Gopher-style quality filters):
    fraction of tokens that are repeats, and the top token's share.

    Shape: explode → (doc, token) counts → per-doc aggregate.  Two
    codegen'd shuffles.  NOT the tempting nested-higher-order-lambda
    form (``transform`` with a ``filter`` over the outer array inside) —
    nested lambdas fall out of whole-stage codegen and run interpreted,
    ~100× slower on this engine (measured on the MinHash path)."""
    docs = load_table(spark, sf_dir, "documents")
    per_tok = (
        docs.select("doc_id", F.explode(TXT.tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_tok.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.count(F.lit(1)).alias("n_unique"),
            F.max("c").alias("top"),
        )
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            F.round(
                (F.col("n") - F.col("n_unique")).cast("double")
                / F.col("n").cast("double"),
                6,
            ).alias("repeat_frac"),
            F.round(
                F.col("top").cast("double") / F.col("n").cast("double"), 6
            ).alias("top_token_share"),
        )
    )


REPETITION_ORACLE = f"""
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  round(CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
    AS repeat_frac,
  round(CAST(list_max(list_transform(list_distinct(toks),
                      u -> len(list_filter(toks, x -> x = u)))) AS DOUBLE)
        / len(toks), 6) AS top_token_share
FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
"""


def doc_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrub: redact digit runs (stand-in for phone/ID patterns
    — the regex is deliberately engine-portable) and report per-doc
    redaction counts plus the redacted length.  regexp_replace/count are
    JVM-side; one scan."""
    docs = load_table(spark, sf_dir, "documents")
    pat = "[0-9][0-9][0-9]+"
    redacted = F.regexp_replace(F.col("text"), pat, "<NUM>")
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), pat, -1)).cast("long").alias("n_parts"),
        F.length(redacted).cast("long").alias("redacted_len"),
    ).withColumn("n_redactions", (F.col("n_parts") - 1).cast("long")).drop("n_parts")


REDACTION_ORACLE = """
SELECT doc_id,
  CAST(length(regexp_replace(text, '[0-9][0-9][0-9]+', '<NUM>', 'g')) AS BIGINT)
    AS redacted_len,
  CAST(len(regexp_split_to_array(text, '[0-9][0-9][0-9]+')) - 1 AS BIGINT)
    AS n_redactions
FROM documents
"""


def training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-prep pipeline in one plan: quality/length
    filter → exact dedup (min-id survivor per fingerprint) → hash split →
    per-(lang, split) counts.  Each stage is an operator tested on its
    own; this query pins their COMPOSITION, which is what a user actually
    runs.  Plan: scan → md5 window-free dedup via groupBy semi-join →
    split hash → one agg shuffle."""
    from df_to_azure_spark.functions.dedup import exact_dedup
    from df_to_azure_spark.functions.sampling import with_split

    docs = load_table(spark, sf_dir, "documents")
    filtered = docs.where(
        (F.col("n_chars") >= 50) & (TXT.token_count("text") >= 10)
    )
    deduped = exact_dedup(filtered)
    split = with_split(deduped, "doc_id")
    return (
        split.groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


TRAINING_MIX_ORACLE = f"""
WITH filtered AS (
  SELECT * FROM documents
  WHERE n_chars >= 50 AND len({_TOKS}) >= 10
),
deduped AS (
  SELECT * FROM filtered
  WHERE doc_id IN (SELECT MIN(doc_id) FROM filtered GROUP BY md5(text))
),
split AS (
  SELECT lang, n_chars,
         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT lang, n_chars,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100 AS b
        FROM deduped)
)
SELECT lang, split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM split GROUP BY lang, split
"""


# ---- bounded-error hard checks for the approximate operators ----------
# The driver's gate is exact hash equality, which an approximate op can
# never satisfy directly.  These queries invert the contract: compute the
# approximation AND its exact reference in one plan, return only the
# rows that VIOLATE the error bound, and pair with an empty-set oracle —
# turning "rows-only" surfaces into hard checks.


def approx_stats_error_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (requested rsd 1%) must land within 5% of
    the exact distinct count — a ~5-sigma margin, scale-independent (the
    DEFAULT rsd of 5% would make a 5% bound a coin flip; measured 6.7%
    error at sf0.1) — and the p50/p95 sketches must sit inside the
    observed value range, for every event type.  Violations (expected:
    none) are returned."""
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.percentile_approx("value", [0.5, 0.95], 10_000).alias("p"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    bad = (
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            > 0.05 * F.col("exact_users")
        )
        | (F.element_at("p", 1) < F.col("vmin"))
        | (F.element_at("p", 2) > F.col("vmax"))
        | (F.element_at("p", 1) > F.element_at("p", 2))
    )
    return stats.where(bad).select(
        "event_type", "approx_users", "exact_users"
    )


APPROX_CHECK_ORACLE = """
SELECT CAST(NULL AS VARCHAR) AS event_type,
       CAST(NULL AS BIGINT) AS approx_users, CAST(NULL AS BIGINT) AS exact_users
WHERE 1 = 0
"""


def simhash_invariant_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash contract: byte-identical texts MUST have identical
    fingerprints.  Returns fingerprint-divergent exact-duplicate pairs
    (expected: none)."""
    from df_to_azure_spark.functions.dedup import simhash64

    docs = load_table(spark, sf_dir, "documents")
    sh = simhash64(docs).join(docs.select("doc_id", "text"), "doc_id")
    a = sh.select(
        F.col("doc_id").alias("id_a"),
        F.col("simhash").alias("sh_a"),
        F.md5("text").alias("fp"),
    )
    b = sh.select(
        F.col("doc_id").alias("id_b"),
        F.col("simhash").alias("sh_b"),
        F.md5("text").alias("fp"),
    )
    return (
        a.join(b, "fp")
        .where((F.col("id_a") < F.col("id_b")) & (F.col("sh_a") != F.col("sh_b")))
        .select("id_a", "id_b")
    )


SIMHASH_CHECK_ORACLE = """
SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b
WHERE 1 = 0
"""


def minhash_error_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimate vs exact n-gram Jaccard: for every candidate pair
    the LSH path surfaces, the 64-hash estimate must sit within 0.35 of
    the exact value (binomial bound at n=64 makes larger errors
    vanishingly unlikely).  Violations returned; expected none."""
    from df_to_azure_spark.functions.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    est = minhash_lsh_pairs(docs, threshold=0.0)
    exact = ngram_jaccard_pairs(docs, threshold=0.0)
    joined = est.join(exact, ["id_a", "id_b"])
    return joined.where(
        F.abs(F.col("est_jaccard") - F.col("jaccard")) > 0.35
    ).select("id_a", "id_b", "est_jaccard", "jaccard")


MINHASH_CHECK_ORACLE = """
SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
       CAST(NULL AS DOUBLE) AS est_jaccard, CAST(NULL AS DOUBLE) AS jaccard
WHERE 1 = 0
"""


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap (chunk 32, stride 24) — how
    long documents become training samples.  posexplode over a computed
    chunk array: single-level higher-order lambdas (slice + array_join),
    stays in codegen, no shuffle — each row expands in place."""
    docs = load_table(spark, sf_dir, "documents")
    chunk, stride = 32, 24
    t = TXT.tokens("text")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size(t) - F.lit(chunk)) / F.lit(stride) + 1).cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(t, i * stride + 1, chunk), " "),
    )
    return docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "chunk_text")
    ).select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        "chunk_text",
        # split("") returns [""] (size 1); a zero-token document's single
        # empty chunk must count 0 tokens, matching the oracle's len([])
        F.when(F.length("chunk_text") == 0, F.lit(0))
        .otherwise(F.size(F.split("chunk_text", " ")))
        .cast("long")
        .alias("chunk_tokens"),
    )


DOC_CHUNKS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), n AS (
  SELECT doc_id, toks,
         greatest(1, CAST(ceil((len(toks) - 32) / 24.0 + 1) AS INT)) AS n_chunks
  FROM t
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_id,
       array_to_string(toks[i * 24 + 1 : i * 24 + 32], ' ') AS chunk_text,
       CAST(len(toks[i * 24 + 1 : i * 24 + 32]) AS BIGINT) AS chunk_tokens
FROM (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS i FROM n)
"""


def split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination probe: exact-duplicate text shared between the
    train split and the val/test splits (hash-split assignment, md5
    fingerprints, fingerprint equi-join).  Returns (test_doc, train_doc)
    pairs — what must be dropped from train before training."""
    from df_to_azure_spark.functions.sampling import with_split

    docs = with_split(load_table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "split", F.md5("text").alias("fp")
    )
    train = docs.where(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc"), "fp"
    )
    heldout = docs.where(F.col("split") != "train").select(
        F.col("doc_id").alias("heldout_doc"), "fp"
    )
    return heldout.join(train, "fp").select("heldout_doc", "train_doc", "fp")


SPLIT_CONTAMINATION_ORACLE = """
WITH s AS (
  SELECT doc_id, md5(text) AS fp,
         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT doc_id, text,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100 AS b
        FROM documents)
)
SELECT h.doc_id AS heldout_doc, t.doc_id AS train_doc, h.fp
FROM s h JOIN s t ON h.fp = t.fp
WHERE h.split <> 'train' AND t.split = 'train'
"""


def doc_sample_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample (md5-bucket filter) — reproducible on any
    engine/cluster/run, unlike rand()-based sampling.  The oracle selects
    the identical rows, proving cross-engine determinism."""
    from df_to_azure_spark.functions.sampling import sample_by_hash

    docs = load_table(spark, sf_dir, "documents")
    return sample_by_hash(docs, "doc_id", 10).select("doc_id", "lang", "n_chars")


DOC_SAMPLE_ORACLE = """
SELECT doc_id, lang, n_chars
FROM (SELECT doc_id, lang, n_chars,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100 AS b
      FROM documents)
WHERE b < 10
"""


def doc_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing of documents into ~8000-char packs within 8 hash
    buckets — per-pack document count and fill.  The oracle replays the
    identical bucket/cumsum/integer-div assignment, so the exact pack
    membership is cross-engine pinned."""
    from df_to_azure_spark.functions.sampling import with_pack_id

    docs = load_table(spark, sf_dir, "documents")
    packed = with_pack_id(docs, "doc_id", "n_chars", target=8000, buckets=8)
    return packed.groupBy("pack_bucket", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("CAST(SUM(n_chars) AS BIGINT)").alias("pack_chars"),
    )


DOC_PACKING_ORACLE = """
SELECT pack_bucket, pack_id, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS pack_chars
FROM (
  SELECT pack_bucket, n_chars,
         CAST((CAST(SUM(n_chars) OVER (PARTITION BY pack_bucket ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
               - n_chars) // 8000 AS BIGINT)
           AS pack_id
  FROM (SELECT doc_id, n_chars,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 8
                 AS pack_bucket
        FROM documents)
)
GROUP BY pack_bucket, pack_id
"""


def user_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas UDF (``applyInPandas``) doing per-user robust
    outlier stats over event values — the batch half of the custom-UDAF
    surface (the streaming half is ``applyInPandasWithState``).  Lower
    medians are exact elements, so the SQL oracle reproduces the Python
    result bit-for-bit and the whole Arrow grouped-map path is
    HASH-checked, not just row-counted."""
    from df_to_azure_spark.functions.outliers import robust_outlier_stats

    events = load_table(spark, sf_dir, "events")
    return robust_outlier_stats(events, "user_id", "value", k=3.0)


OUTLIERS_ORACLE = """
WITH ranked AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
med AS (SELECT user_id, value AS med FROM ranked WHERE rn = (n - 1) // 2 + 1),
dev AS (SELECT e.user_id, ABS(e.value - m.med) AS ad
        FROM events e JOIN med m USING (user_id)),
ranked_ad AS (
  SELECT user_id, ad,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ad) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM dev
),
mad AS (SELECT user_id, ad AS mad FROM ranked_ad WHERE rn = (n - 1) // 2 + 1)
SELECT d.user_id, COUNT(*) AS n_events, ANY_VALUE(me.med) AS med,
       ANY_VALUE(ma.mad) AS mad,
       CAST(SUM(CASE WHEN ma.mad > 0 AND d.ad > 3.0 * ma.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad ma USING (user_id) JOIN med me USING (user_id)
GROUP BY d.user_id
"""


def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language rebalancing: keep 10% of English (the dominant stratum)
    and 50% of everything else, deterministically per doc_id.  Returns
    per-language survivor counts; the oracle replays the identical
    md5-bucket CASE, so the exact surviving row set is cross-engine
    pinned (not just approximate rates)."""
    from df_to_azure_spark.functions.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs, "doc_id", "lang", {"en": 10}, default_pct=50
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("CAST(SUM(n_chars) AS BIGINT)").alias("total_chars"),
    )


STRATIFIED_SAMPLE_ORACLE = """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (SELECT lang, n_chars,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100 AS b
      FROM documents)
WHERE b < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
GROUP BY lang
"""


def doc_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rarity/quality signal without transcendentals: per document, the
    mean and minimum corpus document-frequency of its distinct tokens
    (min-df = rarest token; low values flag junk or OOV-heavy docs).
    Integer/exact-decimal arithmetic only — unlike a log-prob sum, this
    is order-independent and hash-reproducible across engines at any
    parallelism.  Plan: distinct-token explode → df() vocab join (AQE
    broadcasts the vocab when small) → per-doc aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(TXT.tokens("text"))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df_tok"))
    return (
        toks.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.expr("ROUND(CAST(SUM(df_tok) AS DOUBLE) / COUNT(*), 6)").alias(
                "mean_df"
            ),
            F.min("df_tok").alias("min_df"),
        )
    )


DOC_COMMONNESS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM documents
), vocab AS (
  SELECT tok, COUNT(DISTINCT doc_id) AS df_tok FROM toks GROUP BY tok
)
SELECT doc_id, COUNT(*) AS n_distinct_tokens,
       ROUND(CAST(SUM(df_tok) AS DOUBLE) / COUNT(*), 6) AS mean_df,
       MIN(df_tok) AS min_df
FROM toks JOIN vocab USING (tok)
GROUP BY doc_id
"""


def embedding_quantization_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 vector quantization (symmetric, per-vector max-abs scale) —
    the 4× storage/bandwidth saver for embedding tables — validated by
    bound: cosine(original, dequantized) must stay ≥ 0.995 for every
    vector.  Violations returned, oracle = empty set (the inverted
    contract — rounding details can't hash-match across engines)."""
    from df_to_azure_spark.functions.similarity import cosine, _as_double

    emb = load_table(spark, sf_dir, "embeddings")
    v = _as_double("embedding")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    quant = F.transform(v, lambda x: F.round(x / scale).cast("int"))
    dequant = F.transform(quant, lambda q: q.cast("double") * scale)
    fidelity = cosine(v, dequant)
    return (
        emb.select("vec_id", fidelity.alias("cos_fidelity"))
        .where(F.col("cos_fidelity") < 0.995)
    )


QUANTIZATION_CHECK_ORACLE = """
SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS DOUBLE) AS cos_fidelity
WHERE 1 = 0
"""


def doc_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-gram shingle, slide a
    w-window over the hash sequence, keep each window's minimum — the
    selected set is position-robust (insertions shift positions but local
    minima survive), guaranteeing any match of length ≥ w+k-1 shares a
    fingerprint.  The standard plagiarism / near-dup index primitive.

    Plan: posexplode shingles → portable md5-prefix hash (same integer in
    DuckDB, so the whole pipeline is oracle-checkable, unlike MinHash) →
    per-doc ROWS-frame window MIN → distinct.  One shuffle on doc_id;
    window state is O(w); short docs keep their truncated first window so
    no document vanishes (same contract as ``text.shingles``)."""
    from df_to_azure_spark.functions.dedup import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, "text", "doc_id", shingle_n=3, window=4)


# Shared winnowing-fingerprint CTE prefix (through `fps0` = distinct
# (doc_id, fp)) — the oracle twin of ``dedup.winnow_fingerprints`` with
# shingle_n=3, window=4, reused by every winnowing-based oracle below.
_WINNOW_FPS_CTE = f"""toked AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, greatest(len(toks) - 2, 1) + 1),
           i -> {{'pos': i,
                 'h': ('0x' || substr(md5(array_to_string(toks[i:i+2], ' ')), 1, 8))::BIGINT}}
         )) AS u
  FROM toked WHERE len(toks) > 0
), win AS (
  SELECT doc_id, u.pos AS pos,
         MIN(u.h) OVER (PARTITION BY doc_id ORDER BY u.pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         MAX(u.pos) OVER (PARTITION BY doc_id) AS mx
  FROM sh
), fps0 AS (
  SELECT DISTINCT doc_id, fp FROM win WHERE pos <= greatest(mx - 3, 1)
)"""


DOC_WINNOWING_ORACLE = f"""
WITH {_WINNOW_FPS_CTE}
SELECT doc_id, fp FROM fps0
"""


def winnow_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by winnowing-fingerprint Jaccard — the sparse
    companion to ``ngram_jaccard_pairs``: winnowing keeps ~2/(w+1) of
    the shingles, so the posting self-join shuffles ~40% of the volume
    for the same ≥ w+k-1-token match guarantee.  Fully oracle-checkable
    (portable integer hashes), unlike the probabilistic MinHash path."""
    from df_to_azure_spark.functions.dedup import winnow_overlap_pairs

    docs = load_table(spark, sf_dir, "documents")
    return winnow_overlap_pairs(
        docs, "text", "doc_id", shingle_n=3, window=4, threshold=0.2,
        hot_fp_cap=1000,
    )


WINNOW_PAIRS_ORACLE = f"""
WITH {_WINNOW_FPS_CTE}, fps AS (
  SELECT doc_id, fp FROM fps0
  WHERE fp NOT IN (SELECT fp FROM fps0 GROUP BY fp HAVING COUNT(*) > 1000)
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM fps GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, n_shared,
       ROUND(CAST(n_shared AS DOUBLE) /
             CAST(sa.sz + sb.sz - n_shared AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE ROUND(CAST(n_shared AS DOUBLE) /
            CAST(sa.sz + sb.sz - n_shared AS DOUBLE), 6) >= 0.2
"""


def part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: part pairs that appear together
    in the same order, top 25 by support.  Plan: project to distinct
    (orderkey, partkey) — two narrow columns — then a self equi-join on
    the order key with ``pk_a < pk_b`` to emit each unordered pair once,
    count per pair, TakeOrdered top-k.

    Scale: the join shuffles only key pairs (8+8 bytes/row) and both
    sides share one exchange (self-join reuse).  Pair expansion is
    quadratic in basket size, so a degenerate mega-basket (one order
    with 10⁵ parts) would emit 10¹⁰ rows from a single task; the
    ``max_basket`` guard drops oversized baskets up front — the same
    hot-key cap contract as ``ngram_jaccard`` (functions/dedup.py) —
    and is a no-op on sane retail-shaped data like this (TPC-H baskets
    are ≤7 lines)."""
    max_basket = 1000
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates()
    )
    sized = li.join(
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("basket_n"))
        .where(F.col("basket_n") <= max_basket)
        .select("l_orderkey"),
        "l_orderkey",
        "left_semi",
    )
    a = sized.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pk_a")
    )
    b = sized.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pk_b")
    )
    pairs = a.join(b, "okey").where(F.col("pk_a") < F.col("pk_b"))
    return (
        pairs.groupBy("pk_a", "pk_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("pk_a"), F.asc("pk_b"))
        .limit(25)
    )


PART_COOCCURRENCE_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sized AS (
  SELECT l_orderkey FROM li GROUP BY l_orderkey HAVING COUNT(*) <= 1000
)
SELECT a.l_partkey AS pk_a, b.l_partkey AS pk_b, COUNT(*) AS n_orders
FROM li a
JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
JOIN sized s ON a.l_orderkey = s.l_orderkey
GROUP BY a.l_partkey, b.l_partkey
ORDER BY n_orders DESC, pk_a, pk_b
LIMIT 25
"""


def doc_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 distinct tokens by TF-IDF
    (``tf · ln(N/df)``).  Plan: explode → per-(doc, token) tf counts →
    token-keyed df() vocab join (AQE broadcasts the vocab when it fits)
    → 1-row corpus-count broadcast → per-doc window top-k.

    Cross-engine float note: the score is a product of exact integers
    with one ``ln`` — rounded to 6 dp before both ranking and output so
    a ≤1-ulp libm divergence between engines cannot flip the ordering
    (ties after rounding break on the token string).  Complements
    ``doc_commonness``, which avoids transcendentals entirely."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    per_tok = (
        docs.select("doc_id", F.explode(TXT.tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    vocab = per_tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df_tok"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_corpus"))
    scored = (
        per_tok.join(vocab, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.expr("ROUND(tf * LN(CAST(n_corpus AS DOUBLE) / df_tok), 6)"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .select("doc_id", "tok", "tfidf", "rk")
    )


DOC_TFIDF_ORACLE = f"""
WITH per_tok AS (
  SELECT doc_id, tok, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
  GROUP BY doc_id, tok
), vocab AS (
  SELECT tok, COUNT(*) AS df_tok FROM per_tok GROUP BY tok
), scored AS (
  SELECT doc_id, tok,
         ROUND(tf * LN(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / df_tok), 6) AS tfidf
  FROM per_tok JOIN vocab USING (tok)
)
SELECT doc_id, tok, tfidf, rk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rk
      FROM scored)
WHERE rk <= 3
"""


def bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction / the BPE-tokenizer-training counting step:
    adjacent token pairs ranked by PMI (``ln(P(ab) / P(a)P(b))``), min
    support 5.  The most-frequent-pair table IS one BPE merge iteration;
    the PMI ranking is the classic collocation measure on top of it.

    Plan: pairs are generated ARRAY-SIDE — a single-level ``transform``
    over ``sequence(1, n-1)`` (stays in whole-stage codegen; no window
    shuffle, no posexplode+lag) — then explode → count.  Unigram counts
    ride a second explode of the same scan; the corpus total is a 1-row
    broadcast.  All inputs to the PMI are exact integers; the one
    transcendental is rounded to 6 dp before ranking (same cross-engine
    policy as ``doc_tfidf_terms``)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", TXT.tokens("text")
    )
    bigrams = docs.where(F.expr("size(toks) >= 2")).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            )
        ).alias("bigram")
    )
    bgc = bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_bg"))
    uni = docs.select(F.explode("toks").alias("tok"))
    unic = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    totals = uni.agg(F.count(F.lit(1)).alias("n_total"))
    ua = unic.select(F.col("tok").alias("tok_a"), F.col("n_tok").alias("n_a"))
    ub = unic.select(F.col("tok").alias("tok_b"), F.col("n_tok").alias("n_b"))
    return (
        bgc.withColumn("tok_a", F.expr("split_part(bigram, ' ', 1)"))
        .withColumn("tok_b", F.expr("split_part(bigram, ' ', 2)"))
        .join(ua, "tok_a")
        .join(ub, "tok_b")
        .crossJoin(F.broadcast(totals))
        .where(F.col("n_bg") >= 5)
        .select(
            "bigram",
            "n_bg",
            F.expr(
                "ROUND(LN(CAST(n_bg AS DOUBLE) * n_total / (n_a * n_b)), 6)"
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("bigram"))
        .limit(20)
    )


BIGRAM_COLLOCATIONS_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), bg AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i+1])) AS bigram
  FROM toked WHERE len(toks) >= 2
), bgc AS (
  SELECT bigram, COUNT(*) AS n_bg FROM bg GROUP BY bigram
), uni AS (
  SELECT unnest(toks) AS tok FROM toked
), unic AS (
  SELECT tok, COUNT(*) AS n_tok FROM uni GROUP BY tok
), tot AS (SELECT COUNT(*) AS n_total FROM uni)
SELECT bigram, n_bg,
       ROUND(LN(CAST(n_bg AS DOUBLE) * n_total / (ua.n_tok * ub.n_tok)), 6) AS pmi
FROM bgc
CROSS JOIN tot
JOIN unic ua ON ua.tok = split_part(bigram, ' ', 1)
JOIN unic ub ON ub.tok = split_part(bigram, ' ', 2)
WHERE n_bg >= 5
ORDER BY pmi DESC, bigram
LIMIT 20
"""


def kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic Lloyd iteration of k-means over the embedding
    table (K=8, seeds = vectors 0..7): assign every vector to its
    nearest centroid by squared L2, then recompute per-cluster means —
    the building block users loop for clustering / IVF coarse training.

    Engine-exactness: squared dim differences are computed in DOUBLE
    (row-local, order-free) but SUMMED as DECIMAL(28,12) — decimal
    aggregation is exact, so neither the distance nor the mean depends
    on partial-aggregation order, and argmin ties break on centroid id.
    That makes an ITERATIVE numeric algorithm hash-checkable, the same
    trick as the exact-decimal TPC-H policy.

    Plan: dims are exploded once per side; the 8×64 centroid frame is a
    broadcast; distance = one shuffle on (vec, centroid) — at 100 TB
    the assignment is a map-side broadcast join + partial agg, and the
    recompute shuffles |K|·|dim| cells."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims_v = emb.select(
        "vec_id", F.posexplode("embedding").alias("i0", "x")
    ).select(
        "vec_id",
        (F.col("i0") + 1).cast("long").alias("i"),
        F.col("x").cast("double").alias("x"),
    )
    cent = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.posexplode("embedding").alias("i0", "cx")
    ).select(
        "cid",
        (F.col("i0") + 1).cast("long").alias("i"),
        F.col("cx").cast("double").alias("cx"),
    )
    dist = (
        dims_v.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "cid")
        .agg(
            F.expr(
                "SUM(CAST((x - cx) * (x - cx) AS DECIMAL(28,12)))"
            ).alias("d")
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("cid"))
    assign = (
        dist.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vec_id", "cid")
    )
    return (
        dims_v.join(assign, "vec_id")
        .groupBy("cid", "i")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.expr(
                "ROUND(CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6)"
            ).alias("mean_x"),
        )
    )


KMEANS_STEP_ORACLE = """
WITH dims_v AS (
  SELECT vec_id, u.i AS i, CAST(u.x AS DOUBLE) AS x
  FROM (SELECT vec_id,
               unnest(list_transform(range(1, len(embedding) + 1),
                      i -> {'i': i, 'x': embedding[i]})) AS u
        FROM embeddings)
), cent AS (
  SELECT vec_id AS cid, u.i AS i, CAST(u.x AS DOUBLE) AS cx
  FROM (SELECT vec_id,
               unnest(list_transform(range(1, len(embedding) + 1),
                      i -> {'i': i, 'x': embedding[i]})) AS u
        FROM embeddings WHERE vec_id < 8)
), dist AS (
  SELECT vec_id, cid, SUM(CAST((x - cx) * (x - cx) AS DECIMAL(28,12))) AS d
  FROM dims_v JOIN cent USING (i)
  GROUP BY vec_id, cid
), assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rk
    FROM dist)
  WHERE rk = 1
)
SELECT cid, i, COUNT(*) AS n_members,
       ROUND(CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS mean_x
FROM dims_v JOIN assign USING (vec_id)
GROUP BY cid, i
"""


def label_prototype_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality evaluation by nearest-prototype classification:
    build the per-label mean vector (class prototype), assign every
    vector to its nearest prototype by squared L2, and report the
    confusion counts (true label × predicted label).  The diagonal mass
    is the label separability of the embedding space — the standard
    cheap probe before spending on a trained classifier.

    Same engine-exactness contract as ``kmeans_step``: per-dim work in
    DOUBLE (row-local), every aggregate in exact DECIMAL, argmin ties on
    the label id.  The prototype frame is |labels|·|dims| cells —
    bounded by the label domain, hence broadcastable at any data size."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i0", "x")
    ).select(
        "vec_id",
        "label",
        (F.col("i0") + 1).cast("long").alias("i"),
        F.col("x").cast("double").alias("x"),
    )
    proto = (
        dims.groupBy(F.col("label").alias("plabel"), F.col("i"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)"
            ).alias("m")
        )
    )
    dist = (
        dims.join(F.broadcast(proto), "i")
        .groupBy("vec_id", "label", "plabel")
        .agg(F.expr("SUM(CAST((x - m) * (x - m) AS DECIMAL(28,12)))").alias("d"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("plabel"))
    pred = (
        dist.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
    )
    return pred.groupBy(
        F.col("label").alias("true_label"),
        F.col("plabel").alias("predicted_label"),
    ).agg(F.count(F.lit(1)).alias("n_vectors"))


LABEL_CONFUSION_ORACLE = """
WITH dims AS (
  SELECT vec_id, label, u.i AS i, CAST(u.x AS DOUBLE) AS x
  FROM (SELECT vec_id, label,
               unnest(list_transform(range(1, len(embedding) + 1),
                      i -> {'i': i, 'x': embedding[i]})) AS u
        FROM embeddings)
), proto AS (
  SELECT label AS plabel, i,
         CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m
  FROM dims GROUP BY label, i
), dist AS (
  SELECT vec_id, label, plabel,
         SUM(CAST((x - m) * (x - m) AS DECIMAL(28,12))) AS d
  FROM dims JOIN proto USING (i)
  GROUP BY vec_id, label, plabel
), pred AS (
  SELECT vec_id, label, plabel FROM (
    SELECT vec_id, label, plabel,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, plabel ASC) AS rk
    FROM dist)
  WHERE rk = 1
)
SELECT label AS true_label, plabel AS predicted_label, COUNT(*) AS n_vectors
FROM pred GROUP BY label, plabel
"""


def split_neardup_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY train/eval contamination: pairs of documents in different
    splits that share ≥3 winnowing fingerprints — catching the near-dup
    leakage that exact-hash decontamination (``split_contamination``)
    misses, the way production corpus prep actually decontaminates
    benchmarks.  Composition of three tested operators: hash split
    (md5-bucket) × winnowing fingerprints × posting-list join, with the
    same hot-fp cap contract as ``winnow_neardup_pairs``.

    Plan: fingerprint explode (window per doc) → split label join is a
    column expression (no extra shuffle — split is a pure function of
    doc_id) → posting self-join on the fingerprint restricted to
    train×non-train, count per pair."""
    from df_to_azure_spark.functions.dedup import winnow_fingerprints
    from df_to_azure_spark.functions.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    fps = winnow_fingerprints(docs, "text", "doc_id", shingle_n=3, window=4)
    hot = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df_fp"))
        .where(F.col("df_fp") > 1000)
        .select("fp")
    )
    fps = fps.join(hot, "fp", "left_anti").withColumn(
        "is_train", hash_bucket(F.col("doc_id"), 100) < 80
    )
    train = fps.where("is_train").select(
        F.col("doc_id").alias("train_doc"), "fp"
    )
    eval_ = fps.where(~F.col("is_train")).select(
        F.col("doc_id").alias("eval_doc"), "fp"
    )
    return (
        train.join(eval_, "fp")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= 3)
    )


SPLIT_NEARDUP_ORACLE = f"""
WITH {_WINNOW_FPS_CTE}, fps AS (
  SELECT doc_id, fp,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100 < 80
           AS is_train
  FROM fps0
  WHERE fp NOT IN (SELECT fp FROM fps0 GROUP BY fp HAVING COUNT(*) > 1000)
)
SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc, COUNT(*) AS n_shared
FROM fps t JOIN fps e ON t.fp = e.fp AND t.is_train AND NOT e.is_train
GROUP BY t.doc_id, e.doc_id
HAVING COUNT(*) >= 3
"""


def neardup_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the winnowing near-dup graph — the health
    probe run before clustering: a heavy tail (one node matching
    thousands) means boilerplate is about to glue unrelated documents
    into one giant dedup cluster, and the caps need tightening BEFORE
    ``connected_components`` runs.  Plan: pairs → explode both endpoints
    → degree per node → histogram on the (tiny) degree domain."""
    from df_to_azure_spark.functions.dedup import winnow_overlap_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = winnow_overlap_pairs(
        docs, "text", "doc_id", shingle_n=3, window=4, threshold=0.2,
        hot_fp_cap=1000,
    )
    ends = pairs.select(F.col("id_a").alias("node")).unionAll(
        pairs.select(F.col("id_b").alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


DEGREE_HISTOGRAM_ORACLE = f"""
WITH {_WINNOW_FPS_CTE}, fps AS (
  SELECT doc_id, fp FROM fps0
  WHERE fp NOT IN (SELECT fp FROM fps0 GROUP BY fp HAVING COUNT(*) > 1000)
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM fps GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE ROUND(CAST(n_shared AS DOUBLE) /
              CAST(sa.sz + sb.sz - n_shared AS DOUBLE), 6) >= 0.2
), deg AS (
  SELECT node, COUNT(*) AS degree
  FROM (SELECT id_a AS node FROM pairs UNION ALL SELECT id_b FROM pairs)
  GROUP BY node
)
SELECT degree, COUNT(*) AS n_nodes FROM deg GROUP BY degree
"""


def doc_sample_k_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded per-stratum sample: exactly 3 documents per language,
    chosen by deterministic hash order (``sample_k_per_group``) — the
    "show me a few examples of every class" primitive, reproducible on
    any engine or cluster.  One shuffle on the group key; rank state is
    O(1) per group."""
    from df_to_azure_spark.functions.sampling import sample_k_per_group

    docs = load_table(spark, sf_dir, "documents")
    return sample_k_per_group(docs, "doc_id", "lang", 3).select(
        "doc_id", "lang", "source", "n_chars"
    )


DOC_SAMPLE_K_ORACLE = """
SELECT doc_id, lang, source, n_chars
FROM (SELECT doc_id, lang, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM documents)
WHERE rk <= 3
"""


def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite document filter (Rae et al. 2021 §A1.1
    heuristics), emitting each rule flag plus the final keep verdict so
    a pipeline can audit WHY a document was rejected:

    - word count in [50, 100000];
    - mean word length in [3, 10];
    - symbol-to-word ratio ('#', '...') below 0.1;
    - at most 90% of lines start with a bullet ('-' or '*');
    - at least 2 distinct frequent English stopwords present.

    Every signal is rational arithmetic over counts — no transcendentals
    — so the result is bit-reproducible across engines and parallelism
    (the property the whole oracle gate rests on).  Single scan, pure
    codegen'd column expressions, no shuffle: at 100 TB this runs at
    I/O speed and pipelines straight into the dedup/split stages."""
    docs = load_table(spark, sf_dir, "documents")
    t = TXT.tokens("text")
    n_words = F.size(t)
    # NULLIF guard: ANSI mode (Spark 4 default) makes x/0 a runtime ERROR,
    # so an empty document would kill the whole scan; NULL metrics (and a
    # false keep, via the word-count rule) are the correct degradation,
    # and DuckDB's NULLIF arithmetic matches exactly
    n_words_nz = F.nullif(n_words.cast("double"), F.lit(0.0))
    total_chars = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    mean_word_len = total_chars.cast("double") / n_words_nz
    n_hash = F.size(F.split("text", "#", -1)) - 1
    n_ellipsis = F.size(F.split("text", r"\.\.\.", -1)) - 1
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n_words_nz
    lines = F.filter(F.split("text", "\n", -1), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike("^[-*]"))
    )
    gopher_stops = ["the", "be", "to", "of", "and", "that", "have", "with"]
    stop_hits = F.size(
        F.array_intersect(t, F.array(*[F.lit(s) for s in gopher_stops]))
    )
    flags = {
        "ok_word_count": (n_words >= 50) & (n_words <= 100_000),
        "ok_word_len": (mean_word_len >= 3.0) & (mean_word_len <= 10.0),
        "ok_symbols": symbol_ratio < 0.1,
        "ok_bullets": n_bullet.cast("double") <= 0.9 * n_lines.cast("double"),
        "ok_stopwords": stop_hits >= 2,
    }
    keep = F.lit(True)
    for c in flags.values():
        keep = keep & c
    return docs.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        stop_hits.cast("bigint").alias("stop_hits"),
        *[c.alias(name) for name, c in flags.items()],
        keep.alias("keep"),
    )


GOPHER_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text, {_TOKS} AS toks,
         list_filter(regexp_split_to_array(text, '\n'), x -> trim(x) <> '') AS lines
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
           / NULLIF(CAST(len(toks) AS DOUBLE), 0.0) AS mean_word_len,
         CAST(len(regexp_split_to_array(text, '#')) - 1
              + len(regexp_split_to_array(text, '\\.\\.\\.')) - 1 AS DOUBLE)
           / NULLIF(CAST(len(toks) AS DOUBLE), 0.0) AS symbol_ratio,
         len(list_filter(lines, x -> regexp_matches(trim(x), '^[-*]'))) AS n_bullet,
         len(lines) AS n_lines,
         len(list_intersect(toks,
             ['the','be','to','of','and','that','have','with'])) AS stop_hits
  FROM base
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       ROUND(mean_word_len, 4) AS mean_word_len,
       ROUND(symbol_ratio, 6) AS symbol_ratio,
       CAST(stop_hits AS BIGINT) AS stop_hits,
       n_words >= 50 AND n_words <= 100000 AS ok_word_count,
       mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS ok_word_len,
       symbol_ratio < 0.1 AS ok_symbols,
       CAST(n_bullet AS DOUBLE) <= 0.9 * CAST(n_lines AS DOUBLE) AS ok_bullets,
       stop_hits >= 2 AS ok_stopwords,
       (n_words >= 50 AND n_words <= 100000)
         AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
         AND (symbol_ratio < 0.1)
         AND (CAST(n_bullet AS DOUBLE) <= 0.9 * CAST(n_lines AS DOUBLE))
         AND (stop_hits >= 2) AS keep
FROM m
"""


def doc_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model score — the CCNet/KenLM-style perplexity
    filtering signal, made engine-exact: a float ``-log2 p(tok)`` sum is
    order-dependent across parallelism (and ``log`` itself is not
    correctly-rounded, so engines disagree in the last ulp), so the
    surprisal is quantized to INTEGER BITS — ``bit_length(N div n_tok)``
    is exactly ``floor(log2(N/n_tok)) + 1`` for the corpus-total N and
    token count n_tok, computed in pure integer arithmetic that every
    engine reproduces bit-for-bit.  High mean-surprisal docs are
    OOV/junk-heavy; low ones are boilerplate.

    Plan: token explode → vocab count (one shuffle with map-side
    combine, bounded by |vocab| per task) → 1-row corpus total broadcast
    → vocab join back (AQE broadcasts the vocab when small) → per-doc
    agg.  No transcendentals, no UDFs, no driver collect."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(TXT.tokens("text")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    total = vocab.agg(F.sum("n_tok").alias("n_total"))
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.length(F.bin(F.expr("n_total div n_tok"))).alias("bits"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.expr("ROUND(CAST(SUM(bits) AS DOUBLE) / COUNT(*), 6)").alias(
            "mean_surprisal_bits"
        ),
        F.max("bits").cast("bigint").alias("max_surprisal_bits"),
    )


UNIGRAM_SURPRISAL_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
), vocab AS (
  SELECT tok, COUNT(*) AS n_tok FROM toks GROUP BY tok
), total AS (
  SELECT SUM(n_tok) AS n_total FROM vocab
), scored AS (
  SELECT doc_id, length(bin(CAST(n_total // n_tok AS BIGINT))) AS bits
  FROM toks JOIN vocab USING (tok) CROSS JOIN total
)
SELECT doc_id, COUNT(*) AS n_tokens,
       ROUND(CAST(SUM(bits) AS DOUBLE) / COUNT(*), 6) AS mean_surprisal_bits,
       CAST(MAX(bits) AS BIGINT) AS max_surprisal_bits
FROM scored GROUP BY doc_id
"""


def doc_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with STUPID BACKOFF (Brants et al.,
    EMNLP'07) — the next step up from ``doc_unigram_surprisal``: the
    bigram/context/unigram tables are counted on the deterministic
    md5-hash TRAIN split and the TEST split is scored against them, so
    the backoff branch genuinely fires (unseen test bigrams), unlike
    scoring a corpus against its own counts.

    Engine-exact quantization, same policy as the unigram op: seen
    bigrams cost ``bit_length(c(w1·) div c(w1,w2))`` integer bits
    (≈ -log2 p(w2|w1)); unseen ones back off to the unigram cost plus a
    fixed 2-bit penalty (the ×0.25 stupid-backoff weight as a shift —
    pure integer arithmetic instead of the paper's 0.4 float).  Unseen
    unigrams floor at count 1.  No transcendentals, no floats before
    the final ROUND(6) mean.

    Plan: one bigram explode per split; train-side counts are two
    keyed aggregations (map-side combined) + a 1-row total; test
    scoring is keyed left joins (AQE broadcasts the small sides) — no
    driver-sized state anywhere."""
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
        .select("doc_id", "split", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    train_bg = bg.where(F.col("split") == "train")
    bgc = train_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_bg"))
    ctx = bgc.groupBy("w1").agg(F.sum("n_bg").alias("n_ctx"))
    uni = (
        toks_arr.where(F.col("split") == "train")
        .select(F.explode("t").alias("w2"))
        .groupBy("w2")
        .agg(F.count(F.lit(1)).alias("n_uni"))
    )
    total = uni.agg(F.sum("n_uni").alias("n_total"))
    scored = (
        bg.where(F.col("split") == "test")
        .join(bgc, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(uni, "w2", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN n_bg IS NOT NULL"
                "     THEN length(bin(n_ctx div n_bg))"
                "     ELSE 2 + length(bin(n_total div coalesce(n_uni, 1)))"
                " END"
            ).alias("bits"),
            F.expr("IF(n_bg IS NULL, 1, 0)").alias("backoff"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr("ROUND(CAST(SUM(bits) AS DOUBLE) / COUNT(*), 6)").alias(
            "mean_surprisal_bits"
        ),
        F.max("bits").cast("bigint").alias("max_surprisal_bits"),
        F.expr("ROUND(CAST(SUM(backoff) AS DOUBLE) / COUNT(*), 6)").alias(
            "backoff_rate"
        ),
    )


BIGRAM_SURPRISAL_ORACLE = f"""
WITH s AS (
  SELECT doc_id, {_TOKS} AS t,
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
  SELECT w1, SUM(n_bg) AS n_ctx FROM bgc GROUP BY w1
), uni AS (
  SELECT w2, COUNT(*) AS n_uni
  FROM (SELECT unnest(t) AS w2 FROM s WHERE split = 'train') GROUP BY w2
), total AS (
  SELECT SUM(n_uni) AS n_total FROM uni
), scored AS (
  SELECT b.doc_id,
         CASE WHEN bgc.n_bg IS NOT NULL
              THEN length(bin(CAST(ctx.n_ctx // bgc.n_bg AS BIGINT)))
              ELSE 2 + length(bin(CAST(total.n_total // coalesce(uni.n_uni, 1) AS BIGINT)))
         END AS bits,
         CASE WHEN bgc.n_bg IS NULL THEN 1 ELSE 0 END AS backoff
  FROM bg b
  LEFT JOIN bgc ON b.w1 = bgc.w1 AND b.w2 = bgc.w2
  LEFT JOIN ctx ON b.w1 = ctx.w1
  LEFT JOIN uni ON b.w2 = uni.w2
  CROSS JOIN total
  WHERE b.split = 'test'
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(bits) AS DOUBLE) / COUNT(*), 6) AS mean_surprisal_bits,
       CAST(MAX(bits) AS BIGINT) AS max_surprisal_bits,
       ROUND(CAST(SUM(backoff) AS DOUBLE) / COUNT(*), 6) AS backoff_rate
FROM scored GROUP BY doc_id
"""


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix — which corpus sources copy from
    each other: for every source pair, the number of distinct document
    fingerprints present in BOTH.  The curation signal behind "drop
    source B, it is 80% a mirror of A".

    Inverted-index shape, never source×source×docs: distinct
    (fingerprint, source) postings self-join on the fingerprint (a dup
    group spans few sources, so posting lists are tiny), then one agg on
    the source pair.  A fingerprint shared by k sources contributes
    k·(k-1)/2 pairs — bounded by the source count, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    fps = docs.select(
        TXT.fingerprint("text").alias("fp"), F.col("source")
    ).dropDuplicates(["fp", "source"])
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
    )


SOURCE_OVERLAP_ORACLE = """
WITH fps AS (
  SELECT DISTINCT md5(text) AS fp, source FROM documents
)
SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared_fps
FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
GROUP BY a.source, b.source
"""


def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted document sample (50 docs, weight = n_chars)
    via deterministic Efraimidis-Spirakis exponential keys — the sampler
    a data-mix pipeline points at DSIR/quality weights; see
    ``sampling.weighted_sample_topk`` for the exactness and
    TakeOrderedAndProject plan notes."""
    from df_to_azure_spark.functions.sampling import weighted_sample_topk

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample_topk(docs, "n_chars", k=50).select(
        "doc_id", "n_chars", "samp_key", "samp_rank"
    )


WEIGHTED_SAMPLE_ORACLE = """
WITH scored AS (
  SELECT doc_id, n_chars,
         ROUND(ROUND(LN(u), 12) / w, 10) AS samp_key
  FROM (SELECT doc_id, n_chars,
               (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  ::DOUBLE + CAST(1 AS DOUBLE)) / CAST(4294967296 AS DOUBLE) AS u,
               CAST(n_chars AS DOUBLE) AS w
        FROM documents)
  WHERE w > 0
)
SELECT doc_id, n_chars, samp_key,
       CAST(row_number() OVER (ORDER BY samp_key DESC, doc_id) AS BIGINT)
         AS samp_rank
FROM scored
ORDER BY samp_key DESC, doc_id
LIMIT 50
"""


def source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (nats) of each source's unigram
    distribution against the whole-corpus distribution — the standard
    distribution-drift screen over a mixed training corpus ("which
    source is most off-distribution?").  JSD is symmetric and bounded
    (≤ ln 2), so the per-source scores are directly comparable.

    The KL(corpus||mixture) mass on tokens a source never emits needs no
    per-source vocabulary expansion: for absent tokens m = q/2, so the
    contribution is exactly q·ln 2 — computed analytically as
    ``(1 − Σ_present q) · ln 2``.  Everything else runs over the
    (source, token) PRESENT pairs only.

    Exactness policy: probabilities are identical double divisions of
    exact counts in both engines; ROUND(12) after each LN (the only
    transcendental — including the ln 2 constant itself) and per-term
    products ROUND(12) into DECIMAL(28,12) before the per-source sums,
    so aggregation order never matters; output ROUND(6).

    Scale: one token explode → (source, token) counts (map-side
    combined); global token counts AGGREGATE FROM that frame (no second
    scan); per-source totals broadcast back.  Shuffles are keyed on
    token and source — nothing global, nothing driver-sized."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(TXT.tokens("text")).alias("tok"))
    cs = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c_s"))
    ns = cs.groupBy("source").agg(F.sum("c_s").alias("n_s"))
    cg = cs.groupBy("tok").agg(F.sum("c_s").alias("c_g"))
    n_tot = ns.agg(F.sum("n_s").alias("n_g"))
    j = (
        cs.join(cg, "tok")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(n_tot))
        .selectExpr(
            "source",
            "n_s",
            "CAST(c_s AS DOUBLE) / CAST(n_s AS DOUBLE) AS p",
            "CAST(c_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS q",
        )
        .selectExpr(
            "source",
            "n_s",
            "CAST(ROUND(p * ROUND(LN(p / ((p + q) / CAST(2 AS DOUBLE))), 12), 12)"
            " AS DECIMAL(28,12)) AS a",
            "CAST(ROUND(q * ROUND(LN(q / ((p + q) / CAST(2 AS DOUBLE))), 12), 12)"
            " AS DECIMAL(28,12)) AS b",
            "CAST(ROUND(q, 12) AS DECIMAL(28,12)) AS qm",
        )
    )
    ln2 = "ROUND(LN(CAST(2 AS DOUBLE)), 12)"
    return j.groupBy("source").agg(
        F.expr("CAST(MIN(n_s) AS BIGINT)").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.expr(
            "ROUND(CAST(0.5 AS DOUBLE) * (CAST(SUM(a) AS DOUBLE)"
            " + CAST(SUM(b) AS DOUBLE)"
            f" + (CAST(1 AS DOUBLE) - CAST(SUM(qm) AS DOUBLE)) * {ln2}), 6)"
        ).alias("jsd_nats"),
    )


SOURCE_JSD_ORACLE = f"""
WITH toks AS (
  SELECT source, unnest({_TOKS}) AS tok FROM documents
), cs AS (
  SELECT source, tok, COUNT(*) AS c_s FROM toks GROUP BY source, tok
), ns AS (
  SELECT source, SUM(c_s) AS n_s FROM cs GROUP BY source
), cg AS (
  SELECT tok, SUM(c_s) AS c_g FROM cs GROUP BY tok
), n_tot AS (
  SELECT SUM(n_s) AS n_g FROM ns
), pq AS (
  SELECT cs.source, ns.n_s,
         CAST(cs.c_s AS DOUBLE) / CAST(ns.n_s AS DOUBLE) AS p,
         CAST(cg.c_g AS DOUBLE) / CAST(n_tot.n_g AS DOUBLE) AS q
  FROM cs JOIN cg USING (tok) JOIN ns USING (source) CROSS JOIN n_tot
), terms AS (
  SELECT source, n_s,
         CAST(ROUND(p * ROUND(LN(p / ((p + q) / CAST(2 AS DOUBLE))), 12), 12)
              AS DECIMAL(28,12)) AS a,
         CAST(ROUND(q * ROUND(LN(q / ((p + q) / CAST(2 AS DOUBLE))), 12), 12)
              AS DECIMAL(28,12)) AS b,
         CAST(ROUND(q, 12) AS DECIMAL(28,12)) AS qm
  FROM pq
)
SELECT source, CAST(MIN(n_s) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab,
       ROUND(CAST(0.5 AS DOUBLE) * (CAST(SUM(a) AS DOUBLE)
             + CAST(SUM(b) AS DOUBLE)
             + (CAST(1 AS DOUBLE) - CAST(SUM(qm) AS DOUBLE))
               * ROUND(LN(CAST(2 AS DOUBLE)), 12)), 6) AS jsd_nats
FROM terms GROUP BY source
"""


def source_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified importance-weighted sample: 5 documents PER SOURCE,
    weight = n_chars, drawn with the per-group Efraimidis-Spirakis
    sampler — the quota-per-shard draw next to the global
    ``weighted_doc_sample``; see ``sampling.weighted_sample_topk_grouped``
    for the plan notes (one keyed shuffle, group-partitioned window,
    never a global order)."""
    from df_to_azure_spark.functions.sampling import weighted_sample_topk_grouped

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return weighted_sample_topk_grouped(
        docs, "source", "n_chars", k_per_group=5
    ).select("source", "samp_rank", "doc_id", "n_chars", "samp_key")


SOURCE_WEIGHTED_SAMPLE_ORACLE = """
WITH scored AS (
  SELECT doc_id, source, n_chars,
         ROUND(ROUND(LN(u), 12) / w, 10) AS samp_key
  FROM (SELECT doc_id, source, n_chars,
               (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  ::DOUBLE + CAST(1 AS DOUBLE)) / CAST(4294967296 AS DOUBLE) AS u,
               CAST(n_chars AS DOUBLE) AS w
        FROM documents)
  WHERE w > 0
)
SELECT source, samp_rank, doc_id, n_chars, samp_key
FROM (
  SELECT source, doc_id, n_chars, samp_key,
         CAST(row_number() OVER (
           PARTITION BY source ORDER BY samp_key DESC, doc_id
         ) AS BIGINT) AS samp_rank
  FROM scored
)
WHERE samp_rank <= 5
"""


def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS of ln(frequency)
    on ln(rank) for the top-200 terms, via the closed-form normal
    equations — the one-number power-law health check (slope ≈ −1 for
    natural text; a flat slope flags templated/boilerplate corpora).

    Exactness: rank is deterministic (count DESC, term ASC; the top-200
    cut inherits that order), ln(rank)/ln(count) are ROUND(12) after
    the transcendental, per-row products ROUND(12) → DECIMAL(28,12)
    before the sums (order-free), and slope/intercept/r² are single
    double expressions over the exact sums, ROUND(6).

    Scale: token explode → one (term) count agg (map-side combined) →
    top-200 via sort+limit = TakeOrderedAndProject (per-partition
    heaps, 200 rows to the driver — parameter-bounded, never
    data-bounded); the rank window and the final scalar agg run over
    those 200 rows only."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(TXT.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = counts.orderBy(F.desc("freq"), F.asc("tok")).limit(200)
    w = W.orderBy(F.desc("freq"), F.asc("tok"))  # 200-row frame: bounded
    xy = top.withColumn("rank", F.row_number().over(w)).selectExpr(
        "ROUND(LN(CAST(rank AS DOUBLE)), 12) AS x",
        "ROUND(LN(CAST(freq AS DOUBLE)), 12) AS y",
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.expr("SUM(CAST(ROUND(x, 12) AS DECIMAL(28,12)))").alias("sx"),
        F.expr("SUM(CAST(ROUND(y, 12) AS DECIMAL(28,12)))").alias("sy"),
        F.expr("SUM(CAST(ROUND(x * y, 12) AS DECIMAL(28,12)))").alias("sxy"),
        F.expr("SUM(CAST(ROUND(x * x, 12) AS DECIMAL(28,12)))").alias("sxx"),
        F.expr("SUM(CAST(ROUND(y * y, 12) AS DECIMAL(28,12)))").alias("syy"),
    )
    det = (
        "(CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    num = (
        "(CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    return s.select(
        "n_terms",
        F.expr(f"ROUND({num} / {det}, 6)").alias("zipf_slope"),
        F.expr(
            f"ROUND((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)"
            f" - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE)) / {det}, 6)"
        ).alias("zipf_intercept"),
        F.expr(
            f"ROUND({num} * {num} / ({det}"
            " * (CAST(n_terms AS DOUBLE) * CAST(syy AS DOUBLE)"
            " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)"
        ).alias("r2"),
    )


ZIPF_FIT_ORACLE = f"""
WITH counts AS (
  SELECT tok, COUNT(*) AS freq
  FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
  GROUP BY tok
), top AS (
  SELECT tok, freq FROM counts ORDER BY freq DESC, tok LIMIT 200
), xy AS (
  SELECT ROUND(LN(CAST(row_number() OVER (ORDER BY freq DESC, tok) AS DOUBLE)), 12) AS x,
         ROUND(LN(CAST(freq AS DOUBLE)), 12) AS y
  FROM top
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
         SUM(CAST(ROUND(x, 12) AS DECIMAL(28,12))) AS sx,
         SUM(CAST(ROUND(y, 12) AS DECIMAL(28,12))) AS sy,
         SUM(CAST(ROUND(x * y, 12) AS DECIMAL(28,12))) AS sxy,
         SUM(CAST(ROUND(x * x, 12) AS DECIMAL(28,12))) AS sxx,
         SUM(CAST(ROUND(y * y, 12) AS DECIMAL(28,12))) AS syy
  FROM xy
)
SELECT n_terms,
  ROUND((CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope,
  ROUND((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
    / (CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_intercept,
  ROUND((CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        * (CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / ((CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       * (CAST(n_terms AS DOUBLE) * CAST(syy AS DOUBLE)
          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
FROM s
"""


def doc_trigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram language-model scoring with JELINEK-MERCER interpolation
    (Jelinek & Mercer 1980; the smoothing Chen-Goodman found strongest
    for small training sets) — the step past ``doc_bigram_surprisal``'s
    stupid backoff: instead of falling off a cliff to the next-lower
    order, every test trigram mixes all three orders,
    ``p = 0.5·p(w3|w1,w2) + 0.3·p(w3|w2) + 0.2·p(w3)``, so seen AND
    unseen trigrams land on one smooth scale.  Counts come from the
    deterministic md5 TRAIN split; the TEST split is scored.

    Exactness: each order's probability is one double division of
    exact integer counts; the mixture is a fixed left-to-right
    double expression with CAST literals (no decimal-literal division);
    ROUND(12) after the one LN; per-trigram nats ROUND(12) →
    DECIMAL(28,12) before the per-doc sum, so aggregation order never
    matters; final mean ROUND(6).  Unseen unigrams floor at count 1 so
    p is never zero.

    Plan: one trigram explode per split; the three train tables are
    keyed aggregations (ctx2 derived from the trigram table — no extra
    scan); test scoring is four keyed left joins (AQE broadcasts small
    sides) + a 1-row total.  Nothing driver-sized."""
    from df_to_azure_spark.functions.sampling import with_split

    docs = with_split(load_table(spark, sf_dir, "documents"), "doc_id")
    toks_arr = docs.select("doc_id", "split", TXT.tokens("text").alias("t"))
    tg = (
        toks_arr.where(F.size("t") >= 3)
        .select(
            "doc_id",
            "split",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 3),"
                    " i -> struct(t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3))"
                )
            ).alias("g"),
        )
        .select("doc_id", "split", "g.w1", "g.w2", "g.w3")
    )
    bg = (
        toks_arr.where(F.size("t") >= 2)
        .select(
            "split",
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
                    " (a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("b"),
        )
        .select("split", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    tgc = (
        tg.where(F.col("split") == "train")
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("n_tg"))
    )
    ctx2 = tgc.groupBy("w1", "w2").agg(F.sum("n_tg").alias("n_ctx2"))
    bgc = (
        bg.where(F.col("split") == "train")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_bg"))
    )
    ctx1 = bgc.groupBy("w1").agg(F.sum("n_bg").alias("n_ctx1"))
    uni = (
        toks_arr.where(F.col("split") == "train")
        .select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_uni"))
    )
    total = uni.agg(F.sum("n_uni").alias("n_total"))
    test = tg.where(F.col("split") == "test")
    scored = (
        test.join(tgc, ["w1", "w2", "w3"], "left")
        .join(ctx2, ["w1", "w2"], "left")
        .join(
            bgc.select(
                F.col("w1").alias("w2"), F.col("w2").alias("w3"), "n_bg"
            ),
            ["w2", "w3"],
            "left",
        )
        .join(ctx1.select(F.col("w1").alias("w2"), "n_ctx1"), "w2", "left")
        .join(uni.select(F.col("w").alias("w3"), "n_uni"), "w3", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.expr(
                "ROUND(-LN("
                "  CAST(0.5 AS DOUBLE) * (CASE WHEN n_tg IS NOT NULL"
                "    THEN CAST(n_tg AS DOUBLE) / CAST(n_ctx2 AS DOUBLE)"
                "    ELSE CAST(0 AS DOUBLE) END)"
                "  + CAST(0.3 AS DOUBLE) * (CASE WHEN n_bg IS NOT NULL"
                "    THEN CAST(n_bg AS DOUBLE) / CAST(n_ctx1 AS DOUBLE)"
                "    ELSE CAST(0 AS DOUBLE) END)"
                "  + CAST(0.2 AS DOUBLE) * (CAST(coalesce(n_uni, 1) AS DOUBLE)"
                "    / CAST(n_total AS DOUBLE))"
                "), 12)"
            ).alias("nats"),
            F.expr("IF(n_tg IS NOT NULL, 1, 0)").alias("tri_hit"),
            F.expr("IF(n_bg IS NOT NULL, 1, 0)").alias("bi_hit"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
        F.expr(
            "ROUND(CAST(SUM(CAST(ROUND(nats, 12) AS DECIMAL(28,12)))"
            " AS DOUBLE) / COUNT(*), 6)"
        ).alias("mean_surprisal_nats"),
        F.expr("ROUND(CAST(SUM(tri_hit) AS DOUBLE) / COUNT(*), 6)").alias(
            "tri_hit_rate"
        ),
        F.expr("ROUND(CAST(SUM(bi_hit) AS DOUBLE) / COUNT(*), 6)").alias(
            "bi_hit_rate"
        ),
    )


TRIGRAM_SURPRISAL_ORACLE = f"""
WITH s AS (
  SELECT doc_id, {_TOKS} AS t,
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
), bg AS (
  SELECT split, b[1] AS w1, b[2] AS w2
  FROM (SELECT split,
               unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS b
        FROM s WHERE len(t) >= 2)
), tgc AS (
  SELECT w1, w2, w3, COUNT(*) AS n_tg FROM tg WHERE split = 'train'
  GROUP BY w1, w2, w3
), ctx2 AS (
  SELECT w1, w2, SUM(n_tg) AS n_ctx2 FROM tgc GROUP BY w1, w2
), bgc AS (
  SELECT w1, w2, COUNT(*) AS n_bg FROM bg WHERE split = 'train' GROUP BY w1, w2
), ctx1 AS (
  SELECT w1, SUM(n_bg) AS n_ctx1 FROM bgc GROUP BY w1
), uni AS (
  SELECT w, COUNT(*) AS n_uni
  FROM (SELECT unnest(t) AS w FROM s WHERE split = 'train') GROUP BY w
), total AS (
  SELECT SUM(n_uni) AS n_total FROM uni
), scored AS (
  SELECT g.doc_id,
    ROUND(-LN(
      CAST(0.5 AS DOUBLE) * (CASE WHEN tgc.n_tg IS NOT NULL
        THEN CAST(tgc.n_tg AS DOUBLE) / CAST(ctx2.n_ctx2 AS DOUBLE)
        ELSE CAST(0 AS DOUBLE) END)
      + CAST(0.3 AS DOUBLE) * (CASE WHEN b2.n_bg IS NOT NULL
        THEN CAST(b2.n_bg AS DOUBLE) / CAST(c1.n_ctx1 AS DOUBLE)
        ELSE CAST(0 AS DOUBLE) END)
      + CAST(0.2 AS DOUBLE) * (CAST(coalesce(u.n_uni, 1) AS DOUBLE)
        / CAST(total.n_total AS DOUBLE))
    ), 12) AS nats,
    CASE WHEN tgc.n_tg IS NOT NULL THEN 1 ELSE 0 END AS tri_hit,
    CASE WHEN b2.n_bg IS NOT NULL THEN 1 ELSE 0 END AS bi_hit
  FROM tg g
  LEFT JOIN tgc ON g.w1 = tgc.w1 AND g.w2 = tgc.w2 AND g.w3 = tgc.w3
  LEFT JOIN ctx2 ON g.w1 = ctx2.w1 AND g.w2 = ctx2.w2
  LEFT JOIN bgc b2 ON g.w2 = b2.w1 AND g.w3 = b2.w2
  LEFT JOIN ctx1 c1 ON g.w2 = c1.w1
  LEFT JOIN uni u ON g.w3 = u.w
  CROSS JOIN total
  WHERE g.split = 'test'
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
  ROUND(CAST(SUM(CAST(ROUND(nats, 12) AS DECIMAL(28,12))) AS DOUBLE)
        / COUNT(*), 6) AS mean_surprisal_nats,
  ROUND(CAST(SUM(tri_hit) AS DOUBLE) / COUNT(*), 6) AS tri_hit_rate,
  ROUND(CAST(SUM(bi_hit) AS DOUBLE) / COUNT(*), 6) AS bi_hit_rate
FROM scored GROUP BY doc_id
"""
