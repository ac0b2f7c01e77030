"""Training-data pipeline queries over `documents` / `embeddings`:
text analysis, dedup, similarity search — each paired with a DuckDB
oracle where the semantics are SQL-expressible (list lambdas), else
registered oracle-less (driver records the weaker rows-only check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from df_to_azure_spark.functions import dedup as D
from df_to_azure_spark.functions import similarity as SIM
from df_to_azure_spark.functions import text as TXT
from df_to_azure_spark.sources import load_table

# DuckDB token fragment mirroring functions.text.tokens
_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"


def doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TXT.token_count("text").cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_calc"),
        TXT.avg_token_length("text").alias("avg_token_len"),
    )


DOC_STATS_ORACLE = f"""
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(length(text) AS BIGINT) AS n_chars_calc,
  round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 4)
    AS avg_token_len
FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
"""


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TXT.stopword_count("text").cast("long").alias("n_stopwords"),
        TXT.quality_score("text").alias("quality"),
    )


_SW = "('the','a','of','and','to','in','is')"
DOC_QUALITY_ORACLE = f"""
SELECT doc_id,
  CAST(len(list_filter(toks, x -> x IN {_SW})) AS BIGINT) AS n_stopwords,
  round(
    least(1.0, CAST(len(toks) AS DOUBLE) / 50.0) * 0.5 +
    (CASE WHEN len(toks) > 0
          THEN CAST(len(list_filter(toks, x -> x IN {_SW})) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
          ELSE 0.0 END) * 0.5,
    4) AS quality
FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
"""


def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", TXT.language_id("text").alias("lang_guess"))


def _lang_count_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in TXT.LANG_MARKERS[lang])
    return f"len(list_filter(toks, x -> x IN ({markers})))"


_LANG_CASE = (
    "CASE WHEN greatest("
    + ", ".join(f"c_{l}" for l in TXT.LANG_PRIORITY)
    + ") <= 0 THEN 'unknown' "
    + " ".join(
        f"WHEN c_{l} = greatest({', '.join('c_' + x for x in TXT.LANG_PRIORITY)}) THEN '{l}'"
        for l in TXT.LANG_PRIORITY
    )
    + " ELSE 'unknown' END"
)

DOC_LANG_ORACLE = f"""
SELECT doc_id, lang, {_LANG_CASE} AS lang_guess
FROM (
  SELECT doc_id, lang,
    {", ".join(f"{_lang_count_sql(l)} AS c_{l}" for l in TXT.LANG_PRIORITY)}
  FROM (SELECT doc_id, lang, {_TOKS} AS toks FROM documents)
)
"""


def exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup_groups(docs)


EXACT_DEDUP_ORACLE = """
SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM documents GROUP BY md5(text)
"""


# sequential left-fold dot product in DuckDB, mirroring similarity.dot
def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), r -> r[1] * r[2])), (acc, x) -> acc + x)"
    )


def knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return SIM.cosine_topk(queries, emb, k=10)


_COS = (
    f"round({_dot_sql('qv', 'cv')} / "
    f"(sqrt({_dot_sql('qv', 'qv')}) * sqrt({_dot_sql('cv', 'cv')})), 8)"
)

KNN_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS neighbor_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id, {_COS} AS cos_sim
  FROM c CROSS JOIN q WHERE query_id <> neighbor_id
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_sim
FROM (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= 10
"""


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.embedding_neardup_pairs(emb, threshold=0.8)


NEARDUP_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_dot_sql('a.ev', 'b.ev')} /
             (sqrt({_dot_sql('a.ev', 'a.ev')}) * sqrt({_dot_sql('b.ev', 'b.ev')})), 8) AS cos_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round({_dot_sql('a.ev', 'b.ev')} /
            (sqrt({_dot_sql('a.ev', 'a.ev')}) * sqrt({_dot_sql('b.ev', 'b.ev')})), 8) >= 0.8
"""


# Seeded hyperplanes for the bucketed near-dup variant.  The testdata
# embedding dim is 64 at every SF; both the Spark query and the DuckDB
# oracle embed the SAME literal planes, so the bucketing — and therefore
# the full result — is exactly reproducible across engines (dot products
# are sequential double folds on both sides).
_NEARDUP_DIM = 64
_NEARDUP_N_PLANES = 3


def _neardup_planes() -> list[list[float]]:
    import random

    rng = random.Random(7)
    return [
        [rng.gauss(0, 1) for _ in range(_NEARDUP_DIM)]
        for _ in range(_NEARDUP_N_PLANES)
    ]


def embedding_neardup_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed scale path of ``embedding_neardup_pairs``: candidates
    come from an equi-join on the hyperplane bucket, not a cross join."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.embedding_neardup_pairs_lsh(emb, _neardup_planes(), threshold=0.8)


def _neardup_bucket_cte() -> str:
    """Shared CTE text: vectors + their hyperplane bucket (same literal
    planes as the Spark side)."""
    planes = _neardup_planes()
    bucket_terms = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(repr(x) for x in p) + "]"
        bucket_terms.append(
            f"(CASE WHEN {_dot_sql('ev', lit)} >= 0 THEN {1 << i} ELSE 0 END)"
        )
    bucket = " + ".join(bucket_terms)
    return f"""v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
  FROM embeddings
), vb AS (
  SELECT vec_id, ev, {bucket} AS bucket FROM v
)"""


_PAIR_COS = (
    f"round({_dot_sql('a.ev', 'b.ev')} /"
    f" (sqrt({_dot_sql('a.ev', 'a.ev')}) * sqrt({_dot_sql('b.ev', 'b.ev')})), 8)"
)

NEARDUP_LSH_ORACLE = f"""
WITH {_neardup_bucket_cte()}
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_PAIR_COS} AS cos_sim
FROM vb a JOIN vb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_PAIR_COS} >= 0.8
"""


def minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash/LSH near-dup pairs, fully oracle-paired: the signature
    hash is a universal-hash family over md5-prefix integers
    (``dedup.minhash_coeffs`` — exact integer math, engine-portable) and
    the band-bucket key is the signature slice verbatim, so DuckDB
    rebuilds the identical candidate set and estimates.  The
    probabilistic ESTIMATION QUALITY is separately bounded by
    ``minhash_error_check`` (binomial bound vs exact Jaccard)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, threshold=0.3)


def _minhash_cte_parts(
    num_hashes: int = 64, bands: int = 16, shingle_n: int = 3
) -> tuple[str, str]:
    """(CTE prefix through ``banded``, band-key join condition) — shared
    by the self-join oracle and the incremental between-sides oracle."""
    coeffs = D.minhash_coeffs(num_hashes)
    vals = ", ".join(f"({p}, {a}, {b})" for p, (a, b) in enumerate(coeffs))
    m = D.MINHASH_PRIME
    rpb = num_hashes // bands
    assert rpb % 2 == 0, "oracle generator assumes an even band width"
    n_keys = rpb // 2
    key_exprs = ",\n         ".join(
        f"MIN(CASE WHEN p % {rpb} = {2 * j} THEN h END) * {m}"
        f" + MIN(CASE WHEN p % {rpb} = {2 * j + 1} THEN h END) AS k{j}"
        for j in range(n_keys)
    )
    key_join = " AND ".join(f"a.k{j} = b.k{j}" for j in range(n_keys))
    prefix = f"""toked AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - {shingle_n - 1}, 1) + 1),
           i -> array_to_string(toks[i:i+{shingle_n - 1}], ' ')))) AS s
  FROM toked WHERE len(toks) > 0
), base AS (
  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT % {m} AS bh FROM sh
), perms(p, a, b) AS (VALUES {vals}),
mh AS (
  SELECT doc_id, p, MIN((a * bh + b) % {m}) AS h
  FROM base CROSS JOIN perms GROUP BY doc_id, p
), banded AS (
  SELECT doc_id, p // {rpb} AS band,
         {key_exprs}
  FROM mh GROUP BY doc_id, p // {rpb}
)"""
    return prefix, key_join


def _minhash_oracle(
    num_hashes: int = 64, bands: int = 16, shingle_n: int = 3, threshold: float = 0.3
) -> str:
    """DuckDB twin of ``dedup.minhash_lsh_pairs`` — same tokenization,
    shingling, universal-hash literals, banding, and estimate."""
    prefix, key_join = _minhash_cte_parts(num_hashes, bands, shingle_n)
    return f"""
WITH {prefix}, cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND {key_join} AND a.doc_id < b.doc_id
), est AS (
  SELECT c.id_a, c.id_b,
         CAST(SUM(CASE WHEN x.h = y.h THEN 1 ELSE 0 END) AS DOUBLE)
           / {float(num_hashes)} AS est_jaccard
  FROM cand c
  JOIN mh x ON x.doc_id = c.id_a
  JOIN mh y ON y.doc_id = c.id_b AND y.p = x.p
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= {threshold}
"""


MINHASH_PAIRS_ORACLE = _minhash_oracle()


# incremental ingest split: "new batch" = top fifth of doc ids at any SF
_INCR_SPLIT_FRACTION = 0.8


def incremental_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup probe: the top-fifth of doc ids play the
    incoming batch, probed against the remaining corpus with
    ``minhash_lsh_pairs_between`` — candidates only ACROSS the
    batch/corpus boundary, never corpus×corpus (the per-batch cost a
    continuous-ingest pipeline actually pays)."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    cut = int(n * _INCR_SPLIT_FRACTION)
    new = docs.where(F.col("doc_id") >= cut)
    corpus = docs.where(F.col("doc_id") < cut)
    return D.minhash_lsh_pairs_between(new, corpus, threshold=0.3)


def _minhash_between_oracle(
    num_hashes: int = 64, bands: int = 16, shingle_n: int = 3, threshold: float = 0.3
) -> str:
    prefix, key_join = _minhash_cte_parts(num_hashes, bands, shingle_n)
    # FLOOR to mirror Python's int() truncation for non-round counts
    cut = (
        f"(SELECT CAST(FLOOR(COUNT(*) * {_INCR_SPLIT_FRACTION}) AS BIGINT) "
        "FROM documents)"
    )
    return f"""
WITH {prefix}, cand AS (
  SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_corpus
  FROM banded a JOIN banded b
    ON a.band = b.band AND {key_join}
  WHERE a.doc_id >= {cut} AND b.doc_id < {cut}
), est AS (
  SELECT c.id_new, c.id_corpus,
         CAST(SUM(CASE WHEN x.h = y.h THEN 1 ELSE 0 END) AS DOUBLE)
           / {float(num_hashes)} AS est_jaccard
  FROM cand c
  JOIN mh x ON x.doc_id = c.id_new
  JOIN mh y ON y.doc_id = c.id_corpus AND y.p = x.p
  GROUP BY c.id_new, c.id_corpus
)
SELECT id_new, id_corpus, est_jaccard FROM est WHERE est_jaccard >= {threshold}
"""


MINHASH_BETWEEN_ORACLE = _minhash_between_oracle()


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document, fully oracle-paired: token hashes
    are md5-derived 32-bit halves (exact integer math), so DuckDB
    reproduces every fingerprint bit-for-bit.  The structural invariant
    (identical text ⇒ identical fingerprint) stays hash-checked by
    ``simhash_invariant_check``."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash64(docs)


SIMHASH_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), tok AS (
  SELECT doc_id, unnest(toks) AS t FROM toked
), th AS (
  SELECT doc_id, md5(t) AS m FROM tok
), hl AS (
  SELECT doc_id,
         ('0x' || substr(m, 1, 8))::BIGINT AS hi,
         ('0x' || substr(m, 9, 8))::BIGINT AS lo
  FROM th
), votes AS (
  SELECT doc_id, i,
         SUM((CASE WHEN i < 32 THEN (lo >> i) & 1
                   ELSE (hi >> (i - 32)) & 1 END) * 2 - 1) AS v
  FROM hl CROSS JOIN range(64) r(i) GROUP BY doc_id, i
), packed AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN
                    CASE WHEN i = 63 THEN -9223372036854775808
                         ELSE (1::BIGINT << i) END
                  ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(p.simhash, 0) AS simhash
FROM documents d LEFT JOIN packed p USING (doc_id)
"""


def doc_shared_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shared-substring spans (Lee et al. ACL'22 dedup): for every
    document pair, the maximal exactly-repeated token spans ≥ 12 tokens
    — the span-removal input that pair-level Jaccard scores can't give.
    Positional 8-gram inverted index + diagonal gaps-and-islands
    chaining; see ``dedup.shared_span_pairs`` for the 100 TB shape."""
    docs = load_table(spark, sf_dir, "documents")
    return D.shared_span_pairs(
        docs, shingle_n=8, min_span_tokens=12, hot_shingle_cap=1000
    )


_SPAN_K = 8
# CTE chain through `spans` (maximal shared spans) — shared by the
# span-detection oracle and the span-removal oracle.
_SPAN_CTES = f"""toked AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), sh0 AS (
  SELECT doc_id, u.pos AS pos,
         ('0x' || substr(md5(u.s), 1, 12))::BIGINT AS h
  FROM (SELECT doc_id,
          unnest(list_transform(range(1, greatest(len(toks) - {_SPAN_K - 1}, 1) + 1),
                 i -> {{'pos': i, 's': array_to_string(toks[i:i+{_SPAN_K - 1}], ' ')}})) AS u
        FROM toked WHERE len(toks) > 0)
), hot AS (
  SELECT h FROM sh0 GROUP BY h HAVING COUNT(*) > 1000
), sh AS (
  SELECT * FROM sh0 WHERE h NOT IN (SELECT h FROM hot)
), m AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pos_a, b.pos AS pos_b
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
), isl AS (
  SELECT id_a, id_b, pos_a, pos_b, pos_a - pos_b AS diag,
         pos_a - ROW_NUMBER() OVER (
           PARTITION BY id_a, id_b, pos_a - pos_b ORDER BY pos_a) AS isl
  FROM m
), spans AS (
  SELECT id_a, id_b, MIN(pos_a) AS start_a, MIN(pos_b) AS start_b,
         CAST(COUNT(*) + {_SPAN_K - 1} AS BIGINT) AS span_tokens
  FROM isl GROUP BY id_a, id_b, diag, isl
)"""

SHARED_SPANS_ORACLE = f"""
WITH {_SPAN_CTES}
SELECT id_a, id_b, start_a, start_b, span_tokens
FROM spans WHERE span_tokens >= 12
"""


def doc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-removal dedup: duplicated token ranges are dropped from the
    higher-id document of each shared-span pair and the text rebuilt —
    the transform a substring-dedup pass actually applies, verified all
    the way to the reconstructed strings."""
    docs = load_table(spark, sf_dir, "documents")
    return D.remove_shared_spans(
        docs, shingle_n=_SPAN_K, min_span_tokens=12, hot_shingle_cap=1000
    )


SPAN_DEDUP_ORACLE = f"""
WITH {_SPAN_CTES}, drops AS (
  SELECT DISTINCT id_b AS doc_id, u AS pos
  FROM (SELECT id_b, unnest(range(start_b, start_b + span_tokens)) AS u
        FROM spans WHERE span_tokens >= 12)
), tpos AS (
  SELECT doc_id, u.pos AS pos, u.tok AS tok
  FROM (SELECT doc_id,
          unnest(list_transform(range(1, len(toks) + 1),
                 i -> {{'pos': i, 'tok': toks[i]}})) AS u
        FROM toked)
), kept AS (
  SELECT t.doc_id, t.pos, t.tok FROM tpos t
  WHERE NOT EXISTS (SELECT 1 FROM drops d
                    WHERE d.doc_id = t.doc_id AND d.pos = t.pos)
), rebuilt AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS text_dedup
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(len(t.toks) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(r.text_dedup, '') AS text_dedup
FROM documents d
JOIN toked t USING (doc_id)
LEFT JOIN rebuilt r USING (doc_id)
"""


def suffix_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-GLOBAL exact duplicate substrings (Lee et al. ACL'22
    suffix-array semantics, round-9 verdict task 4): every maximal
    token span ≥ 12 whose content occurs ≥ 2 times anywhere in the
    corpus — across documents OR repeated within one document, which
    the pairwise ``doc_shared_spans`` misses by construction.  See
    ``dedup.duplicate_spans_global`` for the suffix-ordering
    equivalence and the no-pair-join scale shape."""
    docs = load_table(spark, sf_dir, "documents")
    return D.duplicate_spans_global(docs, shingle_n=_SPAN_K, min_span_tokens=12)


# Shared CTE chain for the suffix-ordering dedup family: positional
# k-gram fingerprints → global occurrence count (the LCP ≥ k criterion)
# → marked positions → per-doc islands → maximal spans ≥ 12 tokens.
_SUFFIX_CTES = f"""toked AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), sh0 AS (
  SELECT doc_id, u.pos AS pos,
         ('0x' || substr(md5(u.s), 1, 12))::BIGINT AS h
  FROM (SELECT doc_id,
          unnest(list_transform(range(1, greatest(len(toks) - {_SPAN_K - 1}, 1) + 1),
                 i -> {{'pos': i, 's': array_to_string(toks[i:i+{_SPAN_K - 1}], ' ')}})) AS u
        FROM toked WHERE len(toks) > 0)
), dup AS (
  SELECT h FROM sh0 GROUP BY h HAVING COUNT(*) >= 2
), mk AS (
  SELECT doc_id, pos FROM sh0 WHERE h IN (SELECT h FROM dup)
), isl AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM mk
), spans AS (
  SELECT doc_id, MIN(pos) AS start_pos,
         CAST(COUNT(*) + {_SPAN_K - 1} AS BIGINT) AS span_tokens
  FROM isl GROUP BY doc_id, isl
), spans12 AS (
  SELECT doc_id, start_pos, span_tokens FROM spans WHERE span_tokens >= 12
)"""

SUFFIX_DUP_SPANS_ORACLE = f"""
WITH {_SUFFIX_CTES}
SELECT doc_id, start_pos, span_tokens FROM spans12
"""


def suffix_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language duplication-burden report over the suffix-ordering
    spans: how many documents carry ≥ 12-token corpus-duplicated spans,
    and what fraction of each language's token mass a span-removal pass
    would touch — the go/no-go sheet a training-data owner reads before
    running substring dedup.  Duplicated token positions are counted
    DISTINCT (adjacent spans whose token ranges overlap are not
    double-counted).  All counts are integers until the one final
    rounded division."""
    docs = load_table(spark, sf_dir, "documents")
    spans = D.duplicate_spans_global(
        docs, shingle_n=_SPAN_K, min_span_tokens=12
    )
    dup_pos = spans.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.col("start_pos"),
                F.col("start_pos") + F.col("span_tokens") - 1,
            )
        ).alias("pos"),
    ).distinct()
    per_doc = dup_pos.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dup_tokens")
    )
    base = docs.select(
        "doc_id",
        "lang",
        F.size(D.tokens("text")).cast("bigint").alias("n_tokens"),
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(
                F.when(F.coalesce(F.col("dup_tokens"), F.lit(0)) > 0, 1).otherwise(0)
            ).cast("bigint").alias("docs_with_dups"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum(F.coalesce(F.col("dup_tokens"), F.lit(0)))
            .cast("bigint")
            .alias("dup_tokens"),
            F.expr(
                "CASE WHEN SUM(n_tokens) = 0 THEN CAST(0 AS DOUBLE)"
                " ELSE ROUND(CAST(SUM(COALESCE(dup_tokens, 0)) AS DOUBLE)"
                " / CAST(SUM(n_tokens) AS DOUBLE), 6) END"
            ).alias("dup_frac"),
        )
    )


SUFFIX_DUP_PROFILE_ORACLE = f"""
WITH {_SUFFIX_CTES}, dpos AS (
  SELECT DISTINCT doc_id, u AS pos
  FROM (SELECT doc_id,
          unnest(range(start_pos, start_pos + span_tokens)) AS u
        FROM spans12)
), per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_tokens
  FROM dpos GROUP BY doc_id
), base AS (
  SELECT d.doc_id, d.lang, CAST(len(t.toks) AS BIGINT) AS n_tokens
  FROM documents d JOIN toked t USING (doc_id)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN COALESCE(p.dup_tokens, 0) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_with_dups,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(COALESCE(p.dup_tokens, 0)) AS BIGINT) AS dup_tokens,
       CASE WHEN SUM(n_tokens) = 0 THEN CAST(0 AS DOUBLE)
            ELSE ROUND(CAST(SUM(COALESCE(p.dup_tokens, 0)) AS DOUBLE)
                 / CAST(SUM(n_tokens) AS DOUBLE), 6) END AS dup_frac
FROM base b LEFT JOIN per_doc p USING (doc_id)
GROUP BY lang
"""


def suffix_dup_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-global substring-dedup REMOVAL: drop every maximal ≥ 12-
    token span of non-first duplicate occurrences (globally-first copy
    by (doc_id, pos) survives) and rebuild the text — the transform
    Lee et al.'s suffix-array tool applies, verified all the way to the
    reconstructed strings.  See ``dedup.remove_duplicate_spans_global``."""
    docs = load_table(spark, sf_dir, "documents")
    return D.remove_duplicate_spans_global(
        docs, shingle_n=_SPAN_K, min_span_tokens=12
    )


SUFFIX_DUP_REMOVAL_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), sh0 AS (
  SELECT doc_id, u.pos AS pos,
         ('0x' || substr(md5(u.s), 1, 12))::BIGINT AS h
  FROM (SELECT doc_id,
          unnest(list_transform(range(1, greatest(len(toks) - {_SPAN_K - 1}, 1) + 1),
                 i -> {{'pos': i, 's': array_to_string(toks[i:i+{_SPAN_K - 1}], ' ')}})) AS u
        FROM toked WHERE len(toks) > 0)
), f1 AS (
  SELECT h, MIN(doc_id) AS fdoc FROM sh0 GROUP BY h
), f2 AS (
  SELECT s.h, f1.fdoc, MIN(s.pos) AS fpos
  FROM sh0 s JOIN f1 ON s.h = f1.h AND s.doc_id = f1.fdoc
  GROUP BY s.h, f1.fdoc
), mk AS (
  SELECT s.doc_id, s.pos FROM sh0 s JOIN f2 ON s.h = f2.h
  WHERE s.doc_id <> f2.fdoc OR s.pos <> f2.fpos
), isl AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM mk
), spans AS (
  SELECT doc_id, MIN(pos) AS start_pos,
         CAST(COUNT(*) + {_SPAN_K - 1} AS BIGINT) AS span_tokens
  FROM isl GROUP BY doc_id, isl
), drops AS (
  SELECT DISTINCT doc_id, u AS pos
  FROM (SELECT doc_id, unnest(range(start_pos, start_pos + span_tokens)) AS u
        FROM spans WHERE span_tokens >= 12)
), tpos AS (
  SELECT doc_id, u.pos AS pos, u.tok AS tok
  FROM (SELECT doc_id,
          unnest(list_transform(range(1, len(toks) + 1),
                 i -> {{'pos': i, 'tok': toks[i]}})) AS u
        FROM toked)
), kept AS (
  SELECT t.doc_id, t.pos, t.tok FROM tpos t
  WHERE NOT EXISTS (SELECT 1 FROM drops d
                    WHERE d.doc_id = t.doc_id AND d.pos = t.pos)
), rebuilt AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS text_dedup
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(len(t.toks) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(r.text_dedup, '') AS text_dedup
FROM documents d
JOIN toked t USING (doc_id)
LEFT JOIN rebuilt r USING (doc_id)
"""


def suffix_contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set substring leakage screen (Lee et al. decontamination):
    maximal ≥ 12-token spans in the md5 TEST split whose every 8-gram
    also occurs in the TRAIN split — verbatim content the model trained
    on, at span granularity instead of ``split_contamination``'s
    whole-document / shingle-set granularity.  See
    ``dedup.contaminated_spans_between``."""
    from df_to_azure_spark.functions.sampling import with_split

    docs = with_split(load_table(spark, sf_dir, "documents"), "doc_id")
    return D.contaminated_spans_between(
        docs.where(F.col("split") == "test").drop("split"),
        docs.where(F.col("split") == "train").drop("split"),
        shingle_n=_SPAN_K,
        min_span_tokens=12,
    )


SUFFIX_CONTAMINATION_ORACLE = f"""
WITH sdoc AS (
  SELECT doc_id, {_TOKS} AS toks,
         CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100 < 80
              THEN 'train'
              WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100 < 90
              THEN 'val' ELSE 'test' END AS split
  FROM documents
), sh0 AS (
  SELECT doc_id, split, u.pos AS pos,
         ('0x' || substr(md5(u.s), 1, 12))::BIGINT AS h
  FROM (SELECT doc_id, split,
          unnest(list_transform(range(1, greatest(len(toks) - {_SPAN_K - 1}, 1) + 1),
                 i -> {{'pos': i, 's': array_to_string(toks[i:i+{_SPAN_K - 1}], ' ')}})) AS u
        FROM sdoc WHERE len(toks) > 0)
), trainh AS (
  SELECT DISTINCT h FROM sh0 WHERE split = 'train'
), mk AS (
  SELECT doc_id, pos FROM sh0
  WHERE split = 'test' AND h IN (SELECT h FROM trainh)
), isl AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM mk
), spans AS (
  SELECT doc_id, MIN(pos) AS start_pos,
         CAST(COUNT(*) + {_SPAN_K - 1} AS BIGINT) AS span_tokens
  FROM isl GROUP BY doc_id, isl
)
SELECT doc_id, start_pos, span_tokens FROM spans WHERE span_tokens >= 12
"""


def token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample each source to an 800-token budget in deterministic
    hash order — the "N tokens of each source" data-mix selection; see
    ``sampling.token_budget_sample``."""
    from df_to_azure_spark.functions.sampling import token_budget_sample

    docs = load_table(spark, sf_dir, "documents")
    return token_budget_sample(docs, budget_tokens=800, group_col="source").select(
        "doc_id", "source", "n_tokens", "cum_tokens"
    )


TOKEN_BUDGET_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_tokens - n_tokens < 800
"""


def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, threshold=0.3)


# exact Jaccard IS SQL-expressible: unnest distinct shingles, posting-list
# self-join, |A∩B| / (|A|+|B|-|A∩B|) — mirrors dedup.ngram_jaccard_pairs
NGRAM_JACCARD_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
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
       round(CAST(n_inter AS DOUBLE) /
             CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(CAST(n_inter AS DOUBLE) /
            CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 6) >= 0.3
"""


_BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def doc_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword counting: alpha runs, digit runs, single symbols —
    the cheap pre-tokenizer shape real BPE pipelines apply first."""
    docs = load_table(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0)
    return docs.select(
        "doc_id",
        F.size(pieces).cast("long").alias("n_pieces"),
        F.size(F.array_distinct(pieces)).cast("long").alias("n_unique_pieces"),
    )


DOC_TOKEN_BPE_ORACLE = f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT) AS n_pieces,
  CAST(len(list_distinct(regexp_extract_all(text, '{_BPE_PATTERN}'))) AS BIGINT)
    AS n_unique_pieces
FROM documents
"""


def exact_dedup_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated documents table itself (min-id winner per text)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(docs)


EXACT_DEDUP_TABLE_ORACLE = """
SELECT * FROM documents
WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
"""


def _lsh_knn_planes() -> list[list[float]]:
    import random

    rng = random.Random(42)
    return [[rng.gauss(0, 1) for _ in range(_NEARDUP_DIM)] for _ in range(2)]


def lsh_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k through hyperplane-LSH bucketing — the scale
    path next to the exact ``knn_topk`` baseline.  Seeded fixed-dim plane
    literals are mirrored in the oracle (same sign-fold both engines), so
    the bucketing AND the in-bucket ranking are exact-hash-checked;
    recall vs the exact baseline is separately pinned in
    tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return SIM.lsh_topk(queries, emb, _lsh_knn_planes(), k=10)


def _lsh_bucket_sql(vec_expr: str = "ev") -> str:
    """Sign-fold bucket expression over the seeded ``_lsh_knn_planes`` —
    the SQL twin of ``similarity.hyperplane_bucket`` with those planes;
    shared by the kNN oracle and the index-artifact summary oracle."""
    planes = _lsh_knn_planes()
    terms = []
    for i, pl in enumerate(planes):
        lit = "CAST([" + ", ".join(repr(x) for x in pl) + "] AS DOUBLE[])"
        terms.append(
            f"(CASE WHEN {_dot_sql(vec_expr, lit)} >= 0 THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(terms)


def _lsh_knn_oracle() -> str:
    bucket = _lsh_bucket_sql("ev")
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
  FROM embeddings
), vb AS (
  SELECT vec_id, ev, {bucket} AS bucket FROM v
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_dot_sql('q.ev', 'c.ev')} /
               (sqrt({_dot_sql('q.ev', 'q.ev')}) * sqrt({_dot_sql('c.ev', 'c.ev')})), 8) AS cos_sim
  FROM vb q JOIN vb c ON q.bucket = c.bucket
  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_sim
FROM (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= 10
"""


LSH_KNN_ORACLE = _lsh_knn_oracle()


def doc_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split over documents —
    stable across runs, clusters, and engines (md5 of the id)."""
    from df_to_azure_spark.functions.sampling import with_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        with_split(docs, "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


DOC_SPLIT_ORACLE = """
SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT n_chars,
         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT n_chars,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 100 AS b
        FROM documents)
)
GROUP BY split
"""


def incremental_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: state built from pre-1998 orders,
    merged with the 1998+ delta's partial aggregate — must equal the full
    recompute (the oracle)."""
    from df_to_azure_spark.operators.incremental import incremental_agg

    orders = load_table(spark, sf_dir, "orders")
    cut = "o_orderdate < TIMESTAMP_NTZ '1998-01-01 00:00:00'"
    base = orders.where(F.expr(cut))
    delta = orders.where(~F.expr(cut))
    out = incremental_agg(
        base,
        delta,
        ["o_orderstatus"],
        {"total_dec": "CAST(o_totalprice AS DECIMAL(18,2))"},
    )
    return out.select(
        "o_orderstatus",
        F.col("n").cast("long").alias("n_orders"),
        F.col("total_dec").cast("double").alias("total_price"),
    )


INCREMENTAL_ORACLE = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY o_orderstatus
"""


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing surface: deterministic synthetic media table →
    Arrow-batched (stub-decoded) features via mapInPandas.  The stub
    derives features from sha256 HEX digits, so the whole decode is
    replicable in SQL — the Python/Arrow plumbing is hash-checked against
    the oracle below, not just row-counted."""
    from df_to_azure_spark.functions import multimodal as MM

    media = MM.synthesize_media(spark, n=200)
    return MM.extract_features(media)


MEDIA_FEATURES_ORACLE = """
WITH m AS (
  SELECT range AS media_id,
         encode(sha256(CAST(range AS VARCHAR))) AS payload
  FROM range(0, 200)
), h AS (
  SELECT media_id, payload, sha256(decode(payload)) AS hx FROM m
)
SELECT media_id,
  CASE media_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
  CAST(octet_length(payload) AS INT) AS n_bytes,
  list_transform(range(1, 17),
    i -> CAST(strpos('0123456789abcdef', hx[i]) - 1 AS DOUBLE) / 15.0
  ) AS features
FROM h
"""


# IVF centroids: seeded, data-independent literals (production would
# k-means; deterministic literals keep the oracle exact).  C=8, nprobe=2
# → each query scans ~1/4 of the corpus.
_IVF_N_CENTROIDS = 8


def _ivf_centroids() -> list[list[float]]:
    import random

    rng = random.Random(11)
    return [
        [rng.gauss(0, 1) for _ in range(_NEARDUP_DIM)]
        for _ in range(_IVF_N_CENTROIDS)
    ]


def ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned approximate top-k — the inverted-list scale path
    next to ``knn_topk`` (exact) and ``lsh_knn`` (hyperplane LSH)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return SIM.ivf_topk(queries, emb, _ivf_centroids(), k=10, nprobe=2)


def _ivf_assign_ctes() -> str:
    """CTE fragment ``c, cd, ca`` assigning every corpus vector its
    nearest coarse centroid (``ca`` = ``neighbor_id, cv, cid``) — the
    SQL twin of ``similarity.ivf_index`` over ``_ivf_centroids``; shared
    by the kNN oracle and the index-artifact summary oracle."""
    cents = _ivf_centroids()
    # explicit DOUBLE[] cast: DuckDB otherwise types bare numeric list
    # literals as DECIMAL, which overflows in literal×literal dot products
    lits = [
        "CAST([" + ", ".join(repr(x) for x in c) + "] AS DOUBLE[])" for c in cents
    ]
    c2s = [repr(float(sum(x * x for x in c))) for c in cents]
    d_cols = ", ".join(
        f"({_dot_sql('cv', 'cv')} - 2.0 * {_dot_sql('cv', lits[i])} + {c2s[i]}) AS d{i}"
        for i in range(len(cents))
    )
    least = "least(" + ", ".join(f"d{i}" for i in range(len(cents))) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN d{i} = {least} THEN {i}" for i in range(len(cents)))
        + " END"
    )
    return f"""c AS (
  SELECT vec_id AS neighbor_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
), cd AS (
  SELECT neighbor_id, cv, {d_cols} FROM c
), ca AS (
  SELECT neighbor_id, cv, CAST({case} AS INT) AS cid FROM cd
)"""


def _ivf_oracle() -> str:
    cents = _ivf_centroids()
    lits = [
        "CAST([" + ", ".join(repr(x) for x in c) + "] AS DOUBLE[])" for c in cents
    ]
    values = ", ".join(f"({i}, {lits[i]})" for i in range(len(cents)))
    return f"""
WITH {_ivf_assign_ctes()}, q AS (
  SELECT vec_id AS query_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < 5
), qd AS (
  SELECT query_id, qv, cent.cid,
         {_dot_sql('qv', 'qv')} - 2.0 * {_dot_sql('qv', 'cent.cv')}
           + {_dot_sql('cent.cv', 'cent.cv')} AS cd
  FROM q CROSS JOIN (VALUES {values}) AS cent(cid, cv)
), probes AS (
  SELECT query_id, qv, cid FROM (
    SELECT query_id, qv, cid,
           row_number() OVER (PARTITION BY query_id ORDER BY cd, cid) AS pr
    FROM qd
  ) WHERE pr <= 2
), scored AS (
  SELECT query_id, neighbor_id, {_COS} AS cos_sim
  FROM ca JOIN probes USING (cid)
  WHERE query_id <> neighbor_id
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_sim
FROM (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= 10
"""


IVF_KNN_ORACLE = _ivf_oracle()


# NN-descent graph ANN: k neighbors kept, ring-init fan-out, local-join
# rounds; probe prefix for the recall audit.  The demonstration runs on
# a PLANTED-CLUSTER view of the embeddings: the raw synthetic vectors
# are iid Gaussian (measured within- vs across-label mean cosine both
# ≈ 0.00 — no neighborhood locality exists at ANY dimension, so no
# graph-refinement method can converge on them; real embeddings cluster).
# The view takes the first 8 dims and shifts dim (vec_id mod 8) by a
# constant — 8 deterministic clusters, the standard planted geometry for
# ANN benchmarking — and the oracle replays the plant bit-for-bit, so
# the recall audit measures the OPERATOR, not the accident of iid data.
# Breadth/rounds trade off convergence (Dong et al. §5); the registry
# pins k=16 × 4 rounds (measured recall@16 0.77 at sf0.1 / 0.86+ at
# sf0.01, ~6 s build) and audits recall in ``nn_descent_recall_check``.
_NND_K = 16
_NND_CAP = 16
_NND_ROUNDS = 4
_NND_DIM = 8
_NND_SHIFT = 3.0
_NND_PLANES_N = 4
_NND_PROBE = 50


def _nnd_planes() -> list[list[float]]:
    import random

    rng = random.Random(23)
    return [
        [rng.gauss(0, 1) for _ in range(_NND_DIM)]
        for _ in range(_NND_PLANES_N)
    ]


def _nnd_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-d planted-cluster view: cast-to-double FIRST, then add the
    shift (float→double widening is exact and 3.0 is dyadic, so both
    engines compute identical doubles)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.expr(
            f"transform(sequence(1, {_NND_DIM}),"
            " i -> CAST(element_at(embedding, i) AS DOUBLE)"
            f" + IF(pmod(vec_id, {_NND_DIM}) + 1 = i,"
            f" CAST({_NND_SHIFT!r} AS DOUBLE), CAST(0.0 AS DOUBLE)))"
        ).alias("embedding"),
    )


def nn_descent_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-index ANN build (the HNSW/NSW family's distributed cousin):
    deterministic NN-descent over LSH-bucket ring seeds — see
    ``similarity.nn_descent_graph`` for the algorithm and scale shape,
    and the constants block above for why the demonstration runs on the
    8-d view.  Output is the full k-NN graph, the artifact graph-ANN
    search walks."""
    return SIM.nn_descent_graph(
        _nnd_view(spark, sf_dir), planes=_nnd_planes(), k=_NND_K,
        init_cap=_NND_CAP, rounds=_NND_ROUNDS, checkpoint="local",
    )


def _nnd_cos(a: str, b: str) -> str:
    return (
        f"round({_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)})"
        f" * sqrt({_dot_sql(b, b)})), 8)"
    )


def _nnd_bucket_expr(var: str) -> str:
    """Sign-bit LSH bucket id of vector expression ``var`` over the
    seeded ``_nnd_planes`` literals — the SQL twin of
    ``similarity.hyperplane_bucket``."""
    terms = []
    for i, p in enumerate(_nnd_planes()):
        lit = "CAST([" + ", ".join(repr(x) for x in p) + "] AS DOUBLE[])"
        terms.append(
            f"(CASE WHEN {_dot_sql(var, lit)} >= 0 THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(terms)


def _nnd_bucket_ctes() -> str:
    """CTE pair ``c, ca`` assigning every 8-d view vector its sign-bit
    LSH bucket over the seeded ``_nnd_planes`` literals — the SQL twin
    of ``similarity.hyperplane_bucket`` on the sliced view."""
    bucket = _nnd_bucket_expr("cv")
    return f"""c AS (
  SELECT vec_id AS neighbor_id,
         list_transform(range(1, {_NND_DIM + 1}),
           i -> CAST(embedding[i] AS DOUBLE)
                + CASE WHEN (vec_id % {_NND_DIM}) + 1 = i
                       THEN CAST({_NND_SHIFT!r} AS DOUBLE)
                       ELSE CAST(0.0 AS DOUBLE) END) AS cv
  FROM embeddings
), ca AS (
  SELECT neighbor_id, cv, CAST({bucket} AS BIGINT) AS cid FROM c
)"""


def _nn_descent_ctes() -> str:
    """WITH-body replaying the full NN-descent build (rounds unrolled,
    like the PQ-training oracle) — ends at ``b{_NND_ROUNDS}``; shared by
    the graph oracle and the recall-audit oracle."""
    k, cap = _NND_K, _NND_CAP
    cos = _nnd_cos("a.cv", "b.cv")
    parts = [
        f"""{_nnd_bucket_ctes()}, r0 AS MATERIALIZED (
  SELECT cid, neighbor_id AS nid,
         row_number() OVER (PARTITION BY cid ORDER BY neighbor_id) AS rn
  FROM ca
), msz AS MATERIALIZED (
  SELECT cid, CAST(COUNT(*) AS INT) AS m FROM r0 GROUP BY 1
), ring AS MATERIALIZED (
  SELECT a.nid AS u, b.nid AS w
  FROM r0 a
  JOIN msz ON a.cid = msz.cid
  CROSS JOIN (SELECT UNNEST(generate_series(1, {cap})) AS o) t
  JOIN r0 b ON b.cid = a.cid AND b.rn = ((a.rn - 1 + t.o) % msz.m) + 1
  WHERE t.o <= msz.m - 1
), vv AS MATERIALIZED (
  SELECT neighbor_id AS nid, cv FROM ca
), s0 AS MATERIALIZED (
  SELECT ring.u, ring.w, {cos} AS cos_sim
  FROM ring JOIN vv a ON a.nid = ring.u JOIN vv b ON b.nid = ring.w
), b0 AS MATERIALIZED (
  SELECT u, w, cos_sim, rank FROM (
    SELECT u, w, cos_sim,
           row_number() OVER (PARTITION BY u ORDER BY cos_sim DESC, w) AS rank
    FROM s0
  ) WHERE rank <= {k}
)"""
    ]
    for i in range(_NND_ROUNDS):
        j = i + 1
        parts.append(
            f""", rev{i} AS MATERIALIZED (
  SELECT u, w, cos_sim FROM (
    SELECT x.w AS u, x.u AS w, x.cos_sim,
           row_number() OVER (PARTITION BY x.w ORDER BY x.cos_sim DESC, x.u) AS rk
    FROM b{i} x
  ) WHERE rk <= {k}
), l{i} AS MATERIALIZED (
  SELECT u AS node, w AS nbr FROM b{i}
  UNION
  SELECT u AS node, w AS nbr FROM rev{i}
), c{j} AS MATERIALIZED (
  SELECT a.nbr AS u, b.nbr AS w
  FROM l{i} a JOIN l{i} b ON a.node = b.node AND a.nbr <> b.nbr
  UNION
  SELECT u, w FROM b{i}
), s{j} AS MATERIALIZED (
  SELECT c.u, c.w, {cos} AS cos_sim
  FROM c{j} c JOIN vv a ON a.nid = c.u JOIN vv b ON b.nid = c.w
), b{j} AS MATERIALIZED (
  SELECT u, w, cos_sim, rank FROM (
    SELECT u, w, cos_sim,
           row_number() OVER (PARTITION BY u ORDER BY cos_sim DESC, w) AS rank
    FROM s{j}
  ) WHERE rank <= {k}
)"""
        )
    return "".join(parts)


NN_DESCENT_ORACLE = f"""
WITH {_nn_descent_ctes()}
SELECT u AS vec_id, CAST(rank AS INT) AS rank, w AS neighbor_id, cos_sim
FROM b{_NND_ROUNDS}
"""


def nn_descent_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit of the NN-descent graph against exact top-k on a
    deterministic probe prefix (``vec_id < {probe}``) — the quality gate
    a graph-ANN deployment watches, and the honest price tag next to
    the graph build (same pattern as ``pq_trained_recall_check``)."""
    emb = _nnd_view(spark, sf_dir)
    graph = SIM.nn_descent_graph(
        emb, planes=_nnd_planes(), k=_NND_K, init_cap=_NND_CAP,
        rounds=_NND_ROUNDS, checkpoint="local",
    ).where(F.col("vec_id") < _NND_PROBE)
    truth = SIM.cosine_topk(
        emb.where(F.col("vec_id") < _NND_PROBE), emb, k=_NND_K
    ).select(F.col("query_id").alias("vec_id"), "neighbor_id")
    hits = graph.join(truth, ["vec_id", "neighbor_id"], "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits")
    )
    tot = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    return hits.crossJoin(F.broadcast(tot)).select(
        "n_truth",
        "n_hits",
        F.expr(
            "ROUND(CAST(n_hits AS DOUBLE) / CAST(n_truth AS DOUBLE), 4)"
            " AS recall"
        ),
    )


NN_DESCENT_RECALL_ORACLE = f"""
WITH {_nn_descent_ctes()}, q AS (
  SELECT neighbor_id AS query_id, cv AS qv
  FROM c WHERE neighbor_id < {_NND_PROBE}
), sc AS (
  SELECT query_id, nid AS neighbor_id, {_COS.replace("cv", "vv.cv")} AS cos_sim
  FROM q CROSS JOIN vv WHERE vv.nid <> query_id
), truth AS (
  SELECT query_id AS vec_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, neighbor_id) AS rank
    FROM sc
  ) WHERE rank <= {_NND_K}
), g AS (
  SELECT u AS vec_id, w AS neighbor_id FROM b{_NND_ROUNDS}
  WHERE u < {_NND_PROBE}
), h AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM g JOIN truth USING (vec_id, neighbor_id)
), tt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth
)
SELECT n_truth, n_hits,
       ROUND(CAST(n_hits AS DOUBLE) / CAST(n_truth AS DOUBLE), 4) AS recall
FROM tt CROSS JOIN h
"""


# Graph-ANN SEARCH (round 12, verdict task 3): beam search walking the
# NN-descent graph for a deterministic query prefix — the retrieval the
# build exists for.  Entry = the query's LSH bucket's `beam` lowest-id
# members (the build's own seeder as coarse quantizer); each hop expands
# the current beam one step along graph out-edges; the oracle replays
# the whole build (shared CTEs) and then unrolls the hops.
_NND_SEARCH_Q = 25
_NND_SEARCH_K = 10
_NND_SEARCH_BEAM = 8
_NND_SEARCH_HOPS = 3


# one prebuilt graph per (session, sf_dir) shared by the TWO search
# entries: production graph-ANN searches a PREBUILT index, and the
# build's fresh cost stays priced by the nn_descent_knn_graph headline
# (the build is deterministic, so the memo cannot change any result)
_NND_GRAPH_MEMO: dict[tuple[str, str], DataFrame] = {}


def _nnd_search_graph(spark: SparkSession, sf_dir: str):
    emb = _nnd_view(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    graph = _NND_GRAPH_MEMO.get(key)
    if graph is None:
        from df_to_azure_spark.session import protect_pin

        # protect_pin: the memoized graph is the one SESSION-lifetime pin
        # in the engine — release_pins (bench pin hygiene) must not drop
        # its blocks between queries, or the next search call would read
        # a dead checkpoint
        graph = protect_pin(
            SIM.nn_descent_graph(
                emb, planes=_nnd_planes(), k=_NND_K, init_cap=_NND_CAP,
                rounds=_NND_ROUNDS, checkpoint="local",
            ).localCheckpoint()
        )
        _NND_GRAPH_MEMO[key] = graph
    queries = emb.where(F.col("vec_id") < _NND_SEARCH_Q).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return emb, graph, queries


def nn_descent_search_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k retrieval by beam search over the NN-descent k-NN graph —
    see ``similarity.nn_descent_search`` for the algorithm and per-hop
    scale shape (one frontier×graph hash join + one anti-join + one
    vector-fetch join + one window per hop; linear in |queries| with
    beam×k constants)."""
    emb, graph, queries = _nnd_search_graph(spark, sf_dir)
    return SIM.nn_descent_search(
        emb, graph, queries, planes=_nnd_planes(), k=_NND_SEARCH_K,
        beam=_NND_SEARCH_BEAM, hops=_NND_SEARCH_HOPS, exclude_self=True,
        checkpoint="local",
    )


def _nnd_search_ctes() -> str:
    """CTE chain replaying the beam search on top of the replayed build
    (``_nn_descent_ctes`` ends at ``b{_NND_ROUNDS}``): hops unrolled,
    every round CTE MATERIALIZED (plain CTEs re-inline exponentially in
    DuckDB — the documented OOM trap).  Ends at pool ``p{HOPS}``."""
    cos = _nnd_cos("qc.qv", "vv.cv")
    parts = [
        f""", qs AS MATERIALIZED (
  SELECT neighbor_id AS qid, cv AS qv FROM c
  WHERE neighbor_id < {_NND_SEARCH_Q}
), qc AS MATERIALIZED (
  SELECT qid, qv, CAST({_nnd_bucket_expr("qv")} AS BIGINT) AS qcid FROM qs
), ent AS MATERIALIZED (
  SELECT qc.qid, r0.nid
  FROM qc JOIN r0 ON r0.cid = qc.qcid AND r0.rn <= {_NND_SEARCH_BEAM}
), p0 AS MATERIALIZED (
  SELECT e.qid, e.nid, {cos} AS cos_sim
  FROM ent e JOIN vv ON vv.nid = e.nid JOIN qc ON qc.qid = e.qid
  WHERE e.qid <> e.nid
)"""
    ]
    for i in range(_NND_SEARCH_HOPS):
        j = i + 1
        parts.append(
            f""", hf{j} AS MATERIALIZED (
  SELECT qid, nid FROM (
    SELECT qid, nid,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos_sim DESC, nid) AS rk
    FROM p{i}
  ) WHERE rk <= {_NND_SEARCH_BEAM}
), hx{j} AS MATERIALIZED (
  SELECT DISTINCT f.qid, g.w AS nid
  FROM hf{j} f JOIN b{_NND_ROUNDS} g ON g.u = f.nid
), hn{j} AS MATERIALIZED (
  SELECT x.qid, x.nid
  FROM hx{j} x LEFT JOIN p{i} p ON p.qid = x.qid AND p.nid = x.nid
  WHERE p.nid IS NULL
), hs{j} AS MATERIALIZED (
  SELECT n.qid, n.nid, {cos} AS cos_sim
  FROM hn{j} n JOIN vv ON vv.nid = n.nid JOIN qc ON qc.qid = n.qid
  WHERE n.qid <> n.nid
), p{j} AS MATERIALIZED (
  SELECT qid, nid, cos_sim FROM p{i}
  UNION ALL
  SELECT qid, nid, cos_sim FROM hs{j}
)"""
        )
    return "".join(parts)


NN_DESCENT_SEARCH_ORACLE = f"""
WITH {_nn_descent_ctes()}{_nnd_search_ctes()}
SELECT qid AS query_id, CAST(rank AS INT) AS rank, nid AS neighbor_id,
       cos_sim
FROM (
  SELECT qid, nid, cos_sim,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos_sim DESC, nid) AS rank
  FROM p{_NND_SEARCH_HOPS}
) WHERE rank <= {_NND_SEARCH_K}
"""


def nn_descent_search_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit of the graph SEARCH against exact top-k for the
    same query prefix — the end-to-end quality gate of the graph-ANN
    path (build quality × entry seeding × beam width together), next to
    the build-only audit ``nn_descent_recall_check``."""
    emb, graph, queries = _nnd_search_graph(spark, sf_dir)
    got = SIM.nn_descent_search(
        emb, graph, queries, planes=_nnd_planes(), k=_NND_SEARCH_K,
        beam=_NND_SEARCH_BEAM, hops=_NND_SEARCH_HOPS, exclude_self=True,
        checkpoint="local",
    ).select("query_id", "neighbor_id")
    truth = SIM.cosine_topk(
        emb.where(F.col("vec_id") < _NND_SEARCH_Q), emb, k=_NND_SEARCH_K
    ).select("query_id", "neighbor_id")
    hits = got.join(truth, ["query_id", "neighbor_id"], "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits")
    )
    tot = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    return hits.crossJoin(F.broadcast(tot)).select(
        "n_truth",
        "n_hits",
        F.expr(
            "ROUND(CAST(n_hits AS DOUBLE) / CAST(n_truth AS DOUBLE), 4)"
            " AS recall"
        ),
    )


NN_DESCENT_SEARCH_RECALL_ORACLE = f"""
WITH {_nn_descent_ctes()}{_nnd_search_ctes()}, g AS (
  SELECT qid AS query_id, nid AS neighbor_id FROM (
    SELECT qid, nid,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos_sim DESC, nid) AS rank
    FROM p{_NND_SEARCH_HOPS}
  ) WHERE rank <= {_NND_SEARCH_K}
), sc AS (
  SELECT qs.qid AS query_id, vv.nid AS neighbor_id,
         {_nnd_cos("qs.qv", "vv.cv")} AS cos_sim
  FROM qs CROSS JOIN vv WHERE vv.nid <> qs.qid
), truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, neighbor_id) AS rank
    FROM sc
  ) WHERE rank <= {_NND_SEARCH_K}
), h AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM g JOIN truth USING (query_id, neighbor_id)
), tt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth
)
SELECT n_truth, n_hits,
       ROUND(CAST(n_hits AS DOUBLE) / CAST(n_truth AS DOUBLE), 4) AS recall
FROM tt CROSS JOIN h
"""


def neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clustering: LSH near-dup pairs (threshold 0.6 for a richer
    graph) grouped into connected components via distributed min-label
    propagation — the step that turns candidate PAIRS into deletable
    duplicate CLUSTERS.  Oracle: DuckDB recursive CTE computing min
    reachable id per node over the identical pair set."""
    from df_to_azure_spark.functions.graph import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = SIM.embedding_neardup_pairs_lsh(
        emb, _neardup_planes(), threshold=0.6
    ).select("id_a", "id_b")
    return connected_components(pairs)


# CTE block ending in comp(node, component) — shared by the components
# query and the cluster-representative query built on top of it.
_NEARDUP_COMP_CTES = f"""WITH RECURSIVE {_neardup_bucket_cte()},
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM vb a JOIN vb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE {_PAIR_COS} >= 0.6
),
e AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(node, lbl) AS (
  SELECT DISTINCT u, u FROM e
  UNION
  SELECT e.v, r.lbl FROM e JOIN reach r ON e.u = r.node
),
comp AS (
  SELECT node, MIN(lbl) AS component FROM reach GROUP BY node
)"""

NEARDUP_COMPONENTS_ORACLE = f"""
{_NEARDUP_COMP_CTES}
SELECT node, component FROM comp
"""


def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KEEP/DROP decision that follows dedup clustering: per
    near-dup component, elect one canonical document (longest
    ``n_chars``, ties to the smallest id — a deterministic,
    engine-independent rule) and account for what deletion saves.

    Scale: components ⋈ documents shuffles on doc id (both sides scale;
    no hint).  The rank window partitions by component — near-dup
    cluster sizes are bounded in practice (and capped upstream by the
    LSH band width), so no skewed-window risk.  Output is one row per
    CLUSTER, so the result shrinks with dedup rate, not corpus size.
    """
    from pyspark.sql import Window as W

    comp = neardup_components(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("node"), "n_chars"
    )
    j = comp.join(docs, "node")
    w = W.partitionBy("component").orderBy(F.col("n_chars").desc(), F.col("node"))
    ranked = j.select("component", "node", "n_chars", F.row_number().over(w).alias("rk"))
    return ranked.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.expr("MAX(CASE WHEN rk = 1 THEN node END)").alias("rep_doc_id"),
        F.expr("MAX(CASE WHEN rk = 1 THEN n_chars END)").alias("rep_n_chars"),
        F.expr("CAST(SUM(CASE WHEN rk > 1 THEN n_chars ELSE 0 END) AS BIGINT)").alias(
            "chars_dropped"
        ),
    )


CLUSTER_REPS_ORACLE = f"""
{_NEARDUP_COMP_CTES},
j AS (
  SELECT c.component, c.node, d.n_chars
  FROM comp c JOIN documents d ON d.doc_id = c.node
), r AS (
  SELECT component, node, n_chars,
         row_number() OVER (PARTITION BY component ORDER BY n_chars DESC, node) AS rk
  FROM j
)
SELECT component, COUNT(*) AS cluster_size,
       MAX(CASE WHEN rk = 1 THEN node END) AS rep_doc_id,
       MAX(CASE WHEN rk = 1 THEN n_chars END) AS rep_n_chars,
       CAST(SUM(CASE WHEN rk > 1 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_dropped
FROM r GROUP BY component
"""


def doc_length_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted Bernoulli sampling: keep each document
    with probability proportional to its length (p = n_chars / max),
    decided by the document's own md5 draw — the importance-sampling
    primitive for token-budget-aware corpus downsampling, reproducible
    run-to-run and engine-to-engine (same md5 → same keep set).

    Scale: the 1-row max aggregate broadcasts; the keep decision is a
    per-row filter (no shuffle, no coordination) that pushes past the
    scan, then one map-side-combined per-lang rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    mx = docs.agg(F.expr("MAX(n_chars)").alias("mx"))
    u = (
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 13), 16, 10) AS DOUBLE)"
        " / 4503599627370496.0"
    )
    p = "CAST(n_chars AS DOUBLE) / CAST(mx AS DOUBLE)"
    picked = docs.crossJoin(F.broadcast(mx)).where(F.expr(f"{u} < {p}"))
    return picked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.expr("CAST(SUM(n_chars) AS BIGINT)").alias("chars_sampled"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


WEIGHTED_SAMPLE_ORACLE = """
WITH m AS (SELECT MAX(n_chars) AS mx FROM documents),
picked AS (
  SELECT d.lang, d.n_chars, d.doc_id
  FROM documents d, m
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
        / 4503599627370496.0
        < CAST(n_chars AS DOUBLE) / CAST(mx AS DOUBLE)
)
SELECT lang, COUNT(*) AS n_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS chars_sampled,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM picked GROUP BY lang
"""


def lsh_knn_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe variant of ``lsh_knn``: queries also probe every
    bucket one sign-flip away, lifting recall at ~(1+P)/2^P scan cost.
    Same seeded planes; the oracle replicates the probe expansion."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return SIM.lsh_topk_multiprobe(queries, emb, _lsh_knn_planes(), k=10)


def _lsh_multiprobe_oracle() -> str:
    planes = _lsh_knn_planes()
    terms = []
    for i, pl in enumerate(planes):
        lit = "CAST([" + ", ".join(repr(x) for x in pl) + "] AS DOUBLE[])"
        terms.append(
            f"(CASE WHEN {_dot_sql('ev', lit)} >= 0 THEN {1 << i} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    flips = ", ".join(
        ["CAST(bucket0 AS BIGINT)"]
        + [f"CAST(xor(bucket0, {1 << i}) AS BIGINT)" for i in range(len(planes))]
    )
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
  FROM embeddings
), vb AS (
  SELECT vec_id, ev, CAST({bucket} AS BIGINT) AS bucket0 FROM v
), probes AS (
  SELECT vec_id AS query_id, ev AS qv, unnest([{flips}]) AS bucket
  FROM vb WHERE vec_id < 5
), scored AS (
  SELECT probes.query_id, c.vec_id AS neighbor_id,
         round({_dot_sql('probes.qv', 'c.ev')} /
               (sqrt({_dot_sql('probes.qv', 'probes.qv')}) * sqrt({_dot_sql('c.ev', 'c.ev')})), 8) AS cos_sim
  FROM probes JOIN vb c ON probes.bucket = c.bucket0
  WHERE probes.query_id <> c.vec_id
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_sim
FROM (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= 10
"""


LSH_MULTIPROBE_ORACLE = _lsh_multiprobe_oracle()


# Product quantization: M subspaces × K centroids over the 64-dim
# embeddings, seeded so both engines embed identical literal codebooks.
_PQ_M = 4
_PQ_K = 8
_PQ_SUB = _NEARDUP_DIM // _PQ_M


def _pq_codebooks() -> list[list[list[float]]]:
    import random

    rng = random.Random(13)
    return [
        [[rng.gauss(0, 1) for _ in range(_PQ_SUB)] for _ in range(_PQ_K)]
        for _ in range(_PQ_M)
    ]


def pq_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k — the compressed-domain scale path
    next to ``knn_topk`` (exact), ``lsh_knn`` (hyperplane) and
    ``ivf_knn`` (inverted lists): corpus vectors become M=4 codes, the
    query's distance table broadcasts, and search never touches a raw
    corpus vector again.  Codebooks are data-sampled exemplars
    (``sample_codebooks`` — the deterministic stand-in for k-means
    training); the oracle replays the same argmin encode relationally."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = SIM.sample_codebooks(emb, _PQ_M, _PQ_K)
    queries = emb.where(F.col("vec_id") < 5)
    return SIM.pq_adc_topk(queries, emb, books, k=10, checkpoint="local")


def _pq_ctes(M: int, K: int) -> str:
    """Shared CTE text replaying the sampled-codebook PQ encode
    relationally: the codebook CTE selects the same exemplar subvectors
    as ``sample_codebooks`` (``vec_id < M*K``), corpus codes come from a
    per-(vector, subspace) argmin window (ties → lowest code, matching
    ``_argmin_centroid``), and the per-subspace distance table ``dt``
    mirrors the Spark broadcast table."""
    sub = _NEARDUP_DIM // M
    slc = f"list_slice(v.ev, cb.m * {sub} + 1, (cb.m + 1) * {sub})"
    slq = f"list_slice(qv, m * {sub} + 1, (m + 1) * {sub})"
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
  FROM embeddings
), cb AS (
  SELECT CAST(vec_id // {K} AS INT) AS m, CAST(vec_id % {K} AS INT) AS code,
         list_slice(ev, CAST(vec_id // {K} AS INT) * {sub} + 1,
                        (CAST(vec_id // {K} AS INT) + 1) * {sub}) AS cent
  FROM v WHERE vec_id < {M * K}
), cd AS (
  SELECT v.vec_id AS neighbor_id, cb.m, cb.code,
         {_dot_sql(slc, slc)} - 2.0 * {_dot_sql(slc, 'cb.cent')}
           + {_dot_sql('cb.cent', 'cb.cent')} AS dsub
  FROM v CROSS JOIN cb
), code_rows AS (
  SELECT neighbor_id, m, code FROM (
    SELECT neighbor_id, m, code,
           row_number() OVER (PARTITION BY neighbor_id, m ORDER BY dsub, code) AS rk
    FROM cd
  ) WHERE rk = 1
), codes AS (
  SELECT neighbor_id,
         {', '.join(f"MAX(CASE WHEN m = {m} THEN code END) AS code_{m}" for m in range(M))}
  FROM code_rows GROUP BY neighbor_id
), q AS (
  SELECT vec_id AS query_id, ev AS qv FROM v WHERE vec_id < 5
), dt AS (
  SELECT query_id, cb.m, cb.code,
         {_dot_sql(slq, slq)} - 2.0 * {_dot_sql(slq, 'cb.cent')}
           + {_dot_sql('cb.cent', 'cb.cent')} AS d
  FROM q CROSS JOIN cb
), scored AS (
  SELECT d0.query_id, codes.neighbor_id, round({_pq_adc_sum(M)}, 8) AS adc_dist
  FROM codes {' '.join(_pq_joins(M))}
  WHERE d0.query_id <> codes.neighbor_id
), shortlisted AS (
  SELECT query_id, neighbor_id, adc_dist,
         row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rank
  FROM scored
)"""


def _pq_joins(M: int) -> list[str]:
    joins = []
    for m in range(M):
        cond = f"d{m}.code = codes.code_{m} AND d{m}.m = {m}"
        if m > 0:
            cond += f" AND d{m}.query_id = d0.query_id"
        joins.append(f"JOIN dt d{m} ON {cond}")
    return joins


def _pq_adc_sum(M: int) -> str:
    return "".join(["d0.d"] + [f" + d{m}.d" for m in range(1, M)])


def _pq_oracle() -> str:
    return f"""{_pq_ctes(_PQ_M, _PQ_K)}
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, adc_dist
FROM shortlisted WHERE rank <= 10
"""


PQ_ADC_ORACLE = _pq_oracle()


# rerank variant: finer subspaces for the shortlist, exact top-k after
_PQ_RERANK_M = 16
_PQ_RERANK_K = 8
_PQ_RERANK_C = 100


def pq_rerank_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ shortlist + exact re-rank — the full production IVF-PQ search
    shape: ADC (compressed domain) nominates C=100 candidates per query,
    exact L2 re-ranks only those.  Measured recall@10 vs exact: 0.74 on
    the synthetic embeddings, vs 0.14 for pure ADC — quantization picks
    the neighborhood, exact distance picks the order."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = SIM.sample_codebooks(emb, _PQ_RERANK_M, _PQ_RERANK_K)
    queries = emb.where(F.col("vec_id") < 5)
    return SIM.pq_adc_rerank_topk(
        queries, emb, books, k=10, shortlist=_PQ_RERANK_C,
        checkpoint="local",
    )


def _pq_rerank_oracle() -> str:
    return f"""{_pq_ctes(_PQ_RERANK_M, _PQ_RERANK_K)}
, rr AS (
  SELECT s.query_id, s.neighbor_id,
         round({_dot_sql('q.qv', 'q.qv')} - 2.0 * {_dot_sql('q.qv', 'cv.ev')}
               + {_dot_sql('cv.ev', 'cv.ev')}, 8) AS l2_dist
  FROM shortlisted s
  JOIN q ON q.query_id = s.query_id
  JOIN v cv ON cv.vec_id = s.neighbor_id
  WHERE s.rank <= {_PQ_RERANK_C}
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, l2_dist
FROM (
  SELECT query_id, neighbor_id, l2_dist,
         row_number() OVER (PARTITION BY query_id ORDER BY l2_dist, neighbor_id) AS rank
  FROM rr
)
WHERE rank <= 10
"""


PQ_RERANK_ORACLE = _pq_rerank_oracle()


def pq_code_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tripwire for the PQ encoder: for every vector and subspace, the
    distance to the ASSIGNED centroid must equal the minimum distance
    over the whole codebook (argmin optimality — catches slicing/
    indexing bugs in the flat encode expression).  Expected empty;
    empty-set oracle makes the driver hash-check prove it."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = _pq_codebooks()
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    checks = []
    for m, cents in enumerate(books):
        subv = F.slice(v, m * _PQ_SUB + 1, _PQ_SUB)
        dists = SIM._centroid_dists(subv, cents)
        code = SIM._argmin_centroid(dists)
        assigned = F.element_at(F.array(*dists), code + 1)
        checks.append((assigned - F.least(*dists) != 0.0).alias(f"bad_{m}"))
    bad_any = checks[0]
    for c in checks[1:]:
        bad_any = bad_any | c
    return emb.select("vec_id", *checks).where(bad_any).select(
        "vec_id", F.lit("argmin_violation").alias("problem")
    )


PQ_INVARIANT_ORACLE = """
SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS VARCHAR) AS problem
WHERE 1 = 0
"""


# Trained (not just sampled) PQ codebooks: distributed Lloyd iterations,
# engine-exact via decimal aggregation (the kmeans_step trick), so the
# ENTIRE training run is strict-oracle-checkable, iteration by iteration.
_PQ_TRAIN_ITERS = 2


def pq_trained_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ codebook TRAINING itself as a query: 2 Lloyd iterations
    per subspace over the embedding corpus, initialized from the same
    exemplars as ``sample_codebooks``.  Exact-decimal distance sums and
    6-dp rounded means make every iteration engine-reproducible — the
    oracle replays the full unrolled training relationally."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.train_codebooks_frame(
        emb, _PQ_M, _PQ_K, iters=_PQ_TRAIN_ITERS, checkpoint="local"
    )


def _pq_train_ctes(
    m: int = _PQ_M,
    k: int = _PQ_K,
    iters: int = _PQ_TRAIN_ITERS,
    dim: int = _NEARDUP_DIM,
) -> str:
    """CTE chain (no WITH, no final SELECT) replaying
    ``train_codebooks_frame`` through ``cent{iters}`` — shared by the
    PQ-training oracle and the trained-IVF oracle."""
    sub = dim // m
    parts = [
        f"""dims AS (
  SELECT vec_id AS vid,
         CAST((u.g - 1) // {sub} AS INT) AS mi,
         CAST((u.g - 1) % {sub} + 1 AS BIGINT) AS i,
         CAST(u.x AS DOUBLE) AS x
  FROM (SELECT vec_id, unnest(list_transform(range(1, len(embedding) + 1),
               g -> {{'g': g, 'x': embedding[g]}})) AS u
        FROM embeddings)
), cent0 AS (
  SELECT mi, CAST(vid % {k} AS INT) AS cid, i, x AS cx
  FROM dims WHERE vid < {m * k} AND mi = CAST(vid // {k} AS INT)
)"""
    ]
    for t in range(iters):
        parts.append(
            f""", dist{t} AS (
  SELECT d.vid, d.mi, c.cid,
         SUM(CAST((d.x - c.cx) * (d.x - c.cx) AS DECIMAL(28,12))) AS dd
  FROM dims d JOIN cent{t} c ON d.mi = c.mi AND d.i = c.i
  GROUP BY d.vid, d.mi, c.cid
), assign{t} AS (
  SELECT vid, mi, cid FROM (
    SELECT vid, mi, cid,
           ROW_NUMBER() OVER (PARTITION BY vid, mi ORDER BY dd ASC, cid ASC) AS rk
    FROM dist{t}) WHERE rk = 1
), newc{t} AS (
  SELECT a.mi, a.cid, d.i,
         ROUND(CAST(SUM(CAST(d.x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS cx
  FROM dims d JOIN assign{t} a ON d.vid = a.vid AND d.mi = a.mi
  GROUP BY a.mi, a.cid, d.i
), cent{t + 1} AS (
  SELECT c.mi, c.cid, c.i, COALESCE(n.cx, c.cx) AS cx
  FROM cent{t} c LEFT JOIN newc{t} n
    ON c.mi = n.mi AND c.cid = n.cid AND c.i = n.i
)"""
        )
    return "".join(parts)


PQ_TRAINED_ORACLE = (
    "WITH "
    + _pq_train_ctes()
    + f"\nSELECT mi, cid, i, cx FROM cent{_PQ_TRAIN_ITERS}\n"
)


def pq_trained_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tripwire closing the documented exemplar-vs-trained recall gap:
    ADC top-10 hit counts vs exact cosine top-10, trained codebooks vs
    exemplar codebooks over the same queries.  Emits a row ONLY when
    training made recall WORSE — expected empty; the empty-set oracle
    makes the driver hash-check prove trained ≥ exemplar recall."""
    emb = load_table(spark, sf_dir, "embeddings")
    trained = SIM.train_codebooks(
        emb, _PQ_M, _PQ_K, iters=_PQ_TRAIN_ITERS, checkpoint="local"
    )
    exemplar = SIM.sample_codebooks(emb, _PQ_M, _PQ_K)
    queries = emb.where(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(queries, emb, k=10).select("query_id", "neighbor_id")
    hits_t = (
        SIM.pq_adc_topk(queries, emb, trained, k=10, checkpoint="local")
        .select("query_id", "neighbor_id")
        .join(exact, ["query_id", "neighbor_id"])
        .agg(F.count(F.lit(1)).alias("hits_trained"))
    )
    hits_e = (
        SIM.pq_adc_topk(queries, emb, exemplar, k=10, checkpoint="local")
        .select("query_id", "neighbor_id")
        .join(exact, ["query_id", "neighbor_id"])
        .agg(F.count(F.lit(1)).alias("hits_exemplar"))
    )
    return hits_t.crossJoin(hits_e).where(
        F.col("hits_trained") < F.col("hits_exemplar")
    )


PQ_TRAINED_RECALL_ORACLE = """
SELECT CAST(NULL AS BIGINT) AS hits_trained, CAST(NULL AS BIGINT) AS hits_exemplar
WHERE 1 = 0
"""


# full production IVF-PQ: coarse lists + residual product quantization
_IVFPQ_NPROBE = 2


def ivf_pq_residual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full FAISS-style IVFADC index (IVFx,PQy): coarse inverted
    lists (the ``_ivf_centroids`` literals), PQ over the RESIDUAL to the
    list centroid (M=4, K=8, codebooks sampled from the residuals of the
    exemplar vectors), queries probing nprobe=2 lists with a per-(query,
    list) residual distance table — the composition of ``ivf_knn`` and
    ``pq_adc_knn`` into the index an actual billion-vector deployment
    runs.  Machinery: ``similarity.ivf_pq_residual_topk`` /
    ``similarity.residual_frame``; the oracle replays coarse argmin,
    residual, exemplar codebook, encode argmin, probe ranking, and the
    left-to-right ADC sum relationally."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _ivf_centroids()
    # exemplar residuals only (ids < M·K): the codebook sample never
    # needs the full corpus residualized
    res = SIM.residual_frame(
        emb.where(F.col("vec_id") < _PQ_M * _PQ_K), cents
    )
    books = SIM.sample_codebooks(res, _PQ_M, _PQ_K, vec_col="rv")
    queries = emb.where(F.col("vec_id") < 5)
    # checkpoint='none' (round-15): the single-map search consumes the
    # encoded table exactly ONCE, so the eager codes pin was a pure extra
    # serial job + materialization (A/B 0.85×, rows identical); at scale
    # unpinned is also right — the encode is map-side and the real stored
    # artifact is the lake codes table, never a checkpoint
    return SIM.ivf_pq_residual_topk(
        queries, emb, cents, books, k=10, nprobe=_IVFPQ_NPROBE,
        checkpoint="none",
    )


def _ivf_pq_residual_oracle() -> str:
    M, K = _PQ_M, _PQ_K
    sub = _NEARDUP_DIM // M
    cents = _ivf_centroids()
    lits = [
        "CAST([" + ", ".join(repr(x) for x in c) + "] AS DOUBLE[])"
        for c in cents
    ]
    c2s = [repr(float(sum(x * x for x in c))) for c in cents]
    d_cols = ", ".join(
        f"({_dot_sql('cv', 'cv')} - 2.0 * {_dot_sql('cv', lits[i])}"
        f" + {c2s[i]}) AS d{i}"
        for i in range(len(cents))
    )
    least = "least(" + ", ".join(f"d{i}" for i in range(len(cents))) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN d{i} = {least} THEN {i}" for i in range(len(cents)))
        + " END"
    )
    values = ", ".join(f"({i}, {lits[i]})" for i in range(len(cents)))
    slc_a = f"list_slice(a.cv, j.m * {sub} + 1, (j.m + 1) * {sub})"
    slc_q = f"list_slice(p.qres, cb.m * {sub} + 1, (cb.m + 1) * {sub})"
    code_pivot = ", ".join(
        f"MAX(CASE WHEN m = {m} THEN code END) AS code_{m}" for m in range(M)
    )
    dt_joins = []
    for m in range(M):
        cond = (
            f"d{m}.m = {m} AND d{m}.code = codes.code_{m}"
            f" AND d{m}.cid = codes.cid"
        )
        if m > 0:
            cond += f" AND d{m}.query_id = d0.query_id"
        dt_joins.append(f"JOIN dt d{m} ON {cond}")
    adc = " + ".join(f"d{m}.d" for m in range(M))
    return f"""
WITH c AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
), cdist AS (
  SELECT vec_id, cv, {d_cols} FROM c
), ca AS (
  SELECT vec_id, cv, CAST({case} AS INT) AS cid FROM cdist
), cenv AS (
  SELECT * FROM (VALUES {values}) AS t(cid, cev)
), res AS (
  SELECT a.vec_id, a.cid,
         list_transform(range(1, {_NEARDUP_DIM} + 1),
                        i -> a.cv[i] - v.cev[i]) AS rv
  FROM ca a JOIN cenv v ON a.cid = v.cid
  WHERE a.vec_id < {M * K}
), cb AS (
  SELECT CAST(vec_id // {K} AS INT) AS m, CAST(vec_id % {K} AS INT) AS code,
         list_slice(rv, CAST(vec_id // {K} AS INT) * {sub} + 1,
                    (CAST(vec_id // {K} AS INT) + 1) * {sub}) AS cell
  FROM res WHERE vec_id < {M * K}
), cbadj0 AS (
  SELECT cenv.cid, cb.m, cb.code,
         list_transform(
           list_zip(list_slice(cenv.cev, cb.m * {sub} + 1,
                               (cb.m + 1) * {sub}), cb.cell),
           r -> r[1] + r[2]) AS adj
  FROM cenv CROSS JOIN cb
), cbadj AS (
  SELECT cid, m, code, adj, {_dot_sql('adj', 'adj')} AS adj2 FROM cbadj0
), encdist AS (
  SELECT a.vec_id AS neighbor_id, a.cid, j.m, j.code,
         {_dot_sql(slc_a, slc_a)} - 2.0 * {_dot_sql(slc_a, 'j.adj')}
           + j.adj2 AS dsub
  FROM ca a JOIN cbadj j ON j.cid = a.cid
), code_rows AS (
  SELECT neighbor_id, cid, m, code FROM (
    SELECT neighbor_id, cid, m, code,
           row_number() OVER (PARTITION BY neighbor_id, m
                              ORDER BY dsub, code) AS rk
    FROM encdist
  ) WHERE rk = 1
), codes AS (
  SELECT neighbor_id, cid, {code_pivot}
  FROM code_rows GROUP BY neighbor_id, cid
), q AS (
  SELECT vec_id AS query_id, cv AS qv FROM c WHERE vec_id < 5
), qd AS (
  SELECT query_id, qv, cenv.cid, cenv.cev,
         {_dot_sql('qv', 'qv')} - 2.0 * {_dot_sql('qv', 'cenv.cev')}
           + {_dot_sql('cenv.cev', 'cenv.cev')} AS cd
  FROM q CROSS JOIN cenv
), probes AS (
  SELECT query_id, cid,
         list_transform(range(1, {_NEARDUP_DIM} + 1),
                        i -> qv[i] - cev[i]) AS qres
  FROM (
    SELECT query_id, qv, cid, cev,
           row_number() OVER (PARTITION BY query_id ORDER BY cd, cid) AS pr
    FROM qd
  ) WHERE pr <= {_IVFPQ_NPROBE}
), dt AS (
  SELECT p.query_id, p.cid, cb.m, cb.code,
         {_dot_sql(slc_q, slc_q)} - 2.0 * {_dot_sql(slc_q, 'cb.cell')}
           + {_dot_sql('cb.cell', 'cb.cell')} AS d
  FROM probes p CROSS JOIN cb
), scored AS (
  SELECT d0.query_id, codes.neighbor_id, round({adc}, 8) AS adc_dist
  FROM codes {' '.join(dt_joins)}
  WHERE d0.query_id <> codes.neighbor_id
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, adc_dist
FROM (
  SELECT query_id, neighbor_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= 10
"""


IVF_PQ_RESIDUAL_ORACLE = _ivf_pq_residual_oracle()


def ivf_trained_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search over TRAINED coarse centroids: ``train_codebooks`` with
    a single subspace (m=1) IS distributed k-means over the full vectors
    (init = exemplar vectors 0..k-1, the same seeds as ``kmeans_step``),
    so the inverted lists adapt to the data instead of standing on raw
    exemplars.  The oracle re-runs the identical decimal-exact training
    relationally, then replays the same assignment/probe/search — the
    whole index BUILD + QUERY pipeline is hash-checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = SIM.train_codebooks(emb, 1, 8, iters=_PQ_TRAIN_ITERS)[0]
    queries = emb.where(F.col("vec_id") < 5)
    return SIM.ivf_topk(queries, emb, centroids, k=10, nprobe=2)


def _ivf_trained_oracle() -> str:
    train = _pq_train_ctes(m=1, k=8, iters=_PQ_TRAIN_ITERS)
    return f"""
WITH {train}, centv AS (
  SELECT cid, list(cx ORDER BY i) AS cv FROM cent{_PQ_TRAIN_ITERS} GROUP BY cid
), corp AS (
  SELECT vec_id AS neighbor_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
  FROM embeddings
), cdist AS (
  SELECT c.neighbor_id, c.ev, ct.cid,
         {_dot_sql('c.ev', 'c.ev')} - 2.0 * {_dot_sql('c.ev', 'ct.cv')}
           + {_dot_sql('ct.cv', 'ct.cv')} AS d
  FROM corp c CROSS JOIN centv ct
), ca AS (
  SELECT neighbor_id, ev AS cv, cid FROM (
    SELECT neighbor_id, ev, cid,
           row_number() OVER (PARTITION BY neighbor_id ORDER BY d, cid) AS rk
    FROM cdist) WHERE rk = 1
), q AS (
  SELECT vec_id AS query_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < 5
), qd AS (
  SELECT query_id, qv, ct.cid,
         {_dot_sql('qv', 'qv')} - 2.0 * {_dot_sql('qv', 'ct.cv')}
           + {_dot_sql('ct.cv', 'ct.cv')} AS cd
  FROM q CROSS JOIN centv ct
), probes AS (
  SELECT query_id, qv, cid FROM (
    SELECT query_id, qv, cid,
           row_number() OVER (PARTITION BY query_id ORDER BY cd, cid) AS pr
    FROM qd
  ) WHERE pr <= 2
), scored AS (
  SELECT query_id, neighbor_id, {_COS} AS cos_sim
  FROM ca JOIN probes USING (cid)
  WHERE query_id <> neighbor_id
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_sim
FROM (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= 10
"""


IVF_TRAINED_ORACLE = _ivf_trained_oracle()


# Feature hashing (the "hashing trick", Weinberger et al. ICML'09): text →
# fixed-dim signed-count vector with NO vocabulary pass — the standard
# bridge from raw documents to the vector operators (ANN, clustering,
# near-dup) when training an embedding model is off the table.
_FH_DIM = 64


def hash_embedding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed TF vector per document: each token hashes to a dimension
    (md5-prefix integer — portable) and a ±1 sign (an independent hash
    bit, which keeps hash collisions unbiased — the property that makes
    feature hashing work); the vector is the per-dimension signed count.

    Exactly engine-reproducible: integer hashing + integer sums, cast to
    double only at the end.  Plan: token explode → ONE shuffle on
    (doc_id, dim) with map-side combine → per-doc map assembly; the
    64-slot array is built by map lookup, so no per-doc dense pivot join.
    At 100 TB this is scan + one bounded shuffle — no vocabulary state,
    which is the entire point of the hashing trick."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(TXT.tokens("text")).alias("tok"))
    h = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
    t = toks.select(
        "doc_id",
        (h % _FH_DIM).cast("int").alias("dim"),
        F.when(h.bitwiseAND(F.lit(256)) == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("sgn"),
    )
    agg = t.groupBy("doc_id", "dim").agg(F.sum("sgn").alias("v"))
    emb = agg.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("dim", "v"))).alias("m")
    )
    dense = emb.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(_FH_DIM - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("m"), i.cast("int")), F.lit(0).cast("bigint")
            ).cast("double"),
        ).alias("embedding"),
    )
    # the token explode drops token-less documents; the oracle's dense
    # (doc x dim) grid keeps them as zero rows — restore them here with a
    # zero vector so both engines agree on the empty-document class
    zeros = F.transform(
        F.sequence(F.lit(0), F.lit(_FH_DIM - 1)), lambda i: F.lit(0.0)
    )
    return (
        docs.select("doc_id")
        .distinct()
        .join(dense, "doc_id", "left")
        .select(
            "doc_id", F.coalesce(F.col("embedding"), zeros).alias("embedding")
        )
    )


def doc_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry face of ``hash_embedding_frame`` in LONG form
    ``(doc_id, dim, value)`` — scalar cells only, so the driver's
    value-hash needs no array stringification convention; the array
    construction itself is transitively hash-checked through
    ``hashed_doc_knn``, whose cosines consume the assembled vectors."""
    emb = hash_embedding_frame(spark, sf_dir)
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("dim", "value")
    ).select("doc_id", F.col("dim").cast("bigint").alias("dim"), "value")


_HASH_CTES = f"""
toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
), hashed AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS x FROM toks
), signed AS (
  SELECT doc_id, CAST(x % {_FH_DIM} AS INT) AS dim,
         CASE WHEN (x & 256) = 0 THEN 1 ELSE -1 END AS sgn
  FROM hashed
), agg AS (
  SELECT doc_id, dim, SUM(sgn) AS v FROM signed GROUP BY doc_id, dim
), dims AS (
  SELECT unnest(range({_FH_DIM})) AS dim
), grid AS (
  SELECT d.doc_id, dims.dim FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN dims
), filled AS (
  SELECT g.doc_id, g.dim, COALESCE(a.v, 0) AS v
  FROM grid g LEFT JOIN agg a ON a.doc_id = g.doc_id AND a.dim = g.dim
)"""

HASH_EMBEDDING_ORACLE = f"""
WITH {_HASH_CTES}
SELECT doc_id, CAST(dim AS BIGINT) AS dim, CAST(v AS DOUBLE) AS value
FROM filled
"""


def hashed_doc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document ANN over the hashed vectors — text similarity through the
    SAME vector operators as the embeddings table (``cosine_topk``), no
    trained model required.  Zero-norm vectors (a document whose signed
    counts fully cancel — possible, rare) are excluded on both sides
    rather than risking a 0/0 cosine."""
    emb = hash_embedding_frame(spark, sf_dir)
    nonzero = emb.where(SIM.dot(F.col("embedding"), F.col("embedding")) > 0)
    queries = nonzero.where(F.col("doc_id") < 3)
    return SIM.cosine_topk(
        queries, nonzero, k=5, id_col="doc_id", vec_col="embedding"
    )


def _hashed_knn_oracle() -> str:
    return f"""
WITH {_HASH_CTES}, he AS (
  SELECT doc_id, list(CAST(v AS DOUBLE) ORDER BY dim) AS embedding
  FROM filled GROUP BY doc_id
), nz AS (
  SELECT doc_id, embedding FROM he WHERE {_dot_sql('embedding', 'embedding')} > 0
), q AS (
  SELECT doc_id AS query_id, embedding AS qv FROM nz WHERE doc_id < 3
), c AS (
  SELECT doc_id AS neighbor_id, embedding AS cv FROM nz
), scored AS (
  SELECT query_id, neighbor_id,
         round({_dot_sql('qv', 'cv')} /
               (sqrt({_dot_sql('qv', 'qv')}) * sqrt({_dot_sql('cv', 'cv')})), 8) AS cos_sim
  FROM c CROSS JOIN q WHERE query_id <> neighbor_id
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_sim
FROM (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= 5
"""


HASHED_KNN_ORACLE = _hashed_knn_oracle()


def ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs — the quote/inclusion detector next
    to symmetric Jaccard (``ngram_containment_pairs``)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_containment_pairs(docs, threshold=0.5)


NGRAM_CONTAINMENT_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
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
       round(CAST(n_inter AS DOUBLE) / CAST(sa.sz AS DOUBLE), 6) AS containment_a,
       round(CAST(n_inter AS DOUBLE) / CAST(sb.sz AS DOUBLE), 6) AS containment_b
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(CAST(n_inter AS DOUBLE) / CAST(sa.sz AS DOUBLE), 6) >= 0.5
   OR round(CAST(n_inter AS DOUBLE) / CAST(sb.sz AS DOUBLE), 6) >= 0.5
"""


def mmr_rerank_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-rank over the exact cosine shortlist — the
    retrieval chain's third stage (dedup → ANN → rerank).  5 greedy
    steps at lambda=0.7 over a 20-deep shortlist for the same 5 query
    vectors as ``knn_topk``; see ``similarity.mmr_rerank`` for the
    unrolled deterministic-iteration plan the oracle replays."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return SIM.mmr_rerank(queries, emb, k_select=5, shortlist=20, lam=0.7)


def _mmr_oracle(k_select: int = 5, shortlist: int = 20, lam: float = 0.7) -> str:
    """Unrolled-CTE DuckDB twin of ``similarity.mmr_rerank``: one
    (pen, sc, s, sel) CTE quartet per greedy step, identical double
    arithmetic (lam cast to DOUBLE in both engines)."""
    lam_sql = f"CAST({lam!r} AS DOUBLE)"
    om_sql = f"(CAST(1 AS DOUBLE) - {lam_sql})"
    pair_cos = (
        f"round({_dot_sql('a.cv', 'b.cv')} / "
        f"(sqrt({_dot_sql('a.cv', 'a.cv')}) * sqrt({_dot_sql('b.cv', 'b.cv')})), 8)"
    )
    sql = f"""
WITH q AS (
  SELECT vec_id AS query_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS neighbor_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
), scored0 AS (
  SELECT query_id, neighbor_id, {_COS} AS cos_sim
  FROM c CROSS JOIN q WHERE query_id <> neighbor_id
), cand AS (
  SELECT query_id, neighbor_id, cos_sim AS rel
  FROM (SELECT query_id, neighbor_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored0)
  WHERE rn <= {shortlist}
), cvx AS (
  SELECT cand.query_id, cand.neighbor_id, cand.rel, c.cv
  FROM cand JOIN c USING (neighbor_id)
), pairs AS (
  SELECT a.query_id, a.neighbor_id AS na, b.neighbor_id AS nb, {pair_cos} AS sim
  FROM cvx a JOIN cvx b
    ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
), s1 AS (
  SELECT query_id, neighbor_id, rel, rel AS score, 1 AS step
  FROM (SELECT query_id, neighbor_id, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, neighbor_id) AS rn
        FROM cand)
  WHERE rn = 1
), sel1 AS (SELECT * FROM s1)"""
    for t in range(2, k_select + 1):
        sql += f""",
pen{t} AS (
  SELECT p.query_id, p.na AS neighbor_id, MAX(p.sim) AS max_sim
  FROM sel{t - 1} s JOIN pairs p
    ON p.query_id = s.query_id AND p.nb = s.neighbor_id
  GROUP BY p.query_id, p.na
), sc{t} AS (
  SELECT c.query_id, c.neighbor_id, c.rel,
         {lam_sql} * c.rel - {om_sql} * p.max_sim AS score
  FROM cand c JOIN pen{t} p
    ON p.query_id = c.query_id AND p.neighbor_id = c.neighbor_id
  WHERE NOT EXISTS (SELECT 1 FROM sel{t - 1} s
                    WHERE s.query_id = c.query_id
                      AND s.neighbor_id = c.neighbor_id)
), s{t} AS (
  SELECT query_id, neighbor_id, rel, score, {t} AS step
  FROM (SELECT query_id, neighbor_id, rel, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id) AS rn
        FROM sc{t})
  WHERE rn = 1
), sel{t} AS (SELECT * FROM sel{t - 1} UNION ALL SELECT * FROM s{t})"""
    sql += f"""
SELECT query_id, CAST(step AS INT) AS step, neighbor_id,
       round(score, 6) AS mmr_score
FROM sel{k_select}
"""
    return sql


MMR_RERANK_ORACLE = _mmr_oracle()


def hybrid_rrf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: Reciprocal Rank Fusion of the exact cosine
    ranking (``knn_topk``) and the hyperplane-LSH ranking (``lsh_knn``)
    for the same 5 query vectors — the standard two-retriever merge
    (k=60).  See ``similarity.rrf_fuse``."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact_r = SIM.cosine_topk(queries, emb, k=10)
    lsh_r = SIM.lsh_topk(queries, emb, _lsh_knn_planes(), k=10)
    return SIM.rrf_fuse([exact_r, lsh_r], k_const=60, topk=10)


def _rrf_oracle() -> str:
    """DuckDB twin: both ranking CTEs verbatim (nested WITH), identical
    decimal-summed reciprocal contributions."""
    k_sql = "CAST(60 AS DOUBLE)"
    contrib = (
        f"CAST(ROUND(CAST(1 AS DOUBLE) / ({k_sql} + CAST(rank AS DOUBLE)), 12)"
        " AS DECIMAL(28,12))"
    )
    return f"""
WITH exact_r AS ({KNN_ORACLE}),
lsh_r AS ({_lsh_knn_oracle()}),
contrib AS (
  SELECT query_id, neighbor_id, {contrib} AS c FROM exact_r
  UNION ALL
  SELECT query_id, neighbor_id, {contrib} AS c FROM lsh_r
), agg AS (
  SELECT query_id, neighbor_id,
         CAST(COUNT(*) AS BIGINT) AS n_lists,
         ROUND(CAST(SUM(c) AS DOUBLE), 8) AS rrf_score
  FROM contrib GROUP BY query_id, neighbor_id
)
SELECT query_id, rank, neighbor_id, n_lists, rrf_score
FROM (
  SELECT query_id, neighbor_id, n_lists, rrf_score,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY rrf_score DESC, neighbor_id)
              AS BIGINT) AS rank
  FROM agg
)
WHERE rank <= 10
"""


HYBRID_RRF_ORACLE = _rrf_oracle()


# --------------------------------------------------------------------------
# three-way lexical + dense hybrid retrieval
# --------------------------------------------------------------------------

_HYBRID_TERM_POOL = ("join", "hash", "vector", "stream", "sort")


def _hybrid_query_terms() -> list[tuple[int, str]]:
    """Deterministic per-query keyword sets: query i takes 3 consecutive
    pool terms (rotating), so the five lexical queries differ but need no
    external fixture."""
    return [
        (q, _HYBRID_TERM_POOL[(q + j) % len(_HYBRID_TERM_POOL)])
        for q in range(5)
        for j in range(3)
    ]


def hybrid_lexical_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full hybrid retrieval: RRF fusion of THREE rankings per query —
    exact cosine (dense), hyperplane-LSH (dense, approximate) and Okapi
    BM25 over per-query keyword sets (lexical; ``text.bm25_scores``).
    doc_id and vec_id share a key domain, so the lexical and dense lists
    rank the same items; fusion is rank-based (Cormack et al., SIGIR'09)
    and needs no score calibration between the BM25 and cosine scales —
    which is exactly why RRF is the standard lexical+dense merge."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    queries = emb.where(F.col("vec_id") < 5)
    exact_r = SIM.cosine_topk(queries, emb, k=10)
    lsh_r = SIM.lsh_topk(queries, emb, _lsh_knn_planes(), k=10)
    qt = spark.createDataFrame(
        _hybrid_query_terms(), "query_id: bigint, term: string"
    )
    bm25_r = TXT.bm25_topk(docs, qt, k=10, k1=1.2, b=0.75)
    return SIM.rrf_fuse([exact_r, lsh_r, bm25_r], k_const=60, topk=10)


def _bm25_rank_oracle() -> str:
    """DuckDB twin of the BM25 ranking leg: identical tokenization,
    idf/weight arithmetic (all constants CAST to DOUBLE, ROUND(12) per
    term into DECIMAL(28,12), ROUND(6) per score) and (score desc, id)
    ranking."""
    vals = ", ".join(f"({q}, '{t}')" for q, t in _hybrid_query_terms())
    k1, b = "CAST(1.2 AS DOUBLE)", "CAST(0.75 AS DOUBLE)"
    return f"""
WITH qt AS (
  SELECT CAST(query_id AS BIGINT) AS query_id, tok
  FROM (VALUES {vals}) v(query_id, tok)
), vocab AS (
  SELECT DISTINCT tok FROM qt
), toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
), dl AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS dl FROM documents
), stats AS (
  SELECT COUNT(*) AS n, SUM(dl) AS sum_dl FROM dl
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks JOIN vocab USING (tok)
  GROUP BY doc_id, tok
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
  SELECT q.query_id, t.doc_id,
         CAST(ROUND(i.idf * (CAST(t.tf AS DOUBLE) * ({k1} + CAST(1 AS DOUBLE)))
              / (CAST(t.tf AS DOUBLE) + {k1} * (CAST(1 AS DOUBLE) - {b}
                 + {b} * CAST(d.dl AS DOUBLE) / i.avgdl)), 12)
              AS DECIMAL(28,12)) AS w
  FROM tf t JOIN idf i USING (tok) JOIN dl d USING (doc_id) JOIN qt q USING (tok)
), bscores AS (
  SELECT query_id, doc_id, ROUND(CAST(SUM(w) AS DOUBLE), 6) AS bm25
  FROM terms GROUP BY query_id, doc_id
)
SELECT query_id, rank, doc_id AS neighbor_id
FROM (
  SELECT query_id, doc_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY bm25 DESC, doc_id)
              AS BIGINT) AS rank
  FROM bscores
)
WHERE rank <= 10
"""


def _hybrid3_oracle(weights: tuple[float, float, float] | None = None) -> str:
    """Three-leg RRF twin: the two dense ranking CTEs verbatim plus the
    BM25 leg, identical decimal-summed reciprocal contributions;
    ``weights`` mirrors the weighted ``rrf_fuse`` form (w_i DOUBLE-cast
    before the multiply, exactly as Spark-side)."""
    k_sql = "CAST(60 AS DOUBLE)"

    def contrib(i: int) -> str:
        w = (
            f"CAST({float(weights[i])!r} AS DOUBLE) * "
            if weights is not None
            else ""
        )
        return (
            f"CAST(ROUND({w}CAST(1 AS DOUBLE) / ({k_sql} + CAST(rank AS DOUBLE)), 12)"
            " AS DECIMAL(28,12))"
        )

    return f"""
WITH exact_r AS ({KNN_ORACLE}),
lsh_r AS ({_lsh_knn_oracle()}),
bm25_r AS ({_bm25_rank_oracle()}),
contrib AS (
  SELECT query_id, neighbor_id, {contrib(0)} AS c FROM exact_r
  UNION ALL
  SELECT query_id, neighbor_id, {contrib(1)} AS c FROM lsh_r
  UNION ALL
  SELECT query_id, neighbor_id, {contrib(2)} AS c FROM bm25_r
), agg AS (
  SELECT query_id, neighbor_id,
         CAST(COUNT(*) AS BIGINT) AS n_lists,
         ROUND(CAST(SUM(c) AS DOUBLE), 8) AS rrf_score
  FROM contrib GROUP BY query_id, neighbor_id
)
SELECT query_id, rank, neighbor_id, n_lists, rrf_score
FROM (
  SELECT query_id, neighbor_id, n_lists, rrf_score,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY rrf_score DESC, neighbor_id)
              AS BIGINT) AS rank
  FROM agg
)
WHERE rank <= 10
"""


HYBRID_LEXICAL_DENSE_ORACLE = _hybrid3_oracle()


def hybrid_weighted_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted three-leg hybrid: the same rankings as
    ``hybrid_lexical_dense`` fused with the exact retriever trusted 2:1
    over the approximate and lexical legs — the weighted-RRF form
    (``similarity.rrf_fuse(weights=...)``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    queries = emb.where(F.col("vec_id") < 5)
    exact_r = SIM.cosine_topk(queries, emb, k=10)
    lsh_r = SIM.lsh_topk(queries, emb, _lsh_knn_planes(), k=10)
    qt = spark.createDataFrame(
        _hybrid_query_terms(), "query_id: bigint, term: string"
    )
    bm25_r = TXT.bm25_topk(docs, qt, k=10, k1=1.2, b=0.75)
    return SIM.rrf_fuse(
        [exact_r, lsh_r, bm25_r], k_const=60, topk=10,
        weights=[2.0, 1.0, 1.0],
    )


HYBRID_WEIGHTED_RRF_ORACLE = _hybrid3_oracle(weights=(2.0, 1.0, 1.0))


def sq8_rerank_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized ANN with exact rerank (queries = vec_id<5,
    shortlist 30 → top 10) — the 4-8x memory-compression tier; see
    ``similarity.sq8_rerank_topk`` for plan + determinism notes."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return SIM.sq8_rerank_topk(
        queries, emb, dim=_NEARDUP_DIM, k=10, shortlist=30
    )


def _sq8_oracle() -> str:
    d = _NEARDUP_DIM
    mins = "[" + ", ".join(f"min(cv[{i + 1}])" for i in range(d)) + "]"
    maxs = "[" + ", ".join(f"max(cv[{i + 1}])" for i in range(d)) + "]"
    sq8_cos = (
        f"round({_dot_sql('qv', 'xhat')} / "
        f"(sqrt({_dot_sql('qv', 'qv')}) * sqrt({_dot_sql('xhat', 'xhat')})), 8)"
    )
    return f"""
WITH c AS (
  SELECT vec_id AS neighbor_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
), b AS (
  SELECT {mins} AS mins, {maxs} AS maxs FROM c
), bs AS (
  SELECT mins, list_transform(list_zip(maxs, mins), r -> r[1] - r[2]) AS spans
  FROM b
), enc AS (
  SELECT neighbor_id, cv,
    list_transform(
      list_zip(list_transform(list_zip(cv, mins), r -> r[1] - r[2]), spans),
      r -> CAST(CASE WHEN r[2] > CAST(0 AS DOUBLE)
                THEN LEAST(CAST(255 AS DOUBLE),
                           GREATEST(CAST(0 AS DOUBLE),
                                    FLOOR(r[1] * CAST(255 AS DOUBLE) / r[2])))
                ELSE CAST(0 AS DOUBLE) END AS INT)) AS codes,
    mins, spans
  FROM c CROSS JOIN bs
), dec AS (
  SELECT neighbor_id, cv,
    list_transform(
      list_zip(
        list_transform(list_zip(codes, spans),
          r -> (CAST(r[1] AS DOUBLE) + CAST(0.5 AS DOUBLE))
               * r[2] / CAST(255 AS DOUBLE)),
        mins),
      r -> r[1] + r[2]) AS xhat
  FROM enc
), q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < 5
), scored AS (
  SELECT query_id, neighbor_id, qv, cv, {sq8_cos} AS sq8_sim
  FROM dec CROSS JOIN q WHERE query_id <> neighbor_id
), short AS (
  SELECT query_id, neighbor_id, sq8_sim, {_COS} AS cos_sim
  FROM (
    SELECT query_id, neighbor_id, qv, cv, sq8_sim,
           row_number() OVER (
             PARTITION BY query_id ORDER BY sq8_sim DESC, neighbor_id
           ) AS srank
    FROM scored
  ) WHERE srank <= 30
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_sim, sq8_sim
FROM (
  SELECT query_id, neighbor_id, cos_sim, sq8_sim,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
         ) AS rank
  FROM short
) WHERE rank <= 10
"""


SQ8_RERANK_ORACLE = _sq8_oracle()


# Seeded ±1 projection planes (Achlioptas-style sign JL): 16 planes over
# the 64-dim embeddings, shared as literals by Spark and the oracle so
# the projections — and therefore the full result — are exactly
# reproducible across engines.
_RP_N_PLANES = 16


def _rp_planes() -> list[list[float]]:
    import random

    rng = random.Random(29)
    return [
        [float(rng.choice((-1.0, 1.0))) for _ in range(_NEARDUP_DIM)]
        for _ in range(_RP_N_PLANES)
    ]


def rp_rerank_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss ±1 random-projection ANN (64→16 dims) with
    exact rerank (queries = vec_id<5, shortlist 30 → top 10) — the
    compute-compression tier next to SQ8's memory compression; see
    ``similarity.rp_rerank_topk``."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return SIM.rp_rerank_topk(
        queries, emb, _rp_planes(), k=10, shortlist=30
    )


def _rp_oracle() -> str:
    planes = _rp_planes()
    lits = [
        "CAST([" + ", ".join(repr(x) for x in p) + "] AS DOUBLE[])"
        for p in planes
    ]
    proj = lambda v: "[" + ", ".join(_dot_sql(v, lit) for lit in lits) + "]"
    rp_cos = (
        f"round({_dot_sql('qp', 'cp')} / "
        f"(sqrt({_dot_sql('qp', 'qp')}) * sqrt({_dot_sql('cp', 'cp')})), 8)"
    )
    return f"""
WITH q AS (
  SELECT query_id, qv, {proj('qv')} AS qp
  FROM (SELECT vec_id AS query_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id < 5)
), c AS (
  SELECT neighbor_id, cv, {proj('cv')} AS cp
  FROM (SELECT vec_id AS neighbor_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        FROM embeddings)
), scored AS (
  SELECT query_id, neighbor_id, qv, cv, {rp_cos} AS rp_sim
  FROM c CROSS JOIN q WHERE query_id <> neighbor_id
), short AS (
  SELECT query_id, neighbor_id, rp_sim, {_COS} AS cos_sim
  FROM (
    SELECT query_id, neighbor_id, qv, cv, rp_sim,
           row_number() OVER (
             PARTITION BY query_id ORDER BY rp_sim DESC, neighbor_id
           ) AS srank
    FROM scored
  ) WHERE srank <= 30
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_sim, rp_sim
FROM (
  SELECT query_id, neighbor_id, cos_sim, rp_sim,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
         ) AS rank
  FROM short
) WHERE rank <= 10
"""


RP_RERANK_ORACLE = _rp_oracle()


def sq8_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@10 of the SQ8 quantized search against exact
    cosine — the accuracy dial a production deployment watches when it
    trades 4-8x memory for approximate shortlists.  Unlike the PQ
    tripwire (empty-set contract), this is a STRICT metric query: both
    rankings are deterministic, so the hit counts themselves hash-match
    the oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(queries, emb, k=10).select(
        "query_id", "neighbor_id"
    )
    sq8 = SIM.sq8_rerank_topk(
        queries, emb, dim=_NEARDUP_DIM, k=10, shortlist=30
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    return (
        exact.join(sq8, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_hits")
        )
        .select(
            "query_id",
            "n_hits",
            F.expr(
                "ROUND(CAST(n_hits AS DOUBLE) / CAST(10 AS DOUBLE), 6)"
            ).alias("recall_at_10"),
        )
    )


SQ8_RECALL_ORACLE = f"""
WITH exact_r AS ({KNN_ORACLE}),
sq8_r AS ({SQ8_RERANK_ORACLE})
SELECT e.query_id,
       CAST(SUM(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       ROUND(CAST(SUM(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(10 AS DOUBLE), 6) AS recall_at_10
FROM exact_r e
LEFT JOIN sq8_r s
  ON e.query_id = s.query_id AND e.neighbor_id = s.neighbor_id
GROUP BY e.query_id
"""


def ivf_sq8_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + SQ8 + exact rerank (C=8 lists, nprobe=2, shortlist 30 →
    top 10) — the production "IVF,SQ8" index shape where the inverted
    lists bound WHAT is scanned and the int8 codes bound the BYTES
    scanned; see ``similarity.ivf_sq8_rerank_topk``."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return SIM.ivf_sq8_rerank_topk(
        queries, emb, _ivf_centroids(), dim=_NEARDUP_DIM,
        k=10, nprobe=2, shortlist=30,
    )


def _ivf_sq8_oracle() -> str:
    d = _NEARDUP_DIM
    cents = _ivf_centroids()
    lits = [
        "CAST([" + ", ".join(repr(x) for x in c) + "] AS DOUBLE[])" for c in cents
    ]
    d_cols = ", ".join(
        f"({_dot_sql('cv', 'cv')} - 2.0 * {_dot_sql('cv', lits[i])}"
        f" + {repr(float(sum(x * x for x in cents[i])))}) AS d{i}"
        for i in range(len(cents))
    )
    least = "least(" + ", ".join(f"d{i}" for i in range(len(cents))) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN d{i} = {least} THEN {i}" for i in range(len(cents)))
        + " END"
    )
    values = ", ".join(f"({i}, {lits[i]})" for i in range(len(cents)))
    mins = "[" + ", ".join(f"min(cv[{i + 1}])" for i in range(d)) + "]"
    maxs = "[" + ", ".join(f"max(cv[{i + 1}])" for i in range(d)) + "]"
    sq8_cos = (
        f"round({_dot_sql('qv', 'xhat')} / "
        f"(sqrt({_dot_sql('qv', 'qv')}) * sqrt({_dot_sql('xhat', 'xhat')})), 8)"
    )
    return f"""
WITH c AS (
  SELECT vec_id AS neighbor_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
), b AS (
  SELECT {mins} AS mins, {maxs} AS maxs FROM c
), bs AS (
  SELECT mins, list_transform(list_zip(maxs, mins), r -> r[1] - r[2]) AS spans
  FROM b
), enc AS (
  SELECT neighbor_id, cv,
    list_transform(
      list_zip(list_transform(list_zip(cv, mins), r -> r[1] - r[2]), spans),
      r -> CAST(CASE WHEN r[2] > CAST(0 AS DOUBLE)
                THEN LEAST(CAST(255 AS DOUBLE),
                           GREATEST(CAST(0 AS DOUBLE),
                                    FLOOR(r[1] * CAST(255 AS DOUBLE) / r[2])))
                ELSE CAST(0 AS DOUBLE) END AS INT)) AS codes,
    mins, spans
  FROM c CROSS JOIN bs
), dec AS (
  SELECT neighbor_id, cv,
    list_transform(
      list_zip(
        list_transform(list_zip(codes, spans),
          r -> (CAST(r[1] AS DOUBLE) + CAST(0.5 AS DOUBLE))
               * r[2] / CAST(255 AS DOUBLE)),
        mins),
      r -> r[1] + r[2]) AS xhat
  FROM enc
), cd AS (
  SELECT neighbor_id, cv, xhat, {d_cols} FROM dec
), ca AS (
  SELECT neighbor_id, cv, xhat, CAST({case} AS INT) AS cid FROM cd
), q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < 5
), qd AS (
  SELECT query_id, qv, cent.cid,
         {_dot_sql('qv', 'qv')} - 2.0 * {_dot_sql('qv', 'cent.cv')}
           + {_dot_sql('cent.cv', 'cent.cv')} AS cdist
  FROM q CROSS JOIN (VALUES {values}) AS cent(cid, cv)
), probes AS (
  SELECT query_id, qv, cid FROM (
    SELECT query_id, qv, cid,
           row_number() OVER (PARTITION BY query_id ORDER BY cdist, cid) AS pr
    FROM qd
  ) WHERE pr <= 2
), scored AS (
  SELECT query_id, neighbor_id, qv, cv, {sq8_cos} AS sq8_sim
  FROM ca JOIN probes USING (cid)
  WHERE query_id <> neighbor_id
), short AS (
  SELECT query_id, neighbor_id, sq8_sim, {_COS} AS cos_sim
  FROM (
    SELECT query_id, neighbor_id, qv, cv, sq8_sim,
           row_number() OVER (
             PARTITION BY query_id ORDER BY sq8_sim DESC, neighbor_id
           ) AS srank
    FROM scored
  ) WHERE srank <= 30
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_sim, sq8_sim
FROM (
  SELECT query_id, neighbor_id, cos_sim, sq8_sim,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
         ) AS rank
  FROM short
) WHERE rank <= 10
"""


IVF_SQ8_ORACLE = _ivf_sq8_oracle()


def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-distance near-dup pairs (Manku et al. WWW'07
    3-of-4-band pigeonhole; recall 1.0 at Hamming ≤ 3) with the
    hot-band cap engaged — the fingerprint-level dedup tier between
    exact md5 groups and MinHash/Jaccard; see
    ``dedup.simhash_hamming_pairs``."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_hamming_pairs(
        docs, max_hamming=3, n_bands=4, hot_band_cap=200
    )


SIMHASH_PAIRS_ORACLE = f"""
WITH sh AS ({SIMHASH_ORACLE}),
banded AS (
  SELECT doc_id, simhash, r.band,
         (simhash >> (r.band * 16)) & 65535 AS bv
  FROM sh CROSS JOIN range(4) r(band)
), hot AS (
  SELECT band, bv FROM banded GROUP BY band, bv HAVING COUNT(*) > 200
), kept AS (
  SELECT b.* FROM banded b
  WHERE NOT EXISTS (SELECT 1 FROM hot h
                    WHERE h.band = b.band AND h.bv = b.bv)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.simhash AS sh_a, b.simhash AS sh_b
  FROM kept a JOIN kept b ON a.band = b.band AND a.bv = b.bv
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
"""
