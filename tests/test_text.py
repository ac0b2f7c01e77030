"""Text-analysis operator semantics."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from df_to_azure_spark.functions import text as TXT


def test_token_count_and_empties(spark):
    df = spark.createDataFrame(
        [("a b  c ",), ("",), ("   ",), ("single",)], "text string"
    )
    out = [r[0] for r in df.select(TXT.token_count("text")).collect()]
    assert out == [3, 0, 0, 1]


def test_stopword_count(spark):
    df = spark.createDataFrame([("the cat and the dog",)], "text string")
    assert df.select(TXT.stopword_count("text")).collect()[0][0] == 3


def test_avg_token_length(spark):
    df = spark.createDataFrame([("ab abcd",)], "text string")
    assert df.select(TXT.avg_token_length("text")).collect()[0][0] == 3.0


def test_language_id_markers_and_priority(spark):
    df = spark.createDataFrame(
        [("the cat and dog",), ("der hund und das",), ("xyz qrs",), ("the und",)],
        "text string",
    )
    out = [r[0] for r in df.select(TXT.language_id("text")).collect()]
    # last row: en and de tie at 1 marker each → priority picks en
    assert out == ["en", "de", "unknown", "en"]


def test_fingerprint_is_md5(spark):
    df = spark.createDataFrame([("hello",)], "text string")
    fp = df.select(TXT.fingerprint("text")).collect()[0][0]
    assert fp == hashlib.md5(b"hello").hexdigest()


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    out = [r[0] for r in df.select(TXT.shingles("text", 3)).collect()]
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == ["a b"]  # shorter than n → whole text as one shingle


def test_with_text_stats_runs_on_real_docs(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    out = TXT.with_text_stats(docs)
    row = out.orderBy("doc_id").limit(1).collect()[0]
    assert row.n_tokens > 0
    assert row.n_chars_computed == row.n_chars  # driver precomputed length
    assert 0.0 <= row.quality <= 1.0


def test_bm25_scores_parameterized_multiquery(spark):
    docs = spark.createDataFrame(
        [
            (1, "join hash join join scan"),
            (2, "hash scan scan scan scan scan scan scan"),
            (3, "sort sort sort"),
        ],
        "doc_id: long, text: string",
    )
    qt = spark.createDataFrame(
        [(0, "join"), (0, "hash"), (1, "scan"), (1, "scan")],  # dup term deduped
        "query_id: long, term: string",
    )
    out = TXT.bm25_scores(docs, qt).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, {})[r.doc_id] = r
    # query 0: doc 3 matches nothing -> absent; doc 1 matches both terms
    assert set(by_q[0]) == {1, 2}
    assert by_q[0][1].n_terms == 2 and by_q[0][2].n_terms == 1
    assert by_q[0][1].bm25 > by_q[0][2].bm25
    # query 1 ('scan' twice): dedup -> n_terms 1, and tf saturation means
    # doc 2 (7x scan, longer) still outranks doc 1 (1x scan)
    assert by_q[1][1].n_terms == 1 and by_q[1][2].n_terms == 1
    assert by_q[1][2].bm25 > by_q[1][1].bm25


def test_bm25_k1_b_parameters_move_scores(spark):
    docs = spark.createDataFrame(
        [(1, "x x x x y y y y y y y y"), (2, "x")],
        "doc_id: long, text: string",
    )
    qt = spark.createDataFrame([(0, "x")], "query_id: long, term: string")
    base = {r.doc_id: r.bm25 for r in TXT.bm25_scores(docs, qt).collect()}
    # b=0: no length normalization -> the long doc's score strictly rises
    no_norm = {
        r.doc_id: r.bm25 for r in TXT.bm25_scores(docs, qt, b=0.0).collect()
    }
    assert no_norm[1] > base[1]
    # higher k1 -> tf saturates later -> tf=4 doc scores strictly higher
    high_k1 = {
        r.doc_id: r.bm25 for r in TXT.bm25_scores(docs, qt, k1=2.0, b=0.0).collect()
    }
    assert high_k1[1] > no_norm[1]


def test_bm25_topk_ranked_shape(spark):
    docs = spark.createDataFrame(
        [(1, "x x x"), (2, "x y"), (3, "y y")],
        "doc_id: long, text: string",
    )
    qt = spark.createDataFrame(
        [(0, "x"), (1, "y")], "query_id: long, term: string"
    )
    out = TXT.bm25_topk(docs, qt, k=1).collect()
    top = {r.query_id: r for r in out}
    assert len(out) == 2  # one row per query at k=1
    assert top[0].neighbor_id == 1 and top[0].rank == 1  # tf winner for x
    assert top[1].neighbor_id == 3                       # tf winner for y


def test_bm25_scores_empty_corpus_and_no_matches(spark):
    empty = spark.createDataFrame([], "doc_id: long, text: string")
    qt = spark.createDataFrame([(0, "x")], "query_id: long, term: string")
    assert TXT.bm25_scores(empty, qt).count() == 0
    docs = spark.createDataFrame([(1, "a b c")], "doc_id: long, text: string")
    # no query term appears anywhere -> empty result, no division errors
    assert TXT.bm25_scores(docs, qt).count() == 0
    assert TXT.bm25_topk(docs, qt).count() == 0


def test_bpe_train_merges_greedy_leftmost_and_tiebreak(spark):
    from df_to_azure_spark.functions.text import bpe_train_merges

    # vocab: 'ab' x3, 'abc' x1 -> the Sennrich trajectory is
    # (a,b) freq 4, (ab,</w>) freq 3, then a freq-1 tie broken
    # lexicographically: ('ab','c') < ('c','</w>')
    docs = spark.createDataFrame([("ab ab ab abc",)], "text string")
    rows = bpe_train_merges(docs, 3).orderBy("step").collect()
    got = [(r.step, r.left, r.right, r.merged, r.freq) for r in rows]
    assert got == [
        (1, "a", "b", "ab", 4),
        (2, "ab", "</w>", "ab</w>", 3),
        (3, "ab", "c", "abc", 1),
    ]


def test_bpe_train_merges_overlapping_run_is_leftmost(spark):
    from df_to_azure_spark.functions.text import bpe_train_merges

    # 'aaa' -> pairs (a,a) x2 beat (a,</w>) x1; the merge applies
    # greedily leftmost: ' a a a ' -> ' aa a ', NOT ' a aa '
    docs = spark.createDataFrame([("aaa",)], "text string")
    rows = bpe_train_merges(docs, 2).orderBy("step").collect()
    got = [(r.step, r.left, r.right, r.merged, r.freq) for r in rows]
    # step 2: frame is ' aa a </w> ' -> pairs (aa,a), (a,</w>) tie at 1;
    # lex tie-break picks ('a','</w>') ('a' < 'aa')
    assert got == [
        (1, "a", "a", "aa", 2),
        (2, "a", "</w>", "a</w>", 1),
    ]


def test_bpe_train_merges_even_run_shares_boundary(spark):
    from df_to_azure_spark.functions.text import bpe_train_merges

    # 'aaaa' -> ' a a a a </w> '; canonical Sennrich application of
    # (a,a) merges BOTH pairs (the boundary space is shared, not
    # consumed): ' aa aa </w> '.  A consuming replace would leave
    # ' aa a a </w> ', whose step-2 winner is (a,'</w>') instead of
    # the canonical (aa,'</w>') ('<' sorts before 'a', left 'aa' ties).
    docs = spark.createDataFrame([("aaaa",)], "text string")
    rows = bpe_train_merges(docs, 2).orderBy("step").collect()
    got = [(r.step, r.left, r.right, r.merged, r.freq) for r in rows]
    assert got == [
        (1, "a", "a", "aa", 3),
        (2, "aa", "</w>", "aa</w>", 1),
    ]


def test_bpe_train_merges_guard(spark):
    import pytest

    from df_to_azure_spark.functions.text import bpe_train_merges

    docs = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train_merges(docs, 0)
