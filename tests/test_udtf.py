"""Python UDTF extension surface (functions/udtf_text.ChunkTokens)."""

from __future__ import annotations

from df_to_azure_spark.functions.udtf_text import ChunkTokens, chunk_docs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_udtf_chunks_with_overlap(spark):
    docs = _docs(spark, [(1, "a b c d e f g")])
    out = sorted(
        (r.chunk_id, r.chunk_text, r.n_tokens)
        for r in chunk_docs(docs, chunk_tokens=4, overlap=2).collect()
    )
    # windows of 4 with stride 2: [a b c d], [c d e f], [e f g]
    assert out == [
        (0, "a b c d", 4),
        (1, "c d e f", 4),
        (2, "e f g", 3),
    ]


def test_udtf_short_doc_single_chunk_and_empty_text(spark):
    docs = _docs(spark, [(1, "only three tokens"), (2, ""), (3, None)])
    rows = chunk_docs(docs, chunk_tokens=10, overlap=0).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [r.chunk_text for r in by_doc[1]] == ["only three tokens"]
    # empty / NULL text emit no chunks (the UDTF returns early)
    assert 2 not in by_doc and 3 not in by_doc


def test_udtf_registered_for_sql(spark):
    spark.udtf.register("chunk_tokens", ChunkTokens)
    rows = spark.sql(
        "SELECT * FROM chunk_tokens('x y z', 2, 0)"
    ).collect()
    assert [(r.chunk_id, r.chunk_text) for r in rows] == [(0, "x y"), (1, "z")]


def test_chunk_docs_drops_percall_view(spark):
    from df_to_azure_spark.functions.udtf_text import chunk_docs

    def temp_views():
        return {t.name for t in spark.catalog.listTables() if t.isTemporary}

    before = temp_views()
    docs = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id: long, text: string"
    )
    out = chunk_docs(docs, chunk_tokens=4, overlap=1)
    after = temp_views()
    # the per-call view must not leak into the session catalog...
    assert not {v for v in after - before if v.startswith("__chunk_docs_in_")}
    # ...and the returned plan still executes (view resolved eagerly)
    assert out.count() >= 1
