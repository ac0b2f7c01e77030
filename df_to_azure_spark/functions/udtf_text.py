"""Python UDTF surface (Spark 4 ``@udtf``): the table-function extension
point, demonstrated on sentence-piece chunking.

This completes the user-extension matrix next to ``pandas_udf``
(outliers), ``applyInPandas`` (grouped stats), ``mapInPandas`` (media
decode) and ``applyInPandasWithState`` (streaming sessions): a UDTF is
the escape hatch when ONE input row must become a VARIABLE number of
output rows with per-row Python logic that no builtin generator
(``explode``/``posexplode``/``inline``/``stack``) expresses.

It is deliberately NOT used by any registered query: chunking with a
fixed stride IS expressible with builtin array ops, and that plan
(``plans/pipeline.doc_chunks``) stays in whole-stage codegen, shuffles
nothing extra, and hash-matches a SQL oracle.  A row-at-a-time Python
UDTF runs ~100x slower on the same task — keep UDTFs for genuinely
irregular row-expansion (recursive parsers, stateful tokenizers) and
budget for the Python-worker serialization they cost at 100 TB.
"""

from __future__ import annotations

import itertools

from pyspark.sql.functions import lit, udtf

# monotone counter for per-call temp-view/UDTF names (concurrency safety)
_CHUNK_SEQ = itertools.count()


@udtf(returnType="chunk_id: int, chunk_text: string, n_tokens: int")
class ChunkTokens:
    """Emit one row per token-window chunk of the input text: greedy
    fixed-size windows with overlap — the context-window packer shape.
    ``eval`` receives scalar column values; ``yield`` emits output rows.
    """

    def eval(self, text: str, chunk_tokens: int, overlap: int):  # noqa: D102
        if text is None or chunk_tokens <= 0 or not 0 <= overlap < chunk_tokens:
            return
        toks = [t for t in text.split() if t]
        step = chunk_tokens - overlap
        i = 0
        cid = 0
        while i < len(toks):
            window = toks[i : i + chunk_tokens]
            yield cid, " ".join(window), len(window)
            if i + chunk_tokens >= len(toks):
                break
            i += step
            cid += 1


def chunk_docs(docs, chunk_tokens: int = 32, overlap: int = 8):
    """LATERAL-join ``ChunkTokens`` over a ``(doc_id, text)`` frame →
    ``(doc_id, chunk_id, chunk_text, n_tokens)``.  Goes through the SQL
    ``LATERAL`` form (the UDTF registered as a table function), which is
    how a UDTF composes with per-row arguments from another relation."""
    spark = docs.sparkSession
    # per-call names: concurrent chunk_docs calls in one session must not
    # clobber each other's view between createOrReplaceTempView and the
    # eager spark.sql resolution
    seq = next(_CHUNK_SEQ)
    udtf_name = f"__chunk_tokens_udtf_{seq}"
    view = f"__chunk_docs_in_{seq}"
    spark.udtf.register(udtf_name, ChunkTokens)
    docs.createOrReplaceTempView(view)
    try:
        # spark.sql resolves the view EAGERLY into the returned plan, so the
        # view can be dropped immediately — without this every call grows
        # the session catalog for the life of a long-lived session.
        return spark.sql(
            f"""SELECT d.doc_id, c.chunk_id, c.chunk_text, c.n_tokens
                FROM {view} d,
                LATERAL {udtf_name}(
                  d.text, {int(chunk_tokens)}, {int(overlap)}) c"""
        )
    finally:
        spark.catalog.dropTempView(view)
