"""Property-based check of shared-span detection against an in-Python
reference: hypothesis generates small token documents over a tiny
alphabet (forcing real repeats); the distributed inverted-index +
diagonal-chaining plan must match the quadratic reference exactly —
same pairs, same 1-based starts, same maximal lengths."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from df_to_azure_spark.functions.dedup import remove_shared_spans, shared_span_pairs

K = 3       # shingle size
L = 4       # min span tokens

DOCS = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=18),
    min_size=2,
    max_size=4,
)


def _shingles(toks):
    if not toks:
        return []
    n = max(len(toks) - (K - 1), 1)
    return [" ".join(toks[i : i + K]) for i in range(n)]


def _ref_spans(docs):
    """Quadratic reference: all maximal runs of consecutive equal-shingle
    positions per diagonal, span = run + K - 1, kept if >= L."""
    out = set()
    ids = sorted(docs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            ia, ib = ids[x], ids[y]
            A, B = _shingles(docs[ia]), _shingles(docs[ib])
            by_diag = {}
            for pa, sa in enumerate(A, 1):
                for pb, sb in enumerate(B, 1):
                    if sa == sb:
                        by_diag.setdefault(pa - pb, []).append((pa, pb))
            for ps in by_diag.values():
                ps.sort()
                start = prev = None
                for pa, pb in ps:
                    if prev is not None and pa == prev + 1:
                        prev = pa
                    else:
                        if start is not None:
                            n = prev - start[0] + 1 + (K - 1)
                            if n >= L:
                                out.add((ia, ib, start[0], start[1], n))
                        start, prev = (pa, pb), pa
                if start is not None:
                    n = prev - start[0] + 1 + (K - 1)
                    if n >= L:
                        out.add((ia, ib, start[0], start[1], n))
    return out


@given(DOCS)
@settings(max_examples=10, deadline=None)
def test_shared_spans_match_quadratic_reference(spark, token_docs):
    docs = {i: toks for i, toks in enumerate(token_docs)}
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b, r.start_a, r.start_b, r.span_tokens)
        for r in shared_span_pairs(
            df, shingle_n=K, min_span_tokens=L, hot_shingle_cap=None
        ).collect()
    }
    assert got == _ref_spans(docs)


@given(DOCS)
@settings(max_examples=8, deadline=None)
def test_span_removal_conserves_tokens(spark, token_docs):
    """Removal invariants on arbitrary inputs: kept + removed == total,
    the rebuilt text is a subsequence of the original tokens, and the
    LOWEST id never loses tokens."""
    docs = {i: toks for i, toks in enumerate(token_docs)}
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_shared_spans(
        df, shingle_n=K, min_span_tokens=L, hot_shingle_cap=None
    ).collect()}
    assert set(out) == set(docs)
    min_id = min(docs)
    for i, toks in docs.items():
        r = out[i]
        assert r.n_tokens == len(toks)
        kept = r.text_dedup.split() if r.text_dedup else []
        assert len(kept) == r.n_tokens - r.n_removed
        # subsequence check
        it = iter(toks)
        assert all(any(t == k for t in it) for k in kept), (i, toks, kept)
    assert out[min_id].n_removed == 0
