"""Property-based check of the distributed BM25 operator against an
in-Python quadratic reference: hypothesis generates tiny corpora over a
3-word alphabet (forcing shared terms, repeated terms, and no-match
docs); ``text.bm25_scores`` must agree with a direct per-(query, doc)
evaluation of the Lucene-variant formula to the operator's ROUND(6)
output contract, for several (k1, b) settings including the b=0
no-length-normalization edge.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings, strategies as st

from df_to_azure_spark.functions.text import bm25_scores

WORDS = ["x", "y", "z"]


def _round_hu(x: float, nd: int) -> Decimal:
    """Mirror Spark's ROUND(double, nd): BigDecimal.valueOf uses the
    shortest decimal repr of the double (== Python repr), then
    setScale(nd, HALF_UP).  Python's built-in round() is banker's
    (ties-to-even) and diverges at exact …5 boundaries — hypothesis
    found one: docs [[y],[y],[y,y]], q=[y], (k1=2, b=0) sums to exactly
    0.2002965, Spark → .200297, round() → .200296."""
    return Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP
    )

DOCS = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=12),
    min_size=1,
    max_size=5,
)
QUERIES = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=3, unique=True),
    min_size=1,
    max_size=2,
)
PARAMS = st.sampled_from([(1.2, 0.75), (2.0, 0.0), (0.5, 1.0)])


def _ref_bm25(docs, queries, k1, b):
    """Quadratic reference: same idf variant, same rounding ladder
    (ROUND 6 after LN, ROUND 12 per term → exact decimal sum, ROUND 6
    per score) — bit-exact vs the operator, so equality is strict."""
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    out = {}
    for qid, terms in enumerate(queries):
        for did, toks in enumerate(docs):
            ws = []
            for t in set(terms):
                tf = toks.count(t)
                if tf == 0:
                    continue
                dft = sum(1 for d in docs if t in d)
                idf = float(
                    _round_hu(math.log(1 + (n - dft + 0.5) / (dft + 0.5)), 6)
                )
                w = _round_hu(
                    idf * (tf * (k1 + 1.0))
                    / (tf + k1 * (1.0 - b + b * len(toks) / avgdl)),
                    12,
                )
                ws.append(w)
            if ws:
                total = sum(ws, Decimal(0))  # exact decimal sum, as the
                # operator's DECIMAL(28,12) SUM — then one HALF_UP round
                out[(qid, did)] = (
                    len(ws),
                    float(
                        total.quantize(
                            Decimal("0.000001"), rounding=ROUND_HALF_UP
                        )
                    ),
                )
    return out


@given(DOCS, QUERIES, PARAMS)
@settings(max_examples=12, deadline=None)
def test_bm25_scores_match_quadratic_reference(spark, docs, queries, params):
    k1, b = params
    docs_df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id: long, text: string",
    )
    qt_df = spark.createDataFrame(
        [(q, t) for q, terms in enumerate(queries) for t in terms],
        "query_id: long, term: string",
    )
    got = {
        (r.query_id, r.doc_id): (r.n_terms, float(r.bm25))
        for r in bm25_scores(docs_df, qt_df, k1=k1, b=b).collect()
    }
    exp = _ref_bm25(docs, queries, k1, b)
    assert set(got) == set(exp)
    for key in exp:
        assert got[key][0] == exp[key][0], (key, got[key], exp[key])
        # both sides ROUND(12)-decimal-sum then HALF_UP ROUND(6): exact
        assert got[key][1] == exp[key][1], (key, got[key], exp[key])
