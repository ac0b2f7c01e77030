"""Unit tests for the pipeline7 wave: two_phase_cummax vs a brute
running max (inclusive + exclusive), record-high counts vs a pandas
replay, max drawdown vs a pandas replay, the prefix-filter Jaccard
join vs brute-force all-pairs (losslessness on a hand corpus), label
containment + numpy parity for filtered kNN, and the conformal
quantile/coverage arithmetic."""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from df_to_azure_spark.plans import pipeline7 as PL7


def test_two_phase_cummax_matches_bruteforce(spark):
    from df_to_azure_spark.functions.distrank import two_phase_cummax

    rng = random.Random(23)
    vals = [rng.randint(-50, 50) for _ in range(500)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v long"
    )
    inc = {
        r.k: r.cm
        for r in two_phase_cummax(df, [("k", "asc")], "v", out_col="cm").collect()
    }
    exc = {
        r.k: r.cm
        for r in two_phase_cummax(
            df, [("k", "asc")], "v", out_col="cm", inclusive=False
        ).collect()
    }
    run = None
    for i, v in enumerate(vals):
        assert exc[i] == run
        run = v if run is None or v > run else run
        assert inc[i] == run


def test_order_record_highs_pandas_replay(spark, sf_smoke):
    got = (
        PL7.order_record_highs(spark, sf_smoke)
        .toPandas()
        .sort_values("yr")
        .reset_index(drop=True)
    )
    orders = pd.read_parquet(f"{sf_smoke}/orders.parquet")
    orders["cents"] = (
        orders["o_totalprice"].map(lambda x: round(x * 100))
    ).astype("int64")
    orders = orders.sort_values(["o_orderdate", "o_orderkey"]).reset_index(
        drop=True
    )
    orders["prevmax"] = orders["cents"].cummax().shift(1)
    orders["rec"] = orders["prevmax"].isna() | (
        orders["cents"] > orders["prevmax"]
    )
    orders["yr"] = orders["o_orderdate"].dt.year
    per = orders.groupby("yr").agg(
        n_orders=("cents", "size"),
        n_records=("rec", "sum"),
        yr_max=("cents", "max"),
    )
    per["record_high_cents"] = per["yr_max"].cummax()
    for _, row in got.iterrows():
        exp = per.loc[row["yr"]]
        assert row["n_orders"] == exp["n_orders"]
        assert row["n_records"] == exp["n_records"]
        assert row["record_high_cents"] == exp["record_high_cents"]
    # record counts are positive in the first year and total >= 1
    assert got["n_records"].iloc[0] >= 1
    # the year-end record watermark never decreases
    assert got["record_high_cents"].is_monotonic_increasing


def test_revenue_max_drawdown_pandas_replay(spark, sf_smoke):
    got = PL7.revenue_max_drawdown(spark, sf_smoke).collect()
    assert len(got) == 1
    row = got[0]
    orders = pd.read_parquet(f"{sf_smoke}/orders.parquet")
    orders["d"] = (
        orders["o_orderdate"].dt.normalize() - pd.Timestamp("1992-01-01")
    ).dt.days
    cents = (
        orders.assign(c=orders["o_totalprice"].map(lambda x: round(x * 100)))
        .groupby("d")["c"]
        .sum()
        .sort_index()
    )
    peak = cents.cummax()
    dd6 = ((2_000_000 * (peak - cents) + peak) // (2 * peak)).astype("int64")
    t = dd6[dd6 == dd6.max()].index.min()
    assert row.trough_d == t
    assert row.trough_cents == cents.loc[t]
    assert row.peak_cents == peak.loc[t]
    assert row.max_drawdown == pytest.approx(dd6.max() / 1e6, abs=0)
    assert 0.0 <= row.max_drawdown <= 1.0


def _brute_jaccard_pairs(doc_shingles, tau=0.5):
    ids = sorted(doc_shingles)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = doc_shingles[a], doc_shingles[b]
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union and inter / union >= tau:
                out[(a, b)] = inter
    return out


def test_prefix_filter_lossless_vs_bruteforce(spark, sf_smoke):
    got = PL7.prefix_filter_jaccard_pairs(spark, sf_smoke).collect()
    docs = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    sh = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split()
        if len(toks) >= 3:
            grams = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
        elif toks:
            grams = {" ".join(toks)}
        else:
            grams = set()
        sh[int(doc_id)] = grams
    expected = _brute_jaccard_pairs(sh, tau=0.5)
    got_pairs = {(r.id_a, r.id_b): r.n_inter for r in got}
    assert got_pairs == expected
    for r in got:
        u = r.sz_a + r.sz_b - r.n_inter
        assert 2 * r.n_inter >= u  # exact integer gate, J >= 1/2
        dev = (2_000_000 * r.n_inter + u) // (2 * u)
        assert r.jaccard == pytest.approx(dev / 1e6, abs=0)


def test_filtered_knn_label_constraint(spark, sf_smoke):
    rows = PL7.filtered_knn(spark, sf_smoke).collect()
    emb = pd.read_parquet(f"{sf_smoke}/embeddings.parquet").set_index("vec_id")
    assert rows
    for r in rows:
        assert emb.loc[r.query_id, "label"] == r.label
        assert emb.loc[r.neighbor_id, "label"] == r.label
    # numpy parity for one query: exact same top-10 within the class
    q = 0
    qlab = emb.loc[q, "label"]
    qv = np.array(emb.loc[q, "embedding"], dtype="float64")
    cands = emb[(emb["label"] == qlab) & (emb.index != q)]
    sims = {}
    for vid, row in cands.iterrows():
        cv = np.array(row["embedding"], dtype="float64")
        # sequential left-fold, matching the engine's aggregate() order
        dot = qq = cc = 0.0
        for x, y in zip(qv, cv):
            dot += x * y
        for x in qv:
            qq += x * x
        for y in cv:
            cc += y * y
        sims[vid] = (
            round(dot / (math.sqrt(qq) * math.sqrt(cc)), 8) if qq and cc else 0.0
        )
    want = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got_q = sorted(
        [(r.neighbor_id, r.cos_sim) for r in rows if r.query_id == q],
        key=lambda kv: (-kv[1], kv[0]),
    )
    # same neighbor set and same rounded similarity values
    assert [n for n, _ in got_q] == [n for n, _ in want]
    for (gn, gs), (wn, ws) in zip(got_q, want):
        assert gs == pytest.approx(ws, abs=1e-8)


def test_conformal_quantile_arithmetic(spark, sf_smoke):
    row = PL7.conformal_coverage_check(spark, sf_smoke).collect()[0]
    # k = ceil((n_calib + 1) * 0.9), exact integer form
    assert row.k == ((row.n_calib + 1) * 9 + 9) // 10
    assert row.n_covered <= row.n_test
    # the distribution-free band: coverage lands near 1 - alpha
    assert 0.8 <= row.coverage <= 1.0
    # threshold really is the k-th smallest calibration score
    docs = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    import hashlib

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 100

    calib = sorted(
        (int(c), int(d))
        for d, c in zip(docs["doc_id"], docs["n_chars"])
        if bucket(d) < 50
    )
    assert row.n_calib == len(calib)
    assert row.threshold == calib[row.k - 1][0]


def test_kneser_ney_pandas_replay(spark, sf_smoke):
    got = {
        r.doc_id: r
        for r in PL7.doc_kneser_ney_surprisal(spark, sf_smoke).collect()
    }
    import hashlib
    import re
    from collections import Counter, defaultdict

    docs = pd.read_parquet(f"{sf_smoke}/documents.parquet")

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 100

    def toks(text):
        return [t for t in re.split(r"\s+", text) if t]

    bgc = Counter()
    test_docs = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        b = bucket(doc_id)
        t = toks(text)
        grams = list(zip(t, t[1:]))
        if b < 80:
            bgc.update(grams)
        elif b >= 90:
            test_docs[int(doc_id)] = grams
    c_ctx, n1p, cont = Counter(), Counter(), Counter()
    for (w1, w2), c in bgc.items():
        c_ctx[w1] += c
        n1p[w1] += 1
        cont[w2] += 1
    n_bb = len(bgc)

    for doc_id, grams in test_docs.items():
        if not grams:
            assert doc_id not in got
            continue
        bits_list, oov = [], 0
        for w1, w2 in grams:
            if w1 in c_ctx:
                num = max(
                    max(4 * bgc.get((w1, w2), 0) - 3, 0) * n_bb
                    + 3 * n1p[w1] * cont.get(w2, 0),
                    1,
                )
                den = 4 * c_ctx[w1] * n_bb
                bits_list.append((den // num).bit_length())
            else:
                oov += 1
                bits_list.append(
                    (n_bb // max(cont.get(w2, 0), 1)).bit_length()
                )
        n = len(bits_list)
        r = got[doc_id]
        assert r.n_bigrams == n
        assert r.max_kn_bits == max(bits_list)
        mean_dev = (2_000_000 * sum(bits_list) + n) // (2 * n)
        assert r.mean_kn_bits == pytest.approx(mean_dev / 1e6, abs=0)
        oov_dev = (2_000_000 * oov + n) // (2 * n)
        assert r.oov_ctx_rate == pytest.approx(oov_dev / 1e6, abs=0)
    assert set(got) == {d for d, g in test_docs.items() if g}


def test_stream_quantile_hist_diff_empty(spark, sf_smoke):
    from df_to_azure_spark.streaming.stateful import stream_quantile_hist_diff

    assert stream_quantile_hist_diff(spark, sf_smoke).count() == 0


def test_prefix_filter_join_operator_tau_two_thirds(spark):
    # hand corpus, tau = 2/3, shingle_n = 2; brute-force ground truth
    from df_to_azure_spark.functions.dedup import prefix_filter_jaccard_join

    texts = {
        1: "a b c d e",
        2: "a b c d f",      # J(1,2) on 2-grams: inter {ab,bc,cd} u=5 -> 0.6
        3: "a b c d e",      # exact dup of 1 -> J=1
        4: "x y z w",
        5: "x y z q",        # J(4,5): inter {xy,yz} union 4 -> 0.5
        6: "p q",            # single shingle
        7: "p q",            # J(6,7)=1
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): (r.n_inter, r.jaccard)
        for r in prefix_filter_jaccard_join(
            df, shingle_n=2, tau_num=2, tau_den=3
        ).collect()
    }

    def sh2(t):
        toks = t.split()
        return (
            {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}
            if len(toks) >= 2
            else {t}
        )

    exp = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sh2(texts[a]), sh2(texts[b])
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if 3 * inter >= 2 * union:  # J >= 2/3 exactly
                exp[(a, b)] = inter
    assert {k: v[0] for k, v in got.items()} == exp
    assert got[(1, 3)][1] == 1.0 and got[(6, 7)][1] == 1.0
    assert (1, 2) not in got and (4, 5) not in got

    with pytest.raises(ValueError):
        prefix_filter_jaccard_join(df, tau_num=3, tau_den=2)


def test_prefix_filter_between_lossless_vs_bruteforce(spark, sf_smoke):
    """A×B variant: every (train, test) pair with J >= 1/2 on 3-shingle
    sets, brute-forced in pandas over the md5-free doc_id % 10 split —
    proves the shared-global-order prefix + positional filters drop no
    qualifying cross-corpus pair."""
    got = PL7.prefix_filter_jaccard_between(spark, sf_smoke).collect()
    docs = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    sh = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split()
        if len(toks) >= 3:
            grams = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        elif toks:
            grams = {" ".join(toks)}
        else:
            grams = set()
        sh[int(doc_id)] = grams
    exp = {}
    for a, sa in sh.items():
        if a % 10 == 7 or not sa:
            continue
        for b, sb in sh.items():
            if b % 10 != 7 or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union and 2 * inter >= union:
                exp[(a, b)] = inter
    assert {(r.train_id, r.test_id): r.n_inter for r in got} == exp
    for r in got:
        u = r.sz_a + r.sz_b - r.n_inter
        assert 2 * r.n_inter >= u
        assert r.jaccard == pytest.approx(
            ((2_000_000 * r.n_inter + u) // (2 * u)) / 1e6, abs=0
        )


def test_markov_top1_pandas_replay(spark, sf_smoke):
    got = {r.from_type: r for r in PL7.markov_top1_accuracy(spark, sf_smoke).collect()}
    import hashlib
    from collections import Counter

    ev = pd.read_parquet(f"{sf_smoke}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 100

    train_c, test_pairs = Counter(), []
    for uid, g in ev.groupby("user_id"):
        types = g["event_type"].tolist()
        pairs = list(zip(types, types[1:]))
        if bucket(uid) < 50:
            train_c.update(pairs)
        else:
            test_pairs.extend(pairs)
    pred = {}
    for (f_t, t_t), n in train_c.items():
        cur = pred.get(f_t)
        if cur is None or n > cur[1] or (n == cur[1] and t_t < cur[0]):
            pred[f_t] = (t_t, n)
    stats = {}
    for f_t, t_t in test_pairs:
        p = pred.get(f_t, (None,))[0]
        n, c = stats.get(f_t, (0, 0))
        stats[f_t] = (n + 1, c + (1 if t_t == p else 0))
    assert set(got) == set(stats)
    for f_t, (n, c) in stats.items():
        r = got[f_t]
        assert r.n_test == n and r.n_correct == c
        assert r.top_prediction == pred.get(f_t, (None,))[0]
        assert r.accuracy == pytest.approx(
            ((2_000_000 * c + n) // (2 * n)) / 1e6, abs=0
        )


def test_dedup_funnel_pandas_replay(spark, sf_smoke):
    rows = {r.stage: r for r in PL7.dedup_funnel_report(spark, sf_smoke).collect()}
    assert list(sorted(rows)) == ["0_raw", "1_exact", "2_neardup", "3_minlen"]
    import hashlib

    docs = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    # stage 1: exact dedup keeps the min doc_id per md5(text)
    keep = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        fp = hashlib.md5(text.encode()).hexdigest()
        keep[fp] = min(keep.get(fp, doc_id), doc_id)
    surv1 = set(keep.values())
    # stage 2: near-dup components (J >= 1/2 on 3-shingles), keep min id
    sub = docs[docs["doc_id"].isin(surv1)]
    sh = {}
    for doc_id, text in zip(sub["doc_id"], sub["text"]):
        toks = text.split()
        if len(toks) >= 3:
            sh[int(doc_id)] = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
        elif toks:
            sh[int(doc_id)] = {" ".join(toks)}
    pairs = _brute_jaccard_pairs(sh, tau=0.5)
    parent = {d: d for d in surv1}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    surv2 = {d for d in surv1 if find(d) == d}
    # components keep the min id per cluster: find() converges to it
    # because union always roots at the smaller representative
    surv3 = {
        d
        for d in surv2
        if int(docs.set_index("doc_id").loc[d, "n_chars"]) >= 100
    }
    assert rows["0_raw"].n_docs == len(docs) and rows["0_raw"].n_removed == 0
    assert rows["1_exact"].n_docs == len(surv1)
    assert rows["1_exact"].n_removed == len(docs) - len(surv1)
    assert rows["2_neardup"].n_docs == len(surv2)
    assert rows["2_neardup"].n_removed == len(surv1) - len(surv2)
    assert rows["3_minlen"].n_docs == len(surv3)
    assert rows["3_minlen"].n_removed == len(surv2) - len(surv3)
