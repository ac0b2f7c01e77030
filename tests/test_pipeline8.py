"""Unit tests for the round-9 pipeline8 wave — each query replayed
against an INDEPENDENT formulation (numpy linear algebra, pandas brute
force, pair counting) rather than the shared SQL text, so a bug in the
shared expression generators cannot hide."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from df_to_azure_spark.plans import pipeline8 as PL8


def test_ridge_matches_numpy_solve(spark, sf_smoke):
    got = PL8.ridge_regression_normal_eq(spark, sf_smoke).collect()[0]
    li = pd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    x1 = np.round(li["l_quantity"].to_numpy() * 100).astype(np.int64)
    x2 = np.round(li["l_discount"].to_numpy() * 100).astype(np.int64)
    y = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    X = np.column_stack([np.ones_like(x1), x1, x2]).astype(np.float64)
    lam = PL8._RIDGE_LAMBDA
    A = X.T @ X + lam * np.diag([0.0, 1.0, 1.0])
    beta = np.linalg.solve(A, X.T @ y.astype(np.float64))
    assert got.n == len(li)
    # numpy solves by LU, Cramer by determinants — agreement to 1e-6
    # relative proves the sufficient statistics and system are right
    assert got.beta0 == pytest.approx(beta[0], rel=1e-6)
    assert got.beta1 == pytest.approx(beta[1], rel=1e-6)
    assert got.beta2 == pytest.approx(beta[2], rel=1e-6)


def test_gini_matches_numpy(spark, sf_smoke):
    got = PL8.customer_revenue_gini(spark, sf_smoke).collect()[0]
    orders = pd.read_parquet(f"{sf_smoke}/orders.parquet")
    cents = np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    rev = (
        pd.DataFrame({"k": orders["o_custkey"], "c": cents})
        .groupby("k")["c"]
        .sum()
        .sort_values(kind="stable")
    )
    y = rev.to_numpy(dtype=np.float64)
    n = len(y)
    i = np.arange(1, n + 1, dtype=np.float64)
    gini = (2 * (i * y).sum() - (n + 1) * y.sum()) / (n * y.sum())
    assert got.n_customers == n
    assert got.total_cents == int(y.sum())
    assert got.gini == pytest.approx(gini, abs=1e-6)
    assert 0.0 <= got.gini < 1.0


def test_kaplan_meier_pandas_replay(spark, sf_smoke):
    rows = PL8.event_user_kaplan_meier(spark, sf_smoke).collect()
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    days = ev["ts"].dt.normalize()
    per = days.groupby(ev["user_id"]).agg(["min", "max"])
    dmax = days.max()
    dur = (per["max"] - per["min"]).dt.days.to_numpy()
    censored = ((dmax - per["max"]).dt.days < PL8._KM_CENSOR_DAYS).to_numpy()
    n = len(dur)
    got = {r.duration_days: r for r in rows}
    assert set(got) == set(np.unique(dur).tolist())
    surv, cumhaz = 1.0, 0.0
    for t in sorted(np.unique(dur)):
        at_t = dur == t
        d = int((at_t & ~censored).sum())
        c = int((at_t & censored).sum())
        n_risk = int(n - (dur < t).sum())
        r = got[int(t)]
        assert (r.n_risk, r.n_churned, r.n_censored) == (n_risk, d, c), t
        if d:
            surv *= (n_risk - d) / n_risk
        cumhaz += d / n_risk
        # per-step ROUND(12) in the engine vs float here: loose bound
        assert r.km_survival == pytest.approx(surv, abs=1e-6), t
        assert r.nelson_aalen_cumhaz == pytest.approx(cumhaz, abs=1e-6), t
    # the curve is non-increasing and within [0, 1]
    s = [r.km_survival for r in sorted(rows, key=lambda r: r.duration_days)]
    assert all(a >= b for a, b in zip(s, s[1:]))
    assert all(0.0 <= x <= 1.0 for x in s)


def test_lorenz_deciles_consistency(spark, sf_smoke):
    rows = sorted(
        PL8.revenue_lorenz_deciles(spark, sf_smoke).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    # shares sum to ~1, cumulative share is non-decreasing and ends at 1
    assert sum(r.revenue_share for r in rows) == pytest.approx(1.0, abs=1e-4)
    cums = [r.cum_share for r in rows]
    assert all(a <= b for a, b in zip(cums, cums[1:]))
    assert cums[-1] == pytest.approx(1.0, abs=1e-6)
    # ascending sort: later deciles carry more revenue
    assert rows[-1].decile_cents > rows[0].decile_cents
    # decile sizes differ by at most 1 under the rank rule
    sizes = [r.n_customers for r in rows]
    assert max(sizes) - min(sizes) <= 1


def test_chi2_cells_match_pandas(spark, sf_smoke):
    rows = PL8.lang_source_chi2(spark, sf_smoke).collect()
    docs = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    ct = docs.groupby(["lang", "source"]).size()
    got = {(r.lang, r.source): r for r in rows}
    assert set(got) == set(ct.index)
    n = len(docs)
    rl = docs["lang"].value_counts()
    cs = docs["source"].value_counts()
    for (lang, src), cnt in ct.items():
        r = got[(lang, src)]
        exp = rl[lang] * cs[src] / n
        assert r.n_obs == cnt
        assert r.expected == pytest.approx(exp, abs=1e-4)
        assert r.chi2_contrib == pytest.approx((cnt - exp) ** 2 / exp, abs=1e-4)


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark, sf_smoke):
    r1 = PL8.revenue_bootstrap_ci(spark, sf_smoke).collect()[0]
    r2 = PL8.revenue_bootstrap_ci(spark, sf_smoke).collect()[0]
    assert r1 == r2  # md5-derived weights: bit-identical on re-run
    orders = pd.read_parquet(f"{sf_smoke}/orders.parquet")
    cents = np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    mean = cents.mean()
    assert r1.n_replicates == PL8._BOOT_B
    assert r1.ci_lo_cents <= mean <= r1.ci_hi_cents
    # a CI from n≈1500 samples is narrow: half-width well under 10% of mean
    assert (r1.ci_hi_cents - r1.ci_lo_cents) / mean < 0.2


def test_poisson_thresholds_are_a_cdf():
    thr = PL8._poisson_thresholds()
    assert len(thr) == 7
    assert all(a < b for a, b in zip(thr, thr[1:]))
    # P(w <= 6) covers all but ~8e-5 of the distribution
    assert thr[-1] / 4294967296.0 > 0.99991
    # P(0) = 1/e
    assert thr[0] / 4294967296.0 == pytest.approx(np.exp(-1.0), abs=1e-9)


def test_mannwhitney_auc_vs_pair_counting(spark, sf_smoke):
    got = PL8.lineitem_discount_auc(spark, sf_smoke).collect()[0]
    li = pd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    disc = np.round(li["l_discount"].to_numpy() * 100).astype(np.int64)
    is_r = (li["l_returnflag"] == "R").to_numpy()
    r, o = disc[is_r], disc[~is_r]
    assert got.n_returned == len(r) and got.n_other == len(o)
    # exact pair counting on the (bounded) distinct-value histogram
    rv = pd.Series(r).value_counts()
    ov = pd.Series(o).value_counts()
    wins = ties = 0
    for dv, nr in rv.items():
        wins += nr * int(ov[ov.index < dv].sum())
        ties += nr * int(ov.get(dv, 0))
    auc = (wins + 0.5 * ties) / (len(r) * len(o))
    assert got.auc == pytest.approx(auc, abs=1e-6)
    assert got.u2 == 2 * wins + ties


def test_ivf_pq_degenerates_to_flat_pq_with_one_zero_centroid(spark, sf_smoke):
    """With a single all-zero coarse centroid the residual IS the raw
    vector and every query probes the only list — so IVFADC must return
    exactly the flat-PQ ADC ranking (same codes, same table, same
    distances).  A structural identity check on the whole composed
    plan."""
    from df_to_azure_spark.functions import similarity as SIM
    from df_to_azure_spark.sources import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    zero = [[0.0] * 64]
    books = SIM.sample_codebooks(emb, 4, 8)
    queries = emb.where("vec_id < 3")
    flat = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_dist)
        for r in SIM.pq_adc_topk(queries, emb, books, k=5).collect()
    }
    ivfpq = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_dist)
        for r in SIM.ivf_pq_residual_topk(
            queries, emb, zero, books, k=5, nprobe=1
        ).collect()
    }
    assert ivfpq == flat


def test_langid_confusion_row_shares_sum_to_one(spark, sf_smoke):
    rows = PL8.langid_confusion_matrix(spark, sf_smoke).collect()
    by_true = {}
    for r in rows:
        by_true.setdefault(r.true_lang, []).append(r)
    for lang, cells in by_true.items():
        assert sum(c.share_of_true for c in cells) == pytest.approx(
            1.0, abs=1e-4
        ), lang
    docs = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    assert sum(r.n_docs for r in rows) == len(docs)


def test_cusum_matches_clamp_recursion(spark, sf_smoke):
    """The S − min(0, running-min S) identity must reproduce the
    textbook clamp recursion C_t = max(0, C_{t−1} + x_t − μ) exactly."""
    rows = sorted(
        PL8.daily_revenue_cusum(spark, sf_smoke).collect(),
        key=lambda r: r.day,
    )
    xs = [r.rev_cents for r in rows]
    mu = (2 * sum(xs) + len(xs)) // (2 * len(xs))  # same half-up device
    c = 0
    for r in rows:
        c = max(0, c + r.rev_cents - mu)
        assert r.cusum_cents == c, r.day


def test_logistic_irls_matches_numpy_two_steps(spark, sf_smoke):
    """Replay the exact 2-step IRLS in numpy (same per-row ROUND(12) on
    p and w) — independent of the shared Cramer text, so a wrong
    sufficient statistic or a mis-derived Newton step cannot hide."""
    got = PL8.logistic_return_model(spark, sf_smoke).collect()[0]
    li = pd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    x1 = np.round(li["l_discount"].to_numpy() * 100).astype(np.int64)
    x2 = np.round(li["l_quantity"].to_numpy() * 100).astype(np.int64)
    y = (li["l_returnflag"] == "R").to_numpy().astype(np.int64)
    X = np.column_stack([np.ones_like(x1), x1, x2]).astype(np.float64)
    # step 1: beta = 0 => p = 1/2: G b = 2 * X'(2y-1)
    G = X.T @ X
    b = np.linalg.solve(G, 2.0 * (X.T @ (2 * y - 1)))
    # step 2: one Newton update with rounded p/w
    p = np.round(1.0 / (1.0 + np.exp(-(X @ b))), 12)
    w = np.round(p * (1 - p), 12)
    A = X.T @ (X * w[:, None])
    g = X.T @ (y - p)
    b2 = b + np.linalg.solve(A, g)
    assert got.n == len(li)
    assert got.beta0 == pytest.approx(b2[0], rel=1e-5, abs=1e-6)
    assert got.beta1 == pytest.approx(b2[1], rel=1e-5, abs=1e-6)
    assert got.beta2 == pytest.approx(b2[2], rel=1e-5, abs=1e-6)


def test_logistic_auc_vs_sorted_pair_counting(spark, sf_smoke):
    """Independent check of the data-sized rank fold: score with the
    numpy-replayed 2-step betas, count concordant/tied pairs via the
    sorted-merge identity (O(n log n), no quadratic loop)."""
    got = PL8.logistic_model_auc(spark, sf_smoke).collect()[0]
    li = pd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    x1 = np.round(li["l_discount"].to_numpy() * 100).astype(np.int64)
    x2 = np.round(li["l_quantity"].to_numpy() * 100).astype(np.int64)
    y = (li["l_returnflag"] == "R").to_numpy().astype(np.int64)
    X = np.column_stack([np.ones_like(x1), x1, x2]).astype(np.float64)
    b = np.linalg.solve(X.T @ X, 2.0 * (X.T @ (2 * y - 1)))
    p1 = np.round(1.0 / (1.0 + np.exp(-(X @ b))), 12)
    w = np.round(p1 * (1 - p1), 12)
    A = X.T @ (X * w[:, None])
    b2 = b + np.linalg.solve(A, X.T @ (y - p1))
    p = np.round(1.0 / (1.0 + np.exp(-(X @ b2))), 12)
    pos, neg = np.sort(p[y == 1]), np.sort(p[y == 0])
    assert got.n_pos == len(pos) and got.n_neg == len(neg)
    # concordant = for each positive, #negatives strictly below; ties via
    # counting equal values
    lo = np.searchsorted(neg, pos, side="left")
    hi = np.searchsorted(neg, pos, side="right")
    wins = int(lo.sum())
    ties = int((hi - lo).sum())
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert got.auc == pytest.approx(auc, abs=1e-6)
    assert got.u2 == 2 * wins + ties


def test_cohort_km_matches_global_km_when_one_cohort(spark, sf_smoke):
    """Cross-consistency: pooling the cohort curves' risk sets at each
    duration must reproduce the GLOBAL KM inputs (risk sets and event
    counts are additive across cohorts)."""
    coh = PL8.kaplan_meier_by_cohort(spark, sf_smoke).collect()
    glob = {r.duration_days: r for r in
            PL8.event_user_kaplan_meier(spark, sf_smoke).collect()}
    pooled = {}
    for r in coh:
        agg = pooled.setdefault(r.duration_days, [0, 0, 0])
        agg[0] += r.n_risk
        agg[1] += r.n_churned
        agg[2] += r.n_censored
    for t, (nr, d, c) in pooled.items():
        # per-duration churn/censor counts pool exactly across cohorts
        assert d == glob[t].n_churned, t
        assert c == glob[t].n_censored, t
    total_churn = sum(r.n_churned for r in coh)
    total_cens = sum(r.n_censored for r in coh)
    assert total_churn == sum(g.n_churned for g in glob.values())
    assert total_cens == sum(g.n_censored for g in glob.values())
    for r in coh:
        assert 0.0 <= r.km_survival <= 1.0


def test_good_turing_table_properties(spark, sf_oracle):
    # sf0.001's tiny vocab has no rare tokens (every type occurs > r_max
    # times), which would make the table legitimately empty — check at
    # sf0.01 where singletons exist
    rows = {r.r: r for r in PL8.token_good_turing(spark, sf_oracle).collect()}
    assert rows, "expected rare-shingle rows at sf0.01"
    docs = pd.read_parquet(f"{sf_oracle}/documents.parquet")
    from collections import Counter

    tok_counts = Counter()
    for t in docs["text"]:
        toks = t.split()
        if len(toks) >= 3:
            tok_counts.update(
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            )
        elif toks:
            tok_counts.update([" ".join(toks)])
    coc = Counter(tok_counts.values())
    for r, row in rows.items():
        assert row.n_r == coc[r], r
        assert row.n_r_next == coc.get(r + 1, 0), r
        exp = (r + 1) * coc.get(r + 1, 0) / coc[r]
        assert row.gt_discounted_r == pytest.approx(exp, abs=1e-6)
    any_row = next(iter(rows.values()))
    assert any_row.n_tokens == sum(tok_counts.values())
    assert any_row.n_types == len(tok_counts)


def test_calibration_bins_are_consistent(spark, sf_smoke):
    rows = PL8.logistic_calibration_curve(spark, sf_smoke).collect()
    li = pd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    assert sum(r.n for r in rows) == len(li)
    for r in rows:
        assert 0 <= r.bin < PL8._CAL_BINS
        assert 0.0 <= r.observed_rate <= 1.0
        # mean predicted prob falls inside (or at the edge of) its bin
        lo, hi = r.bin / PL8._CAL_BINS, (r.bin + 1) / PL8._CAL_BINS
        assert lo - 1e-9 <= r.mean_predicted <= hi + 1e-9 or r.bin == PL8._CAL_BINS - 1
