"""Property tests for the pipeline5 wave: the trend tests against
direct quadratic/numpy reference computations, the portable HLL against
its accuracy bound, quantile normalization against a pandas replay, LPA
on a hand-built graph, and the EWMA against a direct Python fold."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from df_to_azure_spark.plans import pipeline5 as PL5


def _daily(spark, sf_smoke) -> pd.DataFrame:
    return (
        PL5._daily_revenue(spark, sf_smoke)
        .toPandas()
        .sort_values("d")
        .reset_index(drop=True)
    )


def test_mann_kendall_matches_quadratic_reference(spark, sf_smoke):
    out = PL5.daily_revenue_mann_kendall(spark, sf_smoke).toPandas()
    daily = _daily(spark, sf_smoke)
    x = daily["rev"].astype(float).to_numpy()
    n = len(x)
    s = sum(
        np.sign(x[j] - x[i]) for i in range(n) for j in range(i + 1, n)
    )
    assert out.loc[0, "n_days"] == n
    assert out.loc[0, "s_stat"] == int(s)
    # no ties in this data is not guaranteed; recompute var with ties
    _, counts = np.unique(x, return_counts=True)
    tie = sum(t * (t - 1) * (2 * t + 5) for t in counts)
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    z_ref = (s - math.copysign(1, s)) / math.sqrt(var) if s != 0 else 0.0
    assert out.loc[0, "z_stat"] == pytest.approx(z_ref, abs=1e-6)
    n0 = n * (n - 1) / 2
    n2 = sum(t * (t - 1) / 2 for t in counts)
    assert out.loc[0, "tau_b"] == pytest.approx(
        s / math.sqrt(n0 * (n0 - n2)), abs=1e-6
    )


def test_theil_sen_matches_numpy_median(spark, sf_smoke):
    out = PL5.daily_revenue_theil_sen(spark, sf_smoke).toPandas()
    daily = _daily(spark, sf_smoke)
    d = daily["d"].to_numpy()
    x = daily["rev"].astype(float).to_numpy()
    n = len(d)
    slopes = np.array(
        [
            round((x[j] - x[i]) / (d[j] - d[i]), 9)
            for i in range(n)
            for j in range(i + 1, n)
        ]
    )
    assert out.loc[0, "n_pairs"] == len(slopes)
    med = np.median(slopes)  # numpy averages the two middles too
    assert out.loc[0, "slope_per_day"] == pytest.approx(med, abs=1e-8)
    resid = np.round(x - out.loc[0, "slope_per_day"] * d, 6)
    assert out.loc[0, "intercept"] == pytest.approx(
        np.median(resid), abs=1e-5
    )


def test_hll_rho_case_is_leading_zero_rank(spark):
    # rho(w) over the 40-bit word: spot every boundary value
    cases = {0: 41, 1: 40, 2: 39, 3: 39, (1 << 39): 1, (1 << 39) - 1: 2}
    expr = PL5._rho_case("w")
    rows = spark.createDataFrame(
        [(w,) for w in cases], "w LONG"
    ).selectExpr("w", f"{expr} AS rho").collect()
    for r in rows:
        assert r.rho == cases[r.w], f"w={r.w}"


def test_hll_estimate_within_error_bound(spark, sf_oracle):
    out = PL5.hll_distinct_users(spark, sf_oracle).toPandas()
    assert (out["m"] == 256).all()
    # 256 registers: ~1.04/sqrt(256) = 6.5% std error; allow 4 sigma
    assert (out["rel_err"].abs() < 0.26).all(), out
    # registers can never exceed m, zero-register count consistent
    assert (out["v_zero"] >= 0).all() and (out["v_zero"] <= 256).all()


def test_quantile_norm_matches_pandas_replay(spark, sf_smoke):
    out = (
        PL5.event_value_quantile_norm(spark, sf_smoke)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")[
        ["event_type", "event_id", "value"]
    ]
    ev = ev.sort_values(["value", "event_id"]).reset_index(drop=True)
    ev["g"] = np.arange(1, len(ev) + 1)
    n_total = len(ev)
    gval = ev["value"].to_numpy()
    ev["rt"] = ev.groupby("event_type").cumcount() + 1
    nt = ev.groupby("event_type")["value"].transform("size")
    idx = ((2 * ev["rt"] - 1) * n_total) // (2 * nt) + 1
    ev["norm"] = gval[idx.to_numpy() - 1]
    ref = ev.groupby("event_type").agg(
        n=("norm", "size"), min_norm=("norm", "min"),
        max_norm=("norm", "max"),
        mean_norm=("norm", lambda s: round(
            float(sum(pd.Series(s).round(6))) / len(s), 6)),
    ).sort_index()
    assert (out["n"] == ref["n"]).all()
    assert out["min_norm"].to_numpy() == pytest.approx(
        ref["min_norm"].to_numpy()
    )
    assert out["max_norm"].to_numpy() == pytest.approx(
        ref["max_norm"].to_numpy()
    )
    assert out["mean_norm"].to_numpy() == pytest.approx(
        ref["mean_norm"].to_numpy(), abs=1e-5
    )
    # the point of the operator: every type now draws from the SAME
    # reference distribution, so the per-type means collapse together
    assert out["mean_norm"].std() <= out["mean_raw"].std() + 1e-9


def test_label_propagation_two_cliques(spark):
    from df_to_azure_spark.functions.graph import label_propagation

    # two triangles {1,2,3} and {10,11,12} joined by a bridge 3-10
    und = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src LONG, dst LONG"
    )
    labels = {
        r.node: r.label
        for r in label_propagation(edges, iters=4).collect()
    }
    # each triangle collapses to its min label; min-tie keeps them apart
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[11] == labels[12] == labels[10]
    assert labels[10] != labels[1] or labels[10] == 1  # bridge may pull 10
    assert len(labels) == 6


def test_label_propagation_string_ids_portable_tiebreak(spark):
    from df_to_azure_spark.functions.graph import label_propagation

    # same two-clique topology as above, but STRING node ids — the
    # numeric -label tie-break can't apply; the portable min(label)
    # fallback must give the identical deterministic result
    m = {1: "n01", 2: "n02", 3: "n03", 10: "n10", 11: "n11", 12: "n12"}
    und = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)]
    edges = spark.createDataFrame(
        [(m[a], m[b]) for a, b in und] + [(m[b], m[a]) for a, b in und],
        "src STRING, dst STRING",
    )
    labels = {
        r.node: r.label for r in label_propagation(edges, iters=4).collect()
    }
    assert labels["n01"] == labels["n02"] == labels["n03"] == "n01"
    assert labels["n11"] == labels["n12"] == labels["n10"]
    assert len(labels) == 6


def test_label_propagation_isolated_node_keeps_label(spark):
    from df_to_azure_spark.functions.graph import label_propagation

    # 5 -> 6 only: 6 adopts 5's label, 5 has no in-edges and keeps its own
    edges = spark.createDataFrame([(5, 6)], "src LONG, dst LONG")
    labels = {r.node: r.label for r in label_propagation(edges, 2).collect()}
    assert labels == {5: 5, 6: 5}
    with pytest.raises(ValueError):
        label_propagation(edges, 0)


def test_ewma_matches_direct_fold(spark, sf_smoke):
    out = (
        PL5.daily_revenue_ewma(spark, sf_smoke)
        .toPandas()
        .sort_values("d")
        .reset_index(drop=True)
    )
    daily = _daily(spark, sf_smoke)
    rev = dict(zip(daily["d"], daily["rev"].astype(float)))
    alpha = 0.3
    for _, row in out.head(50).iterrows():
        d = row["d"]
        num = den = 0.0
        n_win = 0
        for g in range(14):
            if (d - g) in rev:
                w = alpha * (1 - alpha) ** g
                num += w * rev[d - g]
                den += w
                n_win += 1
        assert row["n_window"] == n_win
        assert row["ewma14"] == pytest.approx(num / den, rel=1e-6)
    assert (out["n_window"] <= 14).all()
    # a quiet day pulls the smoother below the raw series spike days
    assert out["ewma14"].std() < out["revenue"].std()


def test_hits_authority_mutual_reinforcement(spark, sf_smoke):
    out = PL5.part_hits_authority(spark, sf_smoke).toPandas()
    assert len(out) == PL5._HITS_TOPK
    assert (out["authority"] > 0).all()
    # sorted by authority desc with part tie-break
    a = out["authority"].to_numpy()
    assert (a[:-1] >= a[1:]).all()
    # authority is a normalized weight, so each entry is a share < 1
    assert (a < 1.0).all()


def test_hits_uniform_on_regular_bipartite(spark, monkeypatch):
    # 2 customers x 2 parts complete bipartite: authorities must tie
    import df_to_azure_spark.plans.pipeline5 as mod

    orders = spark.createDataFrame(
        [(1, 100), (2, 200)], "o_orderkey LONG, o_custkey LONG"
    )
    lineitem = spark.createDataFrame(
        [(1, 7), (1, 8), (2, 7), (2, 8)], "l_orderkey LONG, l_partkey LONG"
    )
    def fake_load(spark_, sf_dir, name):
        return {"orders": orders, "lineitem": lineitem}[name]
    monkeypatch.setattr(mod, "load_table", fake_load)
    out = mod.part_hits_authority(spark, "ignored").toPandas()
    assert sorted(out["part_id"]) == [7, 8]
    assert out["authority"].nunique() == 1
    assert out["authority"].iloc[0] == pytest.approx(0.5, abs=1e-9)


def test_assortativity_matches_numpy(spark, sf_smoke):
    from df_to_azure_spark.plans.pipeline2 import _part_edges

    out = PL5.part_degree_assortativity(spark, sf_smoke).toPandas()
    e = _part_edges(spark, sf_smoke).toPandas()
    deg = e.groupby("src").size()
    dx = deg.loc[e["src"]].to_numpy(dtype=float)
    dy = deg.loc[e["dst"]].to_numpy(dtype=float)
    ref = np.corrcoef(dx, dy)[0, 1]
    assert out.loc[0, "n_edges"] == len(e)
    assert out.loc[0, "n_nodes"] == deg.size
    assert out.loc[0, "assortativity"] == pytest.approx(ref, abs=1e-6)
    assert -1.0 <= out.loc[0, "assortativity"] <= 1.0


def test_weekday_anomalies_reference_replay(spark, sf_smoke):
    out = PL5.weekday_revenue_anomalies(spark, sf_smoke).toPandas()
    daily = _daily(spark, sf_smoke)
    cents = (daily["rev"] * 100).astype("int64")
    dow = ((daily["d"] + 2) % 7).astype(int)
    wd_mean = {}
    for w in range(7):
        sel = cents[dow == w]
        wd_mean[w] = (2 * int(sel.sum()) + len(sel)) // (2 * len(sel))
    res = cents.to_numpy() - np.array([wd_mean[w] for w in dow])
    order = sorted(
        range(len(res)), key=lambda i: (-abs(res[i]), daily["d"][i])
    )[: PL5._WD_TOPK]
    assert list(out["d"]) == [daily["d"][i] for i in order]
    assert out["residual"].to_numpy() == pytest.approx(
        np.array([res[i] for i in order]) / 100.0
    )
    names = {0: "Mon", 1: "Tue", 2: "Wed", 3: "Thu", 4: "Fri", 5: "Sat", 6: "Sun"}
    assert list(out["weekday"]) == [names[dow[i]] for i in order]


def test_cms_one_sided_error(spark, sf_smoke):
    out = PL5.cms_user_event_counts(spark, sf_smoke).toPandas()
    assert len(out) == PL5._CMS_TOPK
    # count-min NEVER undercounts
    assert (out["overestimate"] >= 0).all()
    assert (out["cms_estimate"] >= out["n_exact"]).all()
    # top-k really is the exact top-k: all counts >= any non-selected user
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    full = ev.groupby("user_id").size().sort_values(ascending=False)
    assert set(out["n_exact"]) <= set(full.values)
    assert out["n_exact"].min() >= full.iloc[PL5._CMS_TOPK] - 0  # kth bound


def test_bloom_no_false_negatives_and_rates(spark, sf_smoke):
    out = PL5.bloom_join_prefilter(spark, sf_smoke).toPandas()
    r = out.iloc[0]
    assert r["n_pass"] >= r["n_true"]          # Bloom never drops a member
    assert r["n_false_pos"] == r["n_pass"] - r["n_true"]
    assert 0.0 <= r["fp_rate"] <= 1.0
    assert 0.0 <= r["fp_theoretical"] <= 1.0
    assert r["n_bits_set"] <= PL5._BLOOM_M
    # measured FP should be in the right ballpark of theoretical
    assert r["fp_rate"] <= max(5 * r["fp_theoretical"], 0.05)


def test_bloom_toy_membership(spark, monkeypatch):
    import df_to_azure_spark.plans.pipeline5 as mod

    customer = spark.createDataFrame(
        [(1, "BUILDING"), (2, "BUILDING"), (3, "AUTOMOBILE")],
        "c_custkey LONG, c_mktsegment STRING",
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3), (13, 99)],
        "o_orderkey LONG, o_custkey LONG",
    )
    def fake_load(spark_, sf_dir, name):
        return {"customer": customer, "orders": orders}[name]
    monkeypatch.setattr(mod, "load_table", fake_load)
    r = mod.bloom_join_prefilter(spark, "ignored").toPandas().iloc[0]
    assert r["n_build"] == 2 and r["n_probe"] == 4 and r["n_true"] == 2
    # with m=4096 and 2 keys, keys 3 and 99 all but surely miss
    assert r["n_pass"] >= 2 and r["n_false_pos"] in (0, 1, 2)


def test_psi_identical_distribution_is_stable(spark, monkeypatch):
    import df_to_azure_spark.plans.pipeline5 as mod

    # two sources with IDENTICAL length distributions -> tiny PSI
    rows = [(i, "a" if i % 2 == 0 else "b", 100 + (i % 50)) for i in range(400)]
    docs = spark.createDataFrame(
        [(i, s, n) for i, s, n in rows], "doc_id LONG, source STRING, n_chars LONG"
    )
    monkeypatch.setattr(
        mod, "load_table", lambda sp, sf, name: {"documents": docs}[name]
    )
    out = mod.source_psi_matrix(spark, "ignored").toPandas()
    assert set(out["source"]) == {"a", "b"}
    # not ~0: only 50 distinct lengths, so decile edges cut inside tie
    # groups and the doc_id tie-break correlates with source parity --
    # but far below the 0.1 monitoring threshold
    assert (out["psi"].abs() < 0.05).all()
    assert (out["drift"] == "stable").all()


def test_psi_shifted_distribution_flags_drift(spark, monkeypatch):
    import df_to_azure_spark.plans.pipeline5 as mod

    rows = [(i, "ref", 100 + (i % 50)) for i in range(400)] + [
        (1000 + i, "shifted", 500 + (i % 50)) for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, source STRING, n_chars LONG")
    monkeypatch.setattr(
        mod, "load_table", lambda sp, sf, name: {"documents": docs}[name]
    )
    out = (
        mod.source_psi_matrix(spark, "ignored").toPandas().set_index("source")
    )
    # the shifted source's mass concentrates in the top bins -> major drift
    assert out.loc["shifted", "psi"] > 0.2
    assert out.loc["shifted", "drift"] == "major"
    assert out.loc["shifted", "psi"] > out.loc["ref", "psi"]


def test_target_encoding_no_leakage_and_shrinkage(spark, sf_smoke):
    out = PL5.segment_target_encoding_loo(spark, sf_smoke).toPandas()
    assert len(out) == out[["segment", "fold"]].drop_duplicates().shape[0]
    assert set(out["fold"]) <= set(range(PL5._TE_FOLDS))
    gm = out["global_mean"].iloc[0]
    assert (out["global_mean"] == gm).all()
    # the LOO encoding excludes the fold's own rows: reconstruct one cell
    ev = pd.read_parquet(f"{sf_smoke}/orders.parquet")
    cust = pd.read_parquet(f"{sf_smoke}/customer.parquet")
    df = ev.merge(cust, left_on="o_custkey", right_on="c_custkey")
    import hashlib
    def fold(k):
        return int(hashlib.md5(str(k).encode()).hexdigest()[:12], 16) % 5
    df["fold"] = df["o_orderkey"].map(fold)
    df["cents"] = (df["o_totalprice"] * 100).round().astype("int64")
    seg0, f0 = out.iloc[0]["segment"], int(out.iloc[0]["fold"])
    sdf = df[df["c_mktsegment"] == seg0]
    other = sdf[sdf["fold"] != f0]
    gm_cents = (2 * int(df["cents"].sum()) + len(df)) // (2 * len(df))
    k = PL5._TE_SMOOTH
    num = 2 * (int(other["cents"].sum()) + k * gm_cents) + (len(other) + k)
    enc = (num // (2 * (len(other) + k))) / 100.0
    assert out.iloc[0]["encoding"] == pytest.approx(enc, abs=1e-9)
    # shrinkage: every encoding sits between the raw LOO mean's
    # neighborhood and the global mean (within the segment spread)
    assert out["encoding"].std() <= out["fold_mean"].std() * 1.5 + 1e-9


def test_feature_hashing_grid_and_mass(spark, sf_smoke):
    out = PL5.corpus_feature_hashing(spark, sf_smoke).toPandas()
    assert len(out) == PL5._FH_DIM
    assert sorted(out["idx"]) == list(range(PL5._FH_DIM))
    # total occurrences equals the corpus token count
    ev = pd.read_parquet(f"{sf_smoke}/documents.parquet")
    n_tokens = int(ev["text"].str.split().map(len).sum())
    assert int(out["n_occurrences"].sum()) == n_tokens
    # signed mass is bounded by occurrence mass, collisions visible
    assert (out["signed_value"].abs() <= out["n_occurrences"]).all()
    assert out["n_distinct_tokens"].max() >= 1


def test_stream_cms_matches_batch(spark, sf_smoke):
    from df_to_azure_spark.streaming.stateful import stream_cms_diff

    assert stream_cms_diff(spark, sf_smoke).count() == 0


def test_cohort_ltv_monotone_in_age(spark, sf_smoke):
    out = PL5.cohort_ltv_curve(spark, sf_smoke).toPandas()
    # cumulative per-customer revenue can never decrease with age
    for _, g in out.groupby("cohort_month"):
        g = g.sort_values("age_months")
        assert (g["ltv_per_customer"].diff().dropna() >= -1e-9).all()
    # first month of each cohort has every cohort customer ordering
    assert (out["age_months"] >= 0).all()
    assert (out["n_customers"] > 0).all()
    # cohort sizes sum to the distinct customer count
    ev = pd.read_parquet(f"{sf_smoke}/orders.parquet")
    per_cohort = out.drop_duplicates("cohort_month")["n_customers"].sum()
    assert per_cohort == ev["o_custkey"].nunique()


def test_brand_ols2_matches_numpy_lstsq(spark, sf_smoke):
    out = PL5.brand_price_ols2(spark, sf_smoke).toPandas()
    li = pd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    part = pd.read_parquet(f"{sf_smoke}/part.parquet")
    df = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    b0 = out.iloc[0]["p_brand"]
    g = df[df["p_brand"] == b0]
    X = np.column_stack(
        [np.ones(len(g)), g["l_quantity"], g["l_discount"] * 100]
    )
    yv = g["l_extendedprice"].to_numpy()
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    row = out.set_index("p_brand").loc[b0]
    assert row["intercept"] == pytest.approx(beta[0], rel=1e-4, abs=1e-3)
    assert row["beta_qty"] == pytest.approx(beta[1], rel=1e-4, abs=1e-3)
    assert row["beta_disc_pct"] == pytest.approx(beta[2], rel=1e-3, abs=1e-2)
    pred = X @ beta
    ss_res = float(((yv - pred) ** 2).sum())
    ss_tot = float(((yv - yv.mean()) ** 2).sum())
    assert row["r2"] == pytest.approx(1 - ss_res / ss_tot, abs=1e-4)
    # this synthetic data's extendedprice is NOT quantity-proportional
    # (unlike real TPC-H), so only the algebraic bounds hold
    assert ((out["r2"] <= 1.0) & (out["r2"] >= 0.0)).all()


def test_top_session_paths_replay(spark, sf_smoke):
    out = PL5.top_session_paths(spark, sf_smoke).toPandas()
    assert len(out) <= PL5._PATH_TOPK
    assert (out["n_sessions"] >= out["n_users"]).all()
    # replay in pandas: same gap sessionization, same path construction
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")[
        ["user_id", "event_id", "ts", "event_type"]
    ].sort_values(["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=PL5._PATH_GAP_MIN)
    ev["new_s"] = (
        ev.groupby("user_id")["ts"].diff() > gap
    ).astype(int)
    ev["sess"] = ev.groupby("user_id")["new_s"].cumsum()
    paths = (
        ev.groupby(["user_id", "sess"])["event_type"]
        .apply(lambda s: ">".join(s.head(PL5._PATH_LEN)))
        .reset_index(name="path")
    )
    ref = (
        paths.groupby("path")
        .agg(n_sessions=("path", "size"), n_users=("user_id", "nunique"))
        .reset_index()
        .sort_values(["n_sessions", "path"], ascending=[False, True])
        .head(PL5._PATH_TOPK)
        .reset_index(drop=True)
    )
    assert list(out["path"]) == list(ref["path"])
    assert list(out["n_sessions"]) == list(ref["n_sessions"])
    assert list(out["n_users"]) == list(ref["n_users"])


def test_sla_percentiles_nearest_rank(spark, sf_smoke):
    out = (
        PL5.session_duration_percentiles(spark, sf_smoke)
        .toPandas()
        .set_index("percentile")
    )
    assert list(out.index) == ["p50", "p90", "p99"]
    from df_to_azure_spark.sources import load_table
    from df_to_azure_spark.streaming.events import sessionize

    ev = load_table(spark, sf_smoke, "events")
    durs = sorted(
        (r.session_end - r.session_start).total_seconds() * 1e6
        for r in sessionize(ev, 30).collect()
    )
    import math

    n = len(durs)
    for label, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        k = math.ceil(p * n)
        assert out.loc[label, "rank"] == k
        assert out.loc[label, "duration_us"] == int(durs[k - 1])
    assert (
        out.loc["p50", "duration_us"]
        <= out.loc["p90", "duration_us"]
        <= out.loc["p99", "duration_us"]
    )


def test_interarrival_expfit_against_scipy_free_reference(spark, sf_smoke):
    out = PL5.user_interarrival_expfit(spark, sf_smoke).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")[
        ["user_id", "ts", "event_id"]
    ].sort_values(["user_id", "ts", "event_id"])
    gaps = (
        ev.groupby("user_id")["ts"].diff().dropna().dt.total_seconds() * 1e6
    )
    gaps = gaps[gaps > 0].astype("int64").to_numpy()
    n = len(gaps)
    lam = n / (gaps.sum() / 1e6)
    assert out["n"] == n
    assert out["lambda_per_sec"] == pytest.approx(lam, rel=1e-5)
    # KS replay on the distinct-gap grid
    import numpy as np

    vals, counts = np.unique(gaps, return_counts=True)
    cum = np.cumsum(counts)
    model = np.round(1 - np.exp(-lam * (vals / 1e6)), 12)
    ks = np.max(np.abs(cum / n - model))
    assert out["ks_stat"] == pytest.approx(ks, abs=2e-6)
    mean = gaps.mean()
    sd = gaps.std()  # population (ddof=0), matching sxx/n - mean^2
    assert out["burstiness"] == pytest.approx(
        (sd - mean) / (sd + mean), abs=1e-5
    )
    assert -1.0 <= out["burstiness"] <= 1.0


def test_ir_metrics_bounds_and_perfect_case(spark, sf_smoke):
    out = PL5.lsh_retrieval_metrics(spark, sf_smoke).toPandas()
    assert len(out) == 5  # vec_id < 5 query batch
    for c in ("recall_at_10", "mrr", "ndcg_at_10"):
        assert ((out[c] >= 0) & (out[c] <= 1)).all(), c
    # a query whose LSH list fully matches truth must score 1.0 across
    # the board; one with zero overlap must be all zeros
    perfect = out[out["n_rel"] == PL5._IR_K]
    assert (perfect["recall_at_10"] == 1.0).all()
    assert (perfect["ndcg_at_10"] == 1.0).all()
    empty = out[out["n_rel"] == 0]
    assert (empty["mrr"] == 0).all() and (empty["ndcg_at_10"] == 0).all()
    # NDCG can only reach 1 when every retrieved item is relevant at the
    # top; it is monotone-bounded by recall
    assert (out["ndcg_at_10"] <= out["recall_at_10"] * PL5._IR_K).all()


def test_mta_credit_conservation(spark, sf_smoke):
    out = PL5.purchase_attribution_mta(spark, sf_smoke).toPandas()
    assert set(out["channel"]) <= {"click", "signup", "error", "view"}
    # each attributed purchase distributes EXACTLY one unit of credit,
    # under both models: totals equal the attributed-purchase count
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet")
    p = ev[ev["event_type"] == "purchase"][["user_id", "event_id", "ts"]]
    t = ev[ev["event_type"] != "purchase"][["user_id", "ts"]]
    m = p.merge(t, on="user_id", suffixes=("_p", "_t"))
    w = pd.Timedelta(days=PL5._ATTR_WINDOW_DAYS)
    m = m[(m["ts_t"] < m["ts_p"]) & (m["ts_p"] - m["ts_t"] <= w)]
    n_attributed = m["event_id"].nunique()
    assert out["linear_credit"].sum() == pytest.approx(n_attributed, abs=0.01)
    assert out["decay_credit"].sum() == pytest.approx(n_attributed, abs=0.01)
    # decay must shift credit toward recency relative to linear, but
    # both stay positive wherever touches exist
    assert (out["linear_credit"] > 0).all()
    assert (out["decay_credit"] > 0).all()


def test_reconciliation_audit_counts_balance(spark, sf_smoke):
    out = PL5.order_reconciliation_audit(spark, sf_smoke).toPandas()
    ev = pd.read_parquet(f"{sf_smoke}/orders.parquet")
    assert out["n_orders"].sum() == len(ev)
    assert (out["n_reconciled"] + out["n_no_lines"] <= out["n_orders"]).all()
    assert (out["match_rate"] >= 0).all() and (out["match_rate"] <= 1).all()
    # one cell replayed exactly in pandas
    li = pd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    li["scaled"] = (
        (li["l_extendedprice"] * 100).round().astype("int64")
        * (100 - (li["l_discount"] * 100).round().astype("int64"))
        * (100 + (li["l_tax"] * 100).round().astype("int64"))
    )
    rolled = li.groupby("l_orderkey")["scaled"].sum()
    roll_cents = (2 * rolled + 10000) // 20000
    hdr = ev.set_index("o_orderkey")
    gaps = (
        (hdr["o_totalprice"] * 100).round().astype("int64")
        - roll_cents.reindex(hdr.index).fillna(0).astype("int64")
    ).abs()
    ok = gaps[hdr["o_orderstatus"] == out.iloc[0]["o_orderstatus"]]
    has_lines = roll_cents.reindex(hdr.index).notna()[
        hdr["o_orderstatus"] == out.iloc[0]["o_orderstatus"]
    ]
    n_rec = int(((ok <= PL5._RECON_TOL_CENTS) & has_lines).sum())
    assert out.iloc[0]["n_reconciled"] == n_rec


def test_duplicate_payment_screen_shape(spark, sf_smoke):
    out = PL5.duplicate_payment_screen(spark, sf_smoke).toPandas()
    assert len(out) <= 20
    if len(out):
        assert (out["n_pairs"] >= 1).all()
        assert (out["closest_days"] <= PL5._DUP_WINDOW_DAYS).all()
        n = out["n_pairs"].to_numpy()
        assert (n[:-1] >= n[1:]).all()  # ordered by pair count desc


def test_retrieval_metrics_hand_computed(spark):
    import math

    from df_to_azure_spark.functions.similarity import retrieval_metrics

    truth = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3), (2, 7)],
        "query_id long, neighbor_id long",
    )
    cand = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 5), (1, 3, 2), (2, 1, 8), (2, 2, 9), (2, 3, 10)],
        "query_id long, rank int, neighbor_id long",
    )
    got = {
        r.query_id: r for r in retrieval_metrics(truth, cand, k=3).collect()
    }
    r1 = got[1]
    assert r1.n_rel == 2
    assert abs(r1.recall_at_3 - 2 / 3) < 1e-12
    assert r1.mrr == 1.0
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert abs(r1.ndcg_at_3 - round(dcg / idcg, 6)) < 1e-12
    r2 = got[2]
    assert (r2.n_rel, r2.recall_at_3, r2.mrr, r2.ndcg_at_3) == (0, 0.0, 0.0, 0.0)


def test_ann_retrieval_matrix_smoke(spark, sf_smoke):
    from df_to_azure_spark.plans.pipeline5 import ann_retrieval_matrix

    rows = ann_retrieval_matrix(spark, sf_smoke).collect()
    variants = {r.variant for r in rows}
    assert variants == {"lsh", "ivf", "pq_adc", "pq_rerank", "hybrid_rrf"}
    for r in rows:
        assert 0.0 <= r.recall_at_10 <= 1.0
        assert 0.0 <= r.mrr <= 1.0
        assert 0.0 <= r.ndcg_at_10 <= 1.0
    # the hybrid leg fuses the exact ranking, so it must dominate or
    # match pure LSH on every query's recall
    by = {(r.variant, r.query_id): r for r in rows}
    for (v, qid), r in by.items():
        if v == "hybrid_rrf":
            assert r.recall_at_10 >= by[("lsh", qid)].recall_at_10 - 1e-9


def test_ann_index_build_deterministic_and_matrix_reads_store(spark, sf_smoke):
    """Two consecutive builds must summarize identically (the artifacts
    are pure functions of data + seeded literals), and the matrix must
    produce its 5×|queries| evaluation rows from the stored artifacts."""
    from df_to_azure_spark.plans.pipeline5 import (
        ann_index_build,
        ann_retrieval_matrix,
    )

    s1 = sorted(map(tuple, ann_index_build(spark, sf_smoke).collect()))
    s2 = sorted(map(tuple, ann_index_build(spark, sf_smoke).collect()))
    assert s1 == s2
    assert [r[0] for r in s1] == ["ivf", "lsh", "pq_adc", "pq_rerank"]
    rows = ann_retrieval_matrix(spark, sf_smoke).collect()
    variants = {r.variant for r in rows}
    assert variants == {"lsh", "ivf", "pq_adc", "pq_rerank", "hybrid_rrf"}
