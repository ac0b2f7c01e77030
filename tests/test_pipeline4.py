"""Semantic checks for the pipeline4 wave, independent of the DuckDB
oracles (which intentionally share the same plan shape): a brute-force
definition of interval concurrency, and numpy's least squares."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from df_to_azure_spark.plans.pipeline4 import (
    nation_revenue_ols,
    session_concurrency_hourly,
)
from df_to_azure_spark.sources import load_table


def test_concurrency_matches_bruteforce_definition(spark, sf_smoke):
    """Peak concurrency per hour == max over candidate instants of the
    number of sessions whose closed interval covers the instant.  The
    max is attained at some session start (arrivals only raise the
    count), so session starts clipped into the hour are a sufficient
    candidate set."""
    from df_to_azure_spark.streaming.events import sessionize

    events = load_table(spark, sf_smoke, "events")
    sessions = [
        (r.session_start, r.session_end)
        for r in sessionize(events, gap_minutes=30).collect()
    ]
    got = {
        r.hour: r.peak_concurrency
        for r in session_concurrency_hourly(spark, sf_smoke).collect()
    }
    assert got, "no hours produced"

    from datetime import timedelta

    for hour, peak in sorted(got.items())[:50]:
        hi = hour + timedelta(hours=1)
        # candidate instants: hour start, plus starts falling inside
        candidates = {hour} | {s for s, e in sessions if hour <= s < hi}
        brute = max(
            sum(1 for s, e in sessions if s <= t <= e) for t in candidates
        )
        assert brute == peak, f"{hour}: brute {brute} != sweep {peak}"


def test_nation_ols_matches_numpy(spark, sf_smoke):
    rows = nation_revenue_ols(spark, sf_smoke).collect()
    assert len(rows) > 0
    # rebuild the monthly series per nation straight from the tables
    import duckdb

    con = duckdb.connect()
    monthly = con.sql(
        f"""
        SELECT n_name,
               (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS x,
               SUM(o_totalprice) AS y
        FROM read_parquet('{sf_smoke}/orders.parquet') o
        JOIN read_parquet('{sf_smoke}/customer.parquet') c ON o_custkey = c_custkey
        JOIN read_parquet('{sf_smoke}/nation.parquet') n ON c_nationkey = n_nationkey
        GROUP BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[tuple[int, float]]] = {}
    for name, x, y in monthly:
        series.setdefault(name, []).append((int(x), float(y)))
    for r in rows:
        pts = series[r.n_name]
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert abs(slope - r.slope) < 1e-3 * max(1.0, abs(slope))
        assert abs(intercept - r.intercept) < 1e-3 * max(1.0, abs(intercept))


def test_rolling_7d_matches_set_bruteforce(spark, sf_smoke):
    from datetime import timedelta

    from df_to_azure_spark.plans.pipeline4 import rolling_7d_active_users

    ev = load_table(spark, sf_smoke, "events")
    pairs = {
        (r.user_id, r.d)
        for r in ev.selectExpr("user_id", "CAST(ts AS DATE) AS d").collect()
    }
    days = sorted({d for _, d in pairs})
    got = {
        r.day.date(): (r.active_1d, r.active_7d)
        for r in rolling_7d_active_users(spark, sf_smoke).collect()
    }
    assert set(got) == set(days)
    for day in days:
        lo = day - timedelta(days=6)
        wau = len({u for u, d in pairs if lo <= d <= day})
        dau = len({u for u, d in pairs if d == day})
        assert got[day] == (dau, wau), day


def test_source_ks_matches_numpy_ecdf(spark, sf_smoke):
    from df_to_azure_spark.plans.pipeline4 import source_ks_matrix

    docs = load_table(spark, sf_smoke, "documents")
    by_src: dict[str, list[int]] = {}
    for r in docs.select("source", "n_chars").collect():
        by_src.setdefault(r.source, []).append(r.n_chars)
    rows = source_ks_matrix(spark, sf_smoke).collect()
    assert rows
    for r in rows[:40]:
        a = np.sort(np.array(by_src[r.source_a], dtype=float))
        b = np.sort(np.array(by_src[r.source_b], dtype=float))
        grid = np.unique(np.concatenate([a, b]))
        ecdf_a = np.searchsorted(a, grid, side="right") / len(a)
        ecdf_b = np.searchsorted(b, grid, side="right") / len(b)
        d = float(np.max(np.abs(ecdf_a - ecdf_b)))
        assert abs(d - r.ks_d) < 1e-6, (r.source_a, r.source_b, d, r.ks_d)


def test_gini_matches_numpy(spark, sf_smoke):
    import duckdb

    from df_to_azure_spark.plans.pipeline4 import customer_gini_by_nation

    con = duckdb.connect()
    rev = con.sql(
        f"""
        SELECT n_name, SUM(o_totalprice) AS rev
        FROM read_parquet('{sf_smoke}/orders.parquet') o
        JOIN read_parquet('{sf_smoke}/customer.parquet') c ON o_custkey = c_custkey
        JOIN read_parquet('{sf_smoke}/nation.parquet') n ON c_nationkey = n_nationkey
        GROUP BY n_name, o_custkey
        """
    ).fetchall()
    by_nation: dict[str, list[float]] = {}
    for name, r in rev:
        by_nation.setdefault(name, []).append(float(r))
    for row in customer_gini_by_nation(spark, sf_smoke).collect():
        y = np.sort(np.array(by_nation[row.n_name]))
        n = len(y)
        gini = 2.0 * np.sum(np.arange(1, n + 1) * y) / (n * y.sum()) - (n + 1) / n
        assert abs(gini - row.gini) < 1e-4, (row.n_name, gini, row.gini)
        assert row.n_customers == n


def test_cusum_matches_numpy(spark, sf_smoke):
    import duckdb

    from df_to_azure_spark.plans.pipeline4 import revenue_cusum_changepoint

    con = duckdb.connect()
    daily = con.sql(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS day, SUM(o_totalprice) AS rev
        FROM read_parquet('{sf_smoke}/orders.parquet') GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    days = [d for d, _ in daily]
    vals = np.array([float(v) for _, v in daily])
    cusum = np.cumsum(vals - vals.mean())
    i = int(np.argmax(np.abs(cusum)))
    row = revenue_cusum_changepoint(spark, sf_smoke).collect()[0]
    assert row.changepoint_day.date() == days[i]
    assert row.n_days == len(days)
    assert abs(row.cusum_peak - abs(cusum[i])) < 1e-2 * max(1.0, abs(cusum[i]))


def test_benford_shares_sum_to_one(spark, sf_smoke):
    from df_to_azure_spark.plans.pipeline4 import totalprice_benford

    rows = totalprice_benford(spark, sf_smoke).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.benford_share for r in rows if r.digit) - sum(
        float(v) for d, v in __import__(
            "df_to_azure_spark.plans.pipeline4", fromlist=["_BENFORD"]
        )._BENFORD.items() if any(x.digit == d for x in rows)
    )) < 1e-12
    n_total = sum(r.n_obs for r in rows)
    for r in rows:
        assert abs(r.obs_share - r.n_obs / n_total) < 1e-6


def test_association_rules_bruteforce(spark, sf_smoke):
    import duckdb
    from collections import Counter

    from df_to_azure_spark.plans.pipeline4 import brand_association_rules

    con = duckdb.connect()
    ob = con.sql(
        f"""
        SELECT DISTINCT l_orderkey, p_brand
        FROM read_parquet('{sf_smoke}/lineitem.parquet') li
        JOIN read_parquet('{sf_smoke}/part.parquet') pt ON l_partkey = p_partkey
        """
    ).fetchall()
    baskets: dict[int, set[str]] = {}
    for okey, brand in ob:
        baskets.setdefault(okey, set()).add(brand)
    n_baskets = len(baskets)
    marg = Counter(b for s in baskets.values() for b in s)
    pair = Counter(
        (x, y) for s in baskets.values() for x in s for y in s if x != y
    )
    rows = brand_association_rules(spark, sf_smoke).collect()
    assert len(rows) == len(pair)
    for r in rows[:100]:
        n_ab = pair[(r.brand_a, r.brand_b)]
        assert r.n_ab == n_ab
        assert abs(r.support - n_ab / n_baskets) < 1e-6
        assert abs(r.confidence - n_ab / marg[r.brand_a]) < 1e-6
        assert abs(
            r.lift - n_ab * n_baskets / (marg[r.brand_a] * marg[r.brand_b])
        ) < 1e-6
    # symmetry: n_ab == n_ba
    got = {(r.brand_a, r.brand_b): r.n_ab for r in rows}
    for (x, y), n in list(got.items())[:50]:
        assert got[(y, x)] == n


def test_daily_acf_matches_numpy(spark, sf_smoke):
    import duckdb

    from df_to_azure_spark.plans.pipeline4 import daily_revenue_acf

    con = duckdb.connect()
    daily = dict(
        con.sql(
            f"""
            SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)),
                   SUM(o_totalprice)
            FROM read_parquet('{sf_smoke}/orders.parquet') GROUP BY 1
            """
        ).fetchall()
    )
    rows = {r.lag: r for r in daily_revenue_acf(spark, sf_smoke).collect()}
    assert set(rows) == set(range(1, 8))
    for lag, r in rows.items():
        xs, ys = [], []
        for d, v in daily.items():
            if d + lag in daily:
                xs.append(float(v))
                ys.append(float(daily[d + lag]))
        assert r.n == len(xs)
        expect = float(np.corrcoef(xs, ys)[0, 1])
        assert abs(r.acf - expect) < 1e-6, (lag, r.acf, expect)


def test_trimmed_mean_udaf_demo_matches_distrank_query(spark, sf_smoke):
    """The GROUPED_AGG pandas-UDAF surface demo: same answer as the
    registered distributed query, computed through the no-partial-agg
    Arrow path (kept for bounded groups / API-surface coverage only —
    the registered query uses the two_phase_rank formulation)."""
    from df_to_azure_spark.functions.outliers import trimmed_mean_udaf
    from df_to_azure_spark.plans.pipeline4 import event_value_trimmed_mean

    ev = load_table(spark, sf_smoke, "events")
    udaf = trimmed_mean_udaf(10)
    got = {
        r.event_type: r.tm
        for r in ev.groupBy("event_type")
        .agg(udaf(F.col("value")).alias("raw"))
        .selectExpr("event_type", "ROUND(raw, 6) AS tm")
        .collect()
    }
    want = {
        r.event_type: r.trimmed_mean
        for r in event_value_trimmed_mean(spark, sf_smoke).collect()
    }
    assert got == want


def test_trimmed_mean_bruteforce(spark, sf_smoke):
    from df_to_azure_spark.plans.pipeline4 import event_value_trimmed_mean

    ev = load_table(spark, sf_smoke, "events")
    by_type: dict[str, list[float]] = {}
    for r in ev.select("event_type", "value").collect():
        by_type.setdefault(r.event_type, []).append(r.value)
    rows = {r.event_type: r for r in event_value_trimmed_mean(spark, sf_smoke).collect()}
    assert set(rows) == set(by_type)
    for t, vals in by_type.items():
        cents = sorted(int(round(v * 100)) for v in vals)
        k = (len(cents) * 10) // 100
        mid = cents[k: len(cents) - k] if len(cents) > 2 * k else cents
        expect = sum(mid) / (100.0 * len(mid))
        assert rows[t].n == len(vals)
        assert abs(rows[t].trimmed_mean - expect) < 1e-6, (t, expect)


def test_mwu_matches_quadratic_definition(spark, sf_smoke):
    from df_to_azure_spark.plans.pipeline4 import source_mwu_matrix

    docs = load_table(spark, sf_smoke, "documents")
    by_src: dict[str, np.ndarray] = {}
    for r in docs.select("source", "n_chars").collect():
        by_src.setdefault(r.source, []).append(r.n_chars)
    by_src = {k: np.array(v) for k, v in by_src.items()}
    rows = source_mwu_matrix(spark, sf_smoke).collect()
    assert rows
    for r in rows[:40]:
        a, b = by_src[r.source_a], by_src[r.source_b]
        two_u = sum(2 * int(np.sum(x > b)) + int(np.sum(x == b)) for x in a)
        assert r.u_a == two_u / 2.0, (r.source_a, r.source_b)
        assert abs(r.rank_biserial_a - (1 - two_u / (len(a) * len(b)))) < 1e-6
        # complement identity: 2U_a + 2U_b = 2 n_a n_b
        two_u_b = sum(2 * int(np.sum(x > a)) + int(np.sum(x == a)) for x in b)
        assert two_u + two_u_b == 2 * len(a) * len(b)
        assert (r.n_a, r.n_b) == (len(a), len(b))


def test_km_matches_python_reference(spark, sf_smoke):
    import duckdb
    import math

    from df_to_azure_spark.plans.pipeline4 import reorder_survival_km

    con = duckdb.connect()
    rows_raw = con.sql(
        f"""
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey
        FROM read_parquet('{sf_smoke}/orders.parquet')
        ORDER BY o_custkey, d, o_orderkey
        """
    ).fetchall()
    by_cust: dict[int, list] = {}
    for c, d, _ in rows_raw:
        by_cust.setdefault(c, []).append(d)
    dmax = max(d for _, d, _ in rows_raw)
    durs = []  # (t, event)
    for ds in by_cust.values():
        for a, b in zip(ds, ds[1:]):
            durs.append(((b - a).days, 1))
        durs.append(((dmax - ds[-1]).days, 0))
    # classic KM over the distinct duration grid
    from collections import Counter

    d_at = Counter(t for t, e in durs if e)
    tot_at = Counter(t for t, _ in durs)
    n = len(durs)
    surv, got_surv = 1.0, {}
    seen = 0
    expect = {}
    for t in sorted(tot_at):
        n_risk = n - seen
        d = d_at.get(t, 0)
        if d >= n_risk:
            surv = 0.0
        else:
            surv *= (n_risk - d) / n_risk
        expect[t] = (n_risk, d, surv)
        seen += tot_at[t]
    out = {r.t: r for r in reorder_survival_km(spark, sf_smoke).collect()}
    assert set(out) == set(expect)
    prev = 1.0
    for t in sorted(out):
        r = out[t]
        n_risk, d, surv = expect[t]
        assert r.n_at_risk == n_risk and r.d_events == d, t
        assert abs(r.survival - surv) < 5e-5, (t, r.survival, surv)
        assert r.survival <= prev + 1e-9  # monotone non-increasing
        prev = r.survival


def test_logrank_matches_python_reference(spark, sf_smoke):
    import duckdb
    from collections import Counter

    from df_to_azure_spark.plans.pipeline4 import segment_logrank_test

    con = duckdb.connect()
    raw = con.sql(
        f"""
        SELECT o_custkey,
               CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
               CAST(o_orderdate AS DATE) AS d, o_orderkey
        FROM read_parquet('{sf_smoke}/orders.parquet') o
        JOIN read_parquet('{sf_smoke}/customer.parquet') c ON o_custkey = c_custkey
        ORDER BY o_custkey, d, o_orderkey
        """
    ).fetchall()
    by_cust: dict[int, tuple[int, list]] = {}
    for cust, g, d, _ in raw:
        by_cust.setdefault(cust, (g, []))[1].append(d)
    dmax = max(d for _, _, d, _ in raw)
    durs = []  # (t, event, group)
    for g, ds in by_cust.values():
        for a, b in zip(ds, ds[1:]):
            durs.append(((b - a).days, 1, g))
        durs.append(((dmax - ds[-1]).days, 0, g))
    d_all = Counter(t for t, e, _ in durs if e)
    d1 = Counter(t for t, e, g in durs if e and g)
    tot_all = Counter(t for t, _, _ in durs)
    tot1 = Counter(t for t, _, g in durs if g)
    n_all, n1 = len(durs), sum(1 for *_, g in durs if g)
    seen_all = seen1 = 0
    num = var = 0.0
    for t in sorted(tot_all):
        na, n1t = n_all - seen_all, n1 - seen1
        d, dd1 = d_all.get(t, 0), d1.get(t, 0)
        num += dd1 - d * n1t / na
        if na > 1:
            var += d * (n1t / na) * (1 - n1t / na) * (na - d) / (na - 1)
        seen_all += tot_all[t]
        seen1 += tot1.get(t, 0)
    chi2 = num * num / var
    row = segment_logrank_test(spark, sf_smoke).collect()[0]
    assert abs(row.obs_minus_exp - num) < 1e-6 * max(1.0, abs(num))
    assert abs(row.variance - var) < 1e-6 * max(1.0, var)
    assert abs(row.chi2 - chi2) < 1e-4 * max(1.0, chi2)
