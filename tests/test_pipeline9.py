"""Round-10 wave tests: PAV isotonic fit pinned against a sequential
pool-adjacent-violators reference, KN trigram sanity, grouped Lorenz
invariants."""

from __future__ import annotations

from df_to_azure_spark.plans import pipeline9 as PL9


def test_isotonic_recalibration_matches_sequential_pav(spark, sf_smoke):
    rows = sorted(
        PL9.logistic_isotonic_recalibration(spark, sf_smoke).collect(),
        key=lambda r: r.bin,
    )
    assert rows, "no calibration bins"
    # monotone nondecreasing by construction
    iso = [r.iso_rate for r in rows]
    assert iso == sorted(iso)
    # equals the sequential PAV fit on the same (n, n_pos) bins
    obs = [(r.n, round(r.observed_rate * r.n)) for r in rows]
    blocks = [[n, p] for n, p in obs]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][1] * blocks[i + 1][0] > blocks[i + 1][1] * blocks[i][0]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    # expand pooled blocks back over their member bins by weight
    expanded = []
    bin_iter = iter(obs)
    for w, p in blocks:
        consumed = 0
        while consumed < w:
            n, _ = next(bin_iter)
            expanded.append(round(p / w, 6))
            consumed += n
    assert iso == expanded


def test_kn_trigram_bits_positive_and_clamped(spark, sf_smoke):
    rows = PL9.doc_kn_trigram_surprisal(spark, sf_smoke).collect()
    assert rows, "no test-split documents with trigrams"
    for r in rows:
        assert r.n_trigrams >= 1
        assert 1 <= r.max_kn3_bits <= 63
        assert 0.0 <= r.oov_ctx_rate <= 1.0
        assert r.mean_kn3_bits <= r.max_kn3_bits


def test_nation_lorenz_shares_are_coherent(spark, sf_smoke):
    rows = PL9.nation_revenue_lorenz(spark, sf_smoke).collect()
    assert rows
    by_nation: dict[str, list] = {}
    for r in rows:
        by_nation.setdefault(r.nation, []).append(r)
    for nation, rs in by_nation.items():
        rs.sort(key=lambda r: r.quintile)
        # cumulative share is nondecreasing and ends at ~1
        cums = [r.cum_share for r in rs]
        assert cums == sorted(cums), nation
        assert abs(cums[-1] - 1.0) < 1e-5, nation
        # per-quintile shares sum to ~1
        assert abs(sum(r.revenue_share for r in rs) - 1.0) < 1e-4, nation


def test_contaminated_spans_between_matches_brute_force(spark):
    from df_to_azure_spark.functions import dedup as D

    train = {
        1: "the quick brown fox jumps over the lazy dog tonight",
        2: "completely different training content goes here now",
    }
    test = {
        10: "prefix words the quick brown fox jumps over the lazy dog "
            "tonight suffix words",
        11: "nothing from training appears in this document at all",
    }
    k, min_span = 4, 6
    tr = spark.createDataFrame(
        list(train.items()), "doc_id bigint, text string"
    )
    te = spark.createDataFrame(
        list(test.items()), "doc_id bigint, text string"
    )
    got = {
        (r.doc_id, r.start_pos, r.span_tokens)
        for r in D.contaminated_spans_between(
            te, tr, shingle_n=k, min_span_tokens=min_span
        ).collect()
    }
    # brute force: mark test positions whose k-gram occurs in train
    grams = set()
    for t in train.values():
        ts = t.split()
        for i in range(len(ts) - k + 1):
            grams.add(tuple(ts[i : i + k]))
    want = set()
    for d, t in test.items():
        ts = t.split()
        marked = [
            i + 1
            for i in range(len(ts) - k + 1)
            if tuple(ts[i : i + k]) in grams
        ]
        run, prev = None, None
        for p in marked + [None]:
            if run is None:
                run = p
            elif p is None or p != prev + 1:
                span = prev - run + k
                if span >= min_span:
                    want.add((d, run, span))
                run = p
            prev = p
    assert got == want
    assert any(d == 10 for d, _, _ in got)
    assert not any(d == 11 for d, _, _ in got)


def test_spearman_matches_brute_force(spark, sf_smoke):
    import duckdb

    rows = PL9.discount_quantity_spearman(spark, sf_smoke).collect()
    assert len(rows) == 1
    got = rows[0]
    pdf = duckdb.sql(
        f"SELECT l_discount, l_quantity FROM '{sf_smoke}/lineitem.parquet'"
    ).df()

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + 1 + j + 1) / 2.0
            for t in range(i, j + 1):
                ranks[order[t]] = r
            i = j + 1
        return ranks

    rx = avg_ranks(list(pdf["l_discount"]))
    ry = avg_ranks(list(pdf["l_quantity"]))
    n = len(rx)
    mx = sum(rx) / n
    my = sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    ) ** 0.5
    assert got.n_rows == n
    assert abs(got.spearman_rho - num / den) < 1e-6


def test_kendall_matches_brute_force(spark, sf_smoke):
    import duckdb

    rows = PL9.discount_quantity_kendall(spark, sf_smoke).collect()
    assert len(rows) == 1
    got = rows[0]
    pdf = duckdb.sql(
        f"SELECT l_discount, l_quantity FROM '{sf_smoke}/lineitem.parquet'"
    ).df()
    xs = list(pdf["l_discount"])
    ys = list(pdf["l_quantity"])
    n = len(xs)
    # O(n^2) literal pair count on the smoke slice
    C = D_ = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = (xs[i] > xs[j]) - (xs[i] < xs[j])
            dy = (ys[i] > ys[j]) - (ys[i] < ys[j])
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx != 0 and dy != 0:
                if dx == dy:
                    C += 1
                else:
                    D_ += 1
    n0 = n * (n - 1) // 2
    want = (C - D_) / ((n0 - tx) * (n0 - ty)) ** 0.5
    assert got.n_rows == n
    assert got.n_concordant == C and got.n_discordant == D_
    assert abs(got.kendall_tau_b - want) < 1e-6


def test_pav_isotonic_helper_pools_violations(spark):
    from df_to_azure_spark.functions.calibration import pav_isotonic

    # bins 2 and 3 violate monotonicity (0.8 then 0.2): PAV pools them
    # to their weighted average (8+2)/(10+10) = 0.5
    bins = spark.createDataFrame(
        [(1, 10, 1), (2, 10, 8), (3, 10, 2), (4, 10, 9)],
        "bin int, n bigint, n_pos bigint",
    )
    out = {
        r.bin: r.iso_rate
        for r in pav_isotonic(bins, "bin", "n", "n_pos").collect()
    }
    assert out == {1: 0.1, 2: 0.5, 3: 0.5, 4: 0.9}


def test_quality_isotonic_monotone_and_mass_preserving(spark, sf_smoke):
    rows = sorted(
        PL9.quality_isotonic_recalibration(spark, sf_smoke).collect(),
        key=lambda r: r.decile,
    )
    assert len(rows) == 10
    iso = [r.iso_keep_rate for r in rows]
    assert iso == sorted(iso)
    # PAV preserves the weighted mean (up to rounding)
    tot = sum(r.n for r in rows)
    raw = sum(r.keep_rate * r.n for r in rows) / tot
    fit = sum(r.iso_keep_rate * r.n for r in rows) / tot
    assert abs(raw - fit) < 1e-4
