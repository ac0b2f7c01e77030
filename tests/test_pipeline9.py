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
