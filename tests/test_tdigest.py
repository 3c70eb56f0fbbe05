"""t-digest sketch: accuracy, mergeability, and size bounds."""

import numpy as np

from makinage_spark import tdigest


def test_compress_bounds_size_and_preserves_mass():
    rng = np.random.default_rng(42)
    small = rng.normal(100, 15, size=5_000)
    big = rng.normal(100, 15, size=50_000)
    ms, ws = tdigest.compress(small, np.ones_like(small), delta=100)
    mb, wb = tdigest.compress(big, np.ones_like(big), delta=100)
    # O(delta) clusters, independent of n (10× the data, ~same digest size)
    assert len(mb) < 6 * 100
    assert len(mb) < 1.3 * len(ms) + 50
    assert abs(wb.sum() - 50_000) < 1e-6  # no mass lost
    assert np.all(np.diff(mb) >= 0)  # sorted centroids


def test_quantile_accuracy_single_digest():
    rng = np.random.default_rng(7)
    vals = rng.lognormal(3, 1, size=100_000)
    m, w = tdigest.compress(vals, np.ones_like(vals), delta=200)
    exact = np.quantile(vals, [0.01, 0.25, 0.5, 0.9, 0.99])
    est = [tdigest.digest_quantile(m, w, q) for q in [0.01, 0.25, 0.5, 0.9, 0.99]]
    for q, e, g in zip([0.01, 0.25, 0.5, 0.9, 0.99], exact, est):
        # rank error: where does the estimate fall in the true distribution?
        rank = (vals <= g).mean()
        assert abs(rank - q) < 0.01, (q, e, g, rank)


def test_merge_matches_whole(spark):
    """Digest-of-merged-partials ≈ digest-of-everything (the distributive
    aggregation contract that makes the sketch shuffle-safe)."""
    rng = np.random.default_rng(1)
    vals = rng.normal(0, 1, size=40_000)
    parts = np.array_split(vals, 7)
    partials = [tdigest.compress(p, np.ones_like(p), 100) for p in parts]
    m = np.concatenate([p[0] for p in partials])
    w = np.concatenate([p[1] for p in partials])
    mm, mw = tdigest.compress(m, w, 100)
    for q in [0.05, 0.5, 0.95]:
        merged_est = tdigest.digest_quantile(mm, mw, q)
        rank = (vals <= merged_est).mean()
        assert abs(rank - q) < 0.015


def test_digest_quantiles_df_end_to_end(spark):
    rng = np.random.default_rng(3)
    rows = [
        (("a" if i % 2 else "b"), float(v))
        for i, v in enumerate(rng.normal(50, 10, size=20_000))
    ]
    df = spark.createDataFrame(rows, "k string, v double").repartition(4)
    out = tdigest.digest_quantiles_df(df, "v", ["k"], qs=[0.5, 0.9])
    got = {r.k: (r.q_50, r.q_90) for r in out.collect()}
    assert set(got) == {"a", "b"}
    for k in got:
        assert abs(got[k][0] - 50) < 1.0  # median of N(50,10)
        assert abs(got[k][1] - (50 + 1.2816 * 10)) < 1.5  # p90
