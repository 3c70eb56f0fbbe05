"""graphs.pagerank: fixed-point determinism and known-graph values."""

from makinage_spark import graphs


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = graphs.pagerank(df, **kw).collect()
    return {r.id: r.rank_nanos for r in out}


def test_symmetric_pair_splits_mass_evenly(spark):
    # two nodes, edges both ways: perfectly symmetric → each keeps 0.5
    r = _ranks(spark, [("a", "b"), ("b", "a")], iterations=5)
    assert r == {"a": 500_000_000, "b": 500_000_000}


def test_star_center_dominates(spark):
    # undirected 4-leaf star: center absorbs the leaves' full mass each round
    edges = []
    for leaf in "bcde":
        edges += [("a", leaf), (leaf, "a")]
    r = _ranks(spark, edges, iterations=3)
    assert r["a"] > r["b"]
    assert len({r[leaf] for leaf in "bcde"}) == 1  # leaves identical
    # total mass is conserved up to per-node half-up rounding (±1 nano each)
    assert abs(sum(r.values()) - 1_000_000_000) <= len(r)


def test_partitioning_invariance(spark):
    # fixed-point accounting ⇒ bitwise-same ranks under different partitioning
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(60)]
    df1 = spark.createDataFrame(edges, ["src", "dst"])
    df2 = df1.repartition(13, "dst")
    r1 = {r.id: r.rank_nanos for r in graphs.pagerank(df1).collect()}
    r2 = {r.id: r.rank_nanos for r in graphs.pagerank(df2).collect()}
    assert r1 == r2


def test_dangling_mass_dropped_not_redistributed(spark):
    # a -> b only: b never emits; after 1 iter a holds only teleport mass
    r = _ranks(spark, [("a", "b")], iterations=1)
    assert r["a"] == 75_000_000  # 0.15 * 1e9 / 2 (teleport only)
    assert r["b"] == 500_000_000  # 75e6 teleport + 0.85 * a's initial 5e8
