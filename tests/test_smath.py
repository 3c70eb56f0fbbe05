import pytest
from pyspark.sql import functions as F

from makinage_spark import pipe, smath


def test_mean_reduce_golden(spark):
    # README.rst:66 shape: rs.math.mean(reduce=True) → single terminal value
    df = spark.createDataFrame([(float(i),) for i in range(1, 5)], "x double")
    assert pipe(df, smath.mean("x")).collect()[0]["mean"] == 2.5


def test_running_mean(spark):
    df = spark.createDataFrame([(1, 2.0), (2, 4.0)], "i long, x double")
    out = pipe(df, smath.mean("x", reduce=False, order_by=["i"]))
    assert [r.mean for r in out.orderBy("i").collect()] == [2.0, 3.0]


def test_grouped_aggregates(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 3.0), ("b", 5.0)], "k string, x double")
    out = pipe(df, smath.stddev("x", by=["k"]))
    got = {r.k: r.stddev for r in out.collect()}
    assert got["a"] == pytest.approx(2 ** 0.5)
    assert got["b"] is None  # single sample → null sample stddev


def test_quantiles_exact(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    out = pipe(df, smath.quantiles("x", [0.5], exact=True)).collect()[0]["quantiles"]
    assert out[0] == pytest.approx(50.5)


def test_quantiles_sketch(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    out = pipe(df, smath.quantiles("x", [0.5])).collect()[0]["quantiles"]
    assert abs(out[0] - 50.5) <= 1.0


def test_histogram(spark):
    df = spark.createDataFrame([(1.0,), (5.0,), (15.0,)], "x double")
    out = pipe(df, smath.histogram("x", 10.0))
    got = sorted((r.bucket, r.n) for r in out.collect())
    assert got == [(0, 2), (1, 1)]


def test_ewma_matches_pandas(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from makinage_spark import pipe, smath

    vals = [10.0, 20.0, 5.0, 40.0, 15.0]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "k long, i long, value double"
    )
    out = pipe(
        df, smath.ewma("value", 0.3, by=["k"], order_by=[F.col("i")])
    )
    got = {r.i: r.ewma for r in out.collect()}
    want = pd.Series(vals).ewm(alpha=0.3, adjust=False).mean()
    for i in range(len(vals)):
        assert abs(got[i] - want.iloc[i]) < 1e-12
