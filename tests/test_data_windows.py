"""Window goldens: the README roll golden plus sliding/session/time windows."""

import datetime as dt

from pyspark.sql import functions as F

from makinage_spark import data, pipe


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_roll_tumbling_readme_golden(spark):
    # README.rst:77-90: [1..7], roll(window=3, stride=3) + mean → [2.0, 5.0];
    # trailing partial window [7] is dropped.
    df = spark.createDataFrame([(i,) for i in range(1, 8)], "x long")
    out = pipe(df, data.roll(3, 3, aggs={"mean": F.avg("x")}, order_by=["x"]))
    assert sorted(r.mean for r in out.collect()) == [2.0, 5.0]


def test_roll_sliding(spark):
    # window=3, stride=1 over [1..5] → windows [1,2,3],[2,3,4],[3,4,5]
    df = spark.createDataFrame([(i,) for i in range(1, 6)], "x long")
    out = pipe(df, data.roll(3, 1, aggs={"mean": F.avg("x")}, order_by=["x"]))
    assert sorted(r.mean for r in out.collect()) == [2.0, 3.0, 4.0]


def test_roll_per_key(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", 10), ("b", 20)],
        "k string, x long",
    )
    out = pipe(df, data.roll(2, 2, aggs={"s": F.sum("x")}, order_by=["x"], by=["k"]))
    got = sorted((r.k, r.s) for r in out.collect())
    assert got == [("a", 3), ("a", 7), ("b", 30)]


def test_time_window_tumbling(spark):
    df = spark.createDataFrame(
        [(ts(1, 10), 1.0), (ts(1, 50), 2.0), (ts(2, 10), 4.0)], "t timestamp, v double"
    )
    out = pipe(df, data.time_window("t", "1 hour", aggs={"s": F.sum("v")}))
    got = sorted((r.window_start.hour, r.s) for r in out.collect())
    assert got == [(1, 3.0), (2, 4.0)]


def test_time_window_sliding(spark):
    df = spark.createDataFrame([(ts(1, 30), 1.0)], "t timestamp, v double")
    out = pipe(df, data.time_window("t", "1 hour", slide="30 minutes", aggs={"s": F.sum("v")}))
    # a record belongs to 2 overlapping 1h/30m windows
    assert out.count() == 2


def test_split_sessionize(spark):
    df = spark.createDataFrame(
        [(1, ts(1, 0)), (1, ts(1, 10)), (1, ts(3, 0)), (2, ts(1, 0))],
        "user long, t timestamp",
    )
    out = pipe(df, data.split("t", "30 minutes", by=["user"]))
    got = sorted((r.user, r.n) for r in out.collect())
    assert got == [(1, 1), (1, 2), (2, 1)]


def test_session_window_native(spark):
    df = spark.createDataFrame(
        [(1, ts(1, 0)), (1, ts(1, 10)), (1, ts(3, 0))], "user long, t timestamp"
    )
    out = pipe(df, data.session_window("t", "30 minutes", by=["user"]))
    assert sorted(r.n for r in out.collect()) == [1, 2]


def test_zorder_key_known_vectors(spark):
    from makinage_spark import data
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(10, 6), (0, 0), (255, 255)], ["x", "y"])
    out = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", data.zorder_key([F.col("x"), F.col("y")]).alias("z")
        ).collect()
    }
    # x=0b1010, y=0b0110: x-bits land at even positions, y-bits at odd
    assert out[(10, 6)] == 0b01101100  # 108
    assert out[(0, 0)] == 0
    assert out[(255, 255)] == (1 << 16) - 1


def test_zorder_buckets_are_tight_rectangles(spark):
    from makinage_spark import data
    from pyspark.sql import functions as F

    pts = spark.range(4096).select(
        (F.col("id") % 251).alias("x"), ((F.col("id") * 17) % 256).alias("y")
    )
    keyed = pts.select(
        "x", "y", data.zorder_key([F.col("x"), F.col("y")]).alias("z")
    )
    # top-8-bits bucket => exact 16x16 tile: span <= 15 in BOTH dims
    spans = (
        keyed.groupBy(F.floor(F.col("z") / 256).alias("b"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .agg(F.max("sx").alias("mx"), F.max("sy").alias("my"))
        .first()
    )
    assert spans.mx <= 15 and spans.my <= 15
