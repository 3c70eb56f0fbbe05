"""Golden tests for the rs.ops-equivalent surface, mirroring the reference's
list-in/list-out style (SURVEY §5)."""

import pytest
from pyspark.sql import functions as F

from makinage_spark import ops, pipe


def rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_map_multiply_golden(spark):
    # config.sample.yml + makinage/sample/processor.py:6-14: "5" ×3 → "15"
    df = spark.createDataFrame([("5",), ("7",)], "value string")
    out = pipe(df, ops.map(value=(F.col("value").cast("long") * 3).cast("string")))
    assert rows(out, "value") == [("15",), ("21",)]


def test_map_pandas_escape_hatch(spark):
    df = spark.createDataFrame([(1,), (2,)], "x long")

    def double(batches):
        for pdf in batches:
            pdf["y"] = pdf["x"] * 2
            yield pdf[["x", "y"]]

    out = pipe(df, ops.map(_fn=double, _schema="x long, y long"))
    assert rows(out, "x", "y") == [(1, 2), (2, 4)]


def test_filter(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "x long")
    assert rows(pipe(df, ops.filter(F.col("x") > 1)), "x") == [(2,), (3,)]
    assert rows(pipe(df, ops.filter("x % 2 = 1")), "x") == [(1,), (3,)]


def test_flat_map_explode(spark):
    df = spark.createDataFrame([("a b",), ("c",)], "text string")
    out = pipe(df, ops.flat_map(F.split("text", " "), alias="word"))
    assert rows(out, "word") == [("a",), ("b",), ("c",)]


def test_scan_running(spark):
    df = spark.createDataFrame([(1, 10.0), (1, 20.0), (2, 5.0)], "k long, v double")
    out = pipe(df, ops.scan(by=["k"], order_by=["v"], total=F.sum("v"), n=F.count("*")))
    assert rows(out, "k", "total", "n") == [(1, 10.0, 1), (1, 30.0, 2), (2, 5.0, 1)]


def test_distinct(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k long, v string")
    assert len(pipe(df, ops.distinct("k")).collect()) == 2


def test_take_skip_first_last(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 6)], "x long")
    assert rows(pipe(df, ops.take(2, order_by=["x"])), "x") == [(1,), (2,)]
    assert rows(pipe(df, ops.skip(3, order_by=["x"])), "x") == [(4,), (5,)]
    assert rows(pipe(df, ops.first(order_by=["x"])), "x") == [(1,)]
    assert rows(pipe(df, ops.last(order_by=["x"])), "x") == [(5,)]


def test_take_per_key(spark):
    df = spark.createDataFrame([(1, 3), (1, 1), (2, 9), (2, 4)], "k long, v long")
    out = pipe(df, ops.take(1, order_by=[F.col("v").desc()], by=["k"]))
    assert rows(out, "k", "v") == [(1, 3), (2, 9)]


def test_group_by_aggs(spark):
    df = spark.createDataFrame([(1, 2.0), (1, 4.0), (2, 6.0)], "k long, v double")
    out = pipe(df, ops.group_by(["k"], aggs={"s": F.sum("v"), "m": F.avg("v")}))
    assert rows(out, "k", "s", "m") == [(1, 6.0, 3.0), (2, 6.0, 6.0)]


def test_group_by_apply(spark):
    df = spark.createDataFrame([(1, 2.0), (1, 4.0), (2, 6.0)], "k long, v double")

    def center(pdf):
        pdf["v"] = pdf["v"] - pdf["v"].mean()
        return pdf

    out = pipe(df, ops.group_by(["k"], apply_fn=center, apply_schema="k long, v double"))
    assert rows(out, "k", "v") == [(1, -1.0), (1, 1.0), (2, 0.0)]


def test_tee_map(spark):
    df = spark.createDataFrame([(2.0,)], "x double")
    out = pipe(df, ops.tee_map(double="x * 2", square="x * x"))
    assert rows(out, "double", "square") == [(4.0, 4.0)]


def test_multiplex(spark):
    df = spark.createDataFrame([(1,), (2,)], "x long")
    out = pipe(df, ops.multiplex(F.when(F.col("x") % 2 == 0, "even").otherwise("odd")))
    assert rows(out, "x", "stream") == [(1, "odd"), (2, "even")]


def test_with_latest_from_control(spark):
    # makinage/serve/serve.py:128-137 — enrich data with the single latest
    # control value (no event time → terminal value join).
    data = spark.createDataFrame([(1,), (2,)], "x long")
    control = spark.createDataFrame([(3,)], "multiply long")
    out = pipe(data, ops.with_latest_from(control))
    assert rows(out, "x", "multiply") == [(1, 3), (2, 3)]


def test_assert_passes_and_fails(spark):
    df = spark.createDataFrame([(1,), (2,)], "x long")
    assert pipe(df, ops.assert_(F.col("x") > 0)).count() == 2
    with pytest.raises(AssertionError):
        pipe(df, ops.assert_(F.col("x") > 1)).count()


def test_python_udtf_surface(spark):
    """Official Python UDTF surface (SURVEY §2.3: flat_map-with-user-fn = the
    UDTF shape): lateral 1→N expansion per input row."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="word: string, pos: int")
    class Splitter:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split()):
                yield w, i

    spark.udtf.register("split_words", Splitter)
    out = spark.sql(
        "SELECT t.word, t.pos FROM (SELECT 'a bb ccc' AS s), "
        "LATERAL split_words(s) t"
    ).collect()
    assert [(r.word, r.pos) for r in out] == [("a", 0), ("bb", 1), ("ccc", 2)]


def test_distinct_until_changed_transitions(spark):
    """Consecutive dupes drop; first record and null transitions survive."""
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, None), (1, 5, None), (1, 6, "b"), (2, 1, "a")],
        "k long, seq long, v string",
    )
    out = pipe(df, ops.distinct_until_changed("k", "seq", "v"))
    assert rows(out, "k", "seq", "v") == [
        (1, 1, "a"),
        (1, 3, "b"),
        (1, 4, None),
        (1, 6, "b"),
        (2, 1, "a"),
    ]


def test_pairwise_prev_value(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 13.0), (2, 1, 5.0)], "k long, seq long, v double"
    )
    out = pipe(df, ops.pairwise("k", "seq", "v"))
    assert rows(out, "k", "seq", "prev_v") == [(1, 1, None), (1, 2, 10.0), (2, 1, None)]


def test_observe_metrics_surface(spark):
    """df.observe: pipeline-embedded metrics (the engine-side replacement for
    the reference's feedback/queue-depth instrumentation, SURVEY A18/A20) —
    counters ride the job, no second pass over the data."""
    from pyspark.sql import Observation

    obs = Observation("quality")
    df = spark.createDataFrame([(1.0,), (2.0,), (None,)], "v double")
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"), F.count("v").alias("nonnull"))
    assert observed.filter(F.col("v").isNotNull()).count() == 2
    assert obs.get == {"n": 3, "nonnull": 2}


def test_materialize_dematerialize_error_channel(spark):
    from pyspark.sql import functions as F

    from makinage_spark import ops, pipe

    df = spark.createDataFrame(
        [(1, "10"), (2, "x"), (3, "30")], "id long, s string"
    )
    tagged = pipe(
        df,
        ops.materialize(
            F.expr("try_cast(s AS BIGINT)"), diagnostic=F.concat(F.lit("bad:"), "s")
        ),
    )
    got = {r.id: (r.kind, r.value, r.error) for r in tagged.collect()}
    assert got[1] == ("next", 10, None)
    assert got[2] == ("error", None, "bad:x")
    assert got[3] == ("next", 30, None)
    clean = pipe(tagged, ops.dematerialize())
    assert sorted(r.value for r in clean.collect()) == [10, 30]
    assert "kind" not in clean.columns and "error" not in clean.columns


def test_debounce_collapses_bursts(spark):
    from pyspark.sql import functions as F

    from makinage_spark import ops, pipe

    rows = [
        (1, "k", "2024-01-01 00:00:00"),
        (2, "k", "2024-01-01 00:00:05"),   # 1 and 2 both followed within 10min
        (3, "k", "2024-01-01 00:10:00"),   # burst ends here: 20min of quiet
        (4, "k", "2024-01-01 00:30:00"),   # quiet before and after -> kept
        (5, "x", "2024-01-01 00:00:00"),   # other key, last record -> kept
    ]
    df = spark.createDataFrame(rows, "id long, k string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = pipe(df, ops.debounce("k", F.col("ts"), "10 minutes",
                                order_by=[F.col("ts"), F.col("id")]))
    assert sorted(r.id for r in out.collect()) == [3, 4, 5]


# ---------------------------------------------------------------------------
# rxsci small-op parity (round 4): buffer_with_count / take_last /
# start_with / last_or_default
# ---------------------------------------------------------------------------


def test_buffer_with_count_tumbling(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 8)], "x long")
    out = pipe(df, ops.buffer_with_count(3, ["x"]))
    got = {r.buffer_id: (list(r.items), r.n_items) for r in out.collect()}
    assert got == {
        0: ([1, 2, 3], 3),
        1: ([4, 5, 6], 3),
        2: ([7], 1),  # rx semantics: the final partial buffer still emits
    }


def test_buffer_with_count_hopping_overlap(spark):
    # count=3, skip=2 over 1..6: buffers [1,2,3], [3,4,5], [5,6]
    df = spark.createDataFrame([(i,) for i in range(1, 7)], "x long")
    out = pipe(df, ops.buffer_with_count(3, ["x"], skip=2))
    got = {r.buffer_id: list(r.items) for r in out.collect()}
    assert got == {0: [1, 2, 3], 1: [3, 4, 5], 2: [5, 6]}


def test_buffer_with_count_per_key_structs(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0), ("b", 1, 9.0)],
        "k string, seq long, v double",
    )
    out = pipe(df, ops.buffer_with_count(2, ["seq"], by=["k"]))
    got = {
        (r.k, r.buffer_id): [(s.seq, s.v) for s in r.items]
        for r in out.collect()
    }
    assert got == {
        ("a", 0): [(1, 1.0), (2, 2.0)],
        ("a", 1): [(3, 3.0)],
        ("b", 0): [(1, 9.0)],
    }


def test_buffer_with_count_validates_args(spark):
    with pytest.raises(ValueError):
        ops.buffer_with_count(0, ["x"])
    with pytest.raises(ValueError):
        ops.buffer_with_count(3, ["x"], skip=0)


def test_take_last_global_and_per_key(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(5)] + [("b", 10)], "k string, x long"
    )
    out = pipe(df, ops.take_last(2, ["x"]))
    assert rows(out, "k", "x") == [("a", 4), ("b", 10)]
    per_key = pipe(df, ops.take_last(2, ["x"], by=["k"]))
    assert rows(per_key, "k", "x") == [("a", 3), ("a", 4), ("b", 10)]


def test_start_with_prepends_seed(spark):
    df = spark.createDataFrame([(2, "b")], "id long, s string")
    out = pipe(df, ops.start_with([(1, "a")], "id long, s string"))
    assert rows(out, "id", "s") == [(1, "a"), (2, "b")]


def test_last_or_default_nonempty(spark):
    df = spark.createDataFrame([(1, 5.0), (9, 7.0), (3, 1.0)], "id long, v double")
    out = pipe(df, ops.last_or_default(["id"], {"id": -1, "v": 0.0}))
    assert rows(out, "id", "v") == [(9, 7.0)]


def test_last_or_default_empty_emits_default(spark):
    df = spark.createDataFrame([], "id long, v double")
    out = pipe(df, ops.last_or_default(["id"], {"id": -1, "v": 0.0}))
    assert rows(out, "id", "v") == [(-1, 0.0)]


def test_last_or_default_missing_default_raises(spark):
    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    with pytest.raises(ValueError, match="missing defaults"):
        pipe(df, ops.last_or_default(["id"], {"id": -1}))


def test_do_action_observe_tap(spark):
    from pyspark.sql import Observation

    df = spark.createDataFrame([(i, i * 2) for i in range(10)], "id long, v long")
    obs = Observation("tap")
    out = pipe(
        df,
        ops.do_action(obs, F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")),
        ops.filter(F.col("id") < 5),
    )
    rows = out.collect()
    # tap observes the PRE-filter stream (it sits before the filter in the
    # pipe) and never perturbs the rows that flow through
    assert len(rows) == 5
    assert obs.get == {"n": 10, "sv": 90}


def test_ignore_elements_keeps_schema_drops_rows(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    out = pipe(df, ops.ignore_elements())
    assert out.count() == 0
    assert out.schema == df.schema


def test_self_cogroup_right_side_columns_canary(spark, tmp_path):
    """Pin for the cogroup attribute-dedup workaround (VERDICT r6 task 8,
    COVERAGE.md round-6k note): q_cogroup_click_purchase_lag builds its two
    sides from INDEPENDENT parquet scans because cogrouping two filtered
    branches of the SAME DataFrame was observed (round 6, Spark 4.1.2) to
    intermittently deliver the right pandas frame with a column missing at
    the Arrow boundary — the failure was scale-dependent and does not
    reproduce deterministically on this build (probed at sf0.001/0.01/0.1
    and with range() sources while writing this test).

    This canary runs the UNSAFE shared-scan shape and asserts (a) both
    pandas frames arrive with their full declared column set in every key
    group and (b) the shared-scan result equals the independent-scan
    workaround's result. If it ever fails, the round-6 bug is live on this
    build — keep the workaround and record the trigger here. If it passes
    for a full round after a Spark upgrade, the workaround in
    queries.py::q_cogroup_click_purchase_lag is a candidate for removal."""
    import pandas as pd
    import pyspark.sql.functions as F

    from makinage_spark.queries import QUERIES
    from makinage_spark.sources.files import load_table

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    expected_cols = "event_id,ts_us,user_id"

    def probe(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lcols": [",".join(sorted(l_pdf.columns))],
                "rcols": [",".join(sorted(r_pdf.columns))],
            }
        )

    shapes = {
        (r.lcols, r.rcols)
        for r in (
            clicks.groupBy("user_id")
            .cogroup(purch.groupBy("user_id"))
            .applyInPandas(probe, "lcols string, rcols string")
        ).collect()
    }
    assert shapes == {(expected_cols, expected_cols)}, (
        "round-6 attribute-dedup column drop REPRODUCED — keep the "
        f"independent-scan workaround; observed frames: {shapes}"
    )

    # the shipped workaround must keep producing pairs on the same fixture
    # (guards against the canary passing because the fixture went degenerate)
    safe = {
        (r.user_id, r.event_id): r.lag_s
        for r in QUERIES["cogroup_click_purchase_lag"](spark, sf_dir).collect()
    }
    assert safe, "fixture produced no click->purchase pairs at sf0.001"
