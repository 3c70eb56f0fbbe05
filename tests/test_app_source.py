"""Python Data Source app connector (A5): partitioned batch reads and
exactly-once streaming over a user module:function generator."""

import time
import uuid


def _register(spark):
    from makinage_spark.sources.app_source import AppSource

    try:
        spark.dataSource.register(AppSource)
    except Exception:
        pass  # already registered in this session


def test_app_source_batch_partitioned(spark):
    _register(spark)
    df = (
        spark.read.format("makinage_app_source")
        .option("generator", "makinage_spark.sample.processor:gen_range")
        .option("n", "1000")
        .option("partitions", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = df.orderBy("id").collect()
    assert len(rows) == 1000
    assert (rows[0].id, rows[0].value) == (0, "0")
    assert (rows[999].id, rows[999].value) == (999, str(999 * 7))


def test_app_source_streaming_drains_to_limit(spark):
    _register(spark)
    stream = (
        spark.readStream.format("makinage_app_source")
        .option("generator", "makinage_spark.sample.processor:gen_range")
        .option("rows_per_batch", "40")
        .option("n", "100")
        .load()
    )
    name = f"appsrc_{uuid.uuid4().hex[:6]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", f"/tmp/mk_appsrc_{uuid.uuid4().hex[:6]}")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table(name).count() >= 100:
                break
            time.sleep(0.5)
        got = sorted(r.id for r in spark.table(name).collect())
        assert got == list(range(100))  # finite source drains exactly once
    finally:
        q.stop()


def test_yaml_graph_with_app_topic(spark):
    """End-to-end: YAML graph whose source topic is a user generator (A5) —
    generator → multiply factory → parquet sink."""
    import shutil

    from makinage_spark.plans import run_graph

    outdir = f"/tmp/mk_appgraph_{uuid.uuid4().hex[:8]}"
    config = {
        "application": {"name": "appgraph", "source_type": "batch"},
        "topics": [
            {
                "name": "values",
                "format": "app",
                "schema": "id bigint, value string",
                "options": {
                    "generator": "makinage_spark.sample.processor:gen_range",
                    "n": 100,
                    "partitions": 4,
                },
            },
            {"name": "multiplied_values", "format": "parquet", "path": outdir},
        ],
        "operators": {
            "multiply": {
                "factory": "makinage_spark.sample.processor:multiply",
                "config": {"multiply": 3},
                "sources": ["values"],
                "sinks": ["multiplied_values"],
            }
        },
    }
    run_graph(spark, config)
    out = spark.read.parquet(outdir)
    got = {r.id: r.value for r in out.collect()}
    assert len(got) == 100
    assert got[5] == str(5 * 7 * 3)  # gen emits i*7, operator multiplies by 3
    shutil.rmtree(outdir)
