"""A8 config watch / redirect lifecycle (reference makinage/config.py:57-105,
config.sample.redirect.yaml): file config → redirect → KV watch → hot
per-micro-batch application through the control-refresh runtime."""

from __future__ import annotations

import os

import yaml

from makinage_spark.plans.config_watch import (
    ConfigWatcher,
    FileKV,
    resolve_config,
)


def test_identity_config_passes_through(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(yaml.safe_dump({"application": {"name": "x"}}))
    cfg, watcher = resolve_config(str(p))
    assert cfg == {"application": {"name": "x"}}
    assert watcher is None


def test_redirect_resolves_and_watches(tmp_path):
    kvdir = str(tmp_path / "kv")
    kv = FileKV(kvdir)
    kv.put("myservice", yaml.safe_dump({"config": {"multiply": 3}}).encode())
    redirect = {
        "redirect": {
            "connector": "file",
            "endpoint": kvdir,
            "key": "myservice",
        }
    }
    cfg, watcher = resolve_config(redirect)
    assert cfg == {"config": {"multiply": 3}}
    assert isinstance(watcher, ConfigWatcher)
    # unchanged version -> cached object, no re-parse
    first = watcher.latest()
    assert watcher.latest() is first
    # KV update -> next latest() sees the new config (the watch_key contract)
    kv.put("myservice", yaml.safe_dump({"config": {"multiply": 5}}).encode())
    os.utime(os.path.join(kvdir, "myservice"))
    assert watcher.latest()["config"]["multiply"] == 5


def test_hot_config_swap_per_micro_batch(spark, tmp_path):
    """End-to-end A8: the multiply sample's factor lives behind a KV
    redirect; each micro-batch re-reads the watcher, so an in-flight KV
    update changes the operator's behavior on the next batch — the
    reference's config stream + with_latest_from, per-batch."""
    from pyspark.sql import functions as F

    from makinage_spark.streaming.runtime import for_each_batch_with_latest

    kvdir = str(tmp_path / "kv")
    kv = FileKV(kvdir)
    kv.put("app", yaml.safe_dump({"config": {"multiply": 3}}).encode())
    _, watcher = resolve_config(
        {"redirect": {"connector": "file", "endpoint": kvdir, "key": "app"}}
    )

    d, ck = str(tmp_path / "in"), str(tmp_path / "ck")
    os.makedirs(d)
    outs: list[tuple[int, int]] = []

    def body(batch_df, cfg, _batch_id):
        factor = int(cfg["config"]["multiply"])
        for r in batch_df.collect():
            outs.append((int(r.value), int(r.value) * factor))

    def run_once():
        src = spark.readStream.schema("value long").parquet(d)
        q = for_each_batch_with_latest(
            src, watcher.latest, body, ck, trigger={"availableNow": True}
        )
        q.awaitTermination()

    spark.createDataFrame([(5,)], "value long").coalesce(1).write.mode(
        "append"
    ).parquet(d)
    run_once()
    assert outs == [(5, 15)]  # factor 3

    kv.put("app", yaml.safe_dump({"config": {"multiply": 7}}).encode())
    os.utime(os.path.join(kvdir, "app"))
    spark.createDataFrame([(6,)], "value long").coalesce(1).write.mode(
        "append"
    ).parquet(d)
    run_once()
    assert outs == [(5, 15), (6, 42)]  # factor hot-swapped to 7
