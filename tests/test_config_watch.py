"""A8 config watch / redirect lifecycle (reference makinage/config.py:57-105,
config.sample.redirect.yaml): file config → redirect → KV watch → hot
per-micro-batch application through the control-refresh runtime."""

from __future__ import annotations

import os

import yaml

from makinage_spark.plans.config_watch import (
    ConfigWatcher,
    ConsulKV,
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


# ---------------------------------------------------------------------------
# Live-HTTP ConsulKV: a stdlib http.server stub implementing the subset of
# the Consul KV API the client uses — GET /v1/kv/<key>?raw with
# X-Consul-Index, 404 for missing keys, and index/wait blocking queries —
# so the REAL urllib client + long-poll versioning executes end-to-end
# (reference watch_key contract, makinage/config.py:57-64).
# ---------------------------------------------------------------------------

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest


class _ConsulStubState:
    def __init__(self):
        self.store: dict[str, tuple[bytes, int]] = {}
        self.index = 0
        self.cv = threading.Condition()

    def put(self, key: str, value: bytes) -> None:
        with self.cv:
            self.index += 1
            self.store[key] = (value, self.index)
            self.cv.notify_all()


def _make_handler(state: _ConsulStubState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def do_GET(self):
            parsed = urlparse(self.path)
            if not parsed.path.startswith("/v1/kv/"):
                self.send_error(404)
                return
            key = parsed.path[len("/v1/kv/"):]
            qs = parse_qs(parsed.query)
            with state.cv:
                if "index" in qs:
                    # blocking query: hold until modify index > requested,
                    # or the (test-short) wait elapses
                    want = int(qs["index"][0])
                    wait_s = 2.0
                    if "wait" in qs:
                        w = qs["wait"][0]
                        wait_s = min(
                            2.0,
                            float(w[:-2]) / 1000 if w.endswith("ms")
                            else float(w[:-1]),
                        )
                    deadline = time.time() + wait_s
                    while (
                        (key not in state.store
                         or state.store[key][1] <= want)
                        and time.time() < deadline
                    ):
                        state.cv.wait(max(0.01, deadline - time.time()))
                if key not in state.store:
                    self.send_error(404)
                    return
                value, idx = state.store[key]
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(value)))
            self.send_header("X-Consul-Index", str(idx))
            self.end_headers()
            self.wfile.write(value)

    return Handler


@pytest.fixture()
def consul_stub():
    state = _ConsulStubState()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    endpoint = f"http://127.0.0.1:{server.server_address[1]}"
    yield endpoint, state
    server.shutdown()
    server.server_close()


def test_consul_get_value_index_and_404(consul_stub):
    endpoint, state = consul_stub
    kv = ConsulKV(endpoint)
    assert kv.get("missing") == (None, None)
    state.put("svc", b"config:\n  multiply: 3\n")
    raw, idx = kv.get("svc")
    assert yaml.safe_load(raw) == {"config": {"multiply": 3}}
    assert idx == 1
    state.put("svc", b"config:\n  multiply: 5\n")
    raw2, idx2 = kv.get("svc")
    assert yaml.safe_load(raw2)["config"]["multiply"] == 5
    assert idx2 > idx


def test_consul_blocking_query_unblocks_on_change(consul_stub):
    endpoint, state = consul_stub
    kv = ConsulKV(endpoint, wait="2s")
    state.put("svc", b"a: 1\n")
    _, idx = kv.get("svc")
    # a writer lands mid-poll: the blocking query must return the NEW value
    threading.Timer(0.2, state.put, args=("svc", b"a: 2\n")).start()
    t0 = time.time()
    raw, nidx = kv.get("svc", index=idx)
    assert yaml.safe_load(raw) == {"a": 2}
    assert nidx > idx
    assert time.time() - t0 < 1.5  # unblocked by the change, not the wait


def test_consul_watch_key_emits_on_each_change(consul_stub):
    endpoint, state = consul_stub
    kv = ConsulKV(endpoint, wait="2s")
    state.put("svc", b"v: 1\n")
    w = kv.watch_key("svc")
    raw, idx1 = next(w)
    assert yaml.safe_load(raw) == {"v": 1}
    threading.Timer(0.1, state.put, args=("svc", b"v: 2\n")).start()
    raw, idx2 = next(w)
    assert yaml.safe_load(raw) == {"v": 2}
    assert idx2 > idx1


def test_consul_redirect_resolves_and_hot_swaps(consul_stub, spark, tmp_path):
    """Mid-stream config change golden over the LIVE HTTP client: the
    redirect resolves via ConsulKV, and a KV write between micro-batches
    hot-swaps the operator factor (same lifecycle the FileKV twin proves,
    now through real urllib + X-Consul-Index versioning)."""
    from makinage_spark.streaming.runtime import for_each_batch_with_latest

    endpoint, state = consul_stub
    state.put("app", yaml.safe_dump({"config": {"multiply": 3}}).encode())
    cfg, watcher = resolve_config(
        {"redirect": {"connector": "consul", "endpoint": endpoint,
                      "key": "app"}}
    )
    assert cfg == {"config": {"multiply": 3}}
    assert isinstance(watcher.kv, ConsulKV)
    # version-cached: same index -> same parsed object
    assert watcher.latest() is watcher.latest()

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
    assert outs == [(5, 15)]

    state.put("app", yaml.safe_dump({"config": {"multiply": 7}}).encode())
    spark.createDataFrame([(6,)], "value long").coalesce(1).write.mode(
        "append"
    ).parquet(d)
    run_once()
    assert outs == [(5, 15), (6, 42)]
