"""Config watch / redirect: the A8 config-source surface
(reference: makinage/config.py:57-105, config.sample.redirect.yaml:1-4).

The reference reads a YAML config file; if it contains a ``redirect`` block
(``connector: consul, endpoint, key``) the real config lives in a KV store
and every change to the key emits a fresh parsed config into the config
stream, which operators consume ``with_latest_from``. Here the same
lifecycle maps to Spark's control-refresh pattern:

- :class:`FileKV` — a directory of key files (version = mtime+size), the
  broker-less KV twin used by tests and local deployments.
- :class:`ConsulKV` — the real Consul HTTP API via stdlib urllib (GET
  ``/v1/kv/<key>?raw`` + ``X-Consul-Index`` as the version). No Consul
  server exists in the test environment, so this class is exercised only
  through the shared :class:`ConfigWatcher` contract; the polling/version
  logic it shares with FileKV IS tested.
- :func:`resolve_config` — the reference's ``identity_or_redirect``: plain
  configs pass through; redirected configs resolve against the KV.
- :class:`ConfigWatcher` — version-cached ``latest()``; plug it into
  ``streaming.runtime.for_each_batch_with_latest`` as the control loader
  and every micro-batch sees the newest config (the reference's
  per-record ``with_latest_from`` relaxed to per-batch, SURVEY §7.3).
"""

from __future__ import annotations

import os
from typing import Any, Callable

import yaml


class FileKV:
    """KV over a directory: one file per key; version = (mtime_ns, size)."""

    def __init__(self, root: str):
        self.root = root

    def get(self, key: str) -> tuple[bytes | None, Any]:
        path = os.path.join(self.root, key)
        try:
            st = os.stat(path)
            with open(path, "rb") as f:
                return f.read(), (st.st_mtime_ns, st.st_size)
        except FileNotFoundError:
            return None, None

    def put(self, key: str, value: bytes) -> None:  # test/deploy helper
        os.makedirs(self.root, exist_ok=True)
        path = os.path.join(self.root, key)
        with open(path, "wb") as f:
            f.write(value)


class ConsulKV:
    """Consul KV over the HTTP API (stdlib only; reference endpoint shape
    config.sample.redirect.yaml). ``get`` returns the raw value and the
    ``X-Consul-Index`` modify index as the version — the same signal the
    reference's watch_key long-poll uses (makinage/config.py:57-64).

    ``get(key, index=N)`` issues a Consul *blocking query*
    (``?index=N&wait=...``): the server holds the request open until the
    key's modify index exceeds N or the wait elapses — the long-poll
    primitive under ``watch_key``. Exercised end-to-end against a live
    stdlib ``http.server`` stub in tests/test_config_watch.py."""

    def __init__(self, endpoint: str, wait: str = "10s", timeout: float = 30.0):
        self.endpoint = endpoint.rstrip("/")
        self.wait = wait
        self.timeout = float(timeout)

    def get(
        self, key: str, index: int | None = None
    ) -> tuple[bytes | None, Any]:
        import urllib.error
        import urllib.request

        url = f"{self.endpoint}/v1/kv/{key}?raw"
        if index is not None:
            url += f"&index={int(index)}&wait={self.wait}"
        try:
            with urllib.request.urlopen(url, timeout=self.timeout) as resp:
                idx = resp.headers.get("X-Consul-Index")
                return resp.read(), int(idx) if idx is not None else None
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None, None
            raise

    def watch_key(self, key: str):
        """Long-poll watch: yield ``(raw_value, index)`` on every change of
        the key — the reference's ``kv_adapter.api.watch_key`` observable
        (makinage/config.py:57-64) as a generator. The first yield is the
        current value; each subsequent ``next()`` blocks in a Consul
        blocking query until the modify index advances."""
        raw, idx = self.get(key)
        if raw is not None:
            yield raw, idx
        while True:
            nraw, nidx = self.get(key, index=idx or 0)
            if nraw is None:
                continue
            if nidx != idx:
                idx = nidx
                yield nraw, nidx


CONNECTORS: dict[str, Callable[[str], Any]] = {
    "file": FileKV,
    "consul": ConsulKV,
}


class ConfigWatcher:
    """Version-cached config poller: ``latest()`` re-reads and re-parses the
    key only when the KV version changed — the per-micro-batch control
    loader for ``for_each_batch_with_latest``."""

    def __init__(self, kv, key: str):
        self.kv, self.key = kv, key
        self._version: Any = object()  # sentinel ≠ any real version
        self._config: dict | None = None

    def latest(self) -> dict:
        raw, version = self.kv.get(self.key)
        if raw is None:
            raise FileNotFoundError(f"config key {self.key!r} not found")
        if version != self._version:
            self._config = yaml.safe_load(raw)
            self._version = version
        return self._config


def resolve_config(
    config: dict | str,
) -> tuple[dict, ConfigWatcher | None]:
    """The reference's ``identity_or_redirect`` (makinage/config.py:66-83):
    a YAML path or dict passes through unchanged unless it carries a
    ``redirect`` block, in which case the true config is read from the
    named KV connector and a :class:`ConfigWatcher` is returned so callers
    can hot-follow changes."""
    if isinstance(config, str):
        with open(config) as f:
            config = yaml.safe_load(f)
    redirect = config.get("redirect")
    if not redirect:
        return config, None
    connector = redirect.get("connector")
    if connector not in CONNECTORS:
        raise ValueError(f"unknown redirect connector {connector!r}")
    kv = CONNECTORS[connector](redirect["endpoint"])
    watcher = ConfigWatcher(kv, redirect["key"])
    return watcher.latest(), watcher
