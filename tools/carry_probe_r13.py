#!/usr/bin/env python
"""r13 __pre-carry probe at adversarial set lengths (VERDICT r12 task 3 /
"What's wrong" #3): the emit-once PPJoin mines carry a triangular __pre
token array through the prefix-join exchange — ~|prefix|²/2 per doc for the
symmetric mine and ~|s|²/2 per doc on the containment INDEX side (the full
set explodes there). At |s| ~ 10³ the carry itself, not the candidate
stream, is the exchange payload. Measure where (and whether) the carry
crosses over the old global-distinct cost before touching the code.

Fixtures: LONG sets (|s| up to 1024) with FEW duplicates — every doc pays
the carry, almost none produce pairs — the exact opposite of the hot
fixtures (many dups, small sets) where emit-once wins. dup_frac controls a
small seeded duplicate group so the output is non-trivial and counts can be
asserted equal across arms.

Usage: PYTHONPATH=/root/repo python tools/carry_probe_r13.py [prefix containment]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import makinage_spark as mk  # noqa: E402
from makinage_spark import dedup  # noqa: E402
from emit_once_probe_r12 import (  # noqa: E402
    old_containment_pairs,
    old_prefix_filter_pairs,
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def few_dup_long_sets(spark, n_docs: int, setlen: int, n_dup: int = 8):
    """n_docs docs of setlen distinct items each; items are per-doc unique
    EXCEPT (a) a small shared vocabulary tail that creates join candidates
    without qualifying pairs and (b) n_dup seeded exact duplicates."""
    shared = 32  # per-doc tokens drawn from a shared pool -> join keys exist
    rows = []
    for i in range(n_docs):
        base = i if i >= n_dup * 2 else (i % n_dup)  # seeded duplicate group
        items = [f"u{base:05d}_{j:04d}" for j in range(setlen - shared)]
        items += [f"s{(base * 7 + j) % 199:03d}" for j in range(shared)]
        rows.append((f"d{i:06d}", items))
    return spark.createDataFrame(
        rows, "doc_id string, items array<string>"
    ).repartition(32)


def timed(spark, label, build, n_runs=2):
    best, count = None, None
    for _ in range(n_runs):
        spark.catalog.clearCache()
        t0 = time.time()
        count = build().count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({"probe": label, "sec": round(best, 2), "rows": count}),
          flush=True)
    return best, count


def main():
    which = set(sys.argv[1:]) or {"prefix", "containment"}
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = mk.get_spark(
        app_name="carry_probe_r13",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={"spark.ui.enabled": "false",
                     "spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    cases = [(256, 2048), (512, 1024), (1024, 512)]  # (setlen, n_docs)
    if "containment" in which:
        for setlen, n_docs in cases:
            df = few_dup_long_sets(spark, n_docs, setlen)
            df.persist().count()
            _, n_new = timed(
                spark, f"containment_fewdup_s{setlen}_n{n_docs}_emit_once",
                lambda: dedup.containment_pairs(df, "items", threshold=0.8))
            _, n_old = timed(
                spark, f"containment_fewdup_s{setlen}_n{n_docs}_distinct",
                lambda: old_containment_pairs(df, "items", threshold=0.8))
            assert n_new == n_old, (setlen, n_new, n_old)
            df.unpersist()
    if "prefix" in which:
        for setlen, n_docs in cases:
            df = few_dup_long_sets(spark, n_docs, setlen)
            df.persist().count()
            _, n_new = timed(
                spark, f"prefix_fewdup_s{setlen}_n{n_docs}_emit_once",
                lambda: dedup.prefix_filter_pairs(df, "items", threshold=0.8))
            _, n_old = timed(
                spark, f"prefix_fewdup_s{setlen}_n{n_docs}_distinct",
                lambda: old_prefix_filter_pairs(df, "items", threshold=0.8))
            assert n_new == n_old, (setlen, n_new, n_old)
            df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
