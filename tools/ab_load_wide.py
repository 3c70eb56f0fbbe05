#!/usr/bin/env python
"""A/B harness for the scan-parallelism repair (VERDICT r6 task 3): time each
candidate headline query at sf0.1 with the `load_wide` round-robin exchange ON
vs OFF (monkeypatched), min-of-N cold-data attempts after one warm-up, and
print a per-query decision table. The winning mode is then hard-coded at the
query's call site (`repartition=False`) and recorded in BASELINE.md.

Usage: PYTHONPATH=/root/repo python tools/ab_load_wide.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import makinage_spark as mk
from makinage_spark import queries as Q

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_CANDIDATES = [
    "dedup_exact",
    "text_language_id",
    "text_quality",
    "pii_redaction",
    "chunk_documents",
    "domain_mixture_weights",
    "embedding_topk",
    "pack_sequences",
    "cdc_chunk_dedup",
    "token_budget_pick",
]


def time_query(spark, name: str, attempts: int = 2) -> float:
    fn = Q.QUERIES[name]
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm-up
    best = float("inf")
    for _ in range(attempts):
        spark.catalog.clearCache()
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    # ONE session for every leg (ADVICE r7): getOrCreate would hand every
    # per-call construction the same session anyway — build it once so the
    # shared-session/shared-conf assumption is explicit, and stop it at exit
    spark = mk.get_spark(
        app_name="ab_load_wide",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or DEFAULT_CANDIDATES
    orig = Q.load_wide
    print(f"{'query':32s} {'ON(s)':>8s} {'OFF(s)':>8s} {'OFF/ON':>7s}  decision")
    for name in names:
        Q.load_wide = orig
        t_on = time_query(spark, name)
        Q.load_wide = (
            lambda spark, sf_dir, table, repartition=True: orig(
                spark, sf_dir, table, repartition=False
            )
        )
        t_off = time_query(spark, name)
        Q.load_wide = orig
        ratio = t_off / t_on if t_on else float("inf")
        decision = "OFF (skip exchange)" if t_off < t_on * 0.9 else (
            "ON (keep exchange)" if t_on < t_off * 0.9 else "tie (keep ON)"
        )
        print(f"{name:32s} {t_on:8.3f} {t_off:8.3f} {ratio:7.2f}  {decision}")
    spark.stop()


if __name__ == "__main__":
    main()
