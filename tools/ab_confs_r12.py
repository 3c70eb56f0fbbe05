#!/usr/bin/env python
"""A/B runtime-settable SQL confs over a headline subset (guide §3.1/§9):
interleaved arms in one session (box-noise control), warm-up + min-of-N
cold-data attempts per arm, noop sink — bench.py's methodology.

Usage: PYTHONPATH=/root/repo python tools/ab_confs_r12.py KEY=V[,KEY=V...] q1 q2 ...
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, AB_ATTEMPTS (default 3)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import makinage_spark as mk  # noqa: E402
from makinage_spark.queries import QUERIES  # noqa: E402


def main():
    conf_arg = sys.argv[1]
    names = sys.argv[2:]
    overrides = dict(kv.split("=", 1) for kv in conf_arg.split(","))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    attempts = int(os.environ.get("AB_ATTEMPTS", "3"))
    spark = mk.get_spark(
        app_name="ab_confs_r12",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    baseline = {k: spark.conf.get(k, None) for k in overrides}

    def set_arm(on: bool):
        for k, v in overrides.items():
            if on:
                spark.conf.set(k, v)
            elif baseline[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, baseline[k])

    def run(name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    print(f"overrides: {overrides}; baseline: {baseline}; attempts={attempts}")
    results = {}
    for name in names:
        # warm-up both arms once (JIT/footers), uncounted
        for on in (False, True):
            set_arm(on)
            try:
                run(name)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: arm on={on} FAILED {type(e).__name__}: {e}")
                results[name] = None
                break
        if results.get(name, "") is None:
            continue
        best = {False: float("inf"), True: float("inf")}
        # interleave arms per attempt so drift hits both equally
        for _ in range(attempts):
            for on in (False, True):
                set_arm(on)
                best[on] = min(best[on], run(name))
        results[name] = (best[False], best[True])
        print(
            f"{name}: OFF {best[False]:.3f}  ON {best[True]:.3f}  "
            f"ON/OFF {best[True] / best[False]:.3f}"
        )
    set_arm(False)
    offs = [v[0] for v in results.values() if v]
    ons = [v[1] for v in results.values() if v]
    if offs:
        print(f"TOTAL: OFF {sum(offs):.3f}  ON {sum(ons):.3f}  ratio {sum(ons)/sum(offs):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
