#!/usr/bin/env python
"""r13 streaming fixed-overhead attribution (VERDICT r12 task 4): the six
headline stream_* queries cost ~1.3-2 s each and r12 closed them as
"framework fixed cost" without attributing it. Before any conf A/B, split
one drain into its phases using the StreamingQueryProgress durationMs
breakdown (triggerExecution / queryPlanning / walCommit / commitOffsets /
getBatch / addBatch / latestOffset) plus wall-clock marks around session
setup, stream construction, start(), and awaitTermination().

Usage: PYTHONPATH=/root/repo python tools/stream_overhead_r13.py [query ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, EXTRA_CONFS (json dict, optional)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import makinage_spark as mk  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    names = sys.argv[1:] or ["stream_scan_running"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    extra = {"spark.ui.enabled": "false",
             "spark.ui.showConsoleProgress": "false"}
    extra.update(json.loads(os.environ.get("EXTRA_CONFS", "{}")))
    spark = mk.get_spark(
        app_name="stream_overhead_r13",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql.streaming import StreamingQueryListener

    progresses = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, e):
            pass

        def onQueryProgress(self, e):
            progresses.append(json.loads(e.progress.json))

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            pass

    spark.streams.addListener(L())
    from makinage_spark.queries import QUERIES

    for name in names:
        for attempt in range(3):
            progresses.clear()
            spark.catalog.clearCache()
            t0 = time.time()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            total = time.time() - t0
            # wait for listener delivery (async bus)
            time.sleep(0.5)
            batches = []
            for p in progresses:
                batches.append(
                    {
                        "batchId": p.get("batchId"),
                        "durationMs": p.get("durationMs"),
                        "numInputRows": p.get("numInputRows"),
                    }
                )
            print(
                json.dumps(
                    {
                        "query": name,
                        "attempt": attempt,
                        "wall_sec": round(total, 3),
                        "n_batches": len(batches),
                        "batches": batches,
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
