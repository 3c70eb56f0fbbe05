#!/usr/bin/env python
"""r13 scale validation of the r12 in-row k-means argmin (VERDICT r12 task
1a): the claim is that the map-only in-row argmin stays flat in n·k where
the OLD path's SortAggregate argmin (min_by over the materialized n·k
BroadcastNestedLoopJoin output) grows with the sorted distance stream.
sf0.1 could not measure it (n·k = 128k rows is scheduler noise); this probe
scales n·k over two orders of magnitude with a deterministic synthetic
vector table and times both arms interleaved in one session.

Both arms share the same seeded centroid table and the same double
arithmetic; assignments are asserted identical (anti-join on differing
cluster) before any timing is trusted.

Usage: PYTHONPATH=/root/repo python tools/kmeans_scale_probe_r13.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import makinage_spark as mk  # noqa: E402
from makinage_spark.vectors import _kmeans_dist  # noqa: E402

D = 64


def synth_vecs(spark, n):
    """Deterministic n×D double vectors in [0,1): value = pmod(xxhash64(id,j),10^6)/10^6."""
    return spark.range(n).select(
        F.col("id").alias("__vid"),
        F.array(
            *[
                (F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(1000000)) / 1e6)
                for j in range(D)
            ]
        ).alias("__v"),
    )


def seed_cents(vecs, k):
    from pyspark.sql import Window

    w = Window.orderBy("__sid")
    return (
        vecs.orderBy("__vid")
        .limit(k)
        .select(F.col("__vid").alias("__sid"), F.col("__v").alias("cvec"))
        .select((F.row_number().over(w) - 1).cast("bigint").alias("cluster"), "cvec")
    ).localCheckpoint(eager=True)


def old_assign(vecs, cents_df):
    """Pre-r12 table-path assignment: broadcast centroid TABLE, n·k BNLJ
    rows, min_by argmin (plans as two SortAggregates + n-row exchange)."""
    d = _kmeans_dist(F.col("__v"), F.col("cvec"), exact=False)
    return (
        vecs.crossJoin(F.broadcast(cents_df))
        .select("__vid", "__v", F.col("cluster"), d.alias("__d"))
        .groupBy("__vid")
        .agg(
            F.min_by("cluster", F.struct(F.col("__d"), F.col("cluster"))).alias(
                "cluster"
            ),
            F.first("__v").alias("__v"),
        )
    )


def new_assign(vecs, cents_df):
    """r12 shipping shape: ONE broadcast row of (cluster, cvec) structs,
    in-row array_min argmin — map-only."""
    cents_arr = cents_df.agg(
        F.collect_list(F.struct("cluster", "cvec")).alias("__cents")
    )
    best = F.array_min(
        F.transform(
            "__cents",
            lambda c: F.struct(
                _kmeans_dist(F.col("__v"), c["cvec"], False).alias("d"),
                c["cluster"].alias("cluster"),
            ),
        )
    )
    return vecs.crossJoin(F.broadcast(cents_arr)).select(
        "__vid", best["cluster"].alias("cluster"), "__v"
    )


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = mk.get_spark(
        app_name="kmeans_scale_probe_r13",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={"spark.ui.enabled": "false",
                     "spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n, k in ((20_000, 64), (100_000, 128), (200_000, 256)):
        vecs = synth_vecs(spark, n).persist()
        vecs.count()
        cents = seed_cents(vecs, k)
        # equality gate first
        a = old_assign(vecs, cents).select("__vid", F.col("cluster").alias("ca"))
        b = new_assign(vecs, cents).select("__vid", F.col("cluster").alias("cb"))
        ndiff = a.join(b, "__vid").where(F.col("ca") != F.col("cb")).count()
        assert ndiff == 0, (n, k, ndiff)
        res = {}
        for arm, fn in (("old_minby", old_assign), ("new_inrow", new_assign)):
            best = None
            for attempt in range(3):  # attempt 0 = warm-up
                t0 = time.time()
                fn(vecs, cents).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                if attempt:
                    best = dt if best is None else min(best, dt)
            res[arm] = round(best, 3)
        print(
            json.dumps(
                {
                    "probe": f"kmeans_assign_n{n}_k{k}",
                    "nk_rows": n * k,
                    **res,
                    "speedup": round(res["old_minby"] / res["new_inrow"], 2),
                }
            ),
            flush=True,
        )
        vecs.unpersist()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
