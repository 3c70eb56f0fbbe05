#!/usr/bin/env python
"""r13 pagerank A/B (VERDICT r12 task 5, measurement-led): the sf1 event-log
breakdown (tools/job_breakdown_r12.py at /root/scale_x10) shows two
back-to-back 94-task jobs (~4.5 s of the 16.2 s total) recomputing the |V|
node set — ``nodes`` (the union-distinct over the cached edge list) is
referenced twice (the ``n_df`` 1-row count that broadcasts into ``base``,
and ``base`` itself) but never persisted, so the distinct runs twice per
evaluation. Candidate fix: persist ``nodes`` (it is |V| rows — tiny next
to the edge cache the function already holds).

Arms (interleaved min-of-N, one session, clearCache between evaluations):
  shipped — graphs.pagerank as-is
  patched — identical except nodes.persist()

Ranks asserted bit-identical (exceptAll both ways) before timing.

Usage: PYTHONPATH=/root/repo python tools/pagerank_nodes_ab_r13.py [runs]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import makinage_spark as mk  # noqa: E402
from makinage_spark import graphs  # noqa: E402
from makinage_spark.graphs import _sized_persist  # noqa: E402
from makinage_spark.sources import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pagerank_patched(edges, src="src", dst="dst", damping=0.85, iterations=3,
                     broadcast_ranks=False, assume_distinct=False,
                     dangling="drop", personalize=None):
    """graphs.pagerank with ONE change: nodes.persist() (drop path only —
    enough for the A/B; the shipped patch covers all paths)."""
    assert dangling == "drop" and personalize is None
    half_up = lambda x: F.floor(x + F.lit(0.5)).cast("bigint")  # noqa: E731
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    e = _sized_persist(e, key="src")
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()  # <-- the candidate fix
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = _sized_persist(e.join(outdeg, "src"), key="src")
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    base = nodes.crossJoin(F.broadcast(n_df)).persist()
    carry = ["id", "n"]
    ranks = base.select(
        *carry, half_up(F.lit(1.0e9) / F.col("n")).alias("rank_nanos")
    )
    tele = (1.0 - damping) * 1.0e9 / F.col("n")
    maybe_bc = F.broadcast if broadcast_ranks else (lambda df: df)
    for _ in range(iterations):
        emitting = ranks.select(F.col("id").alias("src"), "rank_nanos")
        contrib = (
            ew.join(maybe_bc(emitting), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(
                half_up(F.col("rank_nanos").cast("double") / F.col("outdeg"))
            ).alias("contrib"))
        )
        updated = base.join(maybe_bc(contrib), "id", "left")
        received = F.coalesce(F.col("contrib"), F.lit(0))
        ranks = updated.select(
            *carry,
            half_up(tele + damping * received.cast("double")).alias("rank_nanos"),
        )
    return ranks.select(
        "id", "rank_nanos",
        (F.col("rank_nanos").cast("double") / F.lit(1.0e9)).alias("rank"),
    )


def build_sym(spark):
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        li.join(F.broadcast(o), o.o_orderkey == li.l_orderkey)
        .select(
            (2 * F.col("o_custkey")).cast("bigint").alias("src"),
            (2 * F.col("l_suppkey") + 1).cast("bigint").alias("dst"),
        )
        .distinct()
    )
    return e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = mk.get_spark(
        app_name="pagerank_nodes_ab_r13",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={"spark.ui.enabled": "false",
                     "spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # equality gate: bit-identical ranks
    sym = build_sym(spark)
    a = graphs.pagerank(sym, damping=0.85, iterations=3,
                        broadcast_ranks=True, assume_distinct=True)
    b = pagerank_patched(sym, damping=0.85, iterations=3,
                         broadcast_ranks=True, assume_distinct=True)
    d1 = a.exceptAll(b).limit(1).count()
    d2 = b.exceptAll(a).limit(1).count()
    assert d1 == 0 and d2 == 0, (d1, d2)
    print(json.dumps({"equality": "MATCH"}), flush=True)
    spark.catalog.clearCache()

    arms = {"shipped": graphs.pagerank, "patched": pagerank_patched}
    best: dict[str, float] = {}
    for fn in arms.values():  # warm-up, uncounted
        spark.catalog.clearCache()
        fn(build_sym(spark), damping=0.85, iterations=3,
           broadcast_ranks=True, assume_distinct=True).write.format(
            "noop").mode("overwrite").save()
    for _ in range(runs):
        for tag, fn in arms.items():
            spark.catalog.clearCache()
            t0 = time.time()
            fn(build_sym(spark), damping=0.85, iterations=3,
               broadcast_ranks=True, assume_distinct=True).write.format(
                "noop").mode("overwrite").save()
            best[tag] = min(best.get(tag, 1e9), time.time() - t0)
    print(json.dumps({"sf_dir": SF_DIR, "runs": runs,
                      **{k: round(v, 3) for k, v in best.items()}}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
