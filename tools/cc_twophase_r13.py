#!/usr/bin/env python
"""A/B: hash-to-min pointer-jumping CC (shipping) vs the Kiveris et al.
(SoCC'14) large-star/small-star alternation (VERDICT r12 task 2 — attack
ROUND COUNT, not jobs/round; the within-algorithm space is measured dead).

The two-phase candidate is implemented here, NOT in dedup.py: it ships only
if it wins. One eager job per alternation (large-star ∘ small-star chained
lazily into a single localCheckpoint), convergence via observe metrics
(edge count + exact decimal endpoint sums) confirmed by a rigorous
star-forest check (no small endpoint appears as a big endpoint) before the
loop exits, so the result is proven converged, never assumed.

Arms (interleaved min-of-N, one session, clearCache between evaluations):
  e2e      — dedup_pipeline_e2e with dedup.connected_components monkeypatched
  er       — entity_resolution_e2e, same monkeypatch
  chain    — raw CC on a synthetic 250k-node path (degenerate diameter)
  verify   — bit-identical cluster check (sorted rows) on both pair graphs

Usage: PYTHONPATH=/root/repo python tools/cc_twophase_r13.py [e2e er chain verify]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Observation, functions as F  # noqa: E402

import makinage_spark as mk  # noqa: E402
from makinage_spark import dedup  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def twophase_cc(
    pairs: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
    stats: dict | None = None,
    checkpoint: str = "local",
) -> DataFrame:
    """Large-star/small-star alternation (Kiveris et al., SoCC'14).

    State = the canonical edge list (big > small). Each alternation:
      large-star: for every node u, point every LARGER neighbor v at
        m = min(Γ(u) ∪ {u})  →  edges (v, m)
      small-star: for every big endpoint u, point every smaller neighbor
        and u itself at m = min(Γ⁻(u) ∪ {u})  →  edges (small, m) ∪ (u, m)
    Both preserve connectivity; the fixpoint is a star forest centered at
    component minima, so labels read directly off the final edges.
    """
    e = (
        pairs.select(
            F.greatest(F.col(src), F.col(dst)).alias("big"),
            F.least(F.col(src), F.col(dst)).alias("small"),
        )
        .filter(F.col("big") != F.col("small"))
        .distinct()
    )

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=True)

    def large_star(edges: DataFrame) -> DataFrame:
        sym = edges.select(
            F.col("big").alias("u"), F.col("small").alias("v")
        ).union(edges.select(F.col("small").alias("u"), F.col("big").alias("v")))
        m = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mm = m.select("u", F.least("u", "mn").alias("m"))
        return (
            sym.join(mm, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("big"), F.col("m").alias("small"))
            .distinct()
        )

    def small_star(edges: DataFrame) -> DataFrame:
        m = edges.groupBy("big").agg(F.min("small").alias("m"))
        repointed = (
            edges.join(m, "big")
            .where(F.col("small") != F.col("m"))
            .select(F.col("small").alias("big"), F.col("m").alias("small"))
        )
        return m.select("big", F.col("m").alias("small")).union(repointed).distinct()

    prev = None
    rounds = 0
    converged = False
    e = _ckpt(e)
    for _ in range(max_iter):
        rounds += 1
        obs = Observation()
        nxt = small_star(large_star(e)).observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("big").cast("decimal(38,0)")).alias("sb"),
            F.sum(F.col("small").cast("decimal(38,0)")).alias("ss"),
        )
        nxt = _ckpt(nxt)
        sig = (obs.get["n"], obs.get["sb"], obs.get["ss"])
        e = nxt
        if sig == prev:
            # candidate fixpoint — prove it: a star forest has NO small
            # endpoint that also appears as a big endpoint
            nonstar = (
                e.alias("x")
                .join(e.alias("y"), F.col("x.small") == F.col("y.big"), "left_semi")
                .limit(1)
                .count()
            )
            if nonstar == 0:
                converged = True
                break
        prev = sig
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        raise RuntimeError(f"twophase_cc did not converge in {max_iter} rounds")
    roots = e.select(F.col("small").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    nodes = e.select(F.col("big").alias("id"), F.col("small").alias("label")).union(
        roots
    )
    return nodes.select(F.col("id"), F.col("label").alias("cluster_id"))


def _chain_pairs(spark, n=250_000):
    return spark.range(n - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )


def main():
    which = set(sys.argv[1:]) or {"verify", "e2e", "er", "chain"}
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = mk.get_spark(
        app_name="cc_twophase_r13",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={"spark.ui.enabled": "false",
                     "spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from makinage_spark.queries import QUERIES

    orig_cc = dedup.connected_components

    def run_query(name):
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    if "verify" in which:
        # bit-identical clusters on the e2e minhash pair graph + the chain
        for tag, pairs in (
            ("chain-1k", _chain_pairs(spark, 1000)),
        ):
            a = sorted(orig_cc(pairs).collect())
            b = sorted(twophase_cc(pairs).collect())
            print(f"verify {tag}: {'MATCH' if a == b else 'MISMATCH'} ({len(a)} rows)")
        # full e2e pair graphs via the queries' own mines
        import makinage_spark.text as text
        from makinage_spark.queries import load_wide

        docs = load_wide(spark, SF_DIR, "documents")
        sets = docs.select(
            "doc_id", text.tokens(F.lower(F.col("text"))).alias("__items")
        )
        pairs = dedup.prefix_filter_pairs(
            sets, "__items", "doc_id", threshold=0.98
        ).select("a", "b")
        sa = {"rounds": None}
        sb = {"rounds": None}
        a = sorted(orig_cc(pairs, stats=sa).collect())
        b = sorted(twophase_cc(pairs, stats=sb).collect())
        print(
            f"verify jaccard-0.98 graph: {'MATCH' if a == b else 'MISMATCH'} "
            f"({len(a)} rows; old {sa['rounds']} rounds, new {sb['rounds']} alternations)"
        )
        spark.catalog.clearCache()

    for tag, qname in (("e2e", "dedup_pipeline_e2e"), ("er", "entity_resolution_e2e")):
        if tag not in which:
            continue
        res = {"old": [], "new": []}
        # warm-up both arms once (uncounted)
        for arm, fn in (("old", orig_cc), ("new", twophase_cc)):
            dedup.connected_components = fn
            spark.catalog.clearCache()
            run_query(qname)
        for _ in range(3):
            for arm, fn in (("old", orig_cc), ("new", twophase_cc)):
                dedup.connected_components = fn
                spark.catalog.clearCache()
                t0 = time.time()
                run_query(qname)
                res[arm].append(round(time.time() - t0, 3))
        dedup.connected_components = orig_cc
        print(
            f"{tag} ({qname}): old {res['old']} min {min(res['old'])} | "
            f"new {res['new']} min {min(res['new'])}"
        )

    if "chain" in which:
        res = {"old": [], "new": []}
        st = {"old": {}, "new": {}}
        for arm, fn in (("old", orig_cc), ("new", twophase_cc)):
            spark.catalog.clearCache()
            fn(_chain_pairs(spark), stats=st[arm]).write.format("noop").mode(
                "overwrite"
            ).save()  # warm-up
        for _ in range(2):
            for arm, fn in (("old", orig_cc), ("new", twophase_cc)):
                spark.catalog.clearCache()
                t0 = time.time()
                fn(_chain_pairs(spark), stats=st[arm]).write.format("noop").mode(
                    "overwrite"
                ).save()
                res[arm].append(round(time.time() - t0, 3))
        print(
            f"chain-250k: old {res['old']} min {min(res['old'])} "
            f"({st['old']}) | new {res['new']} min {min(res['new'])} ({st['new']})"
        )

    spark.stop()


if __name__ == "__main__":
    main()
