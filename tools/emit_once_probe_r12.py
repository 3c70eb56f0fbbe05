"""r12 emit-once A/B probe (VERDICT r11 task 1): measure the pair-stream
distinct the simhash and PPJoin mines used to pay against the emit-once
plans that replaced it, on the same hot-fixture shapes the r11 minhash
measurement used, plus an organic sf0.1 interleaved control.

Control arms re-state the OLD constructions inline (plain block/prefix
join + global distinct) so both arms run in one session on one box; pair
counts are asserted equal in-probe.

Usage:
  PYTHONPATH=/root/repo python tools/emit_once_probe_r12.py hot
  PYTHONPATH=/root/repo python tools/emit_once_probe_r12.py organic [SF_DIR]
"""
from __future__ import annotations

import json
import sys
import time

from pyspark.sql import DataFrame, functions as F

import makinage_spark as mk
from makinage_spark import dedup


# --------------------------------------------------------------------------
# OLD (distinct-based) control arms
# --------------------------------------------------------------------------


def old_simhash_pairs(df, text_col="text", id_col="doc_id", bits=32,
                      max_hamming=3, blocks=4):
    block_bits = bits // blocks
    sh = dedup.simhash_df(df, text_col, id_col, bits)
    stacked = sh.select(
        id_col, "sh",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("blk"),
                     F.shiftright(F.col("sh"), b * block_bits).bitwiseAND(
                         F.lit((1 << block_bits) - 1)).alias("val"))
            for b in range(blocks)])).alias("bb"),
    ).select(id_col, "sh", "bb.blk", "bb.val").persist()
    a, b = stacked.alias("a"), stacked.alias("b")
    cand = (
        a.join(b, on=[F.col("a.blk") == F.col("b.blk"),
                      F.col("a.val") == F.col("b.val"),
                      F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .select(F.col(f"a.{id_col}").alias("a"), F.col(f"b.{id_col}").alias("b"),
                F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"))
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)


def _ordered(df: DataFrame, items_col: str, id_col: str, threshold: float):
    sets = df.select(
        F.col(id_col).alias("doc_id"), F.array_distinct(F.col(items_col)).alias("items")
    ).filter(F.size("items") > 0)
    dfreq = (sets.select(F.explode("items").alias("it"))
             .groupBy("it").agg(F.count(F.lit(1)).alias("dfr")))
    return (
        sets.select("doc_id", F.explode("items").alias("it"))
        .join(dfreq, "it")
        .groupBy("doc_id")
        .agg(F.expr(
            "transform(array_sort(collect_list(struct(dfr, it))), s -> s.it)"
        ).alias("oit"))
        .select(
            "doc_id", "oit", F.size("oit").cast("bigint").alias("sz"),
            F.expr(
                f"slice(oit, 1, size(oit) - CAST(ceil({threshold} * size(oit)) AS INT) + 1)"
            ).alias("prefix"))
        .persist()
    )


def old_prefix_filter_pairs(df, items_col, id_col="doc_id", threshold=0.8):
    ordered = _ordered(df, items_col, id_col, threshold)
    pa = ordered.select("doc_id", "sz", F.explode("prefix").alias("ptok"))
    pairs = (
        pa.alias("a").join(pa.alias("b"), on=[
            F.col("a.ptok") == F.col("b.ptok"),
            F.col("a.doc_id") < F.col("b.doc_id"),
            F.least(F.col("a.sz"), F.col("b.sz"))
            >= threshold * F.greatest(F.col("a.sz"), F.col("b.sz"))])
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .distinct()
    )
    left = ordered.select(F.col("doc_id").alias("a"), F.col("oit").alias("ta"),
                          F.col("sz").alias("sz_a"))
    right = ordered.select(F.col("doc_id").alias("b"), F.col("oit").alias("tb"),
                           F.col("sz").alias("sz_b"))
    cand = pairs.join(left, "a").join(right, "b")
    inter = F.size(F.array_intersect("ta", "tb")).cast("bigint")
    scored = cand.select("a", "b", inter.alias("inter"), "sz_a", "sz_b")
    jac = F.col("inter").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return scored.filter(jac >= threshold).withColumn("jaccard", jac)


def old_containment_pairs(df, items_col, id_col="doc_id", threshold=0.8):
    ordered = _ordered(df, items_col, id_col, threshold)
    pa = ordered.select("doc_id", "sz", F.explode("prefix").alias("ptok"))
    pb = ordered.select("doc_id", "sz", F.explode("oit").alias("ptok"))
    pairs = (
        pa.alias("a").join(pb.alias("b"), on=[
            F.col("a.ptok") == F.col("b.ptok"),
            F.col("a.doc_id") != F.col("b.doc_id"),
            F.col("b.sz") >= threshold * F.col("a.sz")])
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .distinct()
    )
    left = ordered.select(F.col("doc_id").alias("a"), F.col("oit").alias("ta"),
                          F.col("sz").alias("sz_a"))
    right = ordered.select(F.col("doc_id").alias("b"), F.col("oit").alias("tb"),
                           F.col("sz").alias("sz_b"))
    cand = pairs.join(left, "a").join(right, "b")
    inter = F.size(F.array_intersect("ta", "tb")).cast("bigint")
    scored = cand.select("a", "b", inter.alias("inter"), "sz_a", "sz_b")
    cont = F.col("inter").cast("double") / F.col("sz_a")
    return scored.filter(cont >= threshold).withColumn("containment", cont)


# --------------------------------------------------------------------------
# harness
# --------------------------------------------------------------------------


def timed(spark, label: str, build, n_runs: int = 1):
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


def hot(spark):
    """Hot template fixtures: f near-identical docs put s²-scale pair groups
    on single (block/prefix-token) keys — the shape where the old global
    distinct dominated (r11: ~85% of pipeline cost on the minhash mine)."""
    # --- simhash: f identical docs agree on ALL 4 blocks -> 4x duplication
    T = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
         "eiusmod tempor incididunt ut labore et dolore magna aliqua")
    for f in (8192, 16384):
        rows = [(f"t{i:06d}", T) for i in range(f)]
        rows += [(f"z{i:04d}", f"filler document number {i} about topic {i % 97}")
                 for i in range(2000)]
        df = spark.createDataFrame(rows, "doc_id string, text string").repartition(32)
        new_t, new_n = timed(spark, f"simhash_hot{f}_emit_once",
                             lambda: dedup.simhash_pairs(df, max_hamming=3), n_runs=2)
        old_t, old_n = timed(spark, f"simhash_hot{f}_distinct",
                             lambda: old_simhash_pairs(df, max_hamming=3), n_runs=2)
        assert new_n == old_n, (new_n, old_n)
    # --- ppjoin: f identical 24-item sets share the whole 5-token prefix
    base = [f"w{j:03d}" for j in range(24)]
    for f in (8192,):
        rows = [(f"t{i:06d}", base) for i in range(f)]
        rows += [(f"z{i:04d}", [f"v{i}_{j}" for j in range(12)]) for i in range(2000)]
        df = spark.createDataFrame(rows, "doc_id string, items array<string>").repartition(32)
        new_t, new_n = timed(spark, f"ppjoin_hot{f}_emit_once",
                             lambda: dedup.prefix_filter_pairs(df, "items", threshold=0.8), n_runs=2)
        old_t, old_n = timed(spark, f"ppjoin_hot{f}_distinct",
                             lambda: old_prefix_filter_pairs(df, "items", threshold=0.8), n_runs=2)
        assert new_n == old_n, (new_n, old_n)
    # --- containment: f/2 identical sets -> mutual pairs both directions
    for f in (4096,):
        rows = [(f"t{i:06d}", base) for i in range(f)]
        rows += [(f"z{i:04d}", [f"v{i}_{j}" for j in range(12)]) for i in range(2000)]
        df = spark.createDataFrame(rows, "doc_id string, items array<string>").repartition(32)
        new_t, new_n = timed(spark, f"containment_hot{f}_emit_once",
                             lambda: dedup.containment_pairs(df, "items", threshold=0.8), n_runs=2)
        old_t, old_n = timed(spark, f"containment_hot{f}_distinct",
                             lambda: old_containment_pairs(df, "items", threshold=0.8), n_runs=2)
        assert new_n == old_n, (new_n, old_n)


def organic(spark, sf_dir: str, runs: int = 5):
    """Interleaved organic control at sf0.1: the emit-once carry (__pre
    triangular arrays through the prefix-join exchange) must not regress
    the organic corpus where duplication — hence the old distinct — was
    cheap. min-of-N per arm, alternating, one session."""
    from makinage_spark.sources import load_table
    from makinage_spark.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    sets = docs.select("doc_id", F.array_distinct(
        tokens(F.lower(F.col("text")))).alias("items"))
    arms = {
        "jaccard_organic_emit_once": lambda: dedup.prefix_filter_pairs(
            sets, "items", threshold=0.8),
        "jaccard_organic_distinct": lambda: old_prefix_filter_pairs(
            sets, "items", threshold=0.8),
        "containment_organic_emit_once": lambda: dedup.containment_pairs(
            sets, "items", threshold=0.8),
        "containment_organic_distinct": lambda: old_containment_pairs(
            sets, "items", threshold=0.8),
        "simhash_organic_emit_once": lambda: dedup.simhash_pairs(
            docs, max_hamming=3),
        "simhash_organic_distinct": lambda: old_simhash_pairs(
            docs, max_hamming=3),
    }
    best: dict[str, float] = {}
    counts: dict[str, int] = {}
    for r in range(runs):
        for label, build in arms.items():
            spark.catalog.clearCache()
            t0 = time.time()
            counts[label] = build().count()
            dt = time.time() - t0
            best[label] = min(best.get(label, 1e9), dt)
    for label in arms:
        print(json.dumps({"probe": label, "sec_min": round(best[label], 3),
                          "rows": counts[label], "runs": runs}), flush=True)
    for name in ("jaccard", "containment", "simhash"):
        a, b = counts[f"{name}_organic_emit_once"], counts[f"{name}_organic_distinct"]
        assert a == b, (name, a, b)


def old_minhash_lsh_pairs_distinct(df, bucket_cap=50, num_hashes=16, bands=4):
    """The r10-vintage capped mine: plain band join + global pair distinct
    (no __bkts carry, no kept flags) — the arm BENCH_r07's
    dedup_pipeline_e2e anchor was measured on."""
    stacked = dedup.minhash_band_table(df, num_hashes=num_hashes, bands=bands)
    small = (
        stacked.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("__bs"))
        .filter(F.col("__bs") <= bucket_cap)
        .select("band", "bucket")
    )
    stacked = stacked.join(small, ["band", "bucket"], "left_semi").persist()
    a, b = stacked.alias("l"), stacked.alias("r")
    return (
        a.join(b, on=[F.col("l.band") == F.col("r.band"),
                      F.col("l.bucket") == F.col("r.bucket"),
                      F.col("l.doc_id") < F.col("r.doc_id")])
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


def r11_minhash_lsh_pairs_kept_fullcorpus(df, bucket_cap=50, num_hashes=16, bands=4):
    """The r11 emit-once capped mine BEFORE the r12 kept-flag restriction:
    the band-ordered __kept build groupBys over the WHOLE corpus and
    inner-joins back (every doc pays the id shuffle, not just docs touching
    a dropped bucket)."""
    stacked = dedup.minhash_band_table(df, num_hashes=num_hashes, bands=bands,
                                       with_all_buckets=True).persist()
    big_caps = (
        stacked.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("__bs"))
        .filter(F.col("__bs") > bucket_cap)
        .select("band", "bucket")
    )
    kept_arr = (
        stacked.join(big_caps.withColumn("__dropped", F.lit(True)),
                     ["band", "bucket"], "left")
        .select("doc_id", "band", F.col("__dropped").isNull().alias("__k"))
        .groupBy("doc_id")
        .agg(F.transform(F.array_sort(F.collect_list(F.struct("band", "__k"))),
                         lambda s: s["__k"]).alias("__kept"))
    )
    stacked = (stacked.join(big_caps, ["band", "bucket"], "left_anti")
               .join(kept_arr, "doc_id").persist())
    cond = F.lit(True)
    for j in range(bands - 1):
        cond = cond & ((F.col("l.band") <= F.lit(j))
                       | (F.col("l.__bkts")[j] != F.col("r.__bkts")[j])
                       | ~F.col("l.__kept")[j])
    left, right = stacked.alias("l"), stacked.alias("r")
    return left.join(
        right,
        on=[F.col("l.band") == F.col("r.band"),
            F.col("l.bucket") == F.col("r.bucket"),
            F.col("l.doc_id") < F.col("r.doc_id"), cond],
    ).select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))


def longsets(spark):
    """The adversarial corner of the __pre carry: few-duplicate LONG-set
    fixtures, where the arrays_overlap suppression per join candidate
    (not the small pair stream) is the cost. Measured the shipping plan
    (emit-once + the r12 positional filter) against the frozen distinct
    arms; see SCALING.md r12 'long-set corner'."""
    for name, cases, new_build, old_build in (
        ("prefix", ((96, 1024), (192, 512)),
         lambda d: dedup.prefix_filter_pairs(d, "items", threshold=0.8),
         lambda d: old_prefix_filter_pairs(d, "items", threshold=0.8)),
        ("containment", ((48, 2048), (96, 1024)),
         lambda d: dedup.containment_pairs(d, "items", threshold=0.8),
         lambda d: old_containment_pairs(d, "items", threshold=0.8)),
    ):
        for setlen, f in cases:
            base = [f"w{j:03d}" for j in range(setlen)]
            rows = [(f"t{i:06d}", base) for i in range(f)]
            rows += [(f"z{i:04d}", [f"v{i}_{j}" for j in range(12)])
                     for i in range(2000)]
            df = spark.createDataFrame(
                rows, "doc_id string, items array<string>").repartition(32)
            _, n_new = timed(spark, f"{name}_long{setlen}_emit_once_pos",
                             lambda: new_build(df), n_runs=2)
            _, n_old = timed(spark, f"{name}_long{setlen}_distinct",
                             lambda: old_build(df), n_runs=2)
            assert n_new == n_old, (name, setlen, n_new, n_old)


def e2e(spark, sf_dir: str, runs: int = 3):
    """VERDICT r11 task 2: settle dedup_pipeline_e2e's 2.88x driver reading
    — tight interleaved A/B of the FULL capped pipeline (pairs → CC →
    anti-join) across three pair-mine arms, min-of-N, one session."""
    from makinage_spark.queries import load_wide

    docs = load_wide(spark, sf_dir, "documents")

    def pipeline(pair_builder):
        def run():
            pairs = pair_builder(docs)
            cc = dedup.connected_components(pairs)
            drop_list = cc.filter(F.col("id") != F.col("cluster_id")).select(
                F.col("id").alias("doc_id"))
            kept = docs.join(drop_list, "doc_id", "left_anti")
            return kept.select("doc_id", "source",
                               F.length("text").cast("bigint").alias("n_chars"))
        return run

    arms = {
        "e2e_r10_distinct": pipeline(
            lambda d: old_minhash_lsh_pairs_distinct(d, bucket_cap=50)),
        "e2e_r11_emit_once_fullcorpus_kept": pipeline(
            lambda d: r11_minhash_lsh_pairs_kept_fullcorpus(d, bucket_cap=50)),
        "e2e_r12_emit_once_restricted_kept": pipeline(
            lambda d: dedup.minhash_lsh_pairs(d, num_hashes=16, bands=4,
                                              bucket_cap=50)),
    }
    best: dict[str, float] = {}
    counts: dict[str, int] = {}
    for r in range(runs):
        for label, build in arms.items():
            spark.catalog.clearCache()
            t0 = time.time()
            counts[label] = build().count()
            best[label] = min(best.get(label, 1e9), time.time() - t0)
    for label in arms:
        print(json.dumps({"probe": label, "sec_min": round(best[label], 3),
                          "rows": counts[label], "runs": runs}), flush=True)
    assert len(set(counts.values())) == 1, counts


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "hot"
    spark = mk.get_spark(master="local[32]", shuffle_partitions=32,
                         extra_confs={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    if mode == "hot":
        hot(spark)
    elif mode == "longsets":
        longsets(spark)
    elif mode == "e2e":
        e2e(spark, sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1")
    else:
        organic(spark, sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1")
    spark.stop()
