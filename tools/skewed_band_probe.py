#!/usr/bin/env python
"""Hot-band LSH probe (VERDICT r9 task 3 — mirror of the r8 wedge-cap probe).

A corpus with thousands of near-identical documents (one boilerplate
template + per-doc noise) concentrates ONE (band, bucket) value: every
template copy agrees on every band, so the band self-join faces a single
key holding s docs → s² candidate pairs from one reducer key. This probe
synthesizes that shape deterministically and measures, on it:

1. the band-table bucket-size distribution (max, p99, template bucket size);
2. the uncapped pair mine's cost with AQE skew-split ON vs OFF — the
   existing design keeps the self-join's exchange precisely so
   OptimizeSkewedJoin can split the mega-bucket's expansion (dedup.py r8
   note); this measures whether that actually holds on a hot band;
3. ``bucket_cap`` economics: pair-count and wall-time growth vs cap, and
   RECALL of planted genuine near-dup pairs (template-external) in the
   capped output — the cap must drop only the template's intra-cluster
   pairs, never the organic near-dups;
4. the dropped-bucket membership a production run keeps as cluster labels
   (``dedup.lsh_mega_buckets``): size and label counts.

Fixture (deterministic, no RNG): ``n_bg`` background docs whose 40-word
text derives from xxhash64(doc_id, position); ``n_tpl`` template docs
sharing ONE word sequence plus a per-doc trailing token (near-identical:
the trailing token perturbs a handful of 5-gram shingles, far too few to
move any of the 16 minima at 4 rows/band); ``n_planted`` background docs
get a near-copy partner (same words, last word changed) at id+offset —
the organic near-dup pairs whose recall the cap must preserve.

Usage:
  PYTHONPATH=/root/repo python tools/skewed_band_probe.py [--bg 16000 \
      --template 2000 --planted 200 --cap 64]

r11 additions (VERDICT r10 task 4 — the same-scale defense rows): at
template sizes where s² enumeration is infeasible-by-design, the probe can
still time the defenses that ARE the answer there. ``--skip-uncapped``
drops the raw self-join measurement (a 10⁶-doc template would attempt
10¹² pairs from one reducer key — the point is that nobody should run it),
``--skip-salt`` drops the salted enumeration (same reason, one tier later:
salt bounds per-task work at s²/g but total output is still s²/2), and
``--reps`` controls the min-of-N loop so the widest rows stay affordable.
``--salt-g`` picks the block count. Template-pair lower bound
s·(s-1)/2 ≤ pairs_salted is asserted in-row when salt runs without the
uncapped reference (the full bit-identity claim is driver-hash-checked at
sf0.01 by dedup_minhash_pairs_salted and oracle-checked in tests)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import makinage_spark as mk  # noqa: E402
from makinage_spark import dedup  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

WORDS_PER_DOC = 40
VOCAB = 5000


def _words_expr(seed_col, n_words, last_word_salt=None):
    """40 deterministic words from xxhash64(seed, position); optionally
    replace the final word (the near-copy perturbation)."""
    body = (
        f"transform(sequence(0, {n_words - 1}),"
        f" i -> concat('w', pmod(xxhash64({seed_col}, i), {VOCAB})))"
    )
    if last_word_salt is None:
        return F.expr(f"concat_ws(' ', {body})")
    return F.expr(
        f"concat_ws(' ', concat(slice({body}, 1, {n_words - 1}),"
        f" array(concat('v', pmod(xxhash64({seed_col}, '{last_word_salt}'),"
        f" {VOCAB})))))"
    )


def make_corpus(spark, n_bg: int, n_tpl: int, n_planted: int):
    """Returns (docs, planted_pairs). ids: [0, n_bg) background,
    [n_bg, n_bg+n_planted) near-copy partners of [0, n_planted),
    [n_bg+n_planted, +n_tpl) template copies."""
    bg = spark.range(n_bg).select(
        F.col("id").alias("doc_id"),
        _words_expr("id", WORDS_PER_DOC).alias("text"),
    )
    partners = spark.range(n_planted).select(
        (F.col("id") + n_bg).alias("doc_id"),
        _words_expr("id", WORDS_PER_DOC, last_word_salt="p").alias("text"),
    )
    # template text: ONE shared word sequence (seed = constant) + per-doc
    # trailing token
    tpl = spark.range(n_tpl).select(
        (F.col("id") + n_bg + n_planted).alias("doc_id"),
        F.concat(
            _words_expr(str(10**9), WORDS_PER_DOC),
            F.lit(" t"),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    docs = bg.unionByName(partners).unionByName(tpl)
    planted = spark.range(n_planted).select(
        F.col("id").alias("a"), (F.col("id") + n_bg).alias("b")
    )
    return docs, planted


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bg", type=int, default=16_000)
    ap.add_argument("--template", type=int, default=2_000)
    ap.add_argument("--planted", type=int, default=200)
    ap.add_argument("--cap", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-uncapped", action="store_true")
    ap.add_argument("--skip-salt", action="store_true")
    ap.add_argument("--salt-g", type=int, default=16)
    args = ap.parse_args()

    spark = mk.get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs, planted = make_corpus(spark, args.bg, args.template, args.planted)
    docs = docs.persist()
    n_docs = docs.count()

    # 1. bucket-size distribution
    stacked = dedup.minhash_band_table(docs).persist()
    sizes = stacked.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("s")
    )
    prof = sizes.agg(
        F.max("s").alias("mx"),
        F.expr("CAST(approx_percentile(s, 0.99) AS BIGINT)").alias("p99"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(F.col("s") > args.cap, F.col("s"))).alias("docs_in_mega"),
        F.sum(F.when(F.col("s") > args.cap, 1).otherwise(0)).alias("n_mega"),
    ).first()

    def timed_pairs(bucket_cap, aqe: bool):
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        try:
            best, n = float("inf"), None
            for _ in range(args.reps):
                t0 = time.monotonic()
                n = dedup.minhash_lsh_pairs(docs, bucket_cap=bucket_cap).count()
                best = min(best, time.monotonic() - t0)
            return round(best, 2), n
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")

    # 2. uncapped: AQE skew-split on vs off, then the salted triangular
    # block join (the actual mega-key parallelization — AQE can't see
    # output amplification)
    if args.skip_uncapped:
        t_unc_aqe = t_unc_noaqe = n_unc = None
    else:
        t_unc_aqe, n_unc = timed_pairs(None, aqe=True)
        t_unc_noaqe, _ = timed_pairs(None, aqe=False)

    def timed_salted(g: int):
        best, n = float("inf"), None
        for _ in range(args.reps):
            t0 = time.monotonic()
            n = dedup.minhash_lsh_pairs(
                docs, salt=g, salt_threshold=args.cap * 4
            ).count()
            best = min(best, time.monotonic() - t0)
        return round(best, 2), n

    if args.skip_salt:
        t_salted = n_salted = None
    else:
        t_salted, n_salted = timed_salted(args.salt_g)
        if n_unc is None:
            # no uncapped reference at this scale — assert the analytic
            # floor instead: the template alone contributes s·(s-1)/2
            # distinct pairs, every one of which the salted grid must emit
            floor = args.template * (args.template - 1) // 2
            assert n_salted >= floor, (n_salted, floor)

    # 3. capped economics + planted recall
    t_cap, n_cap = timed_pairs(args.cap, aqe=True)
    capped = dedup.minhash_lsh_pairs(docs, bucket_cap=args.cap)
    n_planted_hit = planted.join(capped, ["a", "b"], "left_semi").count()

    # 4. mega-bucket membership (the cluster-label path for what the cap
    # drops) — timed, so the labels defense has its own curvature row
    t0 = time.monotonic()
    mega = dedup.lsh_mega_buckets(stacked, bucket_cap=args.cap)
    mega_prof = mega.agg(
        F.countDistinct("cluster").alias("n_clusters"),
        F.count(F.lit(1)).alias("n_members"),
        F.countDistinct("doc_id").alias("n_docs"),
    ).first()
    t_labels = round(time.monotonic() - t0, 2)

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "bg": args.bg,
                "template": args.template,
                "planted_pairs": args.planted,
                "cap": args.cap,
                "bucket_max": int(prof.mx),
                "bucket_p99": int(prof.p99),
                "n_buckets": int(prof.n_buckets),
                "n_mega_buckets": int(prof.n_mega),
                "docs_in_mega_buckets": int(prof.docs_in_mega or 0),
                "pairs_uncapped": n_unc,
                "t_uncapped_aqe_sec": t_unc_aqe,
                "t_uncapped_noaqe_sec": t_unc_noaqe,
                "pairs_salted": n_salted,
                "salted_matches_unsalted": (
                    None if n_unc is None or n_salted is None
                    else n_salted == n_unc
                ),
                "salt_g": None if args.skip_salt else args.salt_g,
                "t_salted_sec": t_salted,
                "reps": args.reps,
                "pairs_capped": n_cap,
                "t_capped_sec": t_cap,
                "pair_cut": round(1 - n_cap / n_unc, 4) if n_unc else None,
                "planted_recall_capped": round(
                    n_planted_hit / args.planted, 4
                ),
                "t_labels_sec": t_labels,
                "mega_clusters": int(mega_prof.n_clusters),
                "mega_members": int(mega_prof.n_members),
                "mega_distinct_docs": int(mega_prof.n_docs),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
