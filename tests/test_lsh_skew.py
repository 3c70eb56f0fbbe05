"""Hot-band LSH skew handling (VERDICT r9 task 3).

A boilerplate template collapses thousands of near-identical docs into one
(band, bucket) value; the s² pair expansion of that single key is invisible
to AQE's skew split (input-bytes-based detection, output amplification —
measured in tools/skewed_band_probe.py). These tests pin the two defenses:

- ``salt``: triangular block self-join for buckets above ``salt_threshold``
  — must be BIT-IDENTICAL to the unsalted join (every unordered pair
  exactly once, no self-pairs, no duplicates);
- ``bucket_cap`` + ``lsh_mega_buckets``: what the cap drops from pair
  enumeration comes back as cluster labels over the same band table.
"""

from conftest import broadcast_disabled
from pyspark.sql import functions as F

from makinage_spark import dedup


def _corpus(spark, n_tpl=40, n_bg=60):
    """n_tpl near-identical template docs + n_bg distinct background docs."""
    tpl = spark.range(n_tpl).selectExpr(
        "id AS doc_id",
        "concat('the quick brown fox jumps over the lazy dog again and again"
        " and again padding words everywhere', ' t', id) AS text",
    )
    bg = spark.range(n_bg).selectExpr(
        f"id + {n_tpl} AS doc_id",
        "concat_ws(' ', transform(sequence(0, 29),"
        " i -> concat('w', pmod(xxhash64(id, i), 500)))) AS text",
    )
    return tpl.unionByName(bg)


def test_salted_pairs_bit_identical(spark):
    docs = _corpus(spark)
    plain = {
        (r.a, r.b) for r in dedup.minhash_lsh_pairs(docs).collect()
    }
    salted = {
        (r.a, r.b)
        for r in dedup.minhash_lsh_pairs(
            docs, salt=4, salt_threshold=8
        ).collect()
    }
    assert salted == plain
    assert all(a < b for a, b in salted)
    # the template's intra-cluster pairs are present (it IS a near-dup set)
    assert (0, 1) in salted


def test_salt_one_and_none_equivalent(spark):
    docs = _corpus(spark, n_tpl=12, n_bg=20)
    plain = {(r.a, r.b) for r in dedup.minhash_lsh_pairs(docs).collect()}
    degenerate = {
        (r.a, r.b)
        for r in dedup.minhash_lsh_pairs(docs, salt=1).collect()
    }
    assert degenerate == plain


def test_mega_buckets_label_what_the_cap_drops(spark):
    docs = _corpus(spark)
    stacked = dedup.minhash_band_table(docs)
    capped = dedup.minhash_lsh_pairs(docs, bucket_cap=8)
    labels = dedup.lsh_mega_buckets(stacked, bucket_cap=8)
    lab = {r.doc_id: r.cluster for r in labels.collect()}
    # every template doc is labeled, with the keep-smallest convention
    for d in range(40):
        assert lab.get(d) == 0, (d, lab.get(d))
    # and the capped pair mine no longer enumerates the template's pairs
    tpl_pairs = capped.filter(F.col("a") < 40).filter(F.col("b") < 40)
    assert tpl_pairs.count() == 0
    # union of (capped pairs ∪ labeled docs) covers the template cluster:
    # nothing silently vanished
    assert set(lab.keys()) >= set(range(40))


def test_mega_bucket_labels_generalize_to_simhash_blocks(spark):
    """The labels complement works on any block-keyed table with the same
    s² exposure — here the simhash pigeonhole table (blk, val)."""
    docs = _corpus(spark)
    sh = dedup.simhash_df(docs)
    blocks = 4
    block_bits = 32 // blocks
    stacked = sh.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("blk"),
                    F.shiftright(F.col("sh"), b * block_bits)
                    .bitwiseAND(F.lit((1 << block_bits) - 1))
                    .alias("val"),
                )
                for b in range(blocks)
            ])
        ).alias("bb"),
    ).select("doc_id", "bb.blk", "bb.val")
    labels = dedup.lsh_mega_buckets(
        stacked, bucket_cap=8, band_col="blk", bucket_col="val"
    )
    from collections import defaultdict

    lab = defaultdict(set)
    for r in labels.collect():
        lab[r.doc_id].add(r.cluster)
    # Unlike minhash bands, a simhash BLOCK can flip on a near-identical doc
    # (one perturbed token flips any bit whose vote margin was ±1), so a
    # template doc may carry extra labels from smaller mega-blocks. The
    # guarantees under test: every template doc is labeled, and the shared
    # template block puts (nearly) all of them in cluster 0 — a doc misses
    # it only if its perturbation flipped a bit in EVERY one of the 4
    # blocks, which the 40-doc fixture should make rare.
    for d in range(40):
        assert lab[d], f"template doc {d} unlabeled"
    in_main = sum(1 for d in range(40) if 0 in lab[d])
    assert in_main >= 36, in_main


def test_cap_and_salt_compose(spark):
    """bucket_cap and salt together: the cap drops template buckets FIRST,
    then salt thresholds what remains — output equals the capped unsalted
    mine exactly (salt never resurrects capped-out buckets)."""
    docs = _corpus(spark)
    capped = {
        (r.a, r.b)
        for r in dedup.minhash_lsh_pairs(docs, bucket_cap=8).collect()
    }
    both = {
        (r.a, r.b)
        for r in dedup.minhash_lsh_pairs(
            docs, bucket_cap=8, salt=4, salt_threshold=2
        ).collect()
    }
    assert both == capped


def test_salted_join_shuffles_on_block_key(spark):
    """The salt's whole point is the physical plan: the big-bucket join must
    hash-partition on (band, bucket, __bj) so a mega-bucket spreads over
    ``salt`` reducer keys instead of landing on one. Pin it in the plan —
    with broadcast disabled so the join is a real shuffle join."""
    docs = _corpus(spark)
    with broadcast_disabled(spark):
        pairs = dedup.minhash_lsh_pairs(docs, salt=4, salt_threshold=8)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "__bj" in plan, plan
        import re

        exchanges = re.findall(r"Exchange hashpartitioning\([^)]*\)", plan)
        assert any("__bj" in e for e in exchanges), exchanges
