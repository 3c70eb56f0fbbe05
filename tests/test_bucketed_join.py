"""Bucketing: the pre-partitioned co-located join (SURVEY §7 scale hardening).

At 100 TB the fact-fact join (lineitem ⋈ orders) cannot broadcast either side;
the standard fix is to bucket both tables by the join key at write time so the
join needs NO exchange at read time. This test proves the plan property: the
bucketed join contains zero shuffle exchanges, while the plain-parquet join of
the same data shuffles both sides (or broadcasts one).
"""

import uuid

from conftest import broadcast_disabled


def test_bucketed_join_has_no_shuffle(spark):
    li = spark.range(0, 10_000).selectExpr(
        "id % 1000 AS l_orderkey", "CAST(id % 50 AS DOUBLE) AS l_quantity"
    )
    o = spark.range(0, 1000).selectExpr(
        "id AS o_orderkey", "CAST(id % 3 AS STRING) AS o_status"
    )
    n1, n2 = f"li_b_{uuid.uuid4().hex[:6]}", f"o_b_{uuid.uuid4().hex[:6]}"
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(n1)
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(n2)
    try:
        # disable auto-broadcast so the test exercises the shuffle-vs-bucket
        # choice a fact-fact join faces at scale
        with broadcast_disabled(spark):
            joined = spark.table(n1).join(
                spark.table(n2),
                spark.table(n1).l_orderkey == spark.table(n2).o_orderkey,
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" not in plan, plan
            assert joined.count() == 10_000
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {n1}")
        spark.sql(f"DROP TABLE IF EXISTS {n2}")


def test_unbucketed_join_shuffles(spark):
    with broadcast_disabled(spark):
        li = spark.range(0, 10_000).selectExpr("id % 1000 AS l_orderkey")
        o = spark.range(0, 1000).selectExpr("id AS o_orderkey")
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan


def test_write_bucketed_helper_exchange_free(spark, tmp_path):
    """The library helper (sources.files.write_bucketed) must carry the same
    plan property as the raw API above: co-bucketed external tables join
    with zero hash-partitioning exchanges, and a groupBy on the bucket key
    skips its exchange too (one write-time shuffle bought ALL downstream
    key-local work)."""
    import uuid

    from makinage_spark.sources.files import write_bucketed

    li = spark.range(0, 10_000).selectExpr(
        "id % 1000 AS l_orderkey", "CAST(id % 50 AS DOUBLE) AS l_quantity"
    )
    o = spark.range(0, 1000).selectExpr(
        "id AS o_orderkey", "CAST(id % 3 AS STRING) AS o_status"
    )
    n1, n2 = f"li_h_{uuid.uuid4().hex[:6]}", f"o_h_{uuid.uuid4().hex[:6]}"
    write_bucketed(li, n1, "l_orderkey", buckets=8, path=str(tmp_path / n1))
    write_bucketed(o, n2, "o_orderkey", buckets=8, path=str(tmp_path / n2))
    try:
        with broadcast_disabled(spark):
            t1, t2 = spark.table(n1), spark.table(n2)
            joined = t1.join(t2, t1.l_orderkey == t2.o_orderkey)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" not in plan, plan
            assert joined.count() == 10_000
            agg = t1.groupBy("l_orderkey").count()
            agg_plan = agg._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" not in agg_plan, agg_plan
            assert agg.count() == 1000
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {n1}")
        spark.sql(f"DROP TABLE IF EXISTS {n2}")


def test_minhash_band_self_join_keeps_its_exchange(spark):
    """Regression guard for the r8 review finding: the LSH band table must
    NOT be pre-partitioned by bucket alone — HashPartitioning(bucket)
    satisfies the self-join's (band, bucket) clustering on both
    co-partitioned sides, which would drop the join exchange and with it
    AQE's partition-level rebalancing of input-size skew (many medium
    buckets hashing into one fat partition). r10 correction to the r8
    rationale: AQE does NOT split a single mega-bucket's s² OUTPUT
    amplification (skew detection is input-bytes-based — measured in
    tools/skewed_band_probe.py); that case needs bucket_cap or salt=.
    The exchange is still required — both for the input-size rebalance and
    because the salted path re-keys through it. So: with broadcast
    disabled, the pair join's plan must contain a shuffle exchange."""
    from makinage_spark import dedup

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox document number {i % 3} padded out") for i in range(24)],
        "doc_id long, text string",
    )
    with broadcast_disabled(spark):
        pairs = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan, plan


def test_bucketed_query_flag_is_a_real_detector(spark, tmp_path):
    """Negative control for the registry query's in-row plan pin: the SAME
    join/agg shape over plain (unbucketed) parquet MUST contain an Exchange,
    so the exchange_free flag the oracle pins TRUE is a real detector — if
    write_bucketed ever silently dropped bucketing (e.g. a path-only write),
    the flag would flip and the driver hash gate would fail, not just a
    plan-string test."""
    from pyspark.sql import functions as F

    li = spark.range(0, 10_000).selectExpr(
        "id % 1000 AS l_orderkey", "CAST(id % 50 AS DOUBLE) AS l_quantity"
    )
    o = spark.range(0, 1000).selectExpr(
        "id AS o_orderkey", "CAST(id % 3 AS STRING) AS o_status"
    )
    li.write.parquet(str(tmp_path / "li"))
    o.write.parquet(str(tmp_path / "o"))
    t_li = spark.read.parquet(str(tmp_path / "li"))
    t_o = spark.read.parquet(str(tmp_path / "o"))
    out = (
        t_li.hint("merge")
        .join(t_o, t_li.l_orderkey == t_o.o_orderkey)
        .groupBy("l_orderkey", "o_status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan, plan


def test_final_plan_pin_mechanism(spark):
    """The exchange_free pin's execute-then-read move (r11, ADVICE r9
    item 5): on a query AQE actually adapts (it HAS an exchange), reading
    executedPlan() before any action yields the INITIAL adaptive plan
    (isFinalPlan=false); after materializing the plan's own row RDD — the
    exact py4j call the registry query uses — the SAME QueryExecution
    reports isFinalPlan=true. Pins the mechanism the oracle-hashed
    exchange_free flag depends on, so a Spark upgrade that changes the
    adaptive-plan string contract fails here, not silently in the gate."""
    df = spark.range(0, 10_000).selectExpr("id % 7 AS k").groupBy("k").count()
    qe = df._jdf.queryExecution()
    before = qe.executedPlan().toString()
    assert "isFinalPlan=false" in before, before
    qe.executedPlan().execute().count()
    after = qe.executedPlan().toString()
    assert "isFinalPlan=true" in after, after


def test_mismatched_bucket_counts_reintroduce_exchange(spark, tmp_path):
    """Negative control users actually hit (VERDICT r9 task 6): two tables
    bucketed on the right keys but with DIFFERENT bucket counts (8 vs 16)
    do NOT co-join exchange-free — Spark silently re-shuffles one side, so
    the pay-once-at-write contract quietly becomes pay-every-read. The
    test pins (a) the exchange reappears under a mismatch, and (b) the
    no-rewrite escape hatch: coalesceBucketsInJoin merges 16 -> 8 at read
    time (ratio <= maxBucketRatio, default 4) and restores the
    exchange-free plan without rewriting either table."""
    import uuid

    from makinage_spark.sources.files import write_bucketed

    li = spark.range(0, 10_000).selectExpr(
        "id % 1000 AS l_orderkey", "CAST(id % 50 AS DOUBLE) AS l_quantity"
    )
    o = spark.range(0, 1000).selectExpr(
        "id AS o_orderkey", "CAST(id % 3 AS STRING) AS o_status"
    )
    n1, n2 = f"li_m_{uuid.uuid4().hex[:6]}", f"o_m_{uuid.uuid4().hex[:6]}"
    write_bucketed(li, n1, "l_orderkey", buckets=8, path=str(tmp_path / n1))
    write_bucketed(o, n2, "o_orderkey", buckets=16, path=str(tmp_path / n2))
    try:
        with broadcast_disabled(spark):
            t1, t2 = spark.table(n1), spark.table(n2)
            joined = t1.join(t2, t1.l_orderkey == t2.o_orderkey)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" in plan, plan
            assert joined.count() == 10_000
            spark.conf.set(
                "spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true"
            )
            t1c, t2c = spark.table(n1), spark.table(n2)
            coalesced = t1c.join(t2c, t1c.l_orderkey == t2c.o_orderkey)
            plan_c = coalesced._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" not in plan_c, plan_c
            assert coalesced.count() == 10_000
    finally:
        spark.conf.set(
            "spark.sql.bucketing.coalesceBucketsInJoin.enabled", "false"
        )
        spark.sql(f"DROP TABLE IF EXISTS {n1}")
        spark.sql(f"DROP TABLE IF EXISTS {n2}")
