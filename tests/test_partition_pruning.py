"""Partition pruning: the lake-layout contract for 100 TB scans.

A date-partitioned table (`partitionBy` at write time) must turn a date
predicate into PartitionFilters — the scan then touches only the matching
directories, so a one-month query over a 10-year lake reads ~1% of the files.
"""

import shutil
import uuid

from pyspark.sql import functions as F


def test_date_partitioned_write_prunes_scan(spark):
    d = f"/tmp/mk_part_{uuid.uuid4().hex[:8]}"
    df = spark.range(0, 10_000).select(
        F.col("id"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 90).cast("int")
                   ).alias("day"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    df.write.partitionBy("day").parquet(d)
    back = spark.read.parquet(d).filter(F.col("day") == "2024-02-01")
    plan = back._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan") :]
    assert "PartitionFilters" in scan
    # the predicate is IN the partition filters, not a post-scan Filter
    pf = scan.split("PartitionFilters:")[1].split("]")[0]
    assert "day" in pf
    # semantic check: exactly the rows of that day survive the pruned scan
    n = back.count()
    assert n > 0
    assert n == df.filter(F.col("day") == "2024-02-01").count()
    shutil.rmtree(d)


def test_ivf_index_search_is_partition_pruned(spark):
    """The IVF storage contract: a materialized index (parquet partitioned by
    cell) turns the nprobe filter into PartitionFilters — the scan reads
    nprobe/n_cells of the files, the property that makes IVF search sublinear
    at corpus scale."""
    from makinage_spark import vectors

    d = f"/tmp/mk_ivf_{uuid.uuid4().hex[:8]}"
    rows = [
        (i, [float((i * 13) % 7) - 3.0, float((i * 5) % 11) - 5.0, 1.0])
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = vectors.ivf_centroids(df, n_cells=4, sample_rows=400, iters=3, seed=7)
    vectors.ivf_write_index(df, d, cents)
    q = [1.0, -2.0, 1.0]
    out = vectors.ivf_topk_indexed(spark, d, cents, q, k=5, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan") :]
    assert "PartitionFilters" in scan
    pf = scan.split("PartitionFilters:")[1].split("]")[0]
    assert "cell" in pf  # probe filter prunes at planning time
    # parity: indexed search == in-plan-assigned search on the same probes
    direct = vectors.ivf_topk(df, cents, q, k=5, nprobe=2)
    assert [tuple(r) for r in out.collect()] == [tuple(r) for r in direct.collect()]
    shutil.rmtree(d, ignore_errors=True)
