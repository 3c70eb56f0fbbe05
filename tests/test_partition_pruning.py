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
