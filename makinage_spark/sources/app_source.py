"""App source connector as a Spark 4 Python Data Source (A5).

The reference wraps a user-provided Python observable/generator as a graph
source, pumping it on a dedicated thread with sleep-based rate limiting
(makinage/operator.py:202-215, makinage/driver/app_source.py:23-58). The
Spark-native equivalent is a custom Python Data Source whose rows come from a
user callable loaded by ``module:function`` spec — with two upgrades the
reference structurally cannot have:

- **offset-addressable replay**: the callable takes ``(start, end)`` row
  indices, so the streaming reader is exactly-once restartable from the
  checkpoint (the reference loses its position on crash);
- **partitioned batch reads**: the index range splits across ``partitions``
  input splits, so a batch read runs wide instead of on one thread.

Rate limiting becomes ``rows_per_batch`` (micro-batch sizing) instead of
sleeps — backpressure is the engine's trigger pacing (SURVEY A18: dropped in
favor of engine-managed flow control).

Usage::

    spark.dataSource.register(AppSource)
    df = (spark.read.format("makinage_app_source")
          .option("generator", "my_module:gen")       # gen(start, end) -> iterable of tuples
          .option("n", "10000")                        # total rows (batch mode)
          .option("partitions", "8")
          .option("schema", "id bigint, value string")
          .load())
    stream = (spark.readStream.format("makinage_app_source")
              .option("generator", "my_module:gen")
              .option("rows_per_batch", "1000").load())
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class AppSourceReader(DataSourceReader):
    def __init__(self, schema, options):
        self.spec = options["generator"]
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 4))

    def partitions(self):
        step = max(1, -(-self.n // self.num_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        from makinage_spark.plans.loader import import_function

        gen = import_function(self.spec)
        yield from gen(partition.start, partition.end)


class AppSourceStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema, options):
        self.spec = options["generator"]
        self.rows_per_batch = int(options.get("rows_per_batch", 1000))
        limit = options.get("n")
        self.limit = int(limit) if limit is not None else None

    def initialOffset(self) -> dict:
        return {"index": 0}

    def _pull(self, start: int, end: int):
        from makinage_spark.plans.loader import import_function

        gen = import_function(self.spec)
        return iter(list(gen(start, end)))

    def read(self, start: dict):
        lo = start["index"]
        hi = lo + self.rows_per_batch
        if self.limit is not None:
            hi = min(hi, self.limit)
        if hi <= lo:
            return iter([]), {"index": lo}
        return self._pull(lo, hi), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # exactly-once replay after restart: offsets address row indices
        return self._pull(start["index"], end["index"])


class AppSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "makinage_app_source"

    def schema(self):
        return self.options.get("schema", "id bigint, value string")

    def reader(self, schema: StructType) -> AppSourceReader:
        return AppSourceReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> AppSourceStreamReader:
        return AppSourceStreamReader(schema, self.options)
