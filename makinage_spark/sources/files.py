"""File sources: parquet table loading with schema normalization, CSV ingest.

Parquet nanosecond timestamps: Spark has no TIMESTAMP(NANOS) type and rejects
such columns (PARQUET_TYPE_ILLEGAL) unless
``spark.sql.legacy.parquet.nanosAsLong=true``, which surfaces them as raw
nanos-since-epoch longs. :func:`load_table` converts those longs back to
``TimestampType`` (microsecond truncation) so downstream event-time operators
see real timestamps — the same value DuckDB/pyarrow produce for the same file.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Driver testdata tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nano_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet timestamp[ns] (read by Spark as long)."""
    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    return [f.name for f in schema if str(f.type) == "timestamp[ns]"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing nano-timestamps to TimestampType."""
    path = f"{sf_dir}/{name}.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in _nano_ts_columns(path):
        # integer division: nanos (~1.7e18) exceed double precision, so a
        # float divide-then-cast can be off by 1 µs
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the full testdata star schema (TESTDATA.md tables)."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def read_csv(spark: SparkSession, path: str, schema: str | None = None, **options) -> DataFrame:
    """CSV ingest (rs.container.csv equivalent, README.rst:73). Always pass a
    schema in production — inference is a full extra scan."""
    reader = spark.read.options(header="true", **options)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)
