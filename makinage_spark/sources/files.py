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
from pyspark.sql.types import TimestampNTZType

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


#: Tables above this row count get scan-parallelism repair (see load_table).
_PARALLELIZE_MIN_ROWS = 200_000

_meta_cache: dict[str, tuple[list[str], int, int]] = {}


def _parquet_meta(path: str) -> tuple[list[str], int, int]:
    """(nano-ts columns, num_rows, num_row_groups) — footer only, cached."""
    if path not in _meta_cache:
        try:
            f = pq.ParquetFile(path)
            nano = [x.name for x in f.schema_arrow if str(x.type) == "timestamp[ns]"]
            _meta_cache[path] = (nano, f.metadata.num_rows, f.num_row_groups)
        except Exception:
            _meta_cache[path] = ([], 0, 1)
    return _meta_cache[path]


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool = False
) -> DataFrame:
    """Load one testdata table, normalizing nano-timestamps to TimestampType.

    Scan-parallelism repair (``parallelize=True``): a parquet scan can't be
    split below row-group granularity, and the test fixtures are single-file/
    single-row-group — so heavy map-side work (many decimal aggregates per
    row) runs in ONE task regardless of cores. Opt-in round-robins the big
    tables across the default parallelism right after the (inherently serial)
    decode. OFF by default: the exchange costs ~1 full row-serialization pass,
    a net loss for scan→broadcast-join→agg shapes whose per-row work is light
    (measured 2× slower on TPC-H q5) and for anything that immediately
    shuffles on a key anyway. On a real lake (many files, 128 MB row groups)
    scan parallelism comes from splits and neither mode fires an extra
    exchange.
    """
    path = f"{sf_dir}/{name}.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # defensive: queries may run on a caller-provided session (the driver's);
    # event-time rendering (date_format/date_trunc over TimestampType) must be
    # UTC to match the timezone-naive DuckDB oracle regardless of host TZ
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    nano_cols, num_rows, row_groups = _parquet_meta(path)
    for c in nano_cols:
        # integer division: nanos (~1.7e18) exceed double precision, so a
        # float divide-then-cast can be off by 1 µs
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # micro-ts parquet surfaces as TIMESTAMP_NTZ (inferTimestampNTZ); unify to
    # session-TZ TimestampType so event-time functions (unix_micros, window,
    # date_format) behave identically across fixture vintages — value-
    # preserving because the session TZ is pinned UTC above
    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    cores = spark.sparkContext.defaultParallelism
    if parallelize and num_rows >= _PARALLELIZE_MIN_ROWS and row_groups < cores // 2:
        df = df.repartition(cores)
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


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str | list[str],
    buckets: int = 8,
    path: str | None = None,
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Persist a relation BUCKETED by its join/aggregation key — the disk
    layout that makes repeated equi-joins and aggs on that key
    exchange-free (the 100 TB co-location play: pay the shuffle once at
    write time, never again at read time).

    Two relations bucketed by the same key with the SAME bucket count
    join with zero Exchange on either side (pinned by
    tests/test_bucketed_join.py::test_write_bucketed_helper_exchange_free);
    a groupBy on the bucket key likewise skips its exchange. ``sort=True``
    additionally orders within buckets so sort-merge joins skip their
    per-partition sorts.

    Bucket metadata lives in the session catalog, so this goes through
    ``saveAsTable`` — a plain ``.parquet(path)`` write SILENTLY DROPS
    bucketing. Pass ``path`` to keep the data external (catalog entry
    points at your lake path); bucket count should target ~128 MB of the
    DOMINANT consumer's projection per bucket file, and must match across
    relations you intend to co-join.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(name)
