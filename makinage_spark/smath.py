"""rs.math-equivalent numeric aggregates (reference: ``rs.math.mean`` et al.,
README.rst:66; t-digest distributions ``rs.math.dist``, README.rst:186).

Two emission modes, mirroring the reference's ``reduce`` flag:

- ``reduce=True``  — terminal aggregate only → ``groupBy().agg()`` (Spark's
  default; partial map-side aggregation then a single shuffle on the key).
- ``reduce=False`` — running value emitted per record (Rx ``scan`` shape) →
  window aggregate over ``rowsBetween(unboundedPreceding, currentRow)``.

All of these are built-in JVM aggregate expressions — no Python in the hot
path. At 100 TB the terminal form is one shuffle with map-side combine; the
running form is one shuffle + per-key local sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from makinage_spark.ops.core import ColumnLike, _col, _window

#: name → aggregate builder; the rs.math surface (README.rst:66 evidences
#: ``rs.math.mean``; the rest are the public rxsci API, SURVEY §2.2).
AGGREGATES: dict[str, Column] = {
    "sum": F.sum,
    "count": F.count,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "variance": F.var_samp,
    "stddev": F.stddev_samp,
}


def _aggregate(
    name: str,
    source: ColumnLike,
    alias: str | None,
    reduce: bool,
    by: list[str] | None,
    order_by: list[ColumnLike] | None,
):
    builder = AGGREGATES[name]
    out = alias or name

    def _op(df: DataFrame) -> DataFrame:
        if reduce:
            agg = builder(_col(source)).alias(out)
            if by:
                return df.groupBy(*by).agg(agg)
            return df.agg(agg)
        if not order_by:
            raise ValueError(f"{name}(reduce=False) requires order_by (running emission)")
        w = _window(by, order_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return df.withColumn(out, builder(_col(source)).over(w))

    return _op


def mean(source: ColumnLike, alias=None, reduce=True, by=None, order_by=None):
    """``rs.math.mean`` (README.rst:66)."""
    return _aggregate("mean", source, alias, reduce, by, order_by)


def sum(source: ColumnLike, alias=None, reduce=True, by=None, order_by=None):  # noqa: A001
    return _aggregate("sum", source, alias, reduce, by, order_by)


def count(source: ColumnLike, alias=None, reduce=True, by=None, order_by=None):
    return _aggregate("count", source, alias, reduce, by, order_by)


def min(source: ColumnLike, alias=None, reduce=True, by=None, order_by=None):  # noqa: A001
    return _aggregate("min", source, alias, reduce, by, order_by)


def max(source: ColumnLike, alias=None, reduce=True, by=None, order_by=None):  # noqa: A001
    return _aggregate("max", source, alias, reduce, by, order_by)


def variance(source: ColumnLike, alias=None, reduce=True, by=None, order_by=None):
    return _aggregate("variance", source, alias, reduce, by, order_by)


def stddev(source: ColumnLike, alias=None, reduce=True, by=None, order_by=None):
    return _aggregate("stddev", source, alias, reduce, by, order_by)


# ---------------------------------------------------------------------------
# Distributions (rs.math.dist — t-digest quantiles/histograms, README.rst:186)
# ---------------------------------------------------------------------------


def quantiles(
    source: ColumnLike,
    probabilities: list[float],
    alias: str = "quantiles",
    by: list[str] | None = None,
    exact: bool = False,
    accuracy: int = 10000,
):
    """Streaming-quantile equivalent of ``rs.math.dist`` (t-digest).

    Default is ``approx_percentile`` — Spark's QuantileSummaries sketch: a
    mergeable summary, so partial sketches combine across partitions exactly
    like t-digest merges (same asymptotics, different sketch). ``exact=True``
    uses the exact ``percentile`` aggregate (sorts per group — fine to a few
    hundred million rows per group, not the default at 100 TB).
    """

    def _op(df: DataFrame) -> DataFrame:
        probs = F.array(*[F.lit(p) for p in probabilities])
        if exact:
            agg = F.percentile(_col(source), probs).alias(alias)
        else:
            agg = F.approx_percentile(_col(source), probs, F.lit(accuracy)).alias(alias)
        if by:
            return df.groupBy(*by).agg(agg)
        return df.agg(agg)

    return _op


def histogram(
    source: ColumnLike,
    bin_width: float,
    alias_bucket: str = "bucket",
    alias_count: str = "n",
    by: list[str] | None = None,
):
    """Fixed-width histogram (the KDnuggets real-time-histogram use case the
    reference links, README.rst:186): bucket = floor(x / bin_width). Exact, one
    shuffle with map-side combine; bucket count is data-independent so this
    holds at any scale."""

    def _op(df: DataFrame) -> DataFrame:
        bucket = F.floor(_col(source) / F.lit(bin_width)).alias(alias_bucket)
        keys = [*(by or []), bucket]
        return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias_count))

    return _op
