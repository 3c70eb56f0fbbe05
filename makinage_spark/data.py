"""rs.data-equivalent windowing: count windows (``roll``), time windows,
sessionization (``split``).

Reference semantics:
- ``rs.data.roll(window=w, stride=s, pipeline)`` — count-based sliding/tumbling
  windows; window==stride is tumbling; only *complete* windows emit
  (README.rst:63-90: [1..7] with roll(3,3)+mean → [2.0, 5.0]; the trailing
  partial [7] is dropped).
- ``rs.data.split(predicate, pipeline)`` — split the stream into segments where
  a key function changes (sessions, days) (public rxsci API, SURVEY §2.2).
- time windows/sampling — public rxsci API (SURVEY §2.2).

Batch implementations are pure Column/Window expressions. Streaming
count-windows need custom state — see ``makinage_spark.streaming.stateful``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from makinage_spark.ops.core import ColumnLike, _col, _window


def roll(
    window: int,
    stride: int,
    aggs: dict[str, Column],
    order_by: list[ColumnLike],
    by: list[str] | None = None,
    window_col: str = "window_id",
):
    """Count-based windows (``rs.data.roll``, README.rst:63-68).

    Each key's records are ordered by ``order_by`` and numbered 0..n-1; window
    ``j`` covers rows ``[j*stride, j*stride + window)``; only windows with
    exactly ``window`` rows emit (golden: README.rst:77-90).

    Physical plan: one shuffle on ``by`` (row_number), then for overlapping
    windows (stride < window) an ``explode`` of at most ``ceil(window/stride)``
    window-ids per row — the duplication factor is window/stride, independent
    of data volume — then a second keyed aggregation. For tumbling windows
    (stride == window) the explode degenerates to a single id and Catalyst
    folds it into one projection.

    ``by=None`` = the reference's single global stream: correct, but the
    row-numbering is single-partition — at scale always provide ``by``.
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")

    def _op(df: DataFrame) -> DataFrame:
        w = _window(by, order_by)
        rn = F.row_number().over(w) - F.lit(1)
        df = df.withColumn("__rn", rn)
        # window j contains rn  ⟺  max(0, ceil((rn-window+1)/stride)) <= j <= floor(rn/stride)
        lo = F.greatest(F.lit(0), F.ceil((F.col("__rn") - F.lit(window - 1)) / F.lit(stride)))
        hi = F.floor(F.col("__rn") / F.lit(stride))
        df = df.withColumn(window_col, F.explode(F.sequence(lo, hi)))
        keys = [*(by or []), window_col]
        out = df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("__n"),
            *[a.alias(n) for n, a in aggs.items()],
        )
        return out.filter(F.col("__n") == window).drop("__n")

    return _op


def time_window(
    ts: ColumnLike,
    duration: str,
    slide: str | None = None,
    aggs: dict[str, Column] | None = None,
    by: list[str] | None = None,
    start_col: str = "window_start",
    end_col: str = "window_end",
):
    """Time-based tumbling/sliding windows (rxsci time windows, SURVEY §2.2) —
    Spark's native ``window()`` grouping; identical code on batch and streaming
    DataFrames (add ``withWatermark`` upstream for streaming lateness — the
    reference's only lateness story is ``merge_lookup_depth``,
    makinage/operator.py:61-63, which watermarks subsume)."""
    aggs = aggs or {"n": F.count(F.lit(1))}

    def _op(df: DataFrame) -> DataFrame:
        win = F.window(_col(ts), duration, slide) if slide else F.window(_col(ts), duration)
        keys = [*(by or []), win.alias("__w")]
        out = df.groupBy(*keys).agg(*[a.alias(n) for n, a in aggs.items()])
        return out.select(
            *(by or []),
            F.col("__w.start").alias(start_col),
            F.col("__w.end").alias(end_col),
            *aggs.keys(),
        )

    return _op


def split(
    ts: ColumnLike,
    gap: str,
    aggs: dict[str, Column] | None = None,
    by: list[str] | None = None,
    session_col: str = "session_id",
):
    """Sessionization — segment each key's stream where the inter-record gap
    exceeds ``gap`` (``rs.data.split`` with a time predicate, SURVEY §2.2).

    Batch: gaps-and-islands with window functions (lag → boundary flag →
    running sum = session id), one shuffle on ``by``. Streaming: use
    ``F.session_window`` via :func:`session_window` instead.

    Emits one row per session with the given aggregates plus session bounds.
    """
    aggs = aggs or {"n": F.count(F.lit(1))}
    gap_interval = F.expr(f"INTERVAL {gap}")

    def _op(df: DataFrame) -> DataFrame:
        w = _window(by, [ts])
        prev = F.lag(_col(ts)).over(w)
        new_session = (prev.isNull() | (_col(ts) > prev + gap_interval)).cast("int")
        df2 = df.withColumn("__new", new_session).withColumn(
            session_col,
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        keys = [*(by or []), session_col]
        return df2.groupBy(*keys).agg(
            F.min(_col(ts)).alias("session_start"),
            F.max(_col(ts)).alias("session_end"),
            *[a.alias(n) for n, a in aggs.items()],
        )

    return _op


def session_window(
    ts: ColumnLike,
    gap: str,
    aggs: dict[str, Column] | None = None,
    by: list[str] | None = None,
):
    """Native session windows (``F.session_window``) — the streaming-capable
    form of :func:`split`; state is evicted by watermark."""
    aggs = aggs or {"n": F.count(F.lit(1))}

    def _op(df: DataFrame) -> DataFrame:
        win = F.session_window(_col(ts), gap)
        out = df.groupBy(*(by or []), win.alias("__w")).agg(
            *[a.alias(n) for n, a in aggs.items()]
        )
        return out.select(
            *(by or []),
            F.col("__w.start").alias("session_start"),
            F.col("__w.end").alias("session_end"),
            *aggs.keys(),
        )

    return _op


def pack_sequences(
    df: DataFrame,
    token_col: ColumnLike,
    budget: int,
    order_by: list[ColumnLike],
    by: list[str] | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document to the
    fixed-token-budget training sequence its *start offset* falls in, under a
    deterministic order. Adds ``seq_id``; ``floor(cumsum_exclusive / budget)``.

    The standard LLM pretraining packer (concatenate the corpus, cut every
    ``budget`` tokens) expressed relationally: a running sum over a window,
    partitioned by ``by`` (e.g. source shard) so at 100 TB the cumsum is
    per-partition-key and never a single global serial scan. Documents may
    straddle a boundary — exactly like concat-and-chunk, where a straddling
    document contributes tokens to two physical sequences; seq assignment
    here follows the start offset.
    """
    order = [_col(c) for c in order_by]
    w = Window.partitionBy(*(by or [])).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tok = _col(token_col)
    cum = F.sum(tok).over(w)
    return df.withColumn(
        "seq_id", F.floor((cum - tok).cast("double") / F.lit(budget)).cast("bigint")
    )


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each column.

    Rows sorted by this key cluster so that ANY prefix range of the key is a
    tight hyper-rectangle in ALL dimensions at once — the layout trick behind
    multi-column data skipping (Delta/Iceberg OPTIMIZE ZORDER BY): write
    parquet with ``df.repartitionByRange(n, zkey).sortWithinPartitions(zkey)``
    and min/max row-group stats prune scans filtered on *either* column,
    where a plain sort only skips on the leading one.

    Inputs must already be non-negative integers below ``2**bits`` (bucketize
    first — e.g. ``F.col("user_id") % 256``). Pure JVM bit arithmetic
    (shift/and/or), whole-stage-codegen friendly; the expression tree is
    ``bits × len(cols)`` static terms, no UDF.
    """
    n = len(cols)
    key = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1)),
                    b * n + i,
                )
            )
    return key
