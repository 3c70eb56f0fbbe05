"""Core record operators (rs.ops equivalents), Spark-first.

Reference semantics and usage sites:
- ``rs.ops.map`` / ``ops.starmap``  — makinage/sample/processor.py:10-12,
  makinage/serve/serve.py:130-143 (per-record projection).
- ``rs.ops.filter``                 — makinage/serve/serve.py:145.
- ``rs.ops.flat_map``               — makinage/serve/serve.py:144 (1→N).
- ``rs.ops.scan``                   — makinage/serve/serve.py:88-101 (running fold).
- ``rs.ops.group_by``               — public rxsci API (SURVEY §2.2).
- ``rs.ops.with_latest_from``       — makinage/serve/serve.py:140-141.
- ``ops.take/skip/first``           — makinage/makinage.py:77, makinage/config.py:33,
  makinage/model_publisher/model_publisher.py:88.
- ``rs.ops.distinct`` / ``tee_map`` / ``multiplex`` / ``assert_`` — public rxsci
  API (SURVEY §2.2).

Design rule: the fast path is always a Column expression (JVM, whole-stage
codegen); an Arrow-batched pandas function is the *escape hatch* for arbitrary
Python logic, mirroring the reference's "any Python lambda" surface
(makinage/util.py:5-23) without its per-record interpreter cost.

At 100 TB: every operator here is either narrow (map/filter/flat_map — no
shuffle) or declares its shuffle key explicitly (scan/group_by/distinct take
``by=`` so the shuffle is on the user's key, skew-handled by AQE). Nothing
collects to the driver.
"""

from __future__ import annotations

import builtins
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ColumnLike = Column | str


def _col(c: ColumnLike) -> Column:
    return F.expr(c) if isinstance(c, str) else c


def _window(by: list[str] | None, order_by: list[ColumnLike] | None):
    w = Window.partitionBy(*(by or []))
    if order_by:
        w = w.orderBy(*[_col(c) for c in order_by])
    return w


# ---------------------------------------------------------------------------
# Projection
# ---------------------------------------------------------------------------


def map(_fn: Callable[..., Any] | None = None, _schema: str | None = None, **cols: ColumnLike):
    """Per-record transform (``rs.ops.map``, makinage/sample/processor.py:10-12).

    Fast path — ``map(total=F.col("price") * qty, flag=F.lit(1))`` adds/replaces
    columns via expressions (codegen, no Python).

    Escape hatch — ``map(_fn=batch_fn, _schema="x long, y string")`` where
    ``batch_fn`` maps an iterator of pandas DataFrames (Arrow batches); this is
    the reference's arbitrary-Python-lambda surface, vectorized.
    """
    if _fn is not None:
        if _schema is None:
            raise ValueError("map(_fn=...) requires _schema")

        def _op_fn(df: DataFrame) -> DataFrame:
            return df.mapInPandas(_fn, schema=_schema)

        return _op_fn

    resolved = {name: _col(c) for name, c in cols.items()}

    def _op(df: DataFrame) -> DataFrame:
        return df.withColumns(resolved)

    return _op


# ``ops.starmap`` unpacks tuple records into fn args (makinage/config.py:18).
# In a columnar model every map is a starmap — columns are already unpacked.
starmap = map


def tee_map(**outputs: ColumnLike):
    """Fan-out compute: run several computations on the same record and combine
    the results per item (``rs.ops.tee_map``, public rxsci API).

    In a columnar engine this is simply a multi-expression projection — each
    kwarg is one "branch", all evaluated in a single pass with zero extra
    traversals (the reference re-subscribes the stream per branch).
    """
    resolved = {name: _col(c) for name, c in outputs.items()}

    def _op(df: DataFrame) -> DataFrame:
        return df.select(*[c.alias(n) for n, c in resolved.items()])

    return _op


# ---------------------------------------------------------------------------
# Filtering / limiting
# ---------------------------------------------------------------------------


def filter(predicate: ColumnLike):
    """Keep records matching ``predicate`` (``rs.ops.filter``,
    makinage/serve/serve.py:145). Column expression or SQL string — pushed down
    to the scan by Catalyst when possible."""
    pred = _col(predicate)

    def _op(df: DataFrame) -> DataFrame:
        return df.filter(pred)

    return _op


def distinct(*keys: str, within_watermark: bool = False):
    """Drop duplicate records by key (``rs.ops.distinct``, public rxsci API).

    Batch: ``dropDuplicates`` (hash shuffle on the key — AQE handles skew).
    Streaming: pass ``within_watermark=True`` after ``withWatermark`` to bound
    state (``dropDuplicatesWithinWatermark``) — the reference has no state
    eviction at all, so bounded state is strictly stronger.
    """

    def _op(df: DataFrame) -> DataFrame:
        cols = list(keys) or None
        if within_watermark and df.isStreaming:
            return df.dropDuplicatesWithinWatermark(cols)
        return df.dropDuplicates(cols)

    return _op


def take(n: int, order_by: list[ColumnLike] | None = None, by: list[str] | None = None):
    """First/top ``n`` records (``ops.take``, makinage/makinage.py:77).

    - no args: ``limit(n)``.
    - ``order_by``: global top-k — Spark plans TakeOrderedAndProject (per-partition
      heap + driver merge of k·partitions rows, never a full sort: safe at 100 TB).
    - ``by`` + ``order_by``: per-key top-k via ``row_number`` (one shuffle on key).
    """

    def _op(df: DataFrame) -> DataFrame:
        if by:
            if not order_by:
                raise ValueError("take(by=...) requires order_by")
            w = _window(by, order_by)
            return (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= n)
                .drop("__rn")
            )
        if order_by:
            return df.orderBy(*[_col(c) for c in order_by]).limit(n)
        return df.limit(n)

    return _op


def skip(n: int, order_by: list[ColumnLike], by: list[str] | None = None):
    """Skip the first ``n`` records in ``order_by`` order (``ops.skip``,
    makinage/config.py:33). Requires an explicit order — arrival order is not a
    meaningful concept for a distributed scan."""

    def _op(df: DataFrame) -> DataFrame:
        w = _window(by, order_by)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") > n)
            .drop("__rn")
        )

    return _op


def first(order_by: list[ColumnLike], by: list[str] | None = None):
    """First record (per key) in event order (``ops.first``,
    makinage/model_publisher/model_publisher.py:88)."""
    return take(1, order_by=order_by, by=by) if by else take(1, order_by=order_by)


def last(order_by: list[ColumnLike], by: list[str] | None = None):
    """Final record (per key) — the Rx ``last``/``reduce=True`` shape
    (README.rst:66): emit only the terminal state."""
    rev = [_col(c).desc() for c in order_by]
    return take(1, order_by=rev, by=by) if by else take(1, order_by=rev)


def sample(fraction: float, seed: int | None = None):
    """Bernoulli sample (``rs.ops.sample`` family, public rxsci API)."""

    def _op(df: DataFrame) -> DataFrame:
        return df.sample(fraction=fraction, seed=seed)

    return _op


def take_last(n: int, order_by: list[ColumnLike], by: list[str] | None = None):
    """Final ``n`` records (per key) in event order — rx ``take_last``
    (public rxsci/Rx API, SURVEY §2.2). The dual of :func:`take` with an
    ``order_by``: top-n on the REVERSED order, so globally Spark plans
    TakeOrderedAndProject (per-partition heap, never a full sort) and the
    per-key form is one row_number shuffle on the key."""
    rev = [_col(c).desc() for c in order_by]
    return take(n, order_by=rev, by=by)


def start_with(rows: list[tuple], schema: str):
    """Prepend literal seed records to the stream — rx ``start_with``
    (the config-stream bootstrap pattern, makinage/config.py). A
    driver-literal union: the seed side is a LocalTableScan, no shuffle."""

    def _op(df: DataFrame) -> DataFrame:
        seed = df.sparkSession.createDataFrame(rows, schema)
        return seed.unionByName(df.select(*seed.columns))

    return _op


def last_or_default(
    order_by: list[ColumnLike], default: dict[str, Any]
):
    """Final record of the stream, or a literal default when the stream is
    empty — rx ``last_or_default`` (public Rx API, SURVEY §2.2).

    Spark-native shape: a single ``max_by(struct(*), struct(order))``
    aggregate — one map-side-combined reduction to ONE row, never a sort —
    which is NULL over empty input and is coalesced with the default
    struct. ``default`` must provide a value for every column; each value
    is cast to the column's type."""

    def _op(df: DataFrame) -> DataFrame:
        cols = df.columns
        missing = [c for c in cols if c not in default]
        if missing:
            raise ValueError(f"last_or_default missing defaults for {missing}")
        order_struct = F.struct(*[_col(c) for c in order_by])
        dstruct = F.struct(
            *[
                F.lit(default[c]).cast(df.schema[c].dataType).alias(c)
                for c in cols
            ]
        )
        agged = df.agg(
            F.max_by(F.struct(*cols), order_struct).alias("__s")
        )
        return agged.select(
            F.coalesce(F.col("__s"), dstruct).alias("__s")
        ).select("__s.*")

    return _op


def buffer_with_count(
    count: int,
    order_by: list[ColumnLike],
    by: list[str] | None = None,
    skip: int | None = None,
    items_from: list[str] | None = None,
):
    """Group consecutive records into count-sized buffers — rx
    ``buffer_with_count(count, skip)`` (public rxsci/Rx API, SURVEY §2.2).

    ``skip=None`` (or ``skip == count``) gives tumbling buffers: record
    ``rn`` (1-based in ``order_by`` order, per ``by`` key) lands in bucket
    ``(rn-1) / count``. ``skip < count`` gives overlapping buffers starting
    every ``skip`` records; membership is expanded with an in-row
    ``sequence()`` + ``explode`` (each record belongs to at most
    ``ceil(count/skip)`` buffers — bounded fan-out, no self-join).

    Emits ``(by..., buffer_id, items, n_items)`` where ``items`` preserves
    event order. One shuffle (row_number on the key) + one aggregation.
    ``items_from`` selects which columns go into the item structs (default:
    all non-key columns); with a single item column, ``items`` is a flat
    array of its values (the rx scalar-buffer shape)."""
    step = count if skip is None else int(skip)
    if step <= 0 or count <= 0:
        raise ValueError("buffer_with_count needs count > 0 and skip > 0")

    def _op(df: DataFrame) -> DataFrame:
        keys = by or []
        item_cols = items_from or [c for c in df.columns if c not in keys]
        w = _window(by, order_by)
        numbered = df.withColumn("__rn", F.row_number().over(w))
        if step == count:
            expanded = numbered.withColumn(
                "__b", ((F.col("__rn") - 1) / count).cast("bigint")
            )
        else:
            # buffers s cover rn in [s*step+1, s*step+count]:
            # s from ceil((rn-count)/step) (clamped at 0) to (rn-1)/step
            s_min = F.greatest(
                F.lit(0).cast("bigint"),
                F.ceil((F.col("__rn") - count) / F.lit(step)).cast("bigint"),
            )
            s_max = F.floor((F.col("__rn") - 1) / F.lit(step)).cast("bigint")
            expanded = numbered.withColumn(
                "__b", F.explode(F.sequence(s_min, s_max))
            )
        ordered = F.array_sort(
            F.collect_list(F.struct(F.col("__rn").alias("rn"), *item_cols))
        )
        if len(item_cols) == 1:
            items = F.transform(ordered, lambda s: s[item_cols[0]])
        else:
            items = F.transform(ordered, lambda s: s.dropFields("rn"))
        return expanded.groupBy(*keys, F.col("__b").alias("buffer_id")).agg(
            items.alias("items"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )

    return _op


# ---------------------------------------------------------------------------
# Expansion
# ---------------------------------------------------------------------------


def flat_map(
    expr: ColumnLike | None = None,
    alias: str = "value",
    outer: bool = False,
    _fn: Callable[..., Iterator] | None = None,
    _schema: str | None = None,
):
    """1→N expansion (``rs.ops.flat_map``, makinage/serve/serve.py:144).

    Fast path — ``flat_map(F.split("text", " "), alias="word")`` explodes an
    array expression (codegen ``Generate``; narrow, no shuffle).

    Escape hatch — ``flat_map(_fn=gen, _schema=...)``: ``mapInPandas`` where the
    Python function may emit any number of rows per input batch (the UDTF shape,
    SURVEY §2.3).
    """
    if _fn is not None:
        if _schema is None:
            raise ValueError("flat_map(_fn=...) requires _schema")

        def _op_fn(df: DataFrame) -> DataFrame:
            return df.mapInPandas(_fn, schema=_schema)

        return _op_fn

    if expr is None:
        raise ValueError("flat_map requires expr or _fn")
    e = _col(expr)

    def _op(df: DataFrame) -> DataFrame:
        exploded = F.explode_outer(e) if outer else F.explode(e)
        return df.withColumn(alias, exploded)

    return _op


def multiplex(tag: ColumnLike, alias: str = "stream"):
    """Tag records into logical substreams within one DataFrame
    (``rs.ops.multiplex``, public rxsci API). Demux is ``filter(col == tag)``;
    mux-aware grouped ops are ``group_by([alias, ...])``."""
    t = _col(tag)

    def _op(df: DataFrame) -> DataFrame:
        return df.withColumn(alias, t)

    return _op


# ---------------------------------------------------------------------------
# Stateful fold / grouping
# ---------------------------------------------------------------------------


def scan(
    by: list[str] | None,
    order_by: list[ColumnLike],
    **aggs: Column,
):
    """Running accumulator emitting every intermediate state (``rs.ops.scan``,
    makinage/serve/serve.py:88-101).

    ``scan(by=["user_id"], order_by=["ts"], running_sum=F.sum("value"))`` —
    each aggregate expression is evaluated over
    ``rowsBetween(unboundedPreceding, currentRow)``.

    Order is per-key (SURVEY §7.3: per-record global order is not meaningful in
    a distributed engine; the reference itself only has per-Kafka-partition
    order). One shuffle on ``by``; within-key order comes from a local sort.
    ``by=None`` means a single global stream — correct but single-partition;
    only for small control streams, never the 100 TB path.
    """
    w = _window(by, order_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def _op(df: DataFrame) -> DataFrame:
        return df.withColumns({name: agg.over(w) for name, agg in aggs.items()})

    return _op


def group_by(
    keys: list[str],
    aggs: dict[str, Column] | None = None,
    apply_fn: Callable | None = None,
    apply_schema: str | None = None,
):
    """Partition the stream into per-key substreams and aggregate/transform each
    (``rs.ops.group_by(key_mapper, pipeline)``, public rxsci API).

    - ``aggs`` — terminal aggregates per key (the ``reduce=True`` shape):
      ``group_by(["k"], aggs={"total": F.sum("v")})`` → ``groupBy().agg()``
      with map-side partial aggregation.
    - ``apply_fn``/``apply_schema`` — arbitrary per-group pandas transform via
      ``applyInPandas`` (the sub-pipeline escape hatch). At scale, a group must
      fit in one executor's memory — use only for bounded groups.
    """

    def _op(df: DataFrame) -> DataFrame:
        if aggs:
            return df.groupBy(*keys).agg(*[a.alias(n) for n, a in aggs.items()])
        if apply_fn is not None:
            if apply_schema is None:
                raise ValueError("group_by(apply_fn=...) requires apply_schema")
            return df.groupBy(*keys).applyInPandas(apply_fn, schema=apply_schema)
        raise ValueError("group_by requires aggs or apply_fn")

    return _op


# ---------------------------------------------------------------------------
# Stream combination
# ---------------------------------------------------------------------------


def with_latest_from(
    other: DataFrame,
    on: list[str] | None = None,
    left_ts: ColumnLike | None = None,
    right_ts: ColumnLike | None = None,
):
    """Enrich each record with the latest value of a side stream
    (``rs.ops.with_latest_from``, makinage/serve/serve.py:140-141): emits only
    on the primary stream; side values never trigger output.

    Batch semantics (event-time defined):

    - with ``left_ts``/``right_ts`` — as-of backward join: each left record gets
      the most recent right record with ``right_ts <= left_ts`` (per ``on`` key
      if given). Delegates to :func:`makinage_spark.joins.asof_join` — a single
      union + window pass, no per-key loop, no row explosion.
    - without timestamps — each record gets the single terminal value of
      ``other`` (a tiny control stream: model/config, makinage/serve/serve.py:
      128-137) via a broadcast cross join.

    Streaming: see ``makinage_spark.streaming.runtime.for_each_batch_with_latest``
    — control streams refresh per micro-batch, matching the reference's
    hot-swap granularity relaxation (SURVEY §7.3).
    """

    def _op(df: DataFrame) -> DataFrame:
        if left_ts is not None and right_ts is not None:
            from makinage_spark.joins import asof_join

            return asof_join(df, other, on=on or [], left_ts=left_ts, right_ts=right_ts)
        return df.crossJoin(F.broadcast(other.limit(1)))

    return _op


# ---------------------------------------------------------------------------
# Error channel (A20)
# ---------------------------------------------------------------------------


def materialize(
    attempt: ColumnLike,
    diagnostic: ColumnLike | None = None,
    kind_col: str = "kind",
    value_col: str = "value",
    error_col: str = "error",
    failed: ColumnLike | None = None,
):
    """Fold per-record failures into the data channel (``rx.materialize``,
    reference error-channel handoff makinage/driver/app_sink.py:69-73):
    every record flows on tagged ``kind = 'next' | 'error'`` instead of
    killing the pipeline.

    Spark-native contract: expressions never raise per-row — the fallible
    step is expressed with a ``try_``-family expression (``try_cast``,
    ``try_parse_json``, ``try_divide``, ``try_element_at``) whose NULL means
    failure; ``materialize`` turns that NULL into an ``error`` record
    carrying ``diagnostic``. This keeps the error channel fully data-plane
    (one narrow projection, no Python, streams unchanged), the distributed
    analogue of Rx's OnError-as-data. Demux with :func:`dematerialize` or a
    plain filter; route the error branch to a dead-letter sink.

    By default failure is detected as ``attempt IS NULL`` — which means a
    legitimately-NULL OnNext value (e.g. ``try_element_at`` over a source
    column that is genuinely null) is indistinguishable from a parse
    failure. When NULL is a valid value, pass an explicit ``failed``
    predicate column (e.g. ``src.isNotNull() & att.isNull()``) to
    distinguish null-as-value from null-as-failure."""
    att = _col(attempt)

    def _op(df: DataFrame) -> DataFrame:
        is_err = _col(failed) if failed is not None else att.isNull()
        kind = F.when(is_err, F.lit("error")).otherwise(F.lit("next"))
        out = df.withColumn(value_col, att).withColumn(kind_col, kind)
        diag = _col(diagnostic) if diagnostic is not None else F.lit(None)
        return out.withColumn(
            error_col, F.when(F.col(kind_col) == "error", diag)
        )

    return _op


def dematerialize(
    kind_col: str = "kind", error_col: str = "error"
):
    """Inverse of :func:`materialize`: keep only the ``next`` records and
    drop the channel tags (the reference's downstream operators see clean
    OnNext values)."""

    def _op(df: DataFrame) -> DataFrame:
        return df.filter(F.col(kind_col) == "next").drop(kind_col, error_col)

    return _op


def debounce(
    by: str | list[str],
    ts: ColumnLike,
    gap: str,
    order_by: list[ColumnLike] | None = None,
):
    """Event-time debounce (``rx.ops.debounce`` / trailing-edge): keep a
    record only when NO later record of the same key follows within ``gap``
    — each burst collapses to its final record, the quiet-period emission Rx
    defines. Deterministic because the quiet period is measured in event
    time, not arrival time.

    One window pass (single shuffle on the key + per-key sort): ``lead(ts)``
    against ``ts + gap``. The last record per key always survives (no
    follower). Burst-collapse for sensor chatter, retry storms, UI event
    streams."""
    keys = [by] if isinstance(by, str) else list(by)
    tcol = _col(ts)
    order = [tcol] if order_by is None else [_col(c) for c in order_by]

    def _op(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*keys).orderBy(*order)
        nxt = F.lead(tcol).over(w)
        return (
            df.withColumn("__next_ts", nxt)
            .filter(
                F.col("__next_ts").isNull()
                | (F.col("__next_ts") > tcol + F.expr(f"INTERVAL {gap}"))
            )
            .drop("__next_ts")
        )

    return _op


# ---------------------------------------------------------------------------
# Assertions (test surface)
# ---------------------------------------------------------------------------


def assert_(predicate: ColumnLike, message: str = "assert_ failed"):
    """Pipeline invariant check (``rs.ops.assert_``, used by the reference's
    driver tests, tests/driver/test_app_source.py:79). Eagerly verifies no record
    violates ``predicate``; returns the input unchanged. Test helper — forces a
    job, so keep it out of production pipelines."""
    pred = _col(predicate)

    def _op(df: DataFrame) -> DataFrame:
        bad = df.filter(~pred)
        if not bad.isEmpty():
            examples = [r.asDict() for r in bad.limit(3).collect()]
            raise AssertionError(f"{message}: {examples}")
        return df

    return _op


def distinct_until_changed(key: str | list[str], order_by: str, *value_cols: str):
    """Drop CONSECUTIVE duplicates per key (``rs.ops.distinct_until_changed``,
    public rxsci API): keep a record only when any of ``value_cols`` differs
    from the previous record in ``order_by`` order within the key.

    One window pass (single shuffle on the key); null-safe comparison so a
    null→value or value→null transition counts as a change. The first record
    per key always passes (lag is null row)."""
    from pyspark.sql import Window

    keys = [key] if isinstance(key, str) else list(key)

    def _op(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*keys).orderBy(order_by)
        changed = F.lit(False)
        for c in value_cols:
            changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
        first = F.lag(order_by).over(w).isNull()
        return (
            df.withColumn("__changed", changed | first)
            .filter(F.col("__changed"))
            .drop("__changed")
        )

    return _op


def pairwise(key: str | list[str], order_by: str, value_col: str):
    """Emit each record with its predecessor's value (``rs.ops.pairwise`` /
    ``ops.pairwise``): adds ``prev_<value_col>`` via lag over the key.
    Records with no predecessor get null (Rx pairwise drops the first pair;
    filter ``prev is not null`` for that exact contract)."""
    from pyspark.sql import Window

    keys = [key] if isinstance(key, str) else list(key)

    def _op(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*keys).orderBy(order_by)
        return df.withColumn(f"prev_{value_col}", F.lag(value_col).over(w))

    return _op


def do_action(observation, *metrics: ColumnLike):
    """Side-effect tap (``rx.ops.do_action``; the reference taps streams for
    logging/queue-depth feedback, makinage/driver/app_sink.py:53-67).

    Spark-first reinterpretation: a per-record Python callback would put a
    Python boundary in the hot path just to LOOK at rows, so the tap is
    ``df.observe`` — named aggregate metrics collected as a zero-cost side
    effect of whatever action executes the plan, rows passed through
    untouched. ``observation`` is a ``pyspark.sql.Observation`` (batch:
    read ``observation.get`` after the action) or a string name (streaming:
    metrics arrive on the ``QueryProgressEvent.observedMetrics`` map —
    exactly where the reference's queue-depth feedback lived).

    >>> obs = Observation("tap")
    >>> out = pipe(df, ops.do_action(obs, F.count(F.lit(1)).alias("n")))
    >>> out.collect(); obs.get["n"]
    """
    cols = [_col(m) for m in metrics]

    def _op(df: DataFrame) -> DataFrame:
        return df.observe(observation, *cols)

    return _op


def ignore_elements():
    """Drop every record, keep schema and completion semantics
    (``rx.ops.ignore_elements``; the reference's sink driver uses it to turn
    a tapped stream into a pure lifecycle signal,
    tests/driver/test_app_sink.py:28-30). ``filter(False)`` prunes to an
    empty scan at plan time — the cheapest possible "complete only"."""

    def _op(df: DataFrame) -> DataFrame:
        return df.filter(F.lit(False))

    return _op
