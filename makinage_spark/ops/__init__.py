"""rs.ops-equivalent operator surface (reference: rxsci ``rs.ops``, used at
makinage/sample/processor.py:6-14, makinage/serve/serve.py:82-148).

Every operator is a factory returning a ``DataFrame -> DataFrame`` callable, so
pipelines read like the reference's ``obs.pipe(rs.ops.map(f), rs.ops.filter(p))``
while compiling to a single Catalyst plan.
"""

from makinage_spark.ops.core import (
    assert_,
    buffer_with_count,
    debounce,
    dematerialize,
    do_action,
    distinct,
    distinct_until_changed,
    filter,
    first,
    flat_map,
    ignore_elements,
    group_by,
    last,
    last_or_default,
    map,
    materialize,
    multiplex,
    pairwise,
    sample,
    scan,
    skip,
    starmap,
    start_with,
    take,
    take_last,
    tee_map,
    with_latest_from,
)

__all__ = [
    "map",
    "starmap",
    "filter",
    "flat_map",
    "scan",
    "distinct",
    "distinct_until_changed",
    "take",
    "take_last",
    "skip",
    "start_with",
    "buffer_with_count",
    "last_or_default",
    "first",
    "last",
    "group_by",
    "tee_map",
    "multiplex",
    "materialize",
    "dematerialize",
    "debounce",
    "pairwise",
    "sample",
    "with_latest_from",
    "assert_",
    "do_action",
    "ignore_elements",
]
