"""Pipeline composition: the Rx ``obs.pipe(op1, op2, ...)`` shape on DataFrames.

The reference's programming model is ``rx.Observable.pipe(*operators)``
(README.rst:58-90). Here an *operator* is any callable
``DataFrame -> DataFrame``; ``pipe`` folds them left-to-right, which is exactly
``df.transform`` chaining. The composed result is still one declarative plan —
Catalyst sees through the composition, so pushdown/pruning work across operator
boundaries (unlike the reference, where each Rx operator is an opaque Python
closure; SURVEY §4.1).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

Operator = Callable[[DataFrame], DataFrame]


def pipe(df: DataFrame, *operators: Operator) -> DataFrame:
    """Apply ``operators`` to ``df`` in order. ``pipe(df)`` is ``df``."""
    for op in operators:
        df = op(df)
    return df


def compose(*operators: Operator) -> Operator:
    """Fuse several operators into one ``DataFrame -> DataFrame`` callable."""

    def _composed(df: DataFrame) -> DataFrame:
        return pipe(df, *operators)

    return _composed
