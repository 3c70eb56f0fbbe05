"""The multiply sample operator (reference: makinage/sample/processor.py:6-14,
wired by config.sample.yml:1-17): parse the string value, multiply by
``config['multiply']``, emit as string. Golden: ``"5"`` → ``"15"``
(FIXTURES §1.1)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def multiply(config: dict, values: DataFrame) -> tuple[DataFrame]:
    factor = int(config.get("multiply", 1))
    out = values.withColumn(
        "value", (F.col("value").cast("long") * factor).cast("string")
    )
    return (out,)


def gen_range(start: int, end: int):
    """Sample app-source generator (offset-addressable: deterministic rows for
    any requested [start, end) index range — the replayability contract of
    sources.app_source)."""
    return ((i, str(i * 7)) for i in range(start, end))
