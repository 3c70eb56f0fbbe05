"""Sources & sinks: files (parquet/csv/json) and Kafka wiring.

Reference: Kafka consumer/producer (makinage/operator.py:216-269), bounded pull
(makinage/data/pull.py:6-76), CSV via rxsci container (README.rst:73). Parquet
is this engine's fixture/batch format (the reference has none — SURVEY §2.3).
"""

from makinage_spark.sources.files import (
    load_table,
    load_tables,
    read_csv,
    write_bucketed,
)

__all__ = ["load_table", "load_tables", "read_csv", "write_bucketed"]
