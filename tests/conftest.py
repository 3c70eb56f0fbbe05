import contextlib

import pytest

from makinage_spark import get_spark


@contextlib.contextmanager
def broadcast_disabled(spark):
    """Disable auto-broadcast for a block, restoring whatever threshold the
    session actually had (ADVICE r10: hard-coded 10 MiB restores silently
    re-configure the shared session fixture if its default ever changes)."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="makinage_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_confs={"spark.ui.enabled": "false", "spark.sql.warehouse.dir": "/tmp/spark-wh"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
