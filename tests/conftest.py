import pytest

from makinage_spark import get_spark


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
