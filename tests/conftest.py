from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from ner_spark.session import get_spark

    spark = get_spark(
        app_name="ner-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "2g", "spark.sql.warehouse.dir": "/tmp/ner-spark-wh"},
    )
    yield spark
    spark.stop()
