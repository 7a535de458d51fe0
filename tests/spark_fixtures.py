"""Shared session-scoped Spark fixture helpers."""

import pytest

from pink_spider_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pink-spider-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()
