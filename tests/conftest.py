from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from joern_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="joern-spark-tests", shuffle_partitions=8)
    yield s
