from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pbf2json_spark.session import get_spark

    s = get_spark("pbf2json_spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
