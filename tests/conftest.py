from __future__ import annotations

import pytest

from arango_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("arango_etl_spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
