from __future__ import annotations

import pytest

from otokuna_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("otokuna-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
