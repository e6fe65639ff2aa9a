from __future__ import annotations

import os

import pytest

from otokuna_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # tools/invariance_check.py --streaming reruns the streaming
    # batch-equivalence tests under adversarial settings via these env
    # vars; the default run keeps the usual 8 partitions / UTC.
    n_parts = int(os.environ.get("OTOKUNA_TEST_SHUFFLE_PARTITIONS", "8"))
    s = get_spark("otokuna-tests", shuffle_partitions=n_parts)
    tz = os.environ.get("OTOKUNA_TEST_TZ")
    if tz:
        s.conf.set("spark.sql.session.timeZone", tz)
    s.sparkContext.setLogLevel("ERROR")
    yield s
