from __future__ import annotations

import pytest

from evm_archive_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Small local session for tests; driver-visible behavior (ANSI default,
    # AQE) matches what the harness will run with.
    s = get_spark("evm-archive-spark-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
