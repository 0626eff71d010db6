from __future__ import annotations

import pytest

from kgforge.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="kgforge-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
