from __future__ import annotations

import pytest

from sparkcheck.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=8, app="sparkcheck-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
