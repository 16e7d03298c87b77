import os
import sys

import pytest

# tests must import the repo package regardless of pytest rootdir config
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from exstruct_spark.engine import default_session

    s = default_session(app="exstruct-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
