import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from htmpark.job import build_session

    s = build_session("local[8]", shuffle_partitions=8, app_name="htmpark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def tmp_out():
    d = tempfile.mkdtemp(prefix="htmpark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
