import sys

import pytest

sys.path.insert(0, "/root/repo")

@pytest.fixture(scope="session")
def spark():
    from hogzilla_spark import get_spark

    s = get_spark(app_name="hogzilla_tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
