import pytest


@pytest.fixture(scope="session")
def spark():
    from pyrate_spark.session import get_session
    s = get_session("pyrate-spark-tests", parallelism=4,
                    shuffle_partitions=8)
    yield s
    s.stop()
