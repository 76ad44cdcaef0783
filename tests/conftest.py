import pytest

from drought_t_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("drought-t-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
