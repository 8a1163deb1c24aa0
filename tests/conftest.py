import pytest

from anything2rdf_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="a2r-tests", shuffle_partitions=4)
    yield s
    s.stop()
