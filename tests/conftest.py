import pytest


@pytest.fixture(scope="session")
def spark():
    from s2geography_spark.session import get_spark
    s = get_spark("tests", cpus=4, shuffle_partitions=8)
    yield s
