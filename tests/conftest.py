import pytest

from boatrace_database_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("boatrace-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
