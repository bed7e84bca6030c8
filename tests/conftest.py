import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feathub_spark import default_spark_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    session = default_spark_session("feathub_spark_tests", cpus=4)
    yield session


@pytest.fixture()
def client(spark):
    from feathub_spark import FeathubClient

    return FeathubClient(spark)
