from __future__ import annotations

import pytest

from velib_lakehouse_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="velib-lakehouse-tests", cpus=4, shuffle_partitions=4)
    yield spark
    spark.stop()
