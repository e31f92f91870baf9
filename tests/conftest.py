import os

import pytest

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

SF_DIR_SMALL = "/root/testdata/sf0.001"
SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]


@pytest.fixture(scope="session")
def spark():
    from polars_mas_spark.session import get_spark

    spark = get_spark(
        app_name="polars-mas-spark-tests",
        master="local[8]",
        shuffle_partitions=8,
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_small():
    return SF_DIR_SMALL
