from __future__ import annotations

import os

import pytest

from sample_for_transactional_datalake_using_s3tables_spark.plans import get_spark

# Correctness tests run at the driver's oracle scale factor by default.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_DIR_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="s3tables-spark-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def sf_dir_small() -> str:
    return SF_DIR_SMALL
