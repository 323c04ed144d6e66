from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)


@pytest.fixture(scope="session")
def spark():
    from hadoop_lab_spark.session import get_spark

    spark = get_spark(app_name="hadoop-lab-spark-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def oracle_con():
    from hadoop_lab_spark.testing import duckdb_connection

    con = duckdb_connection(SF_DIR_ORACLE)
    yield con
    con.close()
