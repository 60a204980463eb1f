"""Shared Spark session for the test suite (one JVM for all tests)."""

from __future__ import annotations

import pytest

from weather_bigquery_lakehouse_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="wbl_tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
