"""Shared Spark fixtures: one session per test run (startup is ~15s)."""

import pytest


@pytest.fixture(scope="session")
def spark():
    from pdf_extractor_spark.session import get_spark

    spark = get_spark("tests", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()
