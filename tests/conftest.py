from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from etlutils_spark.session import get_session

    s = get_session(
        "etlutils_spark_tests",
        **{"spark.sql.shuffle.partitions": "4", "spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def star(spark, sf_dir):
    from etlutils_spark.sources.files import load_star

    return load_star(spark, sf_dir)
