"""Shared fixtures. One session-scoped SparkSession (local, small shuffle count)
keeps the suite fast; tests must not mutate global session state."""

from __future__ import annotations

import pytest

from investigraph_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[8]",
        conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.driver.memory": "4g",
            "spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests",
        },
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_table_root(tmp_path):
    return str(tmp_path / "table")
