from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from parquet_go_spark.session import get_spark

    s = get_spark(cores=os.environ.get("SPARK_GRAFT_TEST_CPUS", "4"),
                  app_name="pgs-tests", driver_memory="6g")
    yield s
    s.stop()


@pytest.fixture()
def tmp_out(tmp_path):
    return str(tmp_path / "out")
