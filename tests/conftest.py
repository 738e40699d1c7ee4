from __future__ import annotations

import os

import pytest

from dod_etl_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
# sf0.01 = the driver's actual correctness gate; override for quick local
# iterations with SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.001.
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dod_etl_spark_tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
