"""Every oracle-backed query in the registry must match DuckDB exactly —
the local mirror of the driver's CORRECTNESS gate (at sf0.001 for speed;
the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from reactive_kinesis_spark.queries import load_all
from tests.oracle_utils import compare

_REGISTRY = load_all()
_ORACLE_BACKED = sorted(name for name, qd in _REGISTRY.items() if qd.oracle)
_ROWS_ONLY = sorted(name for name, qd in _REGISTRY.items() if not qd.oracle)


@pytest.mark.parametrize("name", _ORACLE_BACKED)
def test_query_matches_oracle(spark, ddb, sf_dir, name):
    qd = _REGISTRY[name]
    compare(qd.fn(spark, sf_dir), ddb, qd.oracle)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    qd = _REGISTRY[name]
    df = qd.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
