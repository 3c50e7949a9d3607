"""Testdata physical-type drift defense (tables._normalize_schema).

The driver regenerated events.parquet with a different timestamp encoding
between rounds (TIMESTAMP(NANOS) → plain timestamp[us]/NTZ), which broke q20
mid-round. These tests pin the contract: `load_table` coerces every
known-equivalent encoding to the documented schema (so the same queries stay
green), and raises loudly — at load, not deep in a plan — on anything else.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from reactive_kinesis_spark.queries import load_all
from reactive_kinesis_spark.tables import TABLES, load_table, table_path
from tests.oracle_utils import compare

# Queries that exercise the events.ts column end-to-end (window agg, as-of
# join, sessionization, sliding windows) — the blast radius of ts drift.
TS_QUERIES = (
    "q17_events_hourly_window",
    "q19_events_asof_join",
    "q20_events_sessions",
    "q39_sliding_window",
)


def _drifted_dir(tmp_path, sf_dir: str, ts_variant: str) -> str:
    """Clone sf_dir, rewriting events.parquet with a drifted ts encoding."""
    out = str(tmp_path / f"drift_{ts_variant}")
    os.makedirs(out)
    for name in TABLES:
        src = table_path(sf_dir, name)
        if name != "events":
            os.symlink(src, table_path(out, name))
            continue
        t = pq.read_table(src)
        ts = t.column("ts")
        idx = t.schema.get_field_index("ts")
        if ts_variant == "ntz_us":
            new = ts.cast(pa.timestamp("us"))  # no tz → Spark 4 reads NTZ
        elif ts_variant == "nanos":
            new = ts.cast(pa.timestamp("ns"))  # legacy TIMESTAMP(NANOS)
        elif ts_variant == "utc_us":
            new = ts.cast(pa.timestamp("us", tz="UTC"))  # adjusted-to-UTC
        else:
            raise ValueError(ts_variant)
        t = t.set_column(idx, "ts", new)
        pq.write_table(t, table_path(out, name))
    return out


@pytest.mark.parametrize("variant", ["ntz_us", "nanos", "utc_us"])
def test_ts_drift_oracle_parity(spark, ddb, sf_dir, tmp_path, variant):
    """Every known ts encoding loads to TimestampType and keeps the four
    ts-dependent queries bit-identical to the (undrifted) DuckDB oracle."""
    drifted = _drifted_dir(tmp_path, sf_dir, variant)
    df = load_table(spark, drifted, "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp", variant
    registry = load_all()
    for qname in TS_QUERIES:
        qd = registry[qname]
        compare(qd.fn(spark, drifted), ddb, qd.oracle)


def test_orders_lineitem_ts_drift_oracle_parity(spark, ddb, sf_dir, tmp_path):
    """o_orderdate / l_shipdate carry the same drift risk as events.ts —
    drift them to NTZ and prove the date-function, as-of, and scan-agg
    queries stay oracle-exact. (DATE drift is covered by the coercion rule
    but not exercised here: these columns carry time-of-day in the current
    testdata, so a DATE rewrite would change values, not just encoding.)"""
    out = str(tmp_path / "drift_ol")
    os.makedirs(out)
    for name in TABLES:
        src = table_path(sf_dir, name)
        if name not in ("orders", "lineitem"):
            os.symlink(src, table_path(out, name))
            continue
        t = pq.read_table(src)
        col = "o_orderdate" if name == "orders" else "l_shipdate"
        idx = t.schema.get_field_index(col)
        t = t.set_column(idx, col, t.column(col).cast(pa.timestamp("us")))
        pq.write_table(t, table_path(out, name))
    for tname, col in (("orders", "o_orderdate"), ("lineitem", "l_shipdate")):
        df = load_table(spark, out, tname)
        assert df.schema[col].dataType.simpleString() == "timestamp"
    registry = load_all()
    for qname in ("q14_date_functions", "q19_events_asof_join", "q01_pricing_summary"):
        qd = registry[qname]
        compare(qd.fn(spark, out), ddb, qd.oracle)


def test_unknown_drift_raises(spark, sf_dir, tmp_path):
    """Non-equivalent drift (ts as string) must fail loudly at load."""
    out = str(tmp_path / "drift_bad")
    os.makedirs(out)
    for name in TABLES:
        src = table_path(sf_dir, name)
        if name != "events":
            os.symlink(src, table_path(out, name))
            continue
        t = pq.read_table(src)
        idx = t.schema.get_field_index("ts")
        t = t.set_column(idx, "ts", t.column("ts").cast(pa.string()))
        pq.write_table(t, table_path(out, name))
    with pytest.raises(ValueError, match="events.*ts"):
        load_table(spark, out, "events")


def test_missing_column_raises(spark, sf_dir, tmp_path):
    out = str(tmp_path / "drift_missing")
    os.makedirs(out)
    for name in TABLES:
        src = table_path(sf_dir, name)
        if name != "events":
            os.symlink(src, table_path(out, name))
            continue
        t = pq.read_table(src)
        t = t.drop_columns(["ts"])
        pq.write_table(t, table_path(out, name))
    with pytest.raises(ValueError, match="missing expected columns"):
        load_table(spark, out, "events")
