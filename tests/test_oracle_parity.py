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


@pytest.mark.parametrize("name", _ORACLE_BACKED)
def test_output_types_driver_portable(spark, sf_dir, name):
    """Registry convention (round-6 verdict): oracle-backed queries must
    not emit columns whose pandas rendering is engine-dependent. DuckDB's
    ``fetchdf`` renders DECIMAL wider than int64 as float64 while Spark's
    ``toPandas`` yields exact ``Decimal`` objects, so the driver's
    value-hash diverges on *representation* even when values are
    identical (q116, round 6). Reject DECIMAL precision > 18 anywhere in
    the output schema, including nested in arrays/maps/structs — render
    such values as STRING (canonical decimal string) instead."""
    from pyspark.sql import types as T

    def walk(dt):
        if isinstance(dt, T.DecimalType):
            yield dt
        elif isinstance(dt, T.ArrayType):
            yield from walk(dt.elementType)
        elif isinstance(dt, T.MapType):
            yield from walk(dt.keyType)
            yield from walk(dt.valueType)
        elif isinstance(dt, T.StructType):
            for f in dt.fields:
                yield from walk(f.dataType)

    qd = _REGISTRY[name]
    schema = qd.fn(spark, sf_dir).schema
    wide = [
        (f.name, str(f.dataType))
        for f in schema.fields
        for d in walk(f.dataType)
        if d.precision > 18
    ]
    assert not wide, (
        f"{name} emits driver-unportable wide decimals {wide}; cast to "
        "STRING (or split into int64 limbs) in both Spark and the oracle"
    )


def test_q52_oracle_parity_on_degenerate_embeddings(spark, sf_dir, tmp_path):
    """Round-2 advice: q52 passed only because the data has no empty/NULL
    embeddings (DuckDB ``list_reduce`` ERRORS on an empty list; the
    null-skipping oracle COUNT diverged from a count-all Spark
    denominator). Inject both degenerate shapes and require exact parity."""
    import duckdb

    emb_dir = str(tmp_path / "sf_degenerate")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    degenerate = spark.createDataFrame(
        [
            (900001, 0, []),
            (900002, 1, None),
        ],
        schema="vec_id long, label int, embedding array<float>",
    )
    base.select("vec_id", "label", "embedding").unionByName(degenerate).write.parquet(
        f"{emb_dir}/embeddings.parquet"
    )
    qd = _REGISTRY["q52_higher_order_array"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{emb_dir}/embeddings.parquet/*.parquet')"
    )
    try:
        compare(qd.fn(spark, emb_dir), con, qd.oracle)
    finally:
        con.close()


def test_driver_window_integrity():
    """The driver certifies the FIRST 50 registry entries; the rotation
    is an explicit slot list. Guard its invariants so a future edit can't
    silently shrink the window, orphan a name, or let a rows-only query
    eat a certification slot."""
    from reactive_kinesis_spark.queries import _DEFERRED_R16, _WINDOW

    assert len(_WINDOW) == 50
    assert len(set(_WINDOW)) == 50
    names = list(_REGISTRY)
    assert names[:50] == list(_WINDOW)
    for name in (*_WINDOW, *_DEFERRED_R16):
        assert name in _REGISTRY, name
        assert _REGISTRY[name].oracle, f"{name} is rows-only — wasted slot"
    # every oracle-backed query is either in the window, explicitly
    # deferred, or past the window by rotation — never silently dropped
    assert set(_WINDOW).isdisjoint(_DEFERRED_R16)
