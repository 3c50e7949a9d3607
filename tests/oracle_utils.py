"""Local mirror of the driver's Spark-vs-DuckDB compare: row count, column
names, and order-insensitive value equality (exact for non-floats; floats
must match bit-for-bit because the engine's numeric policy is
exact-deterministic — see reactive_kinesis_spark.functions)."""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(
    spark_df, ddb_con, sql: str, float_ulp_tol: int = 0, require_rows: bool = True
) -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(ddb_con.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch\n spark: {list(got.columns)}\n duckdb: {list(want.columns)}"
    )
    assert len(got) == len(want), f"row count mismatch: spark={len(got)} duckdb={len(want)}"
    # A certified query must be NON-DEGENERATE at the test SF: an empty
    # result hash-matches trivially and certifies nothing (q129's first
    # cut targeted a complete graph — 0 candidates — and "passed").
    # Audited: every oracle-backed query returns >=1 row at sf0.001.
    assert not require_rows or len(got) > 0, (
        "oracle query returned 0 rows at the test SF — the hash gate is "
        "vacuous; point the query at a substrate where the operator has "
        "work to do (or pass require_rows=False for a deliberate case)"
    )
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ga = pd.to_numeric(g).to_numpy(dtype="float64")
            wa = pd.to_numeric(w).to_numpy(dtype="float64")
            for i, (x, y) in enumerate(zip(ga, wa)):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, f"float mismatch col={c} row={i}: spark={x!r} duckdb={y!r} diff={x-y!r}"
        else:
            mism = (g.astype(str) != w.astype(str))
            assert not mism.any(), (
                f"value mismatch col={c}:\n spark={g[mism].head(5).tolist()}"
                f"\n duckdb={w[mism].head(5).tolist()}"
            )
