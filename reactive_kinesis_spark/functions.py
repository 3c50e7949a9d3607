"""Scalar/aggregate function helpers.

Two concerns live here:

1. **Oracle-exact numerics.** The driver hash-compares our results against a
   DuckDB oracle. Floating-point aggregation order differs between engines, so
   every SUM/AVG over DOUBLE columns is computed *exactly* by casting the
   input to DECIMAL(38,6), summing (exact integer arithmetic), and casting the
   result back to DOUBLE. Both engines then produce bit-identical doubles.
   AVG is expressed as exact-sum / count — one deterministic IEEE division.

2. **JVM-side vector math.** Cosine similarity / dot products over
   ``array<float>`` columns stay inside whole-stage codegen via
   ``zip_with`` + ``aggregate`` — no Python round-trip in the hot path.

Reference parity: payload decoding mirrors ``payloadAsString``
(reference ``models/ConsumerEvent.scala:60-61``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Oracle-exact numeric aggregates
# --------------------------------------------------------------------------

_DEC = "decimal(38,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact sum of a DOUBLE column, returned as DOUBLE.

    Deterministic across engines and partitionings: DECIMAL(38,6) addition is
    exact, so aggregation order is irrelevant; the final cast to double is a
    single deterministic rounding. Map-side partial aggregation still applies
    (decimal sum is associative), so this costs nothing at scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Exact-sum-based average of a DOUBLE column (see :func:`dsum`)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dsum_sql(expr: str, alias: str) -> str:
    """DuckDB oracle fragment equivalent to :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"


def davg_sql(expr: str, alias: str) -> str:
    """DuckDB oracle fragment equivalent to :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


# --------------------------------------------------------------------------
# Payload helpers (reference parity)
# --------------------------------------------------------------------------


def payload_as_string(col: Column | str = "payload") -> Column:
    """bytes → UTF-8 string; Spark form of ``ConsumerEvent.payloadAsString``
    (reference models/ConsumerEvent.scala:60-61)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


def payload_json(col: Column | str, schema) -> Column:
    """Decode a JSON payload into a typed struct (``from_json``)."""
    return F.from_json(payload_as_string(col), schema)


# --------------------------------------------------------------------------
# JVM-side vector math over array<float>/array<double> columns
# --------------------------------------------------------------------------


def vec_dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns — pure Catalyst (zip_with+aggregate)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vec_norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            ca,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity between two array columns, computed in double."""
    return vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
