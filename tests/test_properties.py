"""Property-based tests (hypothesis) — the engine analog of the reference's
ScalaCheck layer (SURVEY.md §5.3: payload round-trip over generated strings,
reference ConsumerEventSpec.scala:30-37), extended to the invariants that
actually protect the engine: pack/unpack inverse, exact-decimal aggregation,
and payload decode fidelity through a real DataFrame.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from reactive_kinesis_spark.streaming.deaggregate import pack_records, unpack_records

_SETTINGS = dict(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_records = st.lists(
    st.tuples(
        st.text(min_size=1, max_size=40),
        st.binary(min_size=0, max_size=200),
    ),
    min_size=0,
    max_size=20,
)


@settings(**_SETTINGS)
@given(_records)
def test_pack_unpack_is_identity(records):
    """KPL-style aggregate blob round-trips every (partition_key, payload)
    exactly, preserving order (reference parity: KCL deaggregation yields
    sub-records in packed order, ConsumerProcessingManager.scala:82-89)."""
    assert unpack_records(pack_records(records)) == records


@settings(**_SETTINGS)
@given(st.lists(st.text(alphabet=st.characters(codec="utf-8"), max_size=60), min_size=1, max_size=10))
def test_payload_string_roundtrip_through_dataframe(spark, payloads):
    """UTF-8 payload encode → BINARY column → payload_as_string decode is the
    identity (reference ConsumerEventSpec property, payloadAsString)."""
    from reactive_kinesis_spark.functions import payload_as_string

    df = spark.createDataFrame(
        [(i, p.encode("utf-8")) for i, p in enumerate(payloads)], "id long, payload binary"
    )
    out = df.select("id", payload_as_string("payload").alias("s")).collect()
    assert sorted((r.id, r.s) for r in out) == sorted(enumerate(payloads))


@settings(**_SETTINGS)
@given(
    st.lists(
        # doubles quantized to 6 dp within DECIMAL(38,6)'s comfortable range:
        # dsum must equal the exact decimal sum regardless of count/sign/order
        st.integers(min_value=-(10**12), max_value=10**12).map(lambda n: n / 1e6),
        min_size=1,
        max_size=50,
    )
)
def test_dsum_equals_exact_decimal_sum(spark, values):
    """The engine's numeric policy: dsum over doubles representable at 6 dp
    equals the exact Decimal sum, independent of aggregation order."""
    from pyspark.sql import functions as F

    from reactive_kinesis_spark.functions import dsum

    df = spark.createDataFrame([(v,) for v in values], "v double").repartition(4)
    got = df.agg(dsum("v", "s")).collect()[0].s
    want = float(sum(Decimal(str(v)).quantize(Decimal("0.000001")) for v in values))
    assert got == want
