"""KPL aggregation wire-format codec (streaming/kpl.py) — the published
format real Kinesis producers emit and the KCL deaggregates (reference
consumer/ConsumerProcessingManager.scala:82-89)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from reactive_kinesis_spark.streaming.deaggregate import (
    CorruptAggregateError,
    aggregate_records,
    deaggregate,
    unpack_records,
)
from reactive_kinesis_spark.streaming.kpl import (
    KPL_MAGIC,
    is_kpl_aggregate,
    pack_kpl_records,
    unpack_kpl_records,
)


def test_kpl_roundtrip_with_key_table_dedup():
    records = [("user-1", b"a"), ("user-2", b"bb"), ("user-1", b"ccc" * 100)]
    blob = pack_kpl_records(records)
    assert blob.startswith(KPL_MAGIC)
    assert unpack_kpl_records(blob) == records
    # partition-key table is deduplicated: "user-1" appears once in the body
    assert blob.count(b"user-1") == 1


def test_kpl_golden_bytes_conform_to_published_format():
    """Hand-derived blob for pk_table=['a'], records=[(0, b'hi')] — pins
    the exact wire layout (field tags, varints, digest) independently of
    the encoder, so encoder and decoder can't drift together."""
    body = b"\x0a\x01a" + b"\x1a\x06" + b"\x08\x00\x1a\x02hi"
    golden = KPL_MAGIC + body + hashlib.md5(body).digest()
    assert pack_kpl_records([("a", b"hi")]) == golden
    assert unpack_kpl_records(golden) == [("a", b"hi")]


def test_kpl_digest_mismatch_rejected():
    blob = bytearray(pack_kpl_records([("k", b"data")]))
    blob[-1] ^= 0xFF  # corrupt the md5
    with pytest.raises(CorruptAggregateError, match="digest"):
        unpack_kpl_records(bytes(blob))


def test_kpl_unknown_fields_skipped():
    """Forward compatibility: a Record carrying the optional
    explicit_hash_key_index (field 2) and a tags submessage (field 4)
    still decodes — the KCL behavior for fields we don't model."""
    pk_table = b"\x0a\x01k"
    ehk_table = b"\x12\x0238"  # explicit_hash_key_table entry "38"
    rec = b"\x08\x00" + b"\x10\x00" + b"\x1a\x02ok" + b"\x22\x03\x0a\x01t"
    body = pk_table + ehk_table + b"\x1a" + bytes([len(rec)]) + rec
    blob = KPL_MAGIC + body + hashlib.md5(body).digest()
    assert unpack_kpl_records(blob) == [("k", b"ok")]


def test_kpl_truncated_aggregate_rejected_not_passed_through():
    """A blob that CLAIMS the KPL format (magic prefix) but is truncated
    below magic+digest must raise — same DLQ routing as RKSA1 truncation —
    never be delivered as a bogus plain user record."""
    truncated = pack_kpl_records([("k", b"data")])[:10]
    with pytest.raises(CorruptAggregateError, match="truncated"):
        unpack_kpl_records(truncated)
    with pytest.raises(CorruptAggregateError, match="truncated"):
        unpack_records(truncated)


def test_unpack_records_dispatches_on_magic():
    kpl = pack_kpl_records([("p", b"x"), ("q", b"y")])
    assert unpack_records(kpl) == [("p", b"x"), ("q", b"y")]
    assert unpack_records(b"plain payload") == [("", b"plain payload")]


def test_dataframe_deaggregate_handles_kpl_blobs(spark):
    """Consumer-side parity with the KCL: a stream carrying genuine
    KPL-aggregated payloads explodes into user records with
    sub_sequence_number 0..k-1 (UserRecord.deaggregate analog)."""
    blob = pack_kpl_records([("pk-a", b"0"), ("pk-a", b"1"), ("pk-b", b"2")])
    df = spark.createDataFrame(
        [("s", "shard-0", "pk-a", "0" * 20, 0, bytearray(blob), None)],
        schema=(
            "stream_name string, shard_id string, partition_key string, "
            "sequence_number string, sub_sequence_number long, payload binary, "
            "approximate_arrival_timestamp timestamp"
        ),
    )
    rows = deaggregate(df).orderBy("sub_sequence_number").collect()
    assert [(r.partition_key, bytes(r.payload), r.sub_sequence_number) for r in rows] == [
        ("pk-a", b"0", 0),
        ("pk-a", b"1", 1),
        ("pk-b", b"2", 2),
    ]


def test_aggregate_records_kpl_format_roundtrip(spark):
    """Producer aggregation in KPL format → consumer deaggregation recovers
    every payload (the full O3→O2 cycle on the real wire format)."""
    n = 100
    df = spark.range(n).select(
        F.lit("s").alias("stream_name"),
        F.lit("shard-0").alias("shard_id"),
        (F.col("id") % 4).cast("string").alias("partition_key"),
        F.lpad(F.col("id").cast("string"), 20, "0").alias("sequence_number"),
        F.lit(0).cast("long").alias("sub_sequence_number"),
        F.col("id").cast("string").cast("binary").alias("payload"),
        F.current_timestamp().alias("approximate_arrival_timestamp"),
    )
    packed = aggregate_records(df, max_count=8, wire_format="kpl")
    payloads = [bytes(r.payload) for r in packed.collect()]
    assert payloads and all(is_kpl_aggregate(b) for b in payloads)
    got = sorted(int(bytes(r.payload)) for r in deaggregate(packed).collect())
    assert got == list(range(n))
