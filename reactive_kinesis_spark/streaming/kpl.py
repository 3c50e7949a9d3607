"""KPL record-aggregation wire codec — dependency-free.

Real Kinesis data aggregated by the KPL uses the published format
(aws/amazon-kinesis-producer ``aggregation-format.md``; consumed by the
KCL in the reference at consumer/ConsumerProcessingManager.scala:82-89):

    0xF3 0x89 0x9A 0xC2 | protobuf(AggregatedRecord) | md5(protobuf)

with the protobuf schema (messages/kpl.proto)::

    message AggregatedRecord {
      repeated string partition_key_table    = 1;
      repeated string explicit_hash_key_table = 2;
      repeated Record records                = 3;
    }
    message Record {
      required uint64 partition_key_index     = 1;
      optional uint64 explicit_hash_key_index = 2;
      required bytes  data                    = 3;
    }

The container has no protobuf library, but the format only uses two wire
types (varint, length-delimited), so this module hand-codes it (~60 lines)
— the engine is wire-compatible with genuine KPL producers/consumers, not
just its own RKSA1 format. :func:`unpack_kpl_records` validates the md5
digest and rejects corrupt blobs the same way the KCL deaggregator does.
"""

from __future__ import annotations

import hashlib

KPL_MAGIC = b"\xf3\x89\x9a\xc2"

# protobuf wire tags: (field_number << 3) | wire_type
_TAG_PK_TABLE = 0x0A  # AggregatedRecord.partition_key_table (1, bytes)
_TAG_EHK_TABLE = 0x12  # AggregatedRecord.explicit_hash_key_table (2, bytes)
_TAG_RECORD = 0x1A  # AggregatedRecord.records (3, message)
_TAG_REC_PK_IDX = 0x08  # Record.partition_key_index (1, varint)
_TAG_REC_EHK_IDX = 0x10  # Record.explicit_hash_key_index (2, varint)
_TAG_REC_DATA = 0x1A  # Record.data (3, bytes)


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, off: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        if off >= len(buf):
            raise ValueError("truncated varint")
        b = buf[off]
        off += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, off
        shift += 7


def pack_kpl_records(records: list[tuple[str, bytes]]) -> bytes:
    """(partition_key, data) user records → one KPL-aggregated blob.
    Partition keys are table-deduplicated exactly like the KPL."""
    pk_index: dict[str, int] = {}
    for pk, _ in records:
        pk_index.setdefault(pk, len(pk_index))
    body = bytearray()
    for pk in pk_index:
        pk_b = pk.encode("utf-8")
        body += bytes([_TAG_PK_TABLE]) + _varint(len(pk_b)) + pk_b
    for pk, data in records:
        msg = (
            bytes([_TAG_REC_PK_IDX])
            + _varint(pk_index[pk])
            + bytes([_TAG_REC_DATA])
            + _varint(len(data))
            + data
        )
        body += bytes([_TAG_RECORD]) + _varint(len(msg)) + msg
    return KPL_MAGIC + bytes(body) + hashlib.md5(bytes(body)).digest()


def is_kpl_aggregate(blob: bytes) -> bool:
    """True if the blob *claims* the KPL aggregate wire format (magic
    prefix). A truncated aggregate still claims it — ``unpack_kpl_records``
    raises ``CorruptAggregateError`` for it, the same tolerance/DLQ routing
    as RKSA1 truncation, instead of masking corruption by passing the
    partial bytes through as a plain user record."""
    return blob.startswith(KPL_MAGIC)


def _skip_field(buf: bytes, off: int, wire_type: int) -> int:
    """Skip an unknown field (forward compatibility — e.g. Record.tags)."""
    if wire_type == 0:
        _, off = _read_varint(buf, off)
        return off
    if wire_type == 2:
        ln, off = _read_varint(buf, off)
        return off + ln
    if wire_type == 5:
        return off + 4
    if wire_type == 1:
        return off + 8
    raise ValueError(f"unsupported protobuf wire type {wire_type}")


def _parse_record(msg: bytes) -> tuple[int, bytes]:
    pk_idx: int | None = None
    data: bytes | None = None
    off = 0
    while off < len(msg):
        tag = msg[off]
        off += 1
        if tag == _TAG_REC_PK_IDX:
            pk_idx, off = _read_varint(msg, off)
        elif tag == _TAG_REC_DATA:
            ln, off = _read_varint(msg, off)
            data = msg[off : off + ln]
            off += ln
        else:
            off = _skip_field(msg, off, tag & 0x07)
    if pk_idx is None or data is None:
        raise ValueError("KPL Record missing required field")
    return pk_idx, bytes(data)


def unpack_kpl_records(blob: bytes) -> list[tuple[str, bytes]]:
    """KPL-aggregated blob → [(partition_key, data)], digest-verified.

    Raises :class:`~reactive_kinesis_spark.streaming.deaggregate.
    CorruptAggregateError` on a bad digest or malformed body — the same
    contract as the RKSA1 unpacker, so tolerance/DLQ routing is uniform.
    """
    from reactive_kinesis_spark.streaming.deaggregate import CorruptAggregateError

    if not is_kpl_aggregate(blob):
        raise CorruptAggregateError("not a KPL aggregated record")
    if len(blob) < len(KPL_MAGIC) + 16:
        raise CorruptAggregateError(
            f"KPL aggregated record truncated: {len(blob)} bytes, "
            f"need ≥ {len(KPL_MAGIC) + 16} (magic + md5 digest)"
        )
    body, digest = blob[len(KPL_MAGIC) : -16], blob[-16:]
    if hashlib.md5(body).digest() != digest:
        raise CorruptAggregateError("KPL aggregated record: md5 digest mismatch")
    try:
        pk_table: list[str] = []
        recs: list[tuple[int, bytes]] = []
        off = 0
        while off < len(body):
            tag = body[off]
            off += 1
            if tag == _TAG_PK_TABLE:
                ln, off = _read_varint(body, off)
                pk_table.append(body[off : off + ln].decode("utf-8"))
                off += ln
            elif tag == _TAG_RECORD:
                ln, off = _read_varint(body, off)
                recs.append(_parse_record(body[off : off + ln]))
                off += ln
            else:
                off = _skip_field(body, off, tag & 0x07)
        return [(pk_table[idx], data) for idx, data in recs]
    except (ValueError, IndexError, UnicodeDecodeError) as e:
        raise CorruptAggregateError(f"KPL aggregated record corrupt: {e}") from e
