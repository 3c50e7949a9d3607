"""Streaming joins (SURVEY.md §2.2 joins row: stream–static and
stream–stream with watermarks).

The reference has no joins at all (SURVEY.md §2.1 'Absent'); these are the
engine-surface forms the north star mandates, expressed so the same helper
works on batch frames (watermarks/time-bounds become plain predicates).

Scale posture:
* stream–static: the static side is broadcast when small (dimension
  enrichment — the common case for payload decoration), else a shuffled
  equi-join per micro-batch; the static side is re-read per batch only if
  the underlying source changes.
* stream–stream: BOTH sides buffered in the state store, bounded by the
  watermark + time-range condition — without the time bound, state grows
  unboundedly; this module makes the bound a required argument on streaming
  inputs. RocksDB state store for production (config.session knobs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_static_join(
    stream: DataFrame,
    static: DataFrame,
    on: list[str] | Column,
    how: str = "inner",
    broadcast_static: bool = True,
) -> DataFrame:
    """Enrich a stream against a static dimension table. Broadcast by
    default: per-micro-batch hash join with zero shuffle of the stream
    side — at 100 TB/day the stream side never repartitions."""
    right = F.broadcast(static) if broadcast_static else static
    return stream.join(right, on=on, how=how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str | None = None,
    left_ts: str = "approximate_arrival_timestamp",
    right_ts: str = "approximate_arrival_timestamp",
    within: str = "10 minutes",
    watermark_left: str = "10 minutes",
    watermark_right: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream–stream equi-join with a mandatory event-time
    range bound (``|left_ts - right_ts| <= within``).

    The time bound + watermarks let Spark expire buffered state: a row can
    only match partners within the interval, so state older than
    (watermark + interval) is dropped. On batch frames the same predicate
    applies as a plain filter — one code path, oracle-verifiable.
    """
    rk = right_key or key
    # disambiguate columns on the right side
    r = right
    renames = {}
    for c in r.columns:
        if c in left.columns:
            renames[c] = f"r_{c}"
            r = r.withColumnRenamed(c, f"r_{c}")
    rk_eff = renames.get(rk, rk)
    rts_eff = renames.get(right_ts, right_ts)

    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark_left)
    if r.isStreaming:
        r = r.withWatermark(rts_eff, watermark_right)

    iv = F.expr(f"INTERVAL {within}")
    cond = (
        (F.col(key) == F.col(rk_eff))
        & (F.col(rts_eff) >= F.col(left_ts) - iv)
        & (F.col(rts_eff) <= F.col(left_ts) + iv)
    )
    return left.join(r, cond, how)
