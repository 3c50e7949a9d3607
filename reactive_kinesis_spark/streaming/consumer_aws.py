"""Consumer-side AWS Kinesis transport: GetShardIterator / GetRecords.

The producer seam (:mod:`~reactive_kinesis_spark.streaming.aws`) covered
the write path; this module covers the read path — the reference's core
loop: the KCL ``Worker.run()`` polls each shard with GetRecords pages of at
most ``kcl.maxRecords`` records and hands each page to the record processor
(reference consumer/KinesisConsumer.scala:240-271,
consumer/ConsumerProcessingManager.scala:100-121, reference.conf:479-487).

Structure mirrors ``aws.py`` exactly:

* a small **transport** class owning the raw boto3 calls, with
  retryable-vs-fatal classification (service throttles and transient
  network failures are retried with capped exponential backoff — the KCL
  retries GetRecords the same way; validation/auth/missing-stream errors
  escalate immediately);
* everything above the raw client call — position resolution, paging,
  expired-iterator recovery — lives in :func:`read_shard`, transport-
  agnostic and unit-tested against a fake client with the real
  GetRecords response shape (no boto3/AWS in the sandbox; the reference
  proves the same loop against localstack, it/.../KinesisSuite.scala).

Used by :mod:`~reactive_kinesis_spark.streaming.live_source` as the data
plane of the ``kinesis_live`` streaming source.
"""

from __future__ import annotations

import time
from typing import Iterator, NamedTuple

from reactive_kinesis_spark.streaming.aws import (
    RETRYABLE_ERROR_CODES,
    _aws_error_code,
    _is_transient_network_error,
)
from reactive_kinesis_spark.streaming.sink import TransportError

#: GetRecords API hard cap on ``Limit`` (public AWS contract) — a
#: ``maxRecords`` above this is fetched in multiple pages, exactly as the
#: KCL does.
MAX_GET_RECORDS_LIMIT = 10_000

#: our five starting positions → Kinesis ShardIteratorType
#: (reference.conf:469-477 exposes the first three; the sequence-number
#: forms are what checkpoint resume uses, README.md:675-683).
ITERATOR_TYPES = {
    "trim_horizon": "TRIM_HORIZON",
    "latest": "LATEST",
    "at_timestamp": "AT_TIMESTAMP",
    "at_sequence_number": "AT_SEQUENCE_NUMBER",
    "after_sequence_number": "AFTER_SEQUENCE_NUMBER",
}


class ExpiredIteratorError(Exception):
    """GetRecords iterator older than its 5-minute validity — recoverable
    by re-resolving an iterator from the last delivered sequence number
    (which :func:`read_shard` does transparently)."""


class GetRecordsPage(NamedTuple):
    """One GetRecords response: records are the raw boto3 dict shape
    (``SequenceNumber`` / ``PartitionKey`` / ``Data`` /
    ``ApproximateArrivalTimestamp``)."""

    records: list[dict]
    next_iterator: str | None
    millis_behind: int | None


class Boto3GetRecordsTransport:
    """GetShardIterator/GetRecords over a boto3 Kinesis client.

    Parameters
    ----------
    client:
        Pre-built client (anything with ``list_shards`` /
        ``get_shard_iterator`` / ``get_records`` — tests inject a fake).
        ``None`` builds a real boto3 client from the remaining kwargs.
    max_attempts / backoff_millis / max_backoff_millis:
        Retry budget for retryable failures (throttles, transient network
        errors). Capped exponential backoff; the KCL equivalent knobs are
        the idle/backoff times of reference.conf:479-487.
    sleep:
        Injected for tests (defaults to ``time.sleep``).
    """

    def __init__(
        self,
        client=None,
        *,
        region_name: str | None = None,
        endpoint_url: str | None = None,
        profile_name: str | None = None,
        max_attempts: int = 8,
        backoff_millis: int = 200,
        max_backoff_millis: int = 5_000,
        sleep=time.sleep,
    ):
        # client construction is LAZY and the built client is dropped on
        # pickle: Spark may ship the reader (and its transport) to an
        # executor for readBetweenOffsets replay, and boto3 clients are not
        # picklable. An injected client (tests, pre-configured sessions) is
        # kept — fakes cloudpickle by value.
        self._client = client
        self._owns_client = client is None
        self._build_kwargs = {
            "region_name": region_name,
            "endpoint_url": endpoint_url,
            "profile_name": profile_name,
        }
        self._max_attempts = max_attempts
        self._backoff_millis = backoff_millis
        self._max_backoff_millis = max_backoff_millis
        self._sleep = sleep

    def _ensure_client(self):
        if self._client is None:
            from reactive_kinesis_spark.streaming.aws import build_kinesis_client

            self._client = build_kinesis_client(
                **self._build_kwargs, requirer="Boto3GetRecordsTransport"
            )
        return self._client

    def __getstate__(self):
        state = dict(self.__dict__)
        if self._owns_client:
            state["_client"] = None  # rebuilt lazily after unpickle
        return state

    # -- raw calls, each behind the retry classifier ----------------------

    def list_shards(self, stream_name: str) -> list[str]:
        """Open shard ids, ascending — the worker's shard discovery
        (the KCL lease-sync analog). Paginated (``NextToken``)."""
        return sorted(self.shard_parents(stream_name))

    def shard_parents(self, stream_name: str) -> dict[str, list[str]]:
        """``{shard_id: [parent_shard_ids]}`` — the shard lineage the KCL
        uses to finish a closed parent before starting its children (one
        parent after a split, two after a merge). Same paginated ListShards
        call as :meth:`list_shards`, keeping the Parent/AdjacentParent ids
        the simple variant drops."""
        out: dict[str, list[str]] = {}
        token = None
        while True:
            kw = {"NextToken": token} if token else {"StreamName": stream_name}
            resp = self._call("list_shards", **kw)
            for s in resp.get("Shards", []):
                out[s["ShardId"]] = [
                    p
                    for p in (s.get("ParentShardId"), s.get("AdjacentParentShardId"))
                    if p
                ]
            token = resp.get("NextToken")
            if not token:
                return out

    def get_shard_iterator(
        self,
        stream_name: str,
        shard_id: str,
        position: str,
        *,
        sequence_number: str | None = None,
        timestamp_us: int | None = None,
    ) -> str:
        it_type = ITERATOR_TYPES.get(position)
        if it_type is None:
            raise ValueError(
                f"unsupported position {position!r}; one of {sorted(ITERATOR_TYPES)}"
            )
        kw: dict = {
            "StreamName": stream_name,
            "ShardId": shard_id,
            "ShardIteratorType": it_type,
        }
        if it_type in ("AT_SEQUENCE_NUMBER", "AFTER_SEQUENCE_NUMBER"):
            if sequence_number is None:
                raise ValueError(f"position {position} requires sequence_number")
            kw["StartingSequenceNumber"] = sequence_number
        if it_type == "AT_TIMESTAMP":
            if timestamp_us is None:
                raise ValueError("position at_timestamp requires timestamp_us")
            kw["Timestamp"] = timestamp_us / 1_000_000.0  # epoch seconds
        return self._call("get_shard_iterator", **kw)["ShardIterator"]

    def get_records(self, shard_iterator: str, limit: int) -> GetRecordsPage:
        resp = self._call(
            "get_records",
            ShardIterator=shard_iterator,
            Limit=min(limit, MAX_GET_RECORDS_LIMIT),
        )
        return GetRecordsPage(
            records=resp.get("Records", []),
            next_iterator=resp.get("NextShardIterator"),
            millis_behind=resp.get("MillisBehindLatest"),
        )

    # -- retry classification ---------------------------------------------

    def _call(self, method: str, **kw):
        """Invoke a client method with retryable-vs-fatal classification:
        throttles/transient network errors retry with capped exponential
        backoff within ``max_attempts``; ExpiredIteratorException raises
        :class:`ExpiredIteratorError` (recoverable one level up); anything
        else raises :class:`TransportError` immediately."""
        backoff = self._backoff_millis
        client = self._ensure_client()
        for attempt in range(1, self._max_attempts + 1):
            try:
                return getattr(client, method)(**kw)
            except Exception as exc:  # noqa: BLE001 — classify, then retry or escalate
                code = _aws_error_code(exc)
                if code == "ExpiredIteratorException":
                    raise ExpiredIteratorError(str(exc)) from exc
                retryable = code in RETRYABLE_ERROR_CODES or (
                    code is None and _is_transient_network_error(exc)
                )
                if not retryable:
                    raise TransportError(
                        f"{method} failed non-retryably"
                        + (f" ({code})" if code else "")
                    ) from exc
                if attempt == self._max_attempts:
                    raise TransportError(
                        f"{method} still failing after {attempt} attempts ({code})"
                    ) from exc
                self._sleep(backoff / 1000.0)
                backoff = min(backoff * 2, self._max_backoff_millis)

    @classmethod
    def from_options(cls, options: dict) -> "Boto3GetRecordsTransport":
        """Build from lower-cased DataSource options (``region`` /
        ``endpointurl`` / ``profile`` + retry knobs)."""
        return cls(
            region_name=options.get("region"),
            endpoint_url=options.get("endpointurl"),
            profile_name=options.get("profile"),
            max_attempts=int(options.get("maxattempts", 8)),
            backoff_millis=int(options.get("backoffmillis", 200)),
            max_backoff_millis=int(options.get("maxbackoffmillis", 5_000)),
        )


def read_shard(
    transport,
    stream_name: str,
    shard_id: str,
    *,
    last_sequence_number: str | None,
    position: str = "trim_horizon",
    timestamp_us: int | None = None,
    sequence_number: str | None = None,
    max_records: int | None = None,
    until_sequence_number: str | None = None,
    max_empty_pages: int = 3,
    resume_iterator: str | None = None,
    resume_issued_at_us: int | None = None,
    state: dict | None = None,
) -> Iterator[dict]:
    """The per-shard polling loop — the engine's ``Worker.run()`` analog
    (consumer/KinesisConsumer.scala:240-271): resolve an iterator, page
    GetRecords, stop when caught up or at the page budget.

    * ``last_sequence_number`` (the durable read position) wins over the
      initial ``position`` — checkpoint-wins precedence, the same contract
      as the replay source (C3);
    * ``max_records`` caps the records yielded per call (the KCL
      ``maxRecords`` batch cap, honored across multiple GetRecords pages
      when it exceeds the per-call API limit);
    * ``until_sequence_number`` (inclusive) makes the read a deterministic
      closed range — the replay path of ``readBetweenOffsets``;
    * an expired iterator is re-resolved from the last delivered sequence
      number — no loss, no duplicates (KCL does the same transparently);
    * "caught up" = an empty page with ``MillisBehindLatest == 0`` (or
      unknown for ``max_empty_pages`` consecutive pages, so a quiet
      fake/localstack endpoint terminates too), or a ``null``
      NextShardIterator (closed shard end);
    * ``resume_iterator`` skips position resolution and continues a
      still-valid iterator from a previous poll (needed for LATEST before
      the first record: a fresh LATEST iterator would skip records that
      arrived between polls); when ``state`` is given, the loop writes the
      current ``next_iterator`` into ``state["next_iterator"]`` so the
      caller can resume;
    * LATEST iterator EXPIRY before any record was delivered cannot simply
      re-resolve LATEST — records that arrived during the > 5-minute gap
      would be skipped forever. The loop remembers when the latest
      iterator was issued (``resume_issued_at_us`` for a resumed one, its
      own clock for a fresh one) and recovers with ``AT_TIMESTAMP`` of
      that instant: at-least-once with no gap (nothing was delivered, so
      nothing can duplicate).
    """
    issued_at_us = resume_issued_at_us
    if resume_iterator is not None:
        it = resume_iterator
    elif last_sequence_number:
        it = transport.get_shard_iterator(
            stream_name,
            shard_id,
            "after_sequence_number",
            sequence_number=last_sequence_number,
        )
    else:
        if position == "latest" and issued_at_us is None:
            issued_at_us = int(time.time() * 1_000_000)
        it = transport.get_shard_iterator(
            stream_name,
            shard_id,
            position,
            sequence_number=sequence_number,
            timestamp_us=timestamp_us,
        )
    yielded = 0
    empty_pages = 0
    last_seq = last_sequence_number
    while it is not None:
        budget = (
            MAX_GET_RECORDS_LIMIT
            if max_records is None
            else min(max_records - yielded, MAX_GET_RECORDS_LIMIT)
        )
        if budget <= 0:
            return
        try:
            page = transport.get_records(it, budget)
        except ExpiredIteratorError:
            # re-resolve from the last delivered position and continue —
            # sequence numbers make the retry exactly-once
            if last_seq:
                it = transport.get_shard_iterator(
                    stream_name,
                    shard_id,
                    "after_sequence_number",
                    sequence_number=last_seq,
                )
            elif position == "latest" and issued_at_us is not None:
                # gap-free LATEST recovery: resolve at the instant the
                # expired iterator was issued, not at the new tip
                it = transport.get_shard_iterator(
                    stream_name,
                    shard_id,
                    "at_timestamp",
                    timestamp_us=issued_at_us,
                )
            else:
                it = transport.get_shard_iterator(
                    stream_name,
                    shard_id,
                    position,
                    sequence_number=sequence_number,
                    timestamp_us=timestamp_us,
                )
            continue
        if state is not None:
            state["next_iterator"] = page.next_iterator
        for rec in page.records:
            seq = rec["SequenceNumber"]
            if until_sequence_number is not None and _seq_gt(seq, until_sequence_number):
                return
            last_seq = seq
            yielded += 1
            yield rec
            if max_records is not None and yielded >= max_records:
                return
        if until_sequence_number is not None and last_seq == until_sequence_number:
            return
        if not page.records:
            empty_pages += 1
            if page.millis_behind == 0 or empty_pages >= max_empty_pages:
                return
        else:
            empty_pages = 0
        it = page.next_iterator
        if it is None and state is not None:
            # null NextShardIterator = the shard is CLOSED and fully
            # drained (split/merge shard end) — the signal the caller's
            # parent-before-child gating needs (KCL shard-end semantics)
            state["closed"] = True


class LocalDirGetRecordsTransport:
    """File-backed GetRecords transport — the consumer-side mirror of the
    producer's ``sink.LocalDirTransport`` test seam: the same duck-typed
    surface as :class:`Boto3GetRecordsTransport` (``list_shards`` /
    ``get_shard_iterator`` / ``get_records``) served from a directory of
    ``<shard_id>.jsonl`` files. Appended lines become visible to the next
    GetRecords call, so a test (or a localstack-style harness) can feed a
    *live* stream by appending. Works in any process — Spark constructs
    streaming readers in a dedicated Python worker, where in-memory fakes
    registered by a test process don't exist.

    Line shape: ``{"seq": str, "pk": str, "data": base64, "ts_us": int}``.
    """

    def __init__(self, path: str):
        self._path = path

    # -- test/harness helper ----------------------------------------------

    @staticmethod
    def append_records(path: str, shard_id: str, records: list[dict]) -> None:
        """Append boto3-shaped records (SequenceNumber/PartitionKey/Data/
        ApproximateArrivalTimestamp) to a shard file."""
        import base64
        import json
        import os

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, f"{shard_id}.jsonl"), "a") as fh:
            for r in records:
                ts = r["ApproximateArrivalTimestamp"]
                ts_us = (
                    int(ts.timestamp() * 1_000_000)
                    if hasattr(ts, "timestamp")
                    else int(float(ts) * 1_000_000)
                )
                fh.write(
                    json.dumps(
                        {
                            "seq": r["SequenceNumber"],
                            "pk": r.get("PartitionKey", ""),
                            "data": base64.b64encode(bytes(r["Data"])).decode("ascii"),
                            "ts_us": ts_us,
                        }
                    )
                    + "\n"
                )

    def _load(self, shard_id: str) -> list[dict]:
        import base64
        import json
        import os
        from datetime import datetime, timezone

        out = []
        try:
            with open(os.path.join(self._path, f"{shard_id}.jsonl")) as fh:
                for line in fh:
                    if line.strip():
                        rec = json.loads(line)
                        out.append(
                            {
                                "SequenceNumber": rec["seq"],
                                "PartitionKey": rec["pk"],
                                "Data": base64.b64decode(rec["data"]),
                                "ApproximateArrivalTimestamp": datetime.fromtimestamp(
                                    rec["ts_us"] / 1_000_000, tz=timezone.utc
                                ),
                            }
                        )
        except FileNotFoundError:
            pass
        return out

    def list_shards(self, stream_name: str) -> list[str]:
        import os

        try:
            names = os.listdir(self._path)
        except FileNotFoundError:
            # consumer may start before the first append creates the dir —
            # an empty stream, consistent with _load's missing-file tolerance
            return []
        return sorted(f[: -len(".jsonl")] for f in names if f.endswith(".jsonl"))

    def get_shard_iterator(
        self,
        stream_name: str,
        shard_id: str,
        position: str,
        *,
        sequence_number: str | None = None,
        timestamp_us: int | None = None,
    ) -> str:
        recs = self._load(shard_id)
        if position == "trim_horizon":
            idx = 0
        elif position == "latest":
            idx = len(recs)
        elif position == "at_timestamp":
            idx = len(recs)
            for i, r in enumerate(recs):
                ts = r["ApproximateArrivalTimestamp"]
                if int(ts.timestamp() * 1_000_000) >= timestamp_us:
                    idx = i
                    break
        elif position in ("at_sequence_number", "after_sequence_number"):
            idx = len(recs)
            for i, r in enumerate(recs):
                seq = r["SequenceNumber"]
                if seq == sequence_number:
                    idx = i + (1 if position == "after_sequence_number" else 0)
                    break
                if _seq_gt(seq, sequence_number):
                    idx = i
                    break
        else:
            raise ValueError(f"unsupported position {position!r}")
        return f"{shard_id}|{idx}"

    def get_records(self, shard_iterator: str, limit: int) -> GetRecordsPage:
        shard_id, idx = shard_iterator.rsplit("|", 1)
        idx = int(idx)
        recs = self._load(shard_id)
        page = recs[idx : idx + min(limit, MAX_GET_RECORDS_LIMIT)]
        nxt = idx + len(page)
        return GetRecordsPage(
            records=page,
            next_iterator=f"{shard_id}|{nxt}",
            millis_behind=0 if nxt >= len(recs) else 1_000,
        )


def _seq_gt(a: str, b: str) -> bool:
    """Kinesis sequence numbers are decimal strings; compare numerically
    (length, then lexicographic — equivalent to integer compare for
    non-padded decimals, and correct for zero-padded ones of equal
    width). NOT string concatenation — the reference's buggy comparison
    (models/ConsumerEvent.scala:29-39) is deliberately not mirrored."""
    return (len(a), a) > (len(b), b)
