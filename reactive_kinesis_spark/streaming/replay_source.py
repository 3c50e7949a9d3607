"""Custom Python DataSource: a Kinesis-shaped sharded replay stream.

A real Structured Streaming connector (Spark 4 ``DataSource`` API) that
replays a directory of per-shard parquet files as a live sharded stream with
the engine's canonical ``EVENT_SCHEMA``. This is the closest structural
analog of the reference's consumer core:

* one input partition per shard per micro-batch — the reference's
  one-record-processor-per-shard parallelism model
  (reference consumer/KinesisConsumer.scala:207-226, README.md:84-92);
* ``maxRecordsPerBatch`` caps per-shard batch size — the KCL ``maxRecords``
  GetRecords cap (reference reference.conf:479-482);
* ``startingPosition`` = ``trim_horizon`` | ``latest`` | ``at_timestamp``
  (+ ``startingTimestamp``) | ``at_sequence_number`` |
  ``after_sequence_number`` (+ ``startingSequenceNumber``) — the
  reference's five initial positions (reference reference.conf:469-477,
  README.md:675-683) — with checkpoint-wins precedence: Spark's offset log
  overrides the initial position on restart exactly like a KCL lease table;
* offsets are a per-shard ``{shard_id: next_row}`` map — the analog of
  per-shard sequence-number checkpoints;
* rows inside a shard are delivered in file order — per-shard total order
  (reference consumer/ConsumerProcessingManager.scala:77-80).

Layout contract: ``path/shard-*.parquet``, one file per shard, columns =
``EVENT_SCHEMA``. Executors read only their own shard slice (pyarrow row
ranges) — no driver data path, so the design scales with shard count.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)

from reactive_kinesis_spark.schemas import EVENT_SCHEMA

FORMAT_NAME = "kinesis_replay"


def _shard_files(path: str) -> dict[str, str]:
    """shard_id → file path for every ``shard-*.parquet`` in ``path``."""
    out = {}
    for fname in sorted(os.listdir(path)):
        if fname.startswith("shard-") and fname.endswith(".parquet"):
            out[fname[: -len(".parquet")]] = os.path.join(path, fname)
    if not out:
        raise FileNotFoundError(f"no shard-*.parquet files under {path!r}")
    return out


def _shard_rows(files: dict[str, str]) -> dict[str, int]:
    import pyarrow.parquet as pq

    return {sid: pq.read_metadata(f).num_rows for sid, f in files.items()}


def _filter_shards(files: dict[str, str], shards_opt: str | None) -> dict[str, str]:
    """Restrict a reader to an explicit shard subset via the ``shards``
    option (comma-separated shard ids) — the shard-assignment analog of the
    reference's lease table (L1): each concurrent consumer of one stream
    holds a disjoint shard set, and a failed consumer's shards are taken
    over by pointing a new query at its shard set + checkpoint (the lease
    state here IS the checkpoint + cursor pair)."""
    if not shards_opt:
        return files
    want = [s.strip() for s in str(shards_opt).split(",") if s.strip()]
    missing = [s for s in want if s not in files]
    if missing:
        raise ValueError(
            f"unknown shard ids {missing}; available: {sorted(files)}"
        )
    return {sid: files[sid] for sid in want}


@dataclass
class _ShardSlice(InputPartition):
    file: str
    start: int
    end: int


_POSITIONS = (
    "trim_horizon",
    "latest",
    "at_timestamp",
    "at_sequence_number",
    "after_sequence_number",
)


def _parse_timestamp_us(raw: str) -> int:
    """startingTimestamp option → epoch microseconds. Accepts epoch
    seconds (int/float form, the reference's ``at.timestamp`` config,
    reference.conf:474-477) or an ISO-8601 string. Both paths use exact
    integer arithmetic — the numeric form is split on ``.`` so fractional
    seconds never round through a float, and negative epochs scale
    symmetrically (-1.5 → -1_500_000 µs, not truncated toward zero).
    Malformed input ('inf', 'nan', garbage) raises a ValueError naming
    the option."""
    from datetime import datetime, timedelta, timezone

    s = str(raw).strip()
    body = s[1:] if s[:1] in ("-", "+") else s
    if body and body.replace(".", "", 1).isdigit():
        whole, _, frac = body.partition(".")
        us = int(whole or "0") * 1_000_000 + int((frac + "000000")[:6])
        return -us if s.startswith("-") else us
    # scientific notation / underscore separators ('1.7e9', '1_700_000_000')
    # are valid float literals for epoch seconds — scale exactly via Decimal
    # (no binary-float rounding), flooring sub-µs fractions toward -inf so
    # negative epochs behave symmetrically with the plain-decimal path
    try:
        from decimal import ROUND_FLOOR, Decimal, InvalidOperation

        d = Decimal(s.replace("_", ""))
        if d.is_finite():
            return int((d * 1_000_000).to_integral_value(rounding=ROUND_FLOOR))
    except (InvalidOperation, ValueError):
        pass
    try:
        dt = datetime.fromisoformat(s)
    except ValueError:
        raise ValueError(
            f"invalid startingTimestamp {raw!r}: expected epoch seconds "
            "(int/float) or an ISO-8601 timestamp"
        ) from None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    return (dt - epoch) // timedelta(microseconds=1)


def _resolve_start_offsets(
    files: dict[str, str],
    total: dict[str, int],
    position: str,
    timestamp_us: int | None,
    sequence_number: str | None,
) -> dict[str, int]:
    """Per-shard first row index for the five reference starting positions
    (reference.conf:469-477, README.md:675-683). TRIM_HORIZON/LATEST are
    metadata-only; the timestamp/sequence positions binary-search one sorted
    column per shard file — a bounded, driver-side scan (the analog of the
    Kinesis GetShardIterator server-side lookup). The layout contract says
    each shard file is sorted ascending on the searched column; that is
    VALIDATED here (searchsorted on unsorted data silently returns an
    arbitrary index — rows skipped or re-delivered with no error)."""
    if position == "trim_horizon":
        return {sid: 0 for sid in files}
    if position == "latest":
        return dict(total)

    import numpy as np
    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    if position == "at_timestamp":
        if timestamp_us is None:
            raise ValueError("startingPosition=at_timestamp requires startingTimestamp")
        for sid, f in files.items():
            col = pq.read_table(f, columns=["approximate_arrival_timestamp"]).column(0)
            arr = col.cast("timestamp[us]").to_numpy(zero_copy_only=False)
            us = arr.astype("datetime64[us]").astype("int64")
            if us.size > 1 and not bool(np.all(np.diff(us) >= 0)):
                raise ValueError(
                    f"shard file {f!r}: approximate_arrival_timestamp is not "
                    "sorted ascending — the kinesis_replay layout contract "
                    "requires per-shard arrival order for at_timestamp"
                )
            out[sid] = int(np.searchsorted(us, timestamp_us, side="left"))
        return out

    # (AT|AFTER)_SEQUENCE_NUMBER: sequence_number strings sort ascending
    # within a shard (zero-padded by construction — schemas.EVENT_SCHEMA)
    if sequence_number is None:
        raise ValueError(
            f"startingPosition={position} requires startingSequenceNumber"
        )
    side = "left" if position == "at_sequence_number" else "right"
    for sid, f in files.items():
        col = pq.read_table(f, columns=["sequence_number"]).column(0)
        arr = np.asarray(col.to_pylist(), dtype=object)
        if arr.size > 1 and not bool(np.all(arr[:-1] <= arr[1:])):
            raise ValueError(
                f"shard file {f!r}: sequence_number is not sorted ascending — "
                "the kinesis_replay layout contract requires zero-padded, "
                f"in-order sequence numbers for {position}"
            )
        out[sid] = int(np.searchsorted(arr, sequence_number, side=side))
    return out


def _read_slice(part: _ShardSlice):
    """Arrow-native read: yield ``pyarrow.RecordBatch`` directly (PySpark 4
    DataSource readers accept them) — columnar end-to-end, no Python
    row-at-a-time materialization. Cast normalizes the on-disk parquet
    types (e.g. tz-naive/ns timestamps) to the EVENT_SCHEMA arrow types
    Spark expects (timestamp[us, tz=UTC]).

    Only the row groups overlapping ``[start, end)`` are read — a paged
    query over a large shard file decodes each row group ~once across all
    its micro-batches instead of the whole file per page (the GetRecords
    analog of parquet row-group pruning; full-file reads amplify I/O by
    the page count at scale)."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    from reactive_kinesis_spark.schemas import EVENT_SCHEMA

    pf = pq.ParquetFile(part.file)
    groups, first_row = [], 0
    row = 0
    for g in range(pf.metadata.num_row_groups):
        n = pf.metadata.row_group(g).num_rows
        if row + n > part.start and row < part.end:
            if not groups:
                first_row = row
            groups.append(g)
        row += n
    if not groups:
        return
    table = pf.read_row_groups(groups).slice(
        part.start - first_row, part.end - part.start
    )
    yield from table.cast(to_arrow_schema(EVENT_SCHEMA)).to_batches()


class _ReplayStreamReader(DataSourceStreamReader):
    """Rate limiting note. The Python stream protocol exposes only a
    no-argument ``latestOffset`` — Spark never tells the reader where the
    checkpoint restarted from, so an in-memory planning cursor would reset
    to zero on restart and the source could hand Spark an end offset BELOW
    the committed start (observed: the offset log regresses and rows are
    re-delivered or dropped). Therefore:

    * without ``maxRecordsPerBatch``: ``latestOffset`` returns the shard
      totals — monotone by construction, restart-safe, one micro-batch;
    * with ``maxRecordsPerBatch`` (the KCL ``maxRecords`` analog): the
      planning cursor is made durable — persisted on every ``commit()``
      (atomic rename) to the REQUIRED per-query ``cursorPath`` option and
      restored on construction, the same role the KCL lease table plays
      for GetRecords paging. The cursor is coupled to the checkpoint:
      deleting/recreating the checkpoint requires deleting the cursor
      file too, or planning resumes past rows the new query never saw.
    """

    def __init__(self, options: dict):
        self._path = options.get("path") or options.get("paths")
        if not self._path:
            raise ValueError("kinesis_replay requires option 'path'")
        self._files = _filter_shards(_shard_files(self._path), options.get("shards"))
        self._total = _shard_rows(self._files)
        mrb = options.get("maxrecordsperbatch")
        self._max_records = int(mrb) if mrb is not None else None
        start = str(options.get("startingposition", "trim_horizon")).lower()
        if start not in _POSITIONS:
            raise ValueError(
                f"unsupported startingPosition {start!r}; one of {_POSITIONS}"
            )
        ts_opt = options.get("startingtimestamp")
        # option VALIDATION is eager (bad configs fail at construction);
        # the per-shard file scan behind timestamp/sequence positions is
        # LAZY (see _start_offsets) — on checkpoint restart Spark never
        # calls initialOffset and the durable cursor covers every shard,
        # so reader construction does zero data I/O.
        self._start_args = (
            start,
            _parse_timestamp_us(ts_opt) if ts_opt is not None else None,
            options.get("startingsequencenumber"),
        )
        if start == "at_timestamp" and self._start_args[1] is None:
            raise ValueError("startingPosition=at_timestamp requires startingTimestamp")
        if start.endswith("_sequence_number") and self._start_args[2] is None:
            raise ValueError(f"startingPosition={start} requires startingSequenceNumber")
        self._start_offsets_cache: dict[str, int] | None = None
        # the durable planning cursor is per-query state (the KCL lease
        # table analog) — sharing one file between queries, or outliving a
        # deleted checkpoint, re-delivers or skips rows. Require an explicit
        # per-query path; delete it whenever the checkpoint is deleted.
        self._cursor_path = options.get("cursorpath")
        if self._max_records is not None and not self._cursor_path:
            raise ValueError(
                "maxRecordsPerBatch requires option 'cursorPath' (one file "
                "per query; delete it together with the checkpoint)"
            )
        self._planned: dict[str, int] = self._load_cursor()

    def _load_cursor(self) -> dict[str, int]:
        import json

        if not self._cursor_path:
            return {}
        try:
            with open(self._cursor_path) as fh:
                return {str(k): int(v) for k, v in json.load(fh).items()}
        except (OSError, ValueError):
            return {}

    def _save_cursor(self) -> None:
        import json

        tmp = f"{self._cursor_path}.tmp"
        with open(tmp, "w") as fh:
            json.dump(self._planned, fh)
        os.replace(tmp, self._cursor_path)

    @property
    def _start_offsets(self) -> dict[str, int]:
        """Resolved starting offsets, computed on first use (ADVICE round 2:
        eager resolution re-scanned every shard file on every reader
        construction, including checkpoint restarts that never consult it)."""
        if self._start_offsets_cache is None:
            position, ts_us, seqno = self._start_args
            self._start_offsets_cache = _resolve_start_offsets(
                self._files, self._total, position, ts_us, seqno
            )
        return self._start_offsets_cache

    def _base(self, sid: str) -> int:
        return self._start_offsets[sid]

    def initialOffset(self) -> dict:
        return dict(self._start_offsets)

    def latestOffset(self) -> dict:
        if self._max_records is None:
            return dict(self._total)
        for sid, total in self._total.items():
            # cursor hit avoids touching _start_offsets: a restart with a
            # complete cursor never pays the start-position file scan
            cur = self._planned[sid] if sid in self._planned else self._base(sid)
            self._planned[sid] = min(total, cur + self._max_records)
        return dict(self._planned)

    def partitions(self, start: dict, end: dict):
        parts = [
            _ShardSlice(self._files[sid], int(start.get(sid, 0)), int(end[sid]))
            for sid in end
            if int(end[sid]) > int(start.get(sid, 0))
        ]
        # Spark requires ≥1 partition; an empty batch still needs a no-op
        return parts or [_ShardSlice(next(iter(self._files.values())), 0, 0)]

    def read(self, partition: _ShardSlice):
        return _read_slice(partition)

    def commit(self, end: dict) -> None:
        # reference parity: checkpoint monotonicity — never re-plan below a
        # committed sequence (consumer/ConsumerWorker.scala:515-531).
        # The cursor is persisted on EVERY commit: ``latestOffset()`` advances
        # ``_planned`` to the batch end BEFORE the batch commits, so a
        # "persist only when end > planned" guard never fires and the cursor
        # file would never exist (round-1 duplicate-delivery bug).
        for sid, off in end.items():
            if int(off) > self._planned.get(sid, 0):
                self._planned[sid] = int(off)
        if self._max_records is not None:
            self._save_cursor()

    def stop(self) -> None:
        pass


class _ReplayBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path") or options.get("paths")
        if not path:
            raise ValueError("kinesis_replay requires option 'path'")
        self._files = _filter_shards(_shard_files(path), options.get("shards"))
        self._total = _shard_rows(self._files)

    def partitions(self):
        return [
            _ShardSlice(f, 0, self._total[sid]) for sid, f in self._files.items()
        ]

    def read(self, partition: _ShardSlice):
        return _read_slice(partition)


@dataclass
class _StagedFile(WriterCommitMessage):
    path: str
    rows: int


class _ReplayStreamWriter(DataSourceStreamWriter):
    """Producer side (reference S3–S6): a two-phase-commit stream sink.

    Tasks stage parquet files of ``(partition_key, payload)`` producer
    events (reference models/ProducerEvent.scala:28-37); the driver-side
    ``commit`` publishes them atomically under ``data/batch-<id>-*`` and
    records the batch id in ``_commits/`` — a REPLAYED batch (foreachBatch/
    writer re-execution after restart) is detected there and its staged
    files are discarded, upgrading the reference's at-least-once
    (README.md:684-686) to exactly-once publication.
    """

    def __init__(self, options: dict, schema):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("kinesis_replay sink requires option 'path'")
        names = [f.name for f in schema.fields]
        for required in ("partition_key", "payload"):
            if required not in names:
                raise ValueError(
                    f"kinesis_replay sink requires column {required!r}; got {names}"
                )
        self._schema = schema
        for sub in ("_staging", "_commits", "data"):
            os.makedirs(os.path.join(self._path, sub), exist_ok=True)

    def write(self, iterator) -> _StagedFile:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext
        from pyspark.sql.pandas.types import to_arrow_schema

        rows = list(iterator)
        if not rows:
            # never stage empty partitions: schema-less inference on [] would
            # produce pyarrow null-typed columns and the published data/
            # directory would mix parquet schemas (binary vs null)
            return _StagedFile(path="", rows=0)
        ctx = TaskContext.get()
        staged = os.path.join(
            self._path,
            "_staging",
            f"stage-{ctx.stageId()}-part-{ctx.partitionId()}-attempt-{ctx.taskAttemptId()}.parquet",
        )
        names = [f.name for f in self._schema.fields]
        # explicit schema from the Spark schema — all-NULL columns must
        # still publish with their declared type, not pyarrow null
        table = pa.table(
            {n: [getattr(r, n) for r in rows] for n in names},
            schema=to_arrow_schema(self._schema),
        )
        pq.write_table(table, staged)
        return _StagedFile(path=staged, rows=len(rows))

    def commit(self, messages, batchId: int) -> None:
        marker = os.path.join(self._path, "_commits", f"{batchId}.json")
        if os.path.exists(marker):  # replayed batch → drop duplicates
            for m in messages:
                if m is not None and m.path and os.path.exists(m.path):
                    os.remove(m.path)
            return
        total = 0
        for i, m in enumerate(messages):
            if m is None or not m.path:
                continue
            final = os.path.join(self._path, "data", f"batch-{batchId}-{i:05d}.parquet")
            os.replace(m.path, final)
            total += m.rows
        import json

        tmp = f"{marker}.tmp"
        with open(tmp, "w") as fh:
            json.dump({"batch_id": batchId, "rows": total}, fh)
        os.replace(tmp, marker)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and m.path and os.path.exists(m.path):
                os.remove(m.path)


class KinesisReplayDataSource(DataSource):
    """``spark.read/readStream.format("kinesis_replay")`` (source) and
    ``df.writeStream.format("kinesis_replay")`` (producer sink) after
    ``register_replay_source(spark)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        return EVENT_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _ReplayBatchReader({k.lower(): v for k, v in self.options.items()})

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _ReplayStreamReader({k.lower(): v for k, v in self.options.items()})

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return _ReplayStreamWriter(
            {k.lower(): v for k, v in self.options.items()}, schema
        )


def register_replay_source(spark) -> None:
    """Register the connector on this session (idempotent)."""
    spark.dataSource.register(KinesisReplayDataSource)
