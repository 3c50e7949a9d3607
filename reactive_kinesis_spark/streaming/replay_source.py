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
* ``startingPosition`` = ``trim_horizon`` | ``latest`` with
  checkpoint-wins precedence (reference reference.conf:469-477) — Spark's
  offset log overrides the initial position on restart exactly like a KCL
  lease table;
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


@dataclass
class _ShardSlice(InputPartition):
    file: str
    start: int
    end: int


def _read_slice(part: _ShardSlice):
    from datetime import timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pq.read_table(part.file).slice(part.start, part.end - part.start)
    for batch in table.to_batches():
        cols = []
        for i in range(batch.num_columns):
            vals = batch.column(i).to_pylist()
            t = batch.schema.field(i).type
            # Spark's Python worker needs tz-aware datetimes for TimestampType
            if pa.types.is_timestamp(t) and t.tz is None:
                vals = [v.replace(tzinfo=timezone.utc) if v is not None else None for v in vals]
            cols.append(vals)
        yield from zip(*cols)


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
      (atomic rename) to ``cursorPath`` (default
      ``<path>/_replay_cursor.json``) and restored on construction, the
      same role the KCL lease table plays for GetRecords paging. One
      cursor file per concurrently-running query (set ``cursorPath``).
    """

    def __init__(self, options: dict):
        self._path = options.get("path") or options.get("paths")
        if not self._path:
            raise ValueError("kinesis_replay requires option 'path'")
        self._files = _shard_files(self._path)
        self._total = _shard_rows(self._files)
        mrb = options.get("maxrecordsperbatch")
        self._max_records = int(mrb) if mrb is not None else None
        start = str(options.get("startingposition", "trim_horizon")).lower()
        if start not in ("trim_horizon", "latest"):
            raise ValueError(f"unsupported startingPosition {start!r}")
        self._start_latest = start == "latest"
        self._cursor_path = options.get(
            "cursorpath", os.path.join(self._path, "_replay_cursor.json")
        )
        self._planned: dict[str, int] = self._load_cursor()

    def _load_cursor(self) -> dict[str, int]:
        import json

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

    def _base(self, sid: str) -> int:
        return self._total[sid] if self._start_latest else 0

    def initialOffset(self) -> dict:
        if self._start_latest:
            return dict(self._total)
        return {sid: 0 for sid in self._files}

    def latestOffset(self) -> dict:
        if self._max_records is None:
            return dict(self._total)
        for sid, total in self._total.items():
            cur = self._planned.get(sid, self._base(sid))
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
        # committed sequence (consumer/ConsumerWorker.scala:515-531)
        changed = False
        for sid, off in end.items():
            if int(off) > self._planned.get(sid, 0):
                self._planned[sid] = int(off)
                changed = True
        if self._max_records is not None and changed:
            self._save_cursor()

    def stop(self) -> None:
        pass


class _ReplayBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path") or options.get("paths")
        if not path:
            raise ValueError("kinesis_replay requires option 'path'")
        self._files = _shard_files(path)
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

        ctx = TaskContext.get()
        staged = os.path.join(
            self._path,
            "_staging",
            f"stage-{ctx.stageId()}-part-{ctx.partitionId()}-attempt-{ctx.taskAttemptId()}.parquet",
        )
        rows = list(iterator)
        names = [f.name for f in self._schema.fields]
        table = pa.table({n: [getattr(r, n) for r in rows] for n in names})
        pq.write_table(table, staged)
        return _StagedFile(path=staged, rows=len(rows))

    def commit(self, messages, batchId: int) -> None:
        marker = os.path.join(self._path, "_commits", f"{batchId}.json")
        if os.path.exists(marker):  # replayed batch → drop duplicates
            for m in messages:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)
            return
        total = 0
        for i, m in enumerate(messages):
            if m is None:
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
            if m is not None and os.path.exists(m.path):
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
