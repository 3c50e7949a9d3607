"""Event-time streaming operators (SURVEY.md §2.2 'Streaming' row):
watermarked tumbling/sliding/session windows, in-watermark dedup, and a
custom stateful operator via ``applyInPandasWithState``.

All helpers are ``DataFrame -> DataFrame`` and work identically on batch
frames (where the watermark is a no-op) — the engine's single-code-path
rule. The batch twins are what the DuckDB oracle verifies (queries/events
q17/q20); these wrappers add the streaming-only concerns: watermarks (late
data), output modes, and state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reactive_kinesis_spark.functions import dsum


def windowed_aggregate(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    group_cols: tuple[str, ...] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` given) event-time window counts
    + optional exact sum. On a streaming frame, rows later than the
    watermark are dropped (the reference has no event-time notion at all —
    this is engine surface the north star mandates)."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(dsum(value_col, "sum_value"))
    return (
        df.groupBy(win.alias("win"), *group_cols)
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            *[a for a in ["n_events", "sum_value"] if a in (["n_events"] + (["sum_value"] if value_col else []))],
        )
    )


def session_aggregate(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows with an inactivity gap (``session_window`` —
    streaming-native sessionization; the batch twin is queries/events
    q20's gaps-and-islands)."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("win"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(
    df: DataFrame,
    keys: tuple[str, ...] = ("partition_key", "sequence_number", "sub_sequence_number"),
    ts_col: str = "approximate_arrival_timestamp",
    watermark: str = "10 minutes",
) -> DataFrame:
    """At-least-once → effectively-once: drop replays of the same
    (key, sequence) within the watermark horizon — the engine-side answer to
    the reference's documented duplicate caveat (README.md:684-686: KPL
    retries ⇒ consumers must tolerate duplicates; sub-sequence numbers exist
    exactly for this dedup)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))


def stateful_running_count(
    df: DataFrame,
    key_col: str = "partition_key",
    ts_col: str = "approximate_arrival_timestamp",
    watermark: str = "10 minutes",
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running record count + high-water sequence across micro-batches — the
    engine twin of the reference's per-shard worker state (batch high-water
    mark carried across batches, ConsumerWorkerSpec.scala:262-299).

    State = (count, max_seq); an optional processing-time timeout expires
    idle keys (lease-release analog). Scales as hash-partitioned keyed
    state (RocksDB state store in production confs).

    ``timeout_minutes`` defaults to None (NoTimeout): with a processing-time
    timeout armed, a Trigger.AvailableNow query can never prove the stream
    is drained (a timeout might still fire) and spins empty micro-batches
    forever. Enable it only on continuously-triggered queries.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField("total_count", LongType()),
            StructField("max_sequence_number", StringType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("count", LongType()),
            StructField("max_seq", StringType()),
        ]
    )

    def update(key: Any, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        count, max_seq = state.get if state.exists else (0, "")
        for pdf in pdfs:
            count += len(pdf)
            if len(pdf):
                batch_max = max(
                    pdf["sequence_number"], key=lambda s: (len(s), s)
                )
                if (len(batch_max), batch_max) > (len(max_seq), max_seq):
                    max_seq = batch_max
        state.update((count, max_seq))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {key_col: [key[0]], "total_count": [count], "max_sequence_number": [max_seq]}
        )

    stream = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_minutes is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def stateful_running_count_tws(
    df: DataFrame,
    key_col: str = "partition_key",
) -> DataFrame:
    """``transformWithStateInPandas`` twin of :func:`stateful_running_count`
    — Spark 4's arbitrary-stateful-processing API (typed value state,
    explicit lifecycle, RocksDB-backed). Same output: per-key cumulative
    count + high-water sequence number per micro-batch.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider``) — the provider the 100 TB deployment
    uses anyway (state >> executor heap) — and the protobuf package
    (:func:`reactive_kinesis_spark.capabilities.transform_with_state`);
    without it this raises immediately with the capability reason instead
    of crashing the first micro-batch's state server.
    """
    from reactive_kinesis_spark.capabilities import transform_with_state

    ok, reason = transform_with_state()
    if not ok:
        raise RuntimeError(reason)

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField("total_count", LongType()),
            StructField("max_sequence_number", StringType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("count", LongType()),
            StructField("max_seq", StringType()),
        ]
    )

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("running", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            count, max_seq = (
                self._state.get() if self._state.exists() else (0, "")
            )
            for pdf in rows:
                count += len(pdf)
                if len(pdf):
                    batch_max = max(
                        pdf["sequence_number"], key=lambda s: (len(s), s)
                    )
                    if (len(batch_max), batch_max) > (len(max_seq), max_seq):
                        max_seq = batch_max
            self._state.update((count, max_seq))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "total_count": [count],
                    "max_sequence_number": [max_seq],
                }
            )

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        RunningCount(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def ewma_running_level(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: tuple = ("ts", "event_id"),
    alpha: float = 0.3,
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of the batch q136 EWMA (``queries/events.py``):
    per-key exponentially-weighted running level via
    ``applyInPandasWithState`` — state is TWO numbers per key
    ``(n_events, level)``, not the full history the batch query folds
    inside one ``collect_list`` array. This is the bounded-state form
    the 100 TB deployment runs continuously; the batch query is the
    backfill/audit twin.

    Bit-exactness contract: within a micro-batch rows fold in
    ``order_cols`` order; ACROSS micro-batches the fold order is
    arrival order, so stream ≡ batch (bit-identical doubles — the fold
    is the same chain of IEEE ``alpha·x + (1−alpha)·acc`` the JVM-side
    ``F.aggregate`` executes) holds exactly when each key's rows arrive
    in nondecreasing ``order_cols`` order across batches — the per-shard
    ordering the source layer guarantees (``streaming/ordering.py``,
    reference ConsumerWorkerSpec ordering semantics). Out-of-order
    delivery degrades gracefully to "EWMA in arrival order" (the usual
    streaming-smoother semantics), it never crashes or double-counts.

    Output (update mode): one ``(key, n_events, ewma)`` row per key per
    micro-batch — the row with the highest ``n_events`` per key is the
    current level (``n_events`` is monotone per key).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    key_type = df.schema[key_col].dataType
    out_schema = StructType(
        [
            StructField(key_col, key_type),
            StructField("n_events", LongType()),
            StructField("ewma", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("level", DoubleType()),
        ]
    )
    a = float(alpha)
    b = 1.0 - a
    ordering = list(order_cols)

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        n, level = state.get if state.exists else (0, 0.0)
        # applyInPandasWithState splits one key's micro-batch rows into
        # multiple Arrow chunks (spark.sql.execution.arrow.maxRecordsPerBatch,
        # default 10k). The within-micro-batch ordering contract is over the
        # WHOLE micro-batch, so concatenate every chunk first and sort ONCE —
        # sorting each chunk independently would fold out-of-order rows that
        # straddle a chunk boundary in the wrong order.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            # kind="stable": pandas defaults to an unstable quicksort, so
            # rows TIED on order_cols would fold in nondeterministic order
            # (and after the concat above, tie groups can span the whole
            # micro-batch). Stable sort pins ties to arrival order, which
            # keeps the fold deterministic even when order_cols is not a
            # total order per key.
            batch = batch.sort_values(ordering, kind="stable")
            for x in batch[value_col]:
                level = a * float(x) + b * level
            n += len(batch)
        state.update((n, level))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "ewma": [level]})

    stream = (
        df.withWatermark(ts_col, watermark)
        if watermark is not None and df.isStreaming
        else df
    )
    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
