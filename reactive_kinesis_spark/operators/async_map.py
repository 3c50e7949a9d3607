"""Bounded-concurrency per-record async map (P2 in SURVEY.md §2.1).

The reference exposes ``CommittableEvent.mapAsync(parallelism)`` for
per-event IO — "download a file per event" is its documented use
(stream/KinesisSourceGraphStage.scala:91,111-115; README.md:355) — with at
most ``parallelism`` futures in flight and stage failure on a failed future.

Spark-first mapping: the *batch* dimension is already parallel (one task per
partition); what the reference's operator adds is intra-stream concurrency
for LATENCY-bound per-record work (HTTP fetches, KV lookups) that would
otherwise serialize inside a task. :func:`map_async` runs the user function
over each Arrow batch through a bounded thread pool inside ``mapInPandas``:

* narrow transform — no shuffle, no driver round-trip;
* in-flight calls per task ≤ ``parallelism`` (pool size), so total fan-out
  to the external service is ``num_tasks × parallelism`` — size accordingly;
* results stay in input order within each batch, so the operator composes
  with downstream order-sensitive logic exactly like the reference's stream
  stage (which emits in upstream order);
* buffered-but-unyielded results per task ≤ ``window`` (a FIFO of pending
  futures drained in submission order, chunks yielded as they fill), so
  task memory is O(window), independent of the Arrow batch size — the
  sliding ack window of the reference's sink stage
  (stream/KinesisSinkGraphStage.scala:100-105), applied to results;
* an exception from ``fn`` fails the task → Spark retry → query failure,
  the reference's failed-future ⇒ stage-failure contract (first failure in
  submission order re-raises; later in-flight calls are drained by pool
  shutdown, never silently dropped mid-result).

Threads (not asyncio) because the payload is a plain callable — user IO
libraries (requests, boto3, redis) are sync; the GIL releases on IO waits,
which is the bound resource here. CPU-bound work should NOT use this
operator — vectorize it in the batch instead.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def _bounded_ordered_map(
    pool, fn: Callable[[dict], dict], records: Iterable[dict], window: int
) -> Iterator[list[dict]]:
    """Run ``fn`` over ``records`` through ``pool``, yielding result chunks
    in input order with at most ``window`` results pending/buffered at once.

    The pending deque holds ≤ ``window`` futures (submission stalls on the
    oldest one when full) and the result buffer holds ≤ ``window`` completed
    rows awaiting their chunk yield, so peak unyielded results ≤ 2·window —
    O(window) regardless of input length. The first exception, in submission
    order, re-raises on its ``result()`` call.
    """
    from collections import deque

    pending: deque = deque()
    buf: list[dict] = []
    for rec in records:
        if len(pending) >= window:
            buf.append(pending.popleft().result())
            if len(buf) >= window:
                yield buf
                buf = []
        pending.append(pool.submit(fn, rec))
    while pending:
        buf.append(pending.popleft().result())
        if len(buf) >= window:
            yield buf
            buf = []
    if buf:
        yield buf


def map_async(
    df: DataFrame,
    fn: Callable[[dict], dict],
    output_schema: StructType | str,
    parallelism: int = 8,
    window: int = 1024,
) -> DataFrame:
    """Apply ``fn`` (a per-record, IO-bound callable ``dict -> dict``) to
    every row with at most ``parallelism`` concurrent in-flight calls per
    Spark task; returns a DataFrame of ``output_schema``.

    ``window`` caps per-task result buffering: at most ``2·window``
    completed-but-unyielded results are held (window in-flight + one
    window-sized chunk being assembled), independent of
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` — large Arrow batches
    stream through in ``window``-sized chunks instead of materializing all
    results first. Must be ≥ ``parallelism`` or the pool would idle.
    """
    if parallelism < 1:
        raise ValueError(f"parallelism must be >= 1, got {parallelism}")
    if window < parallelism:
        raise ValueError(f"window ({window}) must be >= parallelism ({parallelism})")

    def run(batches: Iterator) -> Iterator:
        import concurrent.futures as cf

        import pandas as pd

        with cf.ThreadPoolExecutor(max_workers=parallelism) as pool:
            for pdf in batches:
                if pdf.empty:
                    continue
                for chunk in _bounded_ordered_map(
                    pool, fn, pdf.to_dict("records"), window
                ):
                    yield pd.DataFrame(chunk)

    return df.mapInPandas(run, output_schema)
