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
* results stay in input order within each batch (``Executor.map``), so the
  operator composes with downstream order-sensitive logic exactly like the
  reference's stream stage (which emits in upstream order);
* an exception from ``fn`` fails the task → Spark retry → query failure,
  the reference's failed-future ⇒ stage-failure contract.

Threads (not asyncio) because the payload is a plain callable — user IO
libraries (requests, boto3, redis) are sync; the GIL releases on IO waits,
which is the bound resource here. CPU-bound work should NOT use this
operator — vectorize it in the batch instead.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def map_async(
    df: DataFrame,
    fn: Callable[[dict], dict],
    output_schema: StructType | str,
    parallelism: int = 8,
) -> DataFrame:
    """Apply ``fn`` (a per-record, IO-bound callable ``dict -> dict``) to
    every row with at most ``parallelism`` concurrent in-flight calls per
    Spark task; returns a DataFrame of ``output_schema``."""
    if parallelism < 1:
        raise ValueError(f"parallelism must be >= 1, got {parallelism}")

    def run(batches: Iterator) -> Iterator:
        import concurrent.futures as cf

        import pandas as pd

        with cf.ThreadPoolExecutor(max_workers=parallelism) as pool:
            for pdf in batches:
                if pdf.empty:
                    continue
                # Executor.map: ≤ max_workers in flight, results in input
                # order, first exception re-raised on iteration (fail-fast).
                results = list(pool.map(fn, pdf.to_dict("records")))
                yield pd.DataFrame(results)

    return df.mapInPandas(run, output_schema)
