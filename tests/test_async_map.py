"""map_async (P2): bounded-concurrency per-record IO inside mapInPandas —
the engine's analog of the reference's ``CommittableEvent.mapAsync``
(stream/KinesisSourceGraphStage.scala:91,111-115; its spec proves parallel
per-event work completes and propagates failure,
KinesisSourceGraphStageSpec.scala:72-85)."""

from __future__ import annotations

import os
import time

import pytest

from reactive_kinesis_spark.operators import map_async

OUT_SCHEMA = "id long, doubled long"


def _make_fn(log_dir: str | None = None, delay: float = 0.0, fail_id: int | None = None):
    """Build the per-record fn in function scope (cloudpickle by-value; the
    worker cannot import the test module). Each call appends enter/exit
    events to ``log_dir`` (O_APPEND is atomic for these tiny writes) so the
    driver can reconstruct the concurrency profile afterwards."""

    def fn(row: dict) -> dict:
        if fail_id is not None and row["id"] == fail_id:
            raise RuntimeError(f"boom on {row['id']}")
        if log_dir:
            pid = os.getpid()
            with open(os.path.join(log_dir, f"{pid}.log"), "a") as fh:
                fh.write(f"enter {time.monotonic():.6f}\n")
        if delay:
            time.sleep(delay)
        if log_dir:
            with open(os.path.join(log_dir, f"{pid}.log"), "a") as fh:
                fh.write(f"exit {time.monotonic():.6f}\n")
        return {"id": row["id"], "doubled": row["id"] * 2}

    return fn


def _max_concurrency(log_dir: str) -> int:
    """Max simultaneously-in-flight calls within any single worker process
    (per-task bound is what map_async promises)."""
    worst = 0
    for name in os.listdir(log_dir):
        events = []
        with open(os.path.join(log_dir, name)) as fh:
            for line in fh:
                kind, t = line.split()
                events.append((float(t), 1 if kind == "enter" else -1))
        cur = 0
        for _, delta in sorted(events):
            cur += delta
            worst = max(worst, cur)
    return worst


def test_results_correct_and_complete(spark):
    df = spark.range(500).repartition(4)
    out = map_async(df, _make_fn(), OUT_SCHEMA, parallelism=8).collect()
    assert sorted((r.id, r.doubled) for r in out) == [(i, 2 * i) for i in range(500)]


def test_concurrent_execution_with_bounded_inflight(spark, tmp_path):
    """80 records × 50 ms on 2 partitions at parallelism=8: sequential would
    need ≥ 2 s of per-task sleep; concurrency must cut wall-clock well below
    that, while never exceeding 8 in flight within a worker."""
    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    df = spark.range(80).repartition(2)
    out = map_async(df, _make_fn(log_dir, delay=0.05), OUT_SCHEMA, parallelism=8).collect()
    assert len(out) == 80
    # The enter/exit log is the load-robust concurrency proof (a wall-clock
    # bound flakes when the suite saturates the machine): the pool must
    # genuinely overlap calls (≥ 4 of the 8 workers simultaneously inside
    # 50 ms sleeps) while never exceeding the promised bound.
    conc = _max_concurrency(log_dir)
    assert 4 <= conc <= 8, f"concurrency profile out of bounds: {conc}"


def test_order_preserved_within_partition(spark):
    """Executor.map keeps input order — downstream order-sensitive logic
    sees rows exactly as the source emitted them (the reference stage's
    emit-in-upstream-order contract)."""
    df = spark.range(200).coalesce(1)
    rows = map_async(df, _make_fn(), OUT_SCHEMA, parallelism=8).collect()
    assert [r.id for r in rows] == list(range(200))


def test_failure_escalates(spark):
    df = spark.range(50).coalesce(1)
    with pytest.raises(Exception, match="boom on 17"):
        map_async(df, _make_fn(fail_id=17), OUT_SCHEMA, parallelism=4).collect()


def test_invalid_parallelism():
    with pytest.raises(ValueError):
        map_async(None, _make_fn(), OUT_SCHEMA, parallelism=0)
    with pytest.raises(ValueError, match="window"):
        map_async(None, _make_fn(), OUT_SCHEMA, parallelism=8, window=4)


def test_window_bounds_buffered_results_and_keeps_order():
    """The result window is the memory cap: with window=w, at most w results
    are pending/buffered at any moment even for an arbitrarily large batch,
    and chunks come back in exact input order."""
    import concurrent.futures as cf

    from reactive_kinesis_spark.operators.async_map import _bounded_ordered_map

    n, window = 500, 16
    state = {"unyielded": 0, "worst": 0}

    def fn(rec):
        state["unyielded"] += 1
        state["worst"] = max(state["worst"], state["unyielded"])
        return rec

    out: list[dict] = []
    with cf.ThreadPoolExecutor(max_workers=4) as pool:
        for chunk in _bounded_ordered_map(
            pool, fn, ({"id": i} for i in range(n)), window
        ):
            assert len(chunk) <= window
            state["unyielded"] -= len(chunk)
            out.extend(chunk)
    # worst counts completed-or-running results not yet yielded; the deque
    # admits ≤ window futures and the chunk buffer ≤ window popped results,
    # so the documented bound is 2·window (+1 transient for the row whose
    # submit raced the drain).
    assert state["worst"] <= 2 * window + 1, state["worst"]
    assert [r["id"] for r in out] == list(range(n))


def test_window_smaller_than_batch_still_fails_fast(spark):
    """A failure deep in a large batch escalates even when earlier windows
    already yielded (partial output is discarded by the task failure)."""
    df = spark.range(300).coalesce(1)
    with pytest.raises(Exception, match="boom on 250"):
        map_async(
            df, _make_fn(fail_id=250), OUT_SCHEMA, parallelism=4, window=8
        ).collect()


def test_map_async_runs_under_readstream(spark, tmp_path):
    """The §7 design rule (every operator DataFrame→DataFrame) holds for
    map_async: the SAME call runs under readStream — per-record bounded-
    concurrency IO inside a micro-batch, the reference's mapAsync-in-stream
    shape (stream/KinesisSourceGraphStage.scala:91)."""
    src = str(tmp_path / "src")
    spark.range(100).write.parquet(src)
    stream = spark.readStream.schema("id long").parquet(src)
    out = map_async(stream, _make_fn(), OUT_SCHEMA, parallelism=4)
    q = (
        out.writeStream.format("memory")
        .queryName("async_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM async_stream").collect()
    assert sorted((r.id, r.doubled) for r in rows) == [(i, 2 * i) for i in range(100)]
