"""Continuous rollup — a streaming materialized view over mergeable
aggregates.

The batch+streaming answer to "keep a keyed summary table continuously
up to date": every micro-batch folds its rows into per-key PARTIAL
aggregates (count / sum / min / max — the mergeable algebra), the
partials are persisted exactly-once, and readers (or a downstream
dashboard query) merge base + deltas into the final measures on scan.
This is the hypertable / continuous-aggregate pattern re-expressed on
Structured Streaming primitives, and the maintenance story mirrors
``io.compact_files``: deltas accumulate one tiny pre-aggregated
partition per micro-batch, and :func:`compact_rollup` periodically
folds them into the bucketed base.

Exactly-once: Structured Streaming replays ``foreachBatch`` with the
SAME batchId after a crash, so each delta is written under a
``_batch_id=<id>`` partition with dynamic-partition overwrite — a
replay overwrites its own previous (possibly partial) attempt instead
of double-counting (the ``sink.idempotent_foreach_batch`` rule).
Compaction writes a new base embedding a high-water batch id
(``_meta.json`` inside the base dir, swapped atomically WITH the data)
and readers ignore deltas at or below the watermark — so a crash
between base swap and delta cleanup cannot double-count either; the
leftover deltas are lazily garbage-collected on the next compaction.

100 TB shape: the streaming side never holds state (no
state-store blowup — the "state" IS the table); each delta is a
per-key aggregate of one micro-batch (map-side combined, tiny); the
read-side merge is one groupBy over base ∪ fresh deltas, and after
compaction the base can be bucketed by key so the merge is
shuffle-free. avg is derived at read time from (sum, count) — only
mergeable partials are ever stored.

Reference parity: reactive-kinesis has no aggregate maintenance at
all (consumers process record-by-record; any rollup is the user's
problem downstream) — this module is part of the engine surface the
brief adds beyond the connector.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META = "_meta.json"


@dataclass(frozen=True)
class RollupSpec:
    """Mergeable rollup definition: group keys + measure columns.

    For each column in ``sums``/``mins``/``maxs`` the rollup stores
    ``sum_<c>`` / ``min_<c>`` / ``max_<c>`` partials; ``n`` (row count)
    is always kept — it is the merge weight for derived means.
    Sums should be integer-typed or pre-quantized by the caller: a
    float sum's value depends on fold order, which a merge tree does
    not fix (the engine-wide exactness rule).
    """

    keys: tuple[str, ...]
    sums: tuple[str, ...] = ()
    mins: tuple[str, ...] = ()
    maxs: tuple[str, ...] = ()

    def partial_aggs(self) -> list:
        aggs = [F.count(F.lit(1)).cast("long").alias("n")]
        aggs += [F.sum(c).alias(f"sum_{c}") for c in self.sums]
        aggs += [F.min(c).alias(f"min_{c}") for c in self.mins]
        aggs += [F.max(c).alias(f"max_{c}") for c in self.maxs]
        return aggs

    def merge_aggs(self) -> list:
        aggs = [F.sum("n").cast("long").alias("n")]
        aggs += [F.sum(f"sum_{c}").alias(f"sum_{c}") for c in self.sums]
        aggs += [F.min(f"min_{c}").alias(f"min_{c}") for c in self.mins]
        aggs += [F.max(f"max_{c}").alias(f"max_{c}") for c in self.maxs]
        return aggs


def _paths(out_dir: str) -> tuple[str, str]:
    return os.path.join(out_dir, "base"), os.path.join(out_dir, "deltas")


def _has_deltas(delta_dir: str) -> bool:
    """A just-GC'd deltas dir has no ``_batch_id=`` partitions left —
    reading it would fail schema inference, and there is nothing to
    merge anyway."""
    if not os.path.exists(delta_dir):
        return False
    return any(e.startswith("_batch_id=") for e in os.listdir(delta_dir))


def _watermark(base_dir: str) -> int:
    meta = os.path.join(base_dir, _META)
    if os.path.exists(meta):
        with open(meta, encoding="utf-8") as fh:
            return int(json.load(fh)["max_batch_id"])
    return -1


def continuous_rollup(out_dir: str, spec: RollupSpec):
    """Build the ``foreachBatch`` writer maintaining the rollup at
    ``out_dir``: per batch, ONE groupBy producing the key-level partials,
    persisted under ``deltas/_batch_id=<id>`` with replay-overwrite.

    Use::

        q = (events.writeStream
             .foreachBatch(continuous_rollup(path, spec))
             .option("checkpointLocation", ckpt).start())
    """

    _, delta_dir = _paths(out_dir)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        partials = batch_df.groupBy(*spec.keys).agg(*spec.partial_aggs())
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                partials.withColumn("_batch_id", F.lit(batch_id))
                .repartition(1)  # a delta is a tiny pre-aggregated frame
                .write.mode("overwrite")
                .partitionBy("_batch_id")
                .parquet(delta_dir)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return write


def read_rollup(spark: SparkSession, out_dir: str, spec: RollupSpec) -> DataFrame:
    """Merge base + fresh deltas into the current rollup: one groupBy on
    the keys over pre-aggregated partials. Deltas at or below the base's
    high-water batch id are ignored (they are already folded in)."""
    base_dir, delta_dir = _paths(out_dir)
    frames = []
    if os.path.exists(base_dir):
        frames.append(
            spark.read.parquet(base_dir).withColumn("_batch_id", F.lit(-1))
        )
    if _has_deltas(delta_dir):
        wm = _watermark(base_dir)
        deltas = spark.read.parquet(delta_dir)
        frames.append(deltas.where(F.col("_batch_id") > F.lit(wm)))
    if not frames:
        raise FileNotFoundError(f"no rollup state at {out_dir}")
    all_parts = frames[0]
    for f in frames[1:]:
        all_parts = all_parts.unionByName(f)
    return all_parts.groupBy(*spec.keys).agg(*spec.merge_aggs())


def compact_rollup(spark: SparkSession, out_dir: str, spec: RollupSpec) -> dict:
    """Fold every fresh delta into the base and advance the watermark.

    The new base (data + ``_meta.json`` watermark) is staged into a
    sibling dir and swapped in with one atomic rename, so readers see
    either the old base+deltas or the new base — never a half state.
    Delta partitions at or below the new watermark are then deleted;
    if that cleanup is interrupted, readers still ignore them via the
    watermark and the next compaction finishes the job.
    """
    base_dir, delta_dir = _paths(out_dir)
    if not _has_deltas(delta_dir):
        return {"folded_batches": 0}
    deltas = spark.read.parquet(delta_dir)
    wm = _watermark(base_dir)
    fresh = deltas.where(F.col("_batch_id") > F.lit(wm))
    batch_ids = [r[0] for r in fresh.select("_batch_id").distinct().collect()]
    if not batch_ids:
        return {"folded_batches": 0}
    merged = read_rollup(spark, out_dir, spec)
    tmp = base_dir.rstrip("/") + "._compact_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, _META), "w", encoding="utf-8") as fh:
        json.dump({"max_batch_id": max(batch_ids)}, fh)
    old = base_dir.rstrip("/") + "._compact_old"
    if os.path.exists(base_dir):
        os.rename(base_dir, old)
    os.rename(tmp, base_dir)
    shutil.rmtree(old, ignore_errors=True)
    spark.catalog.refreshByPath(base_dir)
    # lazy GC of folded delta partitions (safe: watermark already advanced)
    for bid in batch_ids:
        shutil.rmtree(
            os.path.join(delta_dir, f"_batch_id={bid}"), ignore_errors=True
        )
    return {"folded_batches": len(batch_ids), "watermark": max(batch_ids)}
