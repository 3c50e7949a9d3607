"""Tolerate-or-halt DLQ operator (B3–B5/L3 in SURVEY.md §2.1) — the one
genuinely non-built-in semantic in the reference.

Reference behavior (consumer/ConsumerWorker.scala:396-414): after retries,
if the unconfirmed fraction of a batch is ≤ ``failureTolerancePercentage``
(reference.conf:424-430, default 0.25%), the worker *pretends* they were
confirmed — checkpoints past them and continues; otherwise it emits
``ConsumerWorkerFailure`` and shuts the shard down. Per-record skips
(B3, ConsumerWorker.scala:104-110) also advance the checkpoint.

Spark restatement: per micro-batch, rows failing a user predicate go to a
dead-letter sink when within tolerance (batch still commits ⇒ checkpoint
advances past them — B3's skip semantics); beyond tolerance the batch
raises, Spark retries it (B4 analog: spark.task.maxFailures + query
restart), and the query terminates with the error (L3's escalation).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ToleranceExceededError(RuntimeError):
    """Raised when a micro-batch's failure fraction exceeds tolerance —
    the engine's ``ConsumerWorkerFailure`` (ConsumerWorker.scala:408-414)."""

    def __init__(self, batch_id: int, failed: int, total: int, tolerance_pct: float):
        self.batch_id, self.failed, self.total = batch_id, failed, total
        self.tolerance_pct = tolerance_pct
        super().__init__(
            f"batch {batch_id}: {failed}/{total} failed rows "
            f"({100.0 * failed / max(total, 1):.3f}% > tolerance {tolerance_pct}%)"
        )


def split_by_predicate(df: DataFrame, ok: Column) -> tuple[DataFrame, DataFrame]:
    """(good, bad) split on a predicate column; null predicate counts bad."""
    good = df.where(ok)
    bad = df.where(~F.coalesce(ok, F.lit(False)))
    return good, bad


def tolerant_foreach_batch(
    ok: Column,
    process: Callable[[DataFrame, int], None],
    dlq: Callable[[DataFrame, int], None] | None = None,
    tolerance_pct: float = 0.25,
    failed_message_retries: int = 1,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function with retry-then-tolerate-or-halt
    semantics.

    ``ok``: predicate marking a row as successfully processable;
    ``process``: sink for good rows; ``dlq``: sink for tolerated bad rows
    (defaults to dropping them, which is exactly the reference's skip);
    ``tolerance_pct``: max % of bad rows per batch before halting;
    ``failed_message_retries``: before tolerance accounting, re-evaluate
    ``ok`` on ONLY the failed subset up to this many times, promoting rows
    that succeed on retry into the good set — the reference's in-batch
    retry of unconfirmed events (consumer/ConsumerWorker.scala:385-394;
    default 1 mirrors ``failed-message-retries``, reference.conf:419-422;
    behavior matrix ConsumerWorkerSpec.scala:302-461). Transient per-record
    failures (flaky external lookups in the predicate) clear on retry and
    never reach the DLQ; deterministic failures cost one cheap extra
    evaluation of the (tiny) failed subset.

    Each evaluation round is pinned with ``persist`` + a materializing
    count, so a non-deterministic predicate cannot give inconsistent
    answers between the good/bad splits of one round.
    """

    def run(batch_df: DataFrame, batch_id: int) -> None:
        pinned: list[DataFrame] = []

        def flag(df: DataFrame) -> tuple[DataFrame, int, int]:
            """Evaluate the predicate once, pinned: (flagged, total, failed)."""
            flagged = df.withColumn("__ok", F.coalesce(ok, F.lit(False))).persist()
            pinned.append(flagged)
            counts = flagged.agg(
                F.count(F.lit(1)).alias("total"),
                F.sum(F.when(F.col("__ok"), 0).otherwise(1)).alias("failed"),
            ).collect()[0]
            return flagged, counts["total"] or 0, counts["failed"] or 0

        try:
            flagged, total, failed = flag(batch_df)
            good = flagged.where(F.col("__ok")).drop("__ok")
            bad = flagged.where(~F.col("__ok")).drop("__ok")
            for _ in range(failed_message_retries):
                if not failed:
                    break
                reflagged, _, failed = flag(bad)
                good = good.union(reflagged.where(F.col("__ok")).drop("__ok"))
                bad = reflagged.where(~F.col("__ok")).drop("__ok")
            if total and 100.0 * failed / total > tolerance_pct:
                raise ToleranceExceededError(batch_id, failed, total, tolerance_pct)
            if failed and dlq is not None:
                dlq(bad, batch_id)
            process(good, batch_id)
        finally:
            for df in pinned:
                df.unpersist()

    return run


class QualityGateError(RuntimeError):
    """A micro-batch failed the constraint suite and halt_on_fail is set."""

    def __init__(self, batch_id: int, failed_checks: list):
        self.batch_id = batch_id
        self.failed_checks = failed_checks
        names = ", ".join(
            f"{r['check_name']}({r['column_name']})={r['violations']}"
            for r in failed_checks
        )
        super().__init__(f"batch {batch_id} failed quality gate: {names}")


def quality_gate_foreach_batch(
    checks: dict,
    process: Callable[[DataFrame, int], None],
    quarantine: Callable[[DataFrame, int], None] | None = None,
    halt_on_fail: bool = False,
    on_report: Callable[[list, int], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Batch-level admission control: run the declarative constraint
    suite (:func:`operators.quality.check_constraints`; ``checks`` are
    its keyword arguments) on every micro-batch and gate the WHOLE batch
    — the coarse-grained companion to :func:`tolerant_foreach_batch`'s
    per-record skip/DLQ (reference analog: the tolerance layer halts on
    exceeded per-record failure rates; this halts/quarantines on suite
    failures like schema regressions or broken referential integrity,
    which are batch-shaped, not record-shaped).

    On a failing suite: raise :class:`QualityGateError` if
    ``halt_on_fail`` (stops the query — operator intervention), else
    route the batch to ``quarantine`` (or drop it if None). ``on_report``
    receives the full check report (a tiny list — one row per check) for
    every batch, pass/fail — the metrics feed.

    The batch is persisted across the two consumptions (check pass +
    sink) so the source isn't re-read.
    """

    def run(batch_df: DataFrame, batch_id: int) -> None:
        from reactive_kinesis_spark.operators.quality import check_constraints

        pinned = batch_df.persist()
        try:
            report = [r.asDict() for r in check_constraints(pinned, **checks).collect()]
            if on_report is not None:
                on_report(report, batch_id)
            failed = [r for r in report if not r["passed"]]
            if failed:
                if halt_on_fail:
                    raise QualityGateError(batch_id, failed)
                if quarantine is not None:
                    quarantine(pinned, batch_id)
                return
            process(pinned, batch_id)
        finally:
            pinned.unpersist()

    return run


class DriftGateError(RuntimeError):
    """A micro-batch's value distribution drifted past the TVD threshold
    and halt_on_drift is set."""

    def __init__(self, batch_id: int, tvd: float, threshold: float):
        self.batch_id = batch_id
        self.tvd = tvd
        self.threshold = threshold
        super().__init__(
            f"batch {batch_id} drifted: TVD {tvd:.4f} > threshold {threshold:.4f}"
        )


def drift_gate_foreach_batch(
    reference_cuts: list,
    reference_fracs: list,
    value_col: str,
    process: Callable[[DataFrame, int], None],
    threshold: float = 0.2,
    quarantine: Callable[[DataFrame, int], None] | None = None,
    halt_on_drift: bool = False,
    on_report: Callable[[dict, int], None] | None = None,
    min_rows: int = 1,
) -> Callable[[DataFrame, int], None]:
    """Streaming data-drift gate — the micro-batch twin of
    :func:`operators.quality.distribution_drift` (q125), split the same
    way as the anomaly tier's batch-baseline → stream-scorer pair: the
    expensive reference profile (equi-depth ``reference_cuts`` boundaries
    + ``reference_fracs`` bucket fractions, from
    ``distribution_drift``'s ref side or a profiling batch job) is
    computed ONCE offline; each micro-batch then pays one narrow
    bucket-assignment pass + one tiny count aggregate, and its
    total-variation distance against the reference decides admission.
    The stream side never shuffles more than ``len(cuts)+1`` count rows.

    Gate semantics mirror :func:`quality_gate_foreach_batch`:
    ``TVD > threshold`` ⇒ raise :class:`DriftGateError` if
    ``halt_on_drift`` (operator intervention), else ``quarantine`` (or
    drop). ``on_report`` receives ``{"tvd": .., "n": .., "fracs": [..]}``
    every batch — the metrics feed. Batches with fewer than ``min_rows``
    non-null values pass through ungated (a 3-row batch's empirical
    distribution is noise, not drift).
    """
    if len(reference_fracs) != len(reference_cuts) + 1:
        raise ValueError(
            f"need len(cuts)+1 fractions: {len(reference_cuts)} cuts, "
            f"{len(reference_fracs)} fracs"
        )
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    cuts = [float(c) for c in reference_cuts]
    fracs = [float(f) for f in reference_fracs]

    def run(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        pinned = batch_df.persist()
        try:
            v = pinned.select(F.col(value_col).alias("v")).where(
                F.col("v").isNotNull()
            )
            bucket = F.lit(0)
            for c in cuts:
                bucket = bucket + F.when(F.col("v") > F.lit(c), 1).otherwise(0)
            counts = {
                r["bucket"]: r["n"]
                for r in v.select(bucket.alias("bucket"))
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            n = sum(counts.values())
            if n < min_rows:
                if on_report is not None:
                    on_report({"tvd": None, "n": n, "fracs": None}, batch_id)
                process(pinned, batch_id)
                return
            cur = [counts.get(b, 0) / n for b in range(len(fracs))]
            tvd = 0.5 * sum(abs(p - q) for p, q in zip(fracs, cur))
            if on_report is not None:
                on_report({"tvd": tvd, "n": n, "fracs": cur}, batch_id)
            if tvd > threshold:
                if halt_on_drift:
                    raise DriftGateError(batch_id, tvd, threshold)
                if quarantine is not None:
                    quarantine(pinned, batch_id)
                return
            process(pinned, batch_id)
        finally:
            pinned.unpersist()

    return run
