"""bench.run_queries failure-isolation contract (the round-3 postmortem:
one AnalysisException in the warm-up loop zeroed the whole round's bench).
A failing query — at warm-up or mid-timing — must land in the errors map
while every healthy query still produces a median."""

from __future__ import annotations

from dataclasses import dataclass

from bench import run_queries


@dataclass
class _Q:
    fn: object


def _good(spark, sf_dir):
    return spark.range(3)


def _boom(spark, sf_dir):
    raise RuntimeError("synthetic failure")


class _FlakySecondRun:
    """Passes warm-up and run 1, raises on run 2 — the mid-timing path."""

    def __init__(self):
        self.calls = 0

    def __call__(self, spark, sf_dir):
        self.calls += 1
        if self.calls >= 3:  # warm-up + first timed run succeed
            raise RuntimeError("flaky after warm-up")
        return spark.range(3)


def test_failed_warmup_is_isolated(spark):
    registry = {"good": _Q(_good), "bad": _Q(_boom)}
    timings, errors = run_queries(spark, registry, ["good", "bad"], "unused", n_runs=1)
    assert set(timings) == {"good"} and timings["good"] >= 0
    assert set(errors) == {"bad"} and "synthetic failure" in errors["bad"]


def test_failed_timed_run_is_isolated(spark):
    registry = {"good": _Q(_good), "flaky": _Q(_FlakySecondRun())}
    timings, errors = run_queries(spark, registry, ["good", "flaky"], "unused", n_runs=2)
    assert set(timings) == {"good"}
    assert set(errors) == {"flaky"} and "flaky after warm-up" in errors["flaky"]


def test_unknown_query_name_is_isolated(spark):
    timings, errors = run_queries(spark, {"good": _Q(_good)}, ["good", "ghost"], "u", n_runs=1)
    assert set(timings) == {"good"}
    assert "KeyError" in errors["ghost"]
