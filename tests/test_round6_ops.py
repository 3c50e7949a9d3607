"""Round-6 contract tests: the ADVICE.md null-handling / robustness fixes
(snapshot_diff presence markers, canonical_pick NULL-text routing and
collision-safe internals, profile_table identifier safety) and the
resample_ffill generalization (tiebreak column, multi-grain step,
enforceable max_span clamp)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from reactive_kinesis_spark.operators.dedup import canonical_pick, snapshot_diff
from reactive_kinesis_spark.queries.events import resample_ffill


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, schema="doc_id long, source string, text string, n_chars int"
    )


class TestSnapshotDiffNulls:
    """Presence must come from explicit markers, never from md5 NULL-ness
    (md5(NULL) IS NULL made NULL-text rows report 'added' regardless of
    which side they were on)."""

    def test_null_text_removed_is_removed(self, spark):
        old = _docs(spark, [(1, "s", None, 0)])
        new = _docs(spark, [(2, "s", "x", 1)])
        out = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
        assert out == {1: "removed", 2: "added"}

    def test_null_text_both_sides_is_unchanged(self, spark):
        old = _docs(spark, [(1, "s", None, 0)])
        new = _docs(spark, [(1, "s", None, 0)])
        out = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
        assert out == {1: "unchanged"}

    def test_null_to_text_and_text_to_null_are_changed(self, spark):
        old = _docs(spark, [(1, "s", None, 0), (2, "s", "b", 1)])
        new = _docs(spark, [(1, "s", "a", 1), (2, "s", None, 0)])
        out = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
        assert out == {1: "changed", 2: "changed"}

    def test_null_text_added_is_added(self, spark):
        old = _docs(spark, [(1, "s", "a", 1)])
        new = _docs(spark, [(1, "s", "a", 1), (2, "s", None, 0)])
        out = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
        assert out == {1: "unchanged", 2: "added"}


class TestCanonicalPickNulls:
    def test_null_text_rows_each_survive_as_singleton_groups(self, spark):
        # md5(NULL)=NULL previously collapsed ALL null-text rows into one
        # window group, dropping all but one despite not being duplicates
        rows = [
            (1, "s", None, 0),
            (2, "s", "same", 4),
            (3, "s", None, 0),
            (4, "s", "same", 4),
        ]
        out = canonical_pick(
            _docs(spark, rows), order_by=[F.col("n_chars").desc()]
        ).collect()
        by_id = {r.doc_id: r for r in out}
        assert sorted(by_id) == [1, 2, 3]  # both null rows + one 'same' pick
        assert by_id[1].group_size == 1 and by_id[3].group_size == 1
        assert by_id[2].group_size == 2

    def test_preexisting_rn_column_is_not_clobbered(self, spark):
        df = _docs(spark, [(1, "s", "t", 5), (2, "s", "t", 9)]).withColumn(
            "rn", F.lit(42)
        )
        out = canonical_pick(df, order_by=[F.col("n_chars").desc()]).collect()
        assert len(out) == 1 and out[0].doc_id == 2
        assert out[0].rn == 42  # caller's column passes through untouched


class TestProfileTableIdentifierSafety:
    def test_weird_column_names_profile_cleanly(self, spark):
        from reactive_kinesis_spark.io import profile_table

        df = (
            spark.range(4)
            .select(
                F.col("id").alias("plain"),
                (F.col("id") * 2).alias("has space"),
                (F.col("id") % 2).alias("has-hyphen"),
                F.concat(F.lit("v"), F.col("id")).alias("it's.quoted"),
            )
        )
        prof = {
            r.col_name: r
            for r in profile_table(
                df, ["plain", "has space", "has-hyphen", "it's.quoted"]
            ).collect()
        }
        assert set(prof) == {"plain", "has space", "has-hyphen", "it's.quoted"}
        assert prof["has space"].n_distinct == 4
        assert prof["has-hyphen"].n_distinct == 2
        assert (prof["it's.quoted"].min_value, prof["it's.quoted"].max_value) == (
            "v0",
            "v3",
        )


def _series(spark, rows, schema="entity string, t timestamp, v double, seq long"):
    return spark.createDataFrame(rows, schema=schema)


def _ts(h, m=0, d=1):
    return datetime.datetime(2026, 1, d, h, m)


class TestResampleFfill:
    def test_custom_id_col_on_frame_without_event_id(self, spark):
        # the old hardcoded F.col('event_id') tiebreaker raised
        # UNRESOLVED_COLUMN on any frame lacking that column
        df = _series(
            spark,
            [("a", _ts(0, 10), 1.0, 1), ("a", _ts(0, 20), 2.0, 2), ("a", _ts(2, 0), 5.0, 3)],
        )
        out = resample_ffill(
            df, user_col="entity", ts_col="t", value_col="v", id_col="seq"
        ).collect()
        got = {r.bucket.hour: (r.value_ff, r.observed) for r in out}
        # hour 0 closes at the later obs (2.0); hour 1 is forward-filled
        assert got == {0: (2.0, True), 1: (2.0, False), 2: (5.0, True)}

    def test_tiebreak_uses_id_col_on_equal_ts(self, spark):
        df = _series(
            spark,
            [("a", _ts(0), 1.0, 1), ("a", _ts(0), 9.0, 2)],
        )
        out = resample_ffill(
            df, user_col="entity", ts_col="t", value_col="v", id_col="seq"
        ).collect()
        assert len(out) == 1 and out[0].value_ff == 9.0  # highest seq wins

    def test_daily_step_grid(self, spark):
        df = _series(
            spark,
            [("a", _ts(5, d=1), 1.0, 1), ("a", _ts(3, d=4), 4.0, 2)],
        )
        out = sorted(
            resample_ffill(
                df, user_col="entity", ts_col="t", value_col="v",
                id_col="seq", step="1 day",
            ).collect(),
            key=lambda r: r.bucket,
        )
        assert [r.bucket.day for r in out] == [1, 2, 3, 4]
        assert [r.value_ff for r in out] == [1.0, 1.0, 1.0, 4.0]
        assert [r.observed for r in out] == [True, False, False, True]

    def test_max_span_clamps_pathological_entity(self, spark):
        # entity 'wild' spans 30 days at hourly grain (721 grid rows
        # unclamped); with max_span='2 days' it must emit exactly 49 rows
        # and be FLAGGED, while the well-behaved entity is untouched
        df = _series(
            spark,
            [
                ("wild", _ts(0, d=1), 1.0, 1),
                ("wild", _ts(0, d=31), 2.0, 2),
                ("tame", _ts(0, d=1), 7.0, 3),
                ("tame", _ts(5, d=1), 8.0, 4),
            ],
        )
        out = resample_ffill(
            df, user_col="entity", ts_col="t", value_col="v",
            id_col="seq", max_span="2 days",
        ).collect()
        wild = [r for r in out if r.entity == "wild"]
        tame = [r for r in out if r.entity == "tame"]
        assert len(wild) == 49 and all(r.clamped for r in wild)
        assert len(tame) == 6 and not any(r.clamped for r in tame)
        # the clamped tail drops the day-31 observation entirely
        assert all(r.value_ff == 1.0 for r in wild)

    def test_max_span_no_clamp_flag_false(self, spark):
        df = _series(spark, [("a", _ts(0), 1.0, 1), ("a", _ts(3), 2.0, 2)])
        out = resample_ffill(
            df, user_col="entity", ts_col="t", value_col="v",
            id_col="seq", max_span="1 day",
        ).collect()
        assert len(out) == 4 and not any(r.clamped for r in out)

    def test_invalid_step_and_span_raise(self, spark):
        df = _series(spark, [("a", _ts(0), 1.0, 1)])
        with pytest.raises(ValueError, match="step"):
            resample_ffill(df, user_col="entity", ts_col="t", value_col="v",
                           id_col="seq", step="97 parsecs")
        with pytest.raises(ValueError, match="max_span"):
            resample_ffill(df, user_col="entity", ts_col="t", value_col="v",
                           id_col="seq", max_span="DROP TABLE x")
