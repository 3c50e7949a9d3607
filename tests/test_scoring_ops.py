"""Contract tests for the round-6 scoring/similarity operators: BM25,
tf-cosine pairs, edit-distance blocking join, seasonal anomalies, trend
slopes — semantic edge cases the DuckDB parity sweep can't see."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from reactive_kinesis_spark.operators.text import (
    bm25_scoring,
    edit_distance_pairs,
    tf_cosine_pairs,
)
from reactive_kinesis_spark.queries.events import seasonal_anomalies, trend_slopes


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


class TestBM25:
    def test_rarer_term_scores_higher(self, spark):
        # "rare" appears in 1 of 8 docs, "common" in all 8; equal tf and dl
        rows = [(i, "common pad pad") for i in range(7)]
        rows += [(7, "rare pad pad")]
        df = _docs(spark, rows)
        out = {
            r.doc_id: r.score_micro
            for r in bm25_scoring(df, ["rare", "common"]).collect()
        }
        assert out[7] > out[0] > 0

    def test_doc_without_query_terms_excluded(self, spark):
        df = _docs(spark, [(1, "alpha beta"), (2, "gamma delta")])
        got = bm25_scoring(df, ["alpha"]).collect()
        assert [r.doc_id for r in got] == [1]

    def test_tf_saturates(self, spark):
        # same dl; tf 1 vs 5 vs 25: gains must shrink (BM25's whole point)
        mk = lambda n: " ".join(["term"] * n + ["pad"] * (25 - n))  # noqa: E731
        df = _docs(spark, [(1, mk(1)), (2, mk(5)), (3, mk(25)), (4, "pad " * 24 + "x")])
        s = {r.doc_id: r.score_micro for r in bm25_scoring(df, ["term"]).collect()}
        assert s[1] < s[2] < s[3]
        assert (s[2] - s[1]) > (s[3] - s[2])

    def test_empty_query_raises(self, spark):
        with pytest.raises(ValueError, match="query_terms"):
            bm25_scoring(_docs(spark, [(1, "a")]), [])


class TestTfCosinePairs:
    def test_identical_docs_cosine_one(self, spark):
        df = _docs(spark, [(1, "a b b c"), (2, "a b b c"), (3, "z z z")])
        got = tf_cosine_pairs(df, max_df=10, threshold=0.99).collect()
        assert [(r.id_1, r.id_2) for r in got] == [(1, 2)]
        # sqrt(s)*sqrt(s) != s in floats: exactly-1 is approx, not bitwise
        assert got[0].cosine_tf == pytest.approx(1.0, abs=1e-12)

    def test_df_cap_blocks_ubiquitous_terms(self, spark):
        # docs share only "the" (df=3 > cap 2): no candidate pair at all
        df = _docs(spark, [(1, "the x"), (2, "the y"), (3, "the z")])
        assert tf_cosine_pairs(df, max_df=2, threshold=0.0).count() == 0

    def test_dot_counts_all_shared_words_not_just_rare(self, spark):
        # candidates via rare "q"; cosine must still include common "a"
        df = _docs(spark, [(1, "q a a"), (2, "q a a"), (3, "a a a"), (4, "a b c")])
        got = tf_cosine_pairs(df, max_df=2, threshold=0.0).collect()
        assert [(r.id_1, r.id_2) for r in got] == [(1, 2)]
        assert got[0].cosine_tf == pytest.approx(1.0, abs=1e-12)  # identical vectors


class TestEditDistancePairs:
    def test_blocking_and_bound(self, spark):
        df = spark.createDataFrame(
            [(1, "red widget", "widget"), (2, "red wodget", "wodget"),
             (3, "red widgets", "widget"), (4, "blue widget", "widget")],
            schema="id long, name string, blk string",
        )
        got = edit_distance_pairs(df, "name", "id", "blk", max_distance=2).collect()
        pairs = {(r.id_1, r.id_2): r.distance for r in got}
        # 2 is in a different block: never compared despite distance 1
        assert (1, 2) not in pairs
        assert pairs[(1, 3)] == 1  # widget vs widgets
        assert (1, 4) not in pairs  # red vs blue = 3 edits, over the bound
        assert all(0 <= d <= 2 for d in pairs.values())

    def test_threshold_early_exit_rows_are_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, "aaaaaa", "b"), (2, "zzzzzz", "b")],
            schema="id long, name string, blk string",
        )
        assert edit_distance_pairs(df, "name", "id", "blk", max_distance=2).count() == 0


class TestSeasonalAnomalies:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, schema="event_id long, event_type string, ts timestamp, value double"
        )

    def test_planted_outlier_found_in_its_slot_only(self, spark):
        t0 = datetime.datetime(2026, 1, 1, 3, 0, 0)
        rows = [(i, "view", t0 + datetime.timedelta(days=i), 10.0) for i in range(20)]
        rows += [(100, "view", t0 + datetime.timedelta(days=20), 500.0)]
        # same values at a different hour: their slot is clean
        t1 = datetime.datetime(2026, 1, 1, 14, 0, 0)
        rows += [(200 + i, "view", t1 + datetime.timedelta(days=i), 10.0) for i in range(5)]
        got = seasonal_anomalies(self._ev(spark, rows)).collect()
        assert [r.event_id for r in got] == [100]
        assert got[0].hod == 3 and got[0].slot_n == 21

    def test_nulls_excluded_from_baseline_and_flags(self, spark):
        t0 = datetime.datetime(2026, 1, 1, 9, 0, 0)
        rows = [(1, "a", t0, 1.0), (2, "a", t0, None), (3, "a", t0, 1.0)]
        got = seasonal_anomalies(self._ev(spark, rows)).collect()
        assert got == []  # constant slot, null ignored, nothing flagged


class TestTrendSlopes:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, schema="user_id long, ts timestamp, value double"
        )

    def test_recovers_exact_line(self, spark):
        t0 = datetime.datetime(2026, 1, 1)
        # y = 5 + 2.5 * hours
        rows = [(1, t0 + datetime.timedelta(hours=h), 5.0 + 2.5 * h) for h in range(10)]
        got = trend_slopes(self._ev(spark, rows)).collect()
        assert len(got) == 1
        assert got[0].slope_per_hour == pytest.approx(2.5, abs=1e-9)
        assert got[0].intercept == pytest.approx(5.0, abs=1e-6)

    def test_zero_x_variance_key_dropped(self, spark):
        t0 = datetime.datetime(2026, 1, 1)
        rows = [(1, t0, 1.0), (1, t0, 2.0)]  # same timestamp twice
        assert trend_slopes(self._ev(spark, rows)).count() == 0

    def test_null_values_excluded(self, spark):
        t0 = datetime.datetime(2026, 1, 1)
        rows = [(1, t0 + datetime.timedelta(hours=h), float(h)) for h in range(5)]
        rows += [(1, t0 + datetime.timedelta(hours=99), None)]
        got = trend_slopes(self._ev(spark, rows)).collect()
        assert got[0].n == 5
        assert got[0].slope_per_hour == pytest.approx(1.0, abs=1e-9)


class TestMergeUpsert:
    def _t(self, spark, rows):
        return spark.createDataFrame(rows, schema="k long, v string")

    def test_update_insert_passthrough(self, spark):
        from reactive_kinesis_spark.operators.relational import merge_upsert

        target = self._t(spark, [(1, "a"), (2, "b"), (3, "c")])
        updates = self._t(spark, [(2, "B!"), (9, "new")])
        got = sorted(
            (r.k, r.v) for r in merge_upsert(target, updates, ["k"]).collect()
        )
        assert got == [(1, "a"), (2, "B!"), (3, "c"), (9, "new")]

    def test_empty_updates_is_identity(self, spark):
        from reactive_kinesis_spark.operators.relational import merge_upsert

        target = self._t(spark, [(1, "a")])
        got = merge_upsert(target, target.limit(0), ["k"]).collect()
        assert [(r.k, r.v) for r in got] == [(1, "a")]

    def test_empty_keys_raise(self, spark):
        from reactive_kinesis_spark.operators.relational import merge_upsert

        t = self._t(spark, [(1, "a")])
        with pytest.raises(ValueError, match="key_cols"):
            merge_upsert(t, t, [])


class TestScd2Intervals:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, schema="event_id long, user_id long, ts timestamp, event_type string"
        )

    def test_collapses_runs_and_chains_intervals(self, spark):
        from reactive_kinesis_spark.queries.events import scd2_intervals

        t0 = datetime.datetime(2026, 1, 1)
        h = datetime.timedelta(hours=1)
        rows = [
            (1, 1, t0 + 0 * h, "view"),
            (2, 1, t0 + 1 * h, "view"),   # repeat: collapsed
            (3, 1, t0 + 2 * h, "click"),
            (4, 1, t0 + 3 * h, "view"),   # back to view: NEW interval
        ]
        got = sorted(
            (r.state, r.valid_from, r.valid_to)
            for r in scd2_intervals(self._ev(spark, rows)).collect()
        )
        assert got == [
            ("click", t0 + 2 * h, t0 + 3 * h),
            ("view", t0, t0 + 2 * h),
            ("view", t0 + 3 * h, None),  # current state: open interval
        ]

    def test_null_state_forms_interval(self, spark):
        from reactive_kinesis_spark.queries.events import scd2_intervals

        t0 = datetime.datetime(2026, 1, 1)
        h = datetime.timedelta(hours=1)
        rows = [(1, 1, t0, None), (2, 1, t0 + h, None), (3, 1, t0 + 2 * h, "x")]
        got = sorted(
            ((r.state or ""), r.valid_from)
            for r in scd2_intervals(self._ev(spark, rows)).collect()
        )
        assert got == [("", t0), ("x", t0 + 2 * h)]

    def test_equal_ts_resolved_by_tiebreak(self, spark):
        from reactive_kinesis_spark.queries.events import scd2_intervals

        t0 = datetime.datetime(2026, 1, 1)
        rows = [(2, 1, t0, "b"), (1, 1, t0, "a")]  # same ts: event_id orders
        got = scd2_intervals(self._ev(spark, rows)).collect()
        by_state = {r.state: r for r in got}
        assert by_state["a"].valid_to == t0  # a closed by b at the same ts
        assert by_state["b"].valid_to is None


def test_tf_cosine_accepts_materialized_word_counts(spark, tmp_path):
    """The 100 TB seam: feeding a persisted doc_word_counts frame must give
    byte-identical results to the inline derivation."""
    from reactive_kinesis_spark.operators.text import doc_word_counts

    df = _docs(spark, [(1, "q a a"), (2, "q a a b"), (3, "a a a"), (4, "z q")])
    inline = sorted(map(tuple, tf_cosine_pairs(df, max_df=3, threshold=0.0).collect()))
    path = str(tmp_path / "dw.parquet")
    doc_word_counts(df).write.parquet(path)
    fed = sorted(
        map(
            tuple,
            tf_cosine_pairs(
                df, max_df=3, threshold=0.0,
                word_counts=spark.read.parquet(path),
            ).collect(),
        )
    )
    assert inline == fed and len(inline) > 0


class TestStreamingAnomalyTwin:
    """seasonal_baseline + flag_against_baseline = the train-offline /
    score-online split of seasonal_anomalies; the batch composition must
    reproduce the one-pass operator exactly, and the scoring side must run
    unchanged under readStream (stream-static broadcast join)."""

    def _rows(self):
        t0 = datetime.datetime(2026, 1, 1, 3, 0, 0)
        rows = [(i, "view", t0 + datetime.timedelta(days=i), 10.0) for i in range(20)]
        rows += [(100, "view", t0 + datetime.timedelta(days=20), 500.0)]
        return rows

    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, schema="event_id long, event_type string, ts timestamp, value double"
        )

    def test_batch_composition_matches_one_pass_operator(self, spark):
        from reactive_kinesis_spark.queries.events import (
            flag_against_baseline,
            seasonal_baseline,
        )

        ev = self._ev(spark, self._rows())
        one_pass = sorted(map(tuple, seasonal_anomalies(ev).collect()))
        split = sorted(
            map(tuple, flag_against_baseline(ev, seasonal_baseline(ev)).collect())
        )
        assert one_pass == split and len(split) == 1

    def test_scoring_runs_under_readstream(self, spark, tmp_path):
        from reactive_kinesis_spark.queries.events import (
            flag_against_baseline,
            seasonal_baseline,
        )

        ev = self._ev(spark, self._rows())
        baseline = seasonal_baseline(ev)  # "trained" offline, static side
        src = str(tmp_path / "stream_src")
        ev.write.parquet(src)
        stream = (
            spark.readStream.schema(
                "event_id long, event_type string, ts timestamp, value double"
            )
            .parquet(src)
        )
        flagged = flag_against_baseline(stream, baseline)
        assert flagged.isStreaming
        q = (
            flagged.writeStream.format("memory")
            .queryName("anomaly_twin")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = spark.sql("SELECT event_id FROM anomaly_twin").collect()
        assert [r.event_id for r in got] == [100]


class TestRRFFuse:
    def _rk(self, spark, pairs):
        return spark.createDataFrame(pairs, schema="doc_id long, rank long")

    def test_two_way_fusion(self, spark):
        from reactive_kinesis_spark.operators.similarity import rrf_fuse

        a = self._rk(spark, [(1, 1), (2, 2), (3, 3)])
        b = self._rk(spark, [(3, 1), (1, 2), (9, 3)])
        out = {r.doc_id: r for r in rrf_fuse([("a", a), ("b", b)], k=10).collect()}
        assert out[1].rrf_score == 1 / 11 + 1 / 12
        assert out[3].rrf_score == 1 / 13 + 1 / 11
        # absent from b -> only a's term; absent rank reported as 0
        assert out[2].rrf_score == 1 / 12
        assert (out[2].rank_a, out[2].rank_b) == (2, 0)
        assert (out[9].rank_a, out[9].rank_b) == (0, 3)
        assert set(out) == {1, 2, 3, 9}

    def test_three_way_fusion_and_ordering(self, spark):
        from reactive_kinesis_spark.operators.similarity import rrf_fuse

        a = self._rk(spark, [(1, 1), (2, 2)])
        b = self._rk(spark, [(2, 1), (1, 2)])
        c = self._rk(spark, [(2, 1), (3, 2)])
        out = {
            r.doc_id: r.rrf_score
            for r in rrf_fuse([("a", a), ("b", b), ("c", c)], k=0).collect()
        }
        # doc 2 wins: ranks (2,1,1) -> 1/2+1+1 vs doc 1 (1,2,-) -> 1+1/2
        assert out[2] == pytest.approx(2.5)
        assert out[1] == pytest.approx(1.5)
        assert out[3] == pytest.approx(0.5)

    def test_requires_two_rankings(self, spark):
        from reactive_kinesis_spark.operators.similarity import rrf_fuse

        with pytest.raises(ValueError, match="two rankings"):
            rrf_fuse([("a", self._rk(spark, [(1, 1)]))])


class TestWinsorize:
    def test_clamp_bounds_and_counts(self, spark, sf_dir):
        from reactive_kinesis_spark.queries import load_all

        out = {
            r.event_type: r
            for r in load_all()["q113_winsorize"].fn(spark, sf_dir).collect()
        }
        for r in out.values():
            assert r.p_lo <= r.p_hi
            # winsorized mean sits inside the clamp bounds
            assert r.p_lo <= r.mean_winsor <= r.p_hi
            # ~5% clamped each side (exact percentile => at most 5% strictly
            # outside each bound)
            assert r.n_clamped_low <= r.n * 0.05 + 1
            assert r.n_clamped_high <= r.n * 0.05 + 1
            assert r.n_clamped_low > 0 or r.n < 40


class TestSortedNeighborhood:
    def _parts(self, spark, rows):
        return spark.createDataFrame(rows, schema="id long, name string")

    def test_adjacent_pairs_within_block(self, spark):
        from reactive_kinesis_spark.operators.text import sorted_neighborhood_pairs

        rows = [(1, "aa x"), (2, "ab x"), (3, "ac x"), (4, "zz y")]
        out = sorted_neighborhood_pairs(
            self._parts(spark, rows), "name", "id",
            F.split(F.col("name"), " ").getItem(1), window=2,
        ).collect()
        got = {(r.id_1, r.id_2) for r in out}
        # block "x": sorted aa<ab<ac -> (1,2),(1,3),(2,3); block "y": alone
        assert got == {(1, 2), (1, 3), (2, 3)}

    def test_block_boundaries_isolate(self, spark):
        from reactive_kinesis_spark.operators.text import sorted_neighborhood_pairs

        rows = [(1, "aa p"), (2, "aa q")]
        out = sorted_neighborhood_pairs(
            self._parts(spark, rows), "name", "id",
            F.split(F.col("name"), " ").getItem(1), window=3,
        ).collect()
        assert out == []  # different blocks -> never compared

    def test_distance_threshold_early_exit(self, spark):
        from reactive_kinesis_spark.operators.text import sorted_neighborhood_pairs

        rows = [(1, "abcdef g"), (2, "abcxef g"), (3, "zzzzzz g")]
        out = {
            (r.id_1, r.id_2): r.distance
            for r in sorted_neighborhood_pairs(
                self._parts(spark, rows), "name", "id",
                F.split(F.col("name"), " ").getItem(1),
                window=2, max_distance=2,
            ).collect()
        }
        assert out == {(1, 2): 1}  # zzzzzz is adjacent but beyond 2 edits

    def test_window_validated(self, spark):
        import pytest
        from reactive_kinesis_spark.operators.text import sorted_neighborhood_pairs

        with pytest.raises(ValueError, match="window"):
            sorted_neighborhood_pairs(
                self._parts(spark, [(1, "a b")]), "name", "id",
                F.lit("x"), window=0,
            )


class TestEquidepthHistogram:
    def test_buckets_partition_the_table(self, spark, sf_dir):
        from reactive_kinesis_spark.queries import load_all
        from reactive_kinesis_spark.tables import load_table

        rows = load_all()["q119_equidepth_histogram"].fn(spark, sf_dir).collect()
        total = load_table(spark, sf_dir, "lineitem").count()
        assert sum(r.n for r in rows) == total
        assert [r.bucket for r in rows] == sorted(r.bucket for r in rows)
        # equi-depth: every bucket within 2x of the ideal eighth
        ideal = total / 8
        assert all(0.5 * ideal <= r.n <= 2 * ideal for r in rows)
        # bucket ranges are ordered and non-overlapping
        for a, b in zip(rows, rows[1:]):
            assert a.hi <= b.lo


class TestPITJoin:
    def test_no_feature_leakage(self, spark):
        """A fact observed just before a dimension change must see the OLD
        state; just after, the NEW state — the PIT guarantee."""
        import datetime as dt
        from reactive_kinesis_spark.operators.relational import asof_join
        from reactive_kinesis_spark.queries.events import scd2_intervals

        t = dt.datetime(2024, 1, 1)
        ev = spark.createDataFrame(
            [
                (1, t, 7, "bronze", 0.0, None),
                (2, t + dt.timedelta(hours=2), 7, "gold", 0.0, None),
            ],
            schema="event_id long, ts timestamp, user_id long, "
                   "event_type string, value double, props string",
        )
        dim = (
            scd2_intervals(ev)
            .groupBy("key", "valid_from")
            .agg(F.max("state").alias("state"))
        )
        facts = spark.createDataFrame(
            [
                (100, 7, t + dt.timedelta(hours=1, minutes=59)),
                (101, 7, t + dt.timedelta(hours=2)),
                (102, 7, t + dt.timedelta(hours=3)),
            ],
            schema="fid long, key long, fts timestamp",
        )
        out = {
            r.fid: r.state
            for r in asof_join(
                facts, dim, key="key", right_key="key",
                left_time="fts", right_time="valid_from",
                right_value_cols=["state"],
            ).collect()
        }
        assert out == {100: "bronze", 101: "gold", 102: "gold"}
