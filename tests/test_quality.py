"""Constraint-suite tests (operators/quality.check_constraints)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reactive_kinesis_spark.operators.quality import check_constraints


def _by_check(rows):
    return {(r.check_name, r.column_name): r for r in rows}


def _df(spark):
    rows = [
        # id, name, status, score, ref
        (1, "alice", "A", 10.0, 100),
        (2, "bob", "A", 55.0, 200),
        (2, "carol", "B", -3.0, 999),   # dup id, range-low violation, bad ref
        (None, "dave", "Z", 200.0, None),  # null id, bad status, range-high
        (4, None, "B", None, 100),
    ]
    return spark.createDataFrame(
        rows, schema="id long, name string, status string, score double, ref long"
    )


def _dim(spark):
    return spark.createDataFrame([(100,), (200,)], schema="k long")


def test_all_check_kinds(spark):
    out = _by_check(
        check_constraints(
            _df(spark),
            not_null=("id", "name"),
            unique=("id",),
            ranges={"score": (0.0, 100.0)},
            accepted={"status": ("A", "B")},
            patterns={"name": "^[a-z]+$"},
            foreign_keys=[("ref", _dim(spark), "k")],
        ).collect()
    )
    assert out[("not_null", "id")].violations == 1
    assert out[("not_null", "name")].violations == 1
    # ids 1,2,2,4 non-null -> 4 rows, 3 distinct -> 1 surplus
    assert out[("unique", "id")].violations == 1
    # -3.0 and 200.0 out of bounds; NULL score is not a range violation
    assert out[("range", "score")].violations == 2
    assert out[("accepted_values", "status")].violations == 1
    assert out[("pattern", "name")].violations == 0
    # refs 100,200,999,100 non-null; 999 unmatched
    assert out[("foreign_key", "ref")].violations == 1
    assert all(r.total == 5 for r in out.values())
    assert out[("pattern", "name")].passed is True
    assert out[("range", "score")].passed is False


def test_multi_column_unique_and_one_sided_range(spark):
    df = _df(spark)
    out = _by_check(
        check_constraints(
            df,
            unique=(("id", "status"),),
            ranges={"score": (None, 100.0)},
        ).collect()
    )
    # non-null (id,status) rows: (1,A),(2,A),(2,B),(4,B) -> all distinct
    assert out[("unique", "id,status")].violations == 0
    # only the upper bound applies: 200.0 violates, -3.0 does not
    assert out[("range", "score")].violations == 1


def test_empty_input_is_all_green(spark):
    df = _df(spark).where(F.lit(False))
    rows = check_constraints(
        df,
        not_null=("id",),
        unique=("id",),
        ranges={"score": (0.0, 1.0)},
        foreign_keys=[("ref", _dim(spark), "k")],
    ).collect()
    assert len(rows) == 4
    assert all(r.total == 0 and r.violations == 0 and r.passed for r in rows)


def test_row_level_checks_share_one_scan(spark, sf_dir):
    from reactive_kinesis_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    out = check_constraints(
        orders,
        not_null=("o_orderkey", "o_custkey"),
        unique=("o_orderkey",),
        ranges={"o_totalprice": (0.0, None)},
        accepted={"o_orderstatus": ("O", "F", "P")},
        patterns={"o_orderpriority": "^[1-5]-"},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the whole 6-check suite reads the table ONCE — no per-check scans
    assert plan.count("Scan parquet") == 1


def test_registry_query_shape(spark, sf_dir, ddb):
    from reactive_kinesis_spark.queries import load_all

    qd = load_all()["q112_quality_checks"]
    sdf = qd.fn(spark, sf_dir).toPandas()
    ddf = ddb.execute(qd.oracle).fetchdf()
    assert list(sdf.columns) == list(ddf.columns)
    assert len(sdf) == len(ddf) == 8
    assert sorted(sdf["check_name"].unique()) == sorted(ddf["check_name"].unique())


class TestTableFingerprint:
    def test_order_and_partition_invariant(self, spark):
        from reactive_kinesis_spark.io import table_fingerprint

        rows = [(i, f"v{i}") for i in range(500)]
        a = spark.createDataFrame(rows, "id long, v string").repartition(7)
        b = spark.createDataFrame(list(reversed(rows)), "id long, v string").repartition(3)
        fa = table_fingerprint(a, ["id", "v"]).collect()[0]
        fb = table_fingerprint(b, ["id", "v"]).collect()[0]
        assert (fa.n_rows, fa.fingerprint) == (fb.n_rows, fb.fingerprint) == (500, fb.fingerprint)

    def test_detects_single_row_change(self, spark):
        from reactive_kinesis_spark.io import table_fingerprint

        rows = [(i, f"v{i}") for i in range(100)]
        a = spark.createDataFrame(rows, "id long, v string")
        mutated = [(i, "MUTATED" if i == 57 else f"v{i}") for i in range(100)]
        b = spark.createDataFrame(mutated, "id long, v string")
        fa = table_fingerprint(a, ["id", "v"]).collect()[0]
        fb = table_fingerprint(b, ["id", "v"]).collect()[0]
        assert fa.n_rows == fb.n_rows
        assert fa.fingerprint != fb.fingerprint

    def test_null_vs_sentinel_distinct(self, spark):
        from reactive_kinesis_spark.io import table_fingerprint

        a = spark.createDataFrame([(1, None)], "id long, v string")
        b = spark.createDataFrame([(1, "<NULL>")], "id long, v string")
        # the sentinel row and the NULL row hash identically by design
        # (documented canonicalization) — but a different sentinel-free
        # value must differ
        c = spark.createDataFrame([(1, "x")], "id long, v string")
        fa = table_fingerprint(a, ["id", "v"]).collect()[0].fingerprint
        fc = table_fingerprint(c, ["id", "v"]).collect()[0].fingerprint
        assert fa != fc

    def test_grouped(self, spark):
        from reactive_kinesis_spark.io import table_fingerprint

        df = spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 3)], "g string, x long"
        )
        out = {r.g: (r.n_rows, r.fingerprint) for r in
               table_fingerprint(df, ["x"], group_by="g").collect()}
        assert out["a"][0] == 2 and out["b"][0] == 1
        assert out["a"][1] != out["b"][1]


class TestTrainValTestSplit:
    def test_membership_is_stable_under_ingest(self, spark):
        from reactive_kinesis_spark.operators.text import train_val_test_split

        small = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
        big = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
        s1 = {r.doc_id: r.split for r in train_val_test_split(small, "doc_id").collect()}
        s2 = {r.doc_id: r.split for r in train_val_test_split(big, "doc_id").collect()}
        # adding 4000 docs moves NO existing assignment
        assert all(s2[k] == v for k, v in s1.items())

    def test_proportions_roughly_hold(self, spark):
        from reactive_kinesis_spark.operators.text import train_val_test_split

        df = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
        counts = dict(
            (r.split, r.c)
            for r in train_val_test_split(df, "doc_id", train=0.8, val=0.1)
            .groupBy("split").agg(F.count(F.lit(1)).alias("c")).collect()
        )
        n = sum(counts.values())
        assert n == 20000
        assert abs(counts["train"] / n - 0.8) < 0.02
        assert abs(counts["val"] / n - 0.1) < 0.02
        assert abs(counts["test"] / n - 0.1) < 0.02

    def test_invalid_fractions_rejected(self, spark):
        import pytest
        from reactive_kinesis_spark.operators.text import train_val_test_split

        df = spark.range(5).withColumnRenamed("id", "doc_id")
        with pytest.raises(ValueError, match="train"):
            train_val_test_split(df, "doc_id", train=0.99, val=0.02)


class TestQualityGate:
    def _gate(self, **kw):
        from reactive_kinesis_spark.streaming.tolerance import (
            quality_gate_foreach_batch,
        )

        return quality_gate_foreach_batch(**kw)

    def test_clean_batch_passes_through(self, spark):
        seen = []
        run = self._gate(
            checks={"not_null": ("id",)},
            process=lambda df, bid: seen.append((bid, df.count())),
        )
        run(spark.createDataFrame([(1,), (2,)], "id long"), 7)
        assert seen == [(7, 2)]

    def test_failing_batch_quarantined_not_processed(self, spark):
        processed, quarantined, reports = [], [], []
        run = self._gate(
            checks={"not_null": ("id",)},
            process=lambda df, bid: processed.append(bid),
            quarantine=lambda df, bid: quarantined.append((bid, df.count())),
            on_report=lambda rep, bid: reports.append(rep),
        )
        run(spark.createDataFrame([(1,), (None,)], "id long"), 3)
        assert processed == []
        assert quarantined == [(3, 2)]  # the WHOLE batch moves
        assert any(not r["passed"] for r in reports[0])

    def test_halt_on_fail_raises(self, spark):
        import pytest
        from reactive_kinesis_spark.streaming.tolerance import QualityGateError

        run = self._gate(
            checks={"ranges": {"v": (0.0, 1.0)}},
            process=lambda df, bid: None,
            halt_on_fail=True,
        )
        with pytest.raises(QualityGateError, match="range"):
            run(spark.createDataFrame([(5.0,)], "v double"), 1)

    def test_streaming_end_to_end(self, spark, tmp_path):
        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, s string"
        ).write.parquet(src)
        good, reports = [], []
        run = self._gate(
            checks={"not_null": ("id",), "unique": ("id",)},
            process=lambda df, bid: good.append(df.count()),
            on_report=lambda rep, bid: reports.append((bid, len(rep))),
        )
        q = (
            spark.readStream.schema("id long, s string")
            .parquet(src)
            .writeStream.foreachBatch(run)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert good == [2]
        assert reports and reports[0][1] == 2  # both checks reported


class TestDistributionDrift:
    def _df(self, spark, values):
        return spark.createDataFrame([(float(v),) for v in values], "v double")

    def test_identical_snapshots_zero_drift(self, spark):
        from reactive_kinesis_spark.operators.quality import distribution_drift

        vals = [float(i) for i in range(400)]
        ref, cur = self._df(spark, vals), self._df(spark, vals)
        rows = distribution_drift(ref, cur, "v", buckets=8).collect()
        assert [r.bucket for r in rows] == list(range(1, 9))
        assert all(r.tvd_contrib == 0.0 for r in rows)
        assert all(r.chi2_contrib == 0.0 for r in rows)
        assert all(r.ref_frac == r.cur_frac for r in rows)

    def test_shifted_snapshot_detected(self, spark):
        from reactive_kinesis_spark.operators.quality import distribution_drift

        ref = self._df(spark, range(400))
        cur = self._df(spark, [v + 300 for v in range(400)])  # hard right shift
        rows = distribution_drift(ref, cur, "v", buckets=8).collect()
        tvd = sum(r.tvd_contrib for r in rows)
        assert tvd > 0.3, tvd
        # emptied buckets stay on the spine with cur_n = 0
        assert any(r.cur_n == 0 for r in rows)
        # fractions are proper distributions
        assert sum(r.ref_frac for r in rows) == pytest.approx(1.0)
        assert sum(r.cur_frac for r in rows) == pytest.approx(1.0)

    def test_validates_buckets(self, spark):
        from reactive_kinesis_spark.operators.quality import distribution_drift

        df = self._df(spark, range(10))
        with pytest.raises(ValueError, match="buckets"):
            distribution_drift(df, df, "v", buckets=1)

    def test_degenerate_reference_still_sees_cur_only_mass(self, spark):
        """A constant reference collapses every percentile cut to the same
        value — buckets the reference never populates must still report
        current-snapshot mass (the most extreme drift), on the static
        spine, not vanish in a join."""
        from reactive_kinesis_spark.operators.quality import distribution_drift

        ref = self._df(spark, [5.0] * 100)          # all cuts collapse to 5.0
        cur = self._df(spark, [50.0] * 100)         # all mass above every cut
        rows = distribution_drift(ref, cur, "v", buckets=8).collect()
        by_bucket = {r.bucket: r for r in rows}
        assert sorted(by_bucket) == list(range(1, 9))  # full spine, always
        # ref: v > 5.0 is false for every cut → bucket 1; cur: all 7 cuts
        # below → bucket 8, which the reference left empty
        assert (by_bucket[1].ref_n, by_bucket[1].cur_n) == (100, 0)
        assert (by_bucket[8].ref_n, by_bucket[8].cur_n) == (0, 100)
        assert sum(r.tvd_contrib for r in rows) == pytest.approx(1.0)
        assert by_bucket[8].chi2_contrib is None  # expected 0 ⇒ undefined


class TestDriftGate:
    """Streaming twin of distribution_drift: per-micro-batch TVD against
    a frozen reference profile (batch-baseline -> stream-scorer split)."""

    CUTS = [2.0, 4.0, 6.0]          # 4 buckets
    FRACS = [0.25, 0.25, 0.25, 0.25]

    def _gate(self, **kw):
        from reactive_kinesis_spark.streaming.tolerance import (
            drift_gate_foreach_batch,
        )

        kw.setdefault("reference_cuts", self.CUTS)
        kw.setdefault("reference_fracs", self.FRACS)
        kw.setdefault("value_col", "v")
        return drift_gate_foreach_batch(**kw)

    def _df(self, spark, values):
        return spark.createDataFrame([(float(v),) for v in values], "v double")

    def test_in_distribution_batch_passes(self, spark):
        seen, reports = [], []
        run = self._gate(
            process=lambda df, bid: seen.append((bid, df.count())),
            on_report=lambda rep, bid: reports.append(rep),
        )
        run(self._df(spark, [1, 3, 5, 7] * 10), 4)  # exactly 1/4 per bucket
        assert seen == [(4, 40)]
        assert reports[0]["tvd"] == 0.0 and reports[0]["n"] == 40

    def test_drifted_batch_quarantined(self, spark):
        processed, quarantined, reports = [], [], []
        run = self._gate(
            process=lambda df, bid: processed.append(bid),
            quarantine=lambda df, bid: quarantined.append((bid, df.count())),
            on_report=lambda rep, bid: reports.append(rep),
            threshold=0.2,
        )
        run(self._df(spark, [7.5] * 40), 9)  # everything in the top bucket
        assert processed == []
        assert quarantined == [(9, 40)]
        assert reports[0]["tvd"] == pytest.approx(0.75)

    def test_halt_on_drift_raises(self, spark):
        from reactive_kinesis_spark.streaming.tolerance import DriftGateError

        run = self._gate(process=lambda df, bid: None, halt_on_drift=True)
        with pytest.raises(DriftGateError, match="drifted"):
            run(self._df(spark, [0.0] * 30), 2)

    def test_tiny_batch_passes_ungated(self, spark):
        seen, reports = [], []
        run = self._gate(
            process=lambda df, bid: seen.append(bid),
            on_report=lambda rep, bid: reports.append(rep),
            min_rows=10,
        )
        run(self._df(spark, [7.5, 7.5]), 1)  # would drift, but n < min_rows
        assert seen == [1]
        assert reports[0]["tvd"] is None and reports[0]["n"] == 2

    def test_validates_shape(self, spark):
        from reactive_kinesis_spark.streaming.tolerance import (
            drift_gate_foreach_batch,
        )

        with pytest.raises(ValueError, match="fractions"):
            drift_gate_foreach_batch([1.0], [0.5], "v", lambda d, b: None)
        with pytest.raises(ValueError, match="threshold"):
            drift_gate_foreach_batch(
                [1.0], [0.5, 0.5], "v", lambda d, b: None, threshold=0.0
            )

    def test_streaming_end_to_end(self, spark, tmp_path):
        src = str(tmp_path / "src")
        self._df(spark, [1, 3, 5, 7] * 5).write.parquet(src)
        good, reports = [], []
        run = self._gate(
            process=lambda df, bid: good.append(df.count()),
            on_report=lambda rep, bid: reports.append(rep),
        )
        q = (
            spark.readStream.schema("v double")
            .parquet(src)
            .writeStream.foreachBatch(run)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert good == [20]
        assert reports and reports[0]["tvd"] == 0.0
