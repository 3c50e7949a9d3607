"""Round-14 additions: the derived IVF operating point (q195), the
synthetic-corpus twins for the order-sensitive text statistics
(q196–q198), the sampled-trainer 4-rows-per-centroid floor, compaction
size telemetry, and the matmul-assignment parity band (r13 ADVICE)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from reactive_kinesis_spark.queries import load_all

_REGISTRY = load_all()


class TestOracleTextPins:
    """The r13→r14 builder parameterization (q160/q169/q179 oracles now
    come from docs-source-parameterized builders shared with their synth
    twins) must NOT change the certified text: a changed oracle means the
    old green hash row proves the old query, not this one (the q183/q189
    re-proof precedent). Pin the sha256 of each default-built text to the
    bytes the driver certified."""

    PINS = {
        "q160_bigram_lm_score": "76f19ecf5f612f07",
        "q169_textrank_keywords": "3b202659cbc63b86",
        "q179_pair_ngram_precision": "87ef0409e9d8a8e3",
    }

    @pytest.mark.parametrize("name", sorted(PINS))
    def test_certified_text_unchanged(self, name):
        digest = hashlib.sha256(_REGISTRY[name].oracle.encode()).hexdigest()[:16]
        assert digest == self.PINS[name], (
            f"{name}'s oracle text drifted from its driver-certified bytes — "
            "either revert the builder default or put the query in the next "
            "driver window for re-proof (tools/round_end.py enforces this)"
        )


class TestIvfDerivedOperatingPoint:
    """q195: ivf_topk_certified(n_cells=None) — the floor identity that
    makes q38's SQL the oracle by construction, pinned as arithmetic."""

    def test_floor_at_all_testdata_sfs(self):
        from reactive_kinesis_spark.operators.similarity import derive_ivf_cells

        # embeddings: 500 (sf0.001/sf0.01), 2000 (sf0.1) — all on the floor
        assert derive_ivf_cells(500) == 16
        assert derive_ivf_cells(2000) == 16
        assert derive_ivf_cells(16 * 4096) == 16

    def test_departure_point(self):
        from reactive_kinesis_spark.operators.similarity import derive_ivf_cells

        assert derive_ivf_cells(17 * 4096 - 1) == 16
        assert derive_ivf_cells(17 * 4096) == 17
        # k ∝ N from there on: candidate cost n_probe·target stays flat
        assert derive_ivf_cells(100 * 4096) == 100

    def test_invalid_target_raises(self):
        from reactive_kinesis_spark.operators.similarity import derive_ivf_cells

        with pytest.raises(ValueError, match="target_cell_size"):
            derive_ivf_cells(500, target_cell_size=0)

    def test_q195_oracle_is_q38_oracle_by_construction(self):
        assert (
            _REGISTRY["q195_ann_ivf_derived"].oracle
            == _REGISTRY["q38_embedding_ann_ivf"].oracle
        )


class TestSampledTrainerFloor:
    """r13 ADVICE: the derived-k sampled fit must enforce the stated
    >=4-rows-per-centroid floor against the 2^17 bounded-collect cap —
    the old guard only fired past k > 2^17, so k in (2^15, 2^17]
    silently fit 1-4 rows per centroid."""

    def test_floor_gap_zone_raises(self, spark, monkeypatch):
        import reactive_kinesis_spark.operators.similarity as S

        vecs = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(10)],
            "vec_id long, embedding array<double>",
        )
        # k in the old silent zone: 4*k > 2^17 but k <= 2^17
        monkeypatch.setattr(S, "_derive_k", lambda v, t: (1 << 15) + 1)
        with pytest.raises(ValueError, match="4-rows-per-centroid|rows-per-centroid|floor"):
            S.semantic_dedup(vecs, k=None, trainer="sampled")

    def test_below_floor_threshold_still_fits(self, spark, monkeypatch):
        import reactive_kinesis_spark.operators.similarity as S

        rng = np.random.default_rng(5)
        rows = [(i, [float(x) for x in rng.standard_normal(4)]) for i in range(64)]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        monkeypatch.setattr(S, "_derive_k", lambda v, t: 8)  # 4*8 well under cap
        out = S.semantic_dedup(vecs, k=None, trainer="sampled", train_sample=16)
        assert out.agg(F.sum("n_vecs").alias("n")).collect()[0]["n"] == 64


class TestCompactRollupTelemetry:
    """r13 verdict Next #5: every compaction reports the new base's row
    count (parquet-metadata read-back), so the DEFAULT exact path shows
    ledger growth; the floored path derives floored_rows without
    evaluating the merge twice (r13 ADVICE)."""

    def test_exact_path_reports_base_rows(self, spark, tmp_path):
        from reactive_kinesis_spark.streaming.rollup import (
            compact_rollup,
            continuous_source_bigrams,
            source_bigram_spec,
        )

        out_dir = str(tmp_path / "bigrams")
        write = continuous_source_bigrams(out_dir)
        write(
            spark.createDataFrame(
                [("s1", "a b a b"), ("s1", "x y")], "source string, text string"
            ),
            0,
        )
        stats = compact_rollup(spark, out_dir, source_bigram_spec())
        # bigram types: (a,b) (b,a) (x,y) — exact ledger keeps all
        assert stats["base_rows"] == 3
        assert stats["floored_rows"] == 0

    def test_floored_path_counts_add_up(self, spark, tmp_path):
        from reactive_kinesis_spark.streaming.rollup import (
            compact_rollup,
            continuous_source_bigrams,
            source_bigram_spec,
        )

        out_dir = str(tmp_path / "bigrams")
        write = continuous_source_bigrams(out_dir)
        write(
            spark.createDataFrame(
                [("s1", "a b a b a b"), ("s1", "x y")],
                "source string, text string",
            ),
            0,
        )
        stats = compact_rollup(spark, out_dir, source_bigram_spec(), min_count=2)
        # merged types: (a,b) n=3, (b,a) n=2, (x,y) n=1 -> floor drops 1
        assert stats["base_rows"] == 2
        assert stats["floored_rows"] == 1


class TestNearestCentroidParityBand:
    """r13 ADVICE low: the matmul distance form (||c||^2 - 2x·c) rounds
    differently from the naive residual form, so NEAR-tie assignments
    could in principle flip. Property-pin the contract: wherever the
    naive top-2 squared-distance gap exceeds a float-noise band, both
    forms agree exactly; inside the band any flip is between centroids
    whose distances are equal to within the band (documented acceptable
    for the uncertified throughput paths)."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_assignment_parity_outside_noise_band(self, seed):
        from reactive_kinesis_spark.operators.similarity import (
            _nearest_centroid,
        )

        rng = np.random.default_rng(seed)
        mat = rng.standard_normal((512, 16))
        cents = rng.standard_normal((32, 16))
        got = _nearest_centroid(mat, cents)
        # naive residual-tensor form (the pre-r13 arithmetic)
        d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        naive = d2.argmin(axis=1)
        part = np.partition(d2, 1, axis=1)
        gap = part[:, 1] - part[:, 0]
        scale = np.abs(d2).max()
        band = 64 * np.finfo(np.float64).eps * scale
        clear = gap > band
        assert (got[clear] == naive[clear]).all()
        # inside the band a flip must still be a near-tie in naive metric
        flipped = got != naive
        assert (
            np.abs(d2[np.arange(len(mat)), got] - part[:, 0])[flipped] <= band
        ).all()

    def test_exact_duplicate_centroid_tie_to_lowest_index(self):
        from reactive_kinesis_spark.operators.similarity import (
            _nearest_centroid,
        )

        mat = np.array([[1.0, 0.0]])
        cents = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        assert _nearest_centroid(mat, cents)[0] == 0


class TestReproofPolicyGate:
    """tools/round_end.py step 6 (r13 verdict Next #8): a query whose
    oracle text or registration source changed since the committed
    QUERY_MANIFEST.json stamp must take a driver-window slot — pinned
    here so the policy survives builder turnover."""

    def _registry(self):
        return _REGISTRY

    def test_missing_manifest_is_baseline(self, tmp_path):
        from tools.round_end import check_reproof_policy

        v, live = check_reproof_policy(
            self._registry(), str(tmp_path / "absent.json")
        )
        assert v == []
        assert set(live) == set(self._registry())

    def test_changed_nonwindow_entry_is_violation(self, tmp_path):
        import json

        from tools.round_end import check_reproof_policy, compute_query_manifest

        reg = self._registry()
        live = compute_query_manifest(reg)
        nonwindow = list(reg)[60]  # safely past the 50-slot window
        stamped = dict(live)
        stamped[nonwindow] = "0" * 64
        p = tmp_path / "QUERY_MANIFEST.json"
        p.write_text(json.dumps(stamped))
        v, _ = check_reproof_policy(reg, str(p))
        assert v == [nonwindow]

    def test_changed_window_entry_is_clean(self, tmp_path):
        import json

        from tools.round_end import check_reproof_policy, compute_query_manifest

        reg = self._registry()
        live = compute_query_manifest(reg)
        inwindow = list(reg)[0]
        stamped = dict(live)
        stamped[inwindow] = "0" * 64
        p = tmp_path / "QUERY_MANIFEST.json"
        p.write_text(json.dumps(stamped))
        v, _ = check_reproof_policy(reg, str(p))
        assert v == []

    def test_new_entry_missing_from_window_is_violation(self, tmp_path):
        import json

        from tools.round_end import check_reproof_policy, compute_query_manifest

        reg = self._registry()
        live = compute_query_manifest(reg)
        nonwindow = list(reg)[60]
        stamped = {k: v for k, v in live.items() if k != nonwindow}
        p = tmp_path / "QUERY_MANIFEST.json"
        p.write_text(json.dumps(stamped))
        v, _ = check_reproof_policy(reg, str(p))
        assert v == [nonwindow]


class TestThroughputDerivedKnobs:
    """r14: the self-scaling operating point extended to the THROUGHPUT
    families — ivf_topk(n_cells=None) and
    embedding_neardup_pairs(n_planes=None) — so the ingest paths a
    deployment actually re-runs carry the same k ∝ N discipline as the
    certified twins (q190/q195)."""

    def test_ivf_topk_derived_equals_explicit_floor(self, spark, sf_dir):
        from reactive_kinesis_spark.operators import similarity as S
        from reactive_kinesis_spark.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.where(F.col("vec_id") < 20)
        got = S.ivf_topk(emb, q, k=3, n_cells=None, n_probe=4)
        want = S.ivf_topk(emb, q, k=3, n_cells=16, n_probe=4)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_ivf_topk_derived_floor_cap_raises(self, spark, monkeypatch):
        import reactive_kinesis_spark.operators.similarity as S

        vecs = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(10)],
            "vec_id long, embedding array<double>",
        )
        monkeypatch.setattr(S, "derive_ivf_cells", lambda n: (1 << 15) + 1)
        with pytest.raises(ValueError, match="rows-per-centroid"):
            S.ivf_topk(vecs, vecs.limit(2), k=1, n_cells=None)

    def test_neardup_derived_equals_explicit_derived_planes(self, spark, sf_dir):
        from reactive_kinesis_spark.operators import similarity as S
        from reactive_kinesis_spark.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        planes = S.derive_lsh_params(n, bands=4)["n_planes"]
        got = S.embedding_neardup_pairs(emb, threshold=0.4, n_planes=None)
        want = S.embedding_neardup_pairs(emb, threshold=0.4, n_planes=planes)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_neardup_derived_widens_with_n(self):
        from reactive_kinesis_spark.operators.similarity import derive_lsh_params

        # 3-bit floor at testdata sizes; the registered 4-bit width is
        # reached past ~16k rows and keeps widening
        assert derive_lsh_params(500, bands=4)["n_planes"] == 12
        assert derive_lsh_params(20_000, bands=4)["n_planes"] == 20
        assert derive_lsh_params(2_000_000, bands=4)["n_planes"] == 44


class TestBoundedFitSample:
    """The shared floor/cap discipline (_bounded_fit_sample): raise only
    when the 4-rows-per-centroid floor itself cannot fit the 2^17 cap;
    a caller-supplied excess above the cap is CLAMPED, not rejected
    (pre-r14 behavior — the post-review regression pin)."""

    def test_user_excess_clamped_not_rejected(self):
        from reactive_kinesis_spark.operators.similarity import (
            _bounded_fit_sample,
        )

        assert _bounded_fit_sample(200_000, 8, "k", "x") == (1 << 17)

    def test_floor_raise_only_when_floor_exceeds_cap(self):
        from reactive_kinesis_spark.operators.similarity import (
            _bounded_fit_sample,
        )

        cap4 = (1 << 17) // 4
        assert _bounded_fit_sample(16, cap4, "k", "x") == 4 * cap4
        with pytest.raises(ValueError, match="rows-per-centroid"):
            _bounded_fit_sample(16, cap4 + 1, "k", "remedy-here")

    def test_remedy_reaches_message(self):
        from reactive_kinesis_spark.operators.similarity import (
            _bounded_fit_sample,
        )

        with pytest.raises(ValueError, match="use trainer-x instead"):
            _bounded_fit_sample(16, 1 << 16, "k", "use trainer-x instead")

    def test_semantic_dedup_user_excess_still_works(self, spark, monkeypatch):
        import reactive_kinesis_spark.operators.similarity as S

        rng = np.random.default_rng(7)
        rows = [(i, [float(x) for x in rng.standard_normal(4)]) for i in range(48)]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        monkeypatch.setattr(S, "_derive_k", lambda v, t: 6)
        out = S.semantic_dedup(
            vecs, k=None, trainer="sampled", train_sample=200_000
        )
        assert out.agg(F.sum("n_vecs").alias("n")).collect()[0]["n"] == 48

    def test_certified_derivation_uses_valid_vector_count(self, spark, monkeypatch):
        """A corpus with NULL/empty vectors must derive cells from the
        rows actually clustered — same basis as the throughput twin."""
        import reactive_kinesis_spark.operators.similarity as S

        rows = [(i, [float(i % 3), 1.0]) for i in range(12)]
        rows += [(100 + i, None) for i in range(50)]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        seen = {}
        real = S.derive_ivf_cells

        def spy(n, target_cell_size=S.IVF_TARGET_CELL_SIZE):
            seen["n"] = n
            return real(n, target_cell_size)

        monkeypatch.setattr(S, "derive_ivf_cells", spy)
        S.ivf_topk_certified(
            vecs, vecs.where(F.col("vec_id") < 2), k=1, n_cells=None, n_probe=2
        ).collect()
        assert seen["n"] == 12  # not 62
