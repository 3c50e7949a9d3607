"""Round-13 behaviors: the r12 ADVICE closures (matmul-form centroid
assignment, derived-k fit-sample auto-raise, zipf seed charset guard,
fully-signed _tdiv) and the new q190-q194 registry entries' operators."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


class TestNearestCentroidMatmulForm:
    def test_matches_naive_squared_distance_argmin(self):
        """The matmul form (||c||^2 - 2 x.c) must pick the same centroid
        as the naive residual tensor on well-separated data, and the same
        lowest-index winner on exact ties."""
        from reactive_kinesis_spark.operators.similarity import (
            _nearest_cells,
            _nearest_centroid,
        )

        rng = np.random.default_rng(7)
        mat = rng.standard_normal((257, 16))
        cents = rng.standard_normal((9, 16))
        naive = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assert (_nearest_centroid(mat, cents) == naive.argmin(axis=1)).all()
        order = _nearest_cells(mat, cents, 3)
        want = np.argsort(naive, axis=1, kind="stable")[:, :3]
        assert (order == want).all()

    def test_tie_breaks_to_lowest_index_across_chunks(self, monkeypatch):
        """Duplicate centroids tie exactly; the winner must be the lower
        index, and chunking the row axis must not change any answer."""
        import reactive_kinesis_spark.operators.similarity as S

        mat = np.tile(np.arange(5.0)[:, None], (1, 4))
        cents = np.vstack([mat[2], mat[2], mat[0]])  # cents 0 and 1 identical
        full = S._nearest_centroid(mat, cents)
        monkeypatch.setattr(S, "NEAREST_BLOCK_ELEMS", 4)  # force tiny chunks
        chunked = S._nearest_centroid(mat, cents)
        assert (full == chunked).all()
        assert full[2] == 0  # exact tie between 0 and 1 -> lowest index

    def test_block_memory_is_rows_times_cells(self):
        """The distance block at derived-k scale stays O(rows*cells):
        with cells=2^17 the per-chunk row count collapses to
        NEAREST_BLOCK_ELEMS // cells, never rows*cells*dim."""
        from reactive_kinesis_spark.operators.similarity import (
            NEAREST_BLOCK_ELEMS,
        )

        cells = 1 << 17
        block_rows = max(1, NEAREST_BLOCK_ELEMS // cells)
        assert block_rows * cells * 8 <= 2 * NEAREST_BLOCK_ELEMS * 8  # <=128MB


class TestSampledTrainerDerivedScale:
    def test_derived_k_auto_raises_train_sample(self, spark):
        """k=None with a tiny target_cluster_size derives k past the
        default train_sample; the sampled path must auto-raise the fit
        sample instead of hard-failing (the r12 ADVICE medium)."""
        from reactive_kinesis_spark.operators.similarity import semantic_dedup

        rng = np.random.default_rng(3)
        rows = [(i, [float(x) for x in rng.standard_normal(4)]) for i in range(96)]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        # derived k = max(8, 96 // 2) = 48 > train_sample=16 -> auto-raise
        out = semantic_dedup(
            vecs, k=None, target_cluster_size=2, trainer="sampled", train_sample=16
        )
        got = out.agg(F.sum("n_vecs").alias("n")).collect()[0]["n"]
        assert got == 96

    def test_derived_k_past_cap_raises_loudly(self, spark, monkeypatch):
        """A derived k beyond the 2^17 bounded-collect cap must raise the
        documented guidance error, not fit 1-point centroids."""
        import reactive_kinesis_spark.operators.similarity as S

        vecs = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(10)],
            "vec_id long, embedding array<double>",
        )
        monkeypatch.setattr(S, "_derive_k", lambda v, t: (1 << 17) + 1)
        with pytest.raises(ValueError, match="target_cluster_size"):
            S.semantic_dedup(vecs, k=None, trainer="sampled")

    def test_explicit_k_validation_unchanged(self, spark):
        """An EXPLICIT k > train_sample still fails fast (the auto-raise
        applies only when k was derived)."""
        from reactive_kinesis_spark.operators.similarity import semantic_dedup

        vecs = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(10)],
            "vec_id long, embedding array<double>",
        )
        with pytest.raises(ValueError, match="> train_sample"):
            semantic_dedup(vecs, k=8, trainer="sampled", train_sample=4)


class TestZipfSeedGuard:
    def test_bad_seeds_rejected_in_operator_and_oracle(self, spark):
        from reactive_kinesis_spark.operators.lexstats import zipf_synth_docs
        from reactive_kinesis_spark.queries.corpus import _zipf_docs_sql

        docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        for bad in ("a'b", "x;--", "", "a b", 'q"'):
            with pytest.raises(ValueError, match="safe charset"):
                zipf_synth_docs(docs, 2, seed=bad)
            with pytest.raises(ValueError, match="safe charset"):
                _zipf_docs_sql(2, seed=bad)

    def test_bad_column_names_rejected(self, spark):
        from reactive_kinesis_spark.operators.lexstats import zipf_synth_docs

        docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="identifier"):
            zipf_synth_docs(docs, 2, id_col="doc_id); DROP")

    def test_safe_seeds_still_accepted(self):
        from reactive_kinesis_spark.operators.lexstats import check_zipf_seed

        for ok in ("zipf", "x:y", "A-b_0"):
            assert check_zipf_seed(ok) == ok


def test_tdiv_signed_divisor_examples_match_duckdb():
    """The four sign quadrants of _tdiv pinned against DuckDB's actual
    HUGEINT // — the engine semantics the helper claims, not just the
    arithmetic definition."""
    import duckdb

    from reactive_kinesis_spark.operators.similarity import _tdiv

    cases = [(a, b) for a in (-7, -1, 0, 1, 7, 12345) for b in (-3, -2, 2, 3)]
    got = [_tdiv(a, b) for a, b in cases]
    want = [
        duckdb.sql(
            f"SELECT CAST({a} AS HUGEINT) // CAST({b} AS HUGEINT)"
        ).fetchone()[0]
        for a, b in cases
    ]
    assert got == want


class TestSpectralOracleDegenerateGuard:
    """r12 ADVICE: the q183/q189 oracles divided by ss*tr unguarded, so a
    constant-embedding corpus made them diverge from the operators' well-
    formed zero rows. The guards must make operator == oracle on ALL
    inputs, not just the registered non-degenerate corpus."""

    def _ddb_constant_corpus(self):
        import duckdb
        import pandas as pd

        con = duckdb.connect()
        con.register(
            "embeddings",
            pd.DataFrame(
                {"vec_id": range(6), "embedding": [[1.0, 2.0, 3.0, 4.0]] * 6}
            ),
        )
        return con

    def test_q183_oracle_matches_operator_on_constant_corpus(self, spark):
        from reactive_kinesis_spark.operators.similarity import power_iteration_pc
        from reactive_kinesis_spark.queries.llm import _power_pc_oracle_sql
        from tests.oracle_utils import compare

        emb = spark.createDataFrame(
            [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(6)],
            "vec_id long, embedding array<double>",
        )
        compare(
            power_iteration_pc(emb, iterations=6).orderBy("pos"),
            self._ddb_constant_corpus(),
            _power_pc_oracle_sql(6),
        )

    def test_q189_oracle_matches_operator_on_constant_corpus(self, spark):
        from reactive_kinesis_spark.operators.similarity import deflation_pcs
        from reactive_kinesis_spark.queries.llm import _deflation_pcs_oracle_sql
        from tests.oracle_utils import compare

        emb = spark.createDataFrame(
            [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(6)],
            "vec_id long, embedding array<double>",
        )
        compare(
            deflation_pcs(emb, k=4, iterations=6).orderBy("comp", "pos"),
            self._ddb_constant_corpus(),
            _deflation_pcs_oracle_sql(4, 6),
        )


class TestSynthLexstatsTwinsDiscriminate:
    """q191-q194 exist because the testdata corpus saturates the
    information-theoretic tier against a ~31-word vocabulary. Pin the
    DISCRIMINATION claims, not just parity: the synthetic twins must
    produce values the degenerate corpus cannot."""

    def test_synth_entropy_separates_from_support_size(self, spark, sf_dir):
        """On the testdata corpus entropy is glued to log2(vocab) (a
        near-uniform fixed ~31-word support: 2^H ≈ vocab), so q175
        certifies arithmetic but cannot distinguish entropy from support
        size. On the heavy-tailed synth corpus 2^H ≪ vocab (rank 1 alone
        carries mass 1/2) — entropy finally measures CONCENTRATION."""
        import math

        from reactive_kinesis_spark.operators.lexstats import (
            token_entropy,
            zipf_synth_docs,
        )
        from reactive_kinesis_spark.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        base = {
            r.source: (r.entropy_bits, r.vocab)
            for r in token_entropy(docs, group_col="source").collect()
        }
        synth = {
            r.source: (r.entropy_bits, r.vocab)
            for r in token_entropy(
                zipf_synth_docs(docs, 64), group_col="source"
            ).collect()
        }
        assert set(synth) == set(base) and synth
        for s, (h, v) in base.items():
            assert h / math.log2(v) > 0.9, (s, h, v)  # saturated: H ≈ log2|V|
        for s, (h, v) in synth.items():
            # unbounded vocabulary grew past the ~31-word testdata support
            # (1600 tokens/source at sf0.001 -> ~69 types under beta≈0.57)
            assert v > 40, (s, v)
            assert h / math.log2(v) < 0.5, (s, h, v)  # heavy tail: H ≪ log2|V|

    def test_synth_cond_entropy_has_real_gap(self, spark, sf_dir):
        """Under iid draws H(w2|w1) < H2 marginal with a finite-sample
        gap, and both terms are non-degenerate (> 0)."""
        from reactive_kinesis_spark.operators.lexstats import (
            conditional_entropy,
            zipf_synth_docs,
        )
        from reactive_kinesis_spark.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        rows = conditional_entropy(
            zipf_synth_docs(docs, 64), group_col="source"
        ).collect()
        assert rows
        for r in rows:
            assert r.pair_entropy_bits > r.head_entropy_bits > 0
            assert 0 < r.cond_entropy_bits < r.pair_entropy_bits

    def test_synth_pmi_sits_near_independence(self, spark, sf_dir):
        """The synthetic corpus draws tokens independently, so its top
        PMI collocations are finite-sample noise near 0 — the null
        calibration: |pmi| small vs the >=1-bit associations a template
        corpus shows."""
        from reactive_kinesis_spark.operators.lexstats import (
            pmi_collocations,
            zipf_synth_docs,
        )
        from reactive_kinesis_spark.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        rows = pmi_collocations(
            zipf_synth_docs(docs, 64), min_count=5, top=20
        ).collect()
        assert rows
        # finite-sample PMI noise at min_count=5 reaches ~2 bits at this
        # corpus size; a GENUINE always-together template pair would read
        # ≈ log2(N/c) ≈ 12+ bits. 4.0 splits the regimes with margin.
        assert all(abs(r.pmi_bits) < 4.0 for r in rows)


def test_synth_twins_add_zero_exchanges(spark, sf_dir):
    """q191-q194's synth rewrite is an in-scan projection and q190's
    derivation is a driver-side count, so each twin's executed plan must
    carry EXACTLY its base query's exchange count — re-certification on
    discriminating data costs no new shuffle (the q186-q188 contract,
    extended to the whole battery)."""
    from reactive_kinesis_spark.queries import load_all

    reg = load_all()
    pairs = [
        ("q175_token_entropy", "q191_zipf_synth_entropy"),
        ("q181_source_kl_divergence", "q192_zipf_synth_kl"),
        ("q182_pmi_collocations", "q193_zipf_synth_pmi"),
        ("q184_conditional_entropy", "q194_zipf_synth_cond_entropy"),
        ("q30_embedding_ann_lsh", "q190_ann_lsh_derived"),
    ]
    for base, twin in pairs:
        pb = reg[base].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        pt = reg[twin].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert pb.count("Exchange") == pt.count("Exchange"), (base, twin)
