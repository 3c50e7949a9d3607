"""Hand-computed micro-input tests for the second round-11 operator batch:
BPE merge induction, leakage-safe group splitting, TextRank keywords,
cluster silhouette audits, and the Gini-impurity feature screen."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reactive_kinesis_spark.operators.dedup import leakage_safe_split
from reactive_kinesis_spark.operators.graph import pagerank
from reactive_kinesis_spark.operators.quality import gini_feature_screen
from reactive_kinesis_spark.operators.similarity import silhouette_by_cluster
from reactive_kinesis_spark.operators.text import bpe_merges, cooccurrence_word_edges


class TestBpeMerges:
    def test_classic_merge_sequence(self, spark):
        # the Sennrich et al. worked example: freqs low=5 lower=2
        # newest=6 widest=3. Hand-derived sequence (count DESC, pair ASC):
        #   1. (e, s)    9  (newest 6 + widest 3)
        #   2. (es, t)   9  (ties 'es t' < 't </w>')
        #   3. (est, </w>) 9
        #   4. (l, o)    7  (ties 'l o' < 'o w')
        docs = spark.createDataFrame(
            [(" ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3),)],
            "text string",
        )
        rows = bpe_merges(docs, "text", k=4).orderBy("merge_rank").collect()
        got = [(r.left_sym, r.right_sym, r.merged, r.pair_count) for r in rows]
        assert got == [
            ("e", "s", "es", 9),
            ("es", "t", "est", 9),
            ("est", "</w>", "est</w>", 9),
            ("l", "o", "lo", 7),
        ]

    def test_greedy_run_semantics(self, spark):
        # 'aaaa' ×2: merge 1 = (a, a) count 6 (three adjacent pairs per
        # word × freq 2); the greedy fold must yield aa|aa|</w> (two
        # merges, no overlap), so merge 2's candidates are (aa, aa)=2 and
        # (aa, </w>)=2 — tie broken by pair ASC: 'aa </w>' < 'aa aa'
        # (byte '<' sorts before 'a').
        docs = spark.createDataFrame([("aaaa aaaa",)], "text string")
        rows = bpe_merges(docs, "text", k=2).orderBy("merge_rank").collect()
        assert (rows[0].left_sym, rows[0].right_sym, rows[0].pair_count) == ("a", "a", 6)
        assert (rows[1].left_sym, rows[1].right_sym, rows[1].pair_count) == (
            "aa",
            "</w>",
            2,
        )

    def test_k_validation(self, spark):
        docs = spark.createDataFrame([("x",)], "text string")
        with pytest.raises(ValueError, match="k >= 1"):
            bpe_merges(docs, "text", k=0)


class TestLeakageSafeSplit:
    def test_components_share_a_split_and_singletons_match_q117_rule(self, spark):
        docs = spark.createDataFrame(
            [(i,) for i in range(6)], "doc_id long"
        )
        pairs = spark.createDataFrame(
            [(0, 1), (1, 4)], "id_1 long, id_2 long"
        )
        out = {
            r.doc_id: r
            for r in leakage_safe_split(docs, pairs, "doc_id").collect()
        }
        # the {0,1,4} component: one rep (the min), one split for all
        assert out[0].rep_id == out[1].rep_id == out[4].rep_id == 0
        assert out[0].cluster_size == out[1].cluster_size == out[4].cluster_size == 3
        assert out[0].split == out[1].split == out[4].split
        # singletons: own rep, size 1, and the split equals the plain
        # per-document md5 rule applied to their id
        from reactive_kinesis_spark.operators.text import train_val_test_split

        plain = {
            r.doc_id: r.split
            for r in train_val_test_split(
                docs, "doc_id", train=0.8, val=0.1
            ).collect()
        }
        for i in (2, 3, 5):
            assert out[i].rep_id == i and out[i].cluster_size == 1
            assert out[i].split == plain[i]

    def test_split_params_validated(self, spark):
        docs = spark.createDataFrame([(0,)], "doc_id long")
        pairs = spark.createDataFrame([], "id_1 long, id_2 long")
        with pytest.raises(ValueError):
            leakage_safe_split(docs, pairs, "doc_id", train=0.9, val=0.2)


class TestTextRank:
    def test_cooccurrence_edges_hand_computed(self, spark):
        # "a hub b" → window-2 pairs (a,hub), (hub,b), (a,b); normalized
        # counts over two docs sharing the hub word
        docs = spark.createDataFrame(
            [("a hub b",), ("c hub a",)], "text string"
        )
        edges = {
            (r.c, r.s): r.w for r in cooccurrence_word_edges(docs, "text").collect()
        }
        assert edges == {
            ("a", "hub"): 2.0,  # one per doc
            ("b", "hub"): 1.0,
            ("a", "b"): 1.0,
            ("c", "hub"): 1.0,
            ("a", "c"): 1.0,
        }

    def test_hub_word_outranks_satellites(self, spark):
        # star geometry: 'hub' co-occurs with every satellite; satellites
        # only with the hub and one neighbor — hub must take rank 1
        docs = spark.createDataFrame(
            [("s1 hub s2",), ("s3 hub s4",), ("s5 hub s6",)], "text string"
        )
        und = cooccurrence_word_edges(docs, "text")
        edges = und.select(
            F.col("c").alias("src"), F.col("s").alias("dst"), "w"
        ).unionAll(und.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w"))
        pr = pagerank(
            edges, iterations=4, damping=0.85, weight_col="w", symmetric=True
        ).orderBy(F.desc("rank"))
        assert pr.first().node == "hub"

    def test_short_docs_skipped_and_window_validated(self, spark):
        docs = spark.createDataFrame([("a b",)], "text string")
        assert cooccurrence_word_edges(docs, "text", min_words=3).count() == 0
        with pytest.raises(ValueError, match="window"):
            cooccurrence_word_edges(docs, "text", window=0)


class TestSilhouette:
    def test_tight_far_clusters_score_high(self, spark):
        # ids chosen so deterministic seeding (first k by id) lands one
        # seed per true cluster
        vecs = spark.createDataFrame(
            [
                (0, [0.0, 0.0]),
                (1, [4.0, 4.0]),
                (2, [0.1, 0.0]),
                (3, [4.1, 4.0]),
            ],
            "vec_id long, embedding array<float>",
        )
        rows = (
            silhouette_by_cluster(vecs, "embedding", "vec_id", k=2, iterations=1)
            .orderBy("cluster")
            .collect()
        )
        assert [r.n_vectors for r in rows] == [2, 2]
        assert all(r.mean_silhouette > 0.9 for r in rows)

    def test_duplicate_centroids_score_zero(self, spark):
        vecs = spark.createDataFrame(
            [(i, [1.0, 2.0]) for i in range(4)],
            "vec_id long, embedding array<float>",
        )
        rows = silhouette_by_cluster(
            vecs, "embedding", "vec_id", k=2, iterations=1
        ).collect()
        # all vectors sit on both (identical) centroids: a = b = 0 → 0.0
        assert len(rows) == 1 and rows[0].n_vectors == 4
        assert rows[0].mean_silhouette == 0.0

    def test_k_validation(self, spark):
        vecs = spark.createDataFrame(
            [(0, [1.0])], "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError, match="k >= 2"):
            silhouette_by_cluster(vecs, "embedding", "vec_id", k=1)


class TestGiniFeatureScreen:
    def test_perfect_and_constant_features_exact(self, spark):
        # 4 rows, 2 labels split 2/2: parent gini = 1 - 2·(2/4)² = 0.5.
        # 'perfect' predicts the label exactly → split impurity 0, gain
        # 0.5; 'constant' has one value → split == parent, gain 0. All
        # quantities are exact through the 1e15 quantization (terms are
        # 0.5·1e15 exactly), so the asserts are equality, not approx.
        df = spark.createDataFrame(
            [
                ("a", "c0", "l1"),
                ("a", "c0", "l1"),
                ("b", "c0", "l2"),
                ("b", "c0", "l2"),
            ],
            "perfect string, constant string, lang string",
        )
        rows = {
            r.feature: r
            for r in gini_feature_screen(df, "lang", ["perfect", "constant"]).collect()
        }
        assert rows["perfect"].gini_parent == 0.5
        assert rows["perfect"].gini_split == 0.0
        assert rows["perfect"].gini_gain == 0.5
        assert rows["perfect"].n_values == 2
        assert rows["constant"].gini_split == 0.5
        assert rows["constant"].gini_gain == 0.0
        assert rows["constant"].n_values == 1

    def test_empty_features_raise(self, spark):
        df = spark.createDataFrame([("x",)], "lang string")
        with pytest.raises(ValueError, match="non-empty"):
            gini_feature_screen(df, "lang", [])


def _reference_bpe(word_freqs: dict[str, int], k: int):
    """Textbook greedy BPE (Sennrich et al. 2016 Algorithm 1), tuple
    symbols — the independent implementation the operator is
    differentially checked against."""
    vocab = {tuple(w) + ("</w>",): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(k):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        # count DESC, pair ASC — the operator's total order
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        merges.append((l, r, l + r, c))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


class TestBpeDifferential:
    @pytest.mark.parametrize("seed", [7, 99])
    def test_matches_reference_implementation_on_random_corpora(self, spark, seed):
        import random

        rng = random.Random(seed)
        alphabet = "abcde"
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(40)
        ]
        freqs: dict[str, int] = {}
        for w in words:
            freqs[w] = freqs.get(w, 0) + rng.randint(1, 9)
        text = " ".join(w for w, f in freqs.items() for _ in range(f))
        docs = spark.createDataFrame([(text,)], "text string")
        got = [
            (r.left_sym, r.right_sym, r.merged, r.pair_count)
            for r in bpe_merges(docs, "text", k=5).orderBy("merge_rank").collect()
        ]
        assert got == _reference_bpe(freqs, 5)


class TestSilhouetteDifferential:
    def test_matches_numpy_reference(self, spark):
        import numpy as np

        rng = np.random.default_rng(13)
        # two gaussian blobs, float32 round-trip mirrored below
        pts = np.vstack(
            [rng.normal(0, 0.3, (20, 4)), rng.normal(3, 0.3, (20, 4))]
        ).astype("float32")
        order = rng.permutation(40)
        pts = pts[order]
        vecs = spark.createDataFrame(
            [(int(i), [float(x) for x in pts[i]]) for i in range(40)],
            "vec_id long, embedding array<float>",
        )
        rows = (
            silhouette_by_cluster(vecs, "embedding", "vec_id", k=2, iterations=2)
            .orderBy("cluster")
            .collect()
        )
        # numpy reference mirroring the operator's contract: same seeding
        # (first k by id), squared-L2 Lloyd with plain means, simplified
        # silhouette. atol is loose because the reference uses float
        # means, not the engine's decimal-exact path.
        x = pts.astype("float64")
        cents = x[:2].copy()
        for _ in range(2):
            d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            cents = np.array([x[assign == c].mean(0) for c in range(2)])
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        a = np.sqrt(d[np.arange(40), assign])
        b = np.sqrt(
            np.where(
                np.arange(2)[None, :] == assign[:, None], np.inf, d
            ).min(1)
        )
        sil = np.where(np.maximum(a, b) == 0, 0.0, (b - a) / np.maximum(a, b))
        for r in rows:
            ref = sil[assign == r.cluster].mean()
            assert abs(r.mean_silhouette - ref) < 1e-6
            assert r.n_vectors == int((assign == r.cluster).sum())


class TestMarginMining:
    def test_margin_flips_the_hub_match(self, spark):
        # 3D geometry where RAW cosine retrieves the hub for both queries
        # (hub at 45° between them beats each dedicated partner at ~49°),
        # but the margin criterion — cosine normalized by neighborhood
        # density — penalizes the hub (its backward neighborhood is
        # uniformly close) and picks the dedicated partners. This is the
        # property the operator exists for.
        from reactive_kinesis_spark.operators.similarity import margin_topk

        a = spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])],
            "vec_id long, embedding array<float>",
        )
        b = spark.createDataFrame(
            [
                (10, [0.7, 0.7, 0.14]),  # hub
                (11, [0.65, 0.0, 0.76]),  # a1's dedicated partner
                (12, [0.0, 0.65, 0.76]),  # a2's dedicated partner
            ],
            "vec_id long, embedding array<float>",
        )
        rows = margin_topk(a, b, "vec_id", "embedding", k=2).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        # raw cosine prefers the hub...
        for qid in (1, 2):
            top_cos = max(by_q[qid], key=lambda r: r.cosine_sim)
            assert top_cos.neighbor_id == 10
        # ...but margin rank 1 is the dedicated partner, above threshold
        mined = {r.query_id: r for r in rows if r.rn == 1}
        assert mined[1].neighbor_id == 11 and mined[1].margin > 1.05
        assert mined[2].neighbor_id == 12 and mined[2].margin > 1.05

    def test_disjoint_sides_required_contract_shape(self, spark):
        # columns and rank completeness: every query emits exactly k rows
        from reactive_kinesis_spark.operators.similarity import margin_topk

        a = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
            "vec_id long, embedding array<float>",
        )
        b = spark.createDataFrame(
            [(10, [1.0, 1.0]), (11, [1.0, -1.0])],
            "vec_id long, embedding array<float>",
        )
        out = margin_topk(a, b, "vec_id", "embedding", k=2)
        assert out.columns == ["neighbor_id", "query_id", "cosine_sim", "margin", "rn"] or \
            set(out.columns) == {"query_id", "neighbor_id", "cosine_sim", "margin", "rn"}
        cnt = out.groupBy("query_id").count().collect()
        assert {r.query_id: r["count"] for r in cnt} == {1: 2, 2: 2}


class TestBpeSegment:
    def test_classic_corpus_segmentations(self, spark):
        # after the 4 hand-derived merges (e,s)(es,t)(est,</w>)(l,o):
        #   newest → n|e|w|est</w>, low → lo|w|</w>, widest → w|i|d|est</w>,
        #   lower → lo|w|e|r|</w>
        from reactive_kinesis_spark.operators.text import bpe_segment

        docs = spark.createDataFrame(
            [(" ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3),)],
            "text string",
        )
        rows = {r.word: r for r in bpe_segment(docs, "text", k=4, top_n=4).collect()}
        assert rows["newest"].segmentation == "n|e|w|est</w>"
        assert rows["newest"].n_subwords == 4
        assert rows["low"].segmentation == "lo|w|</w>"
        assert rows["widest"].segmentation == "w|i|d|est</w>"
        assert rows["lower"].segmentation == "lo|w|e|r|</w>"

    def test_separator_in_word_raises_loudly(self, spark):
        from reactive_kinesis_spark.operators.text import bpe_merges

        docs = spark.createDataFrame([("bad|word fine",)], "text string")
        with pytest.raises(Exception, match="symbol separator"):
            bpe_merges(docs, "text", k=1).collect()


class TestMarginGuards:
    def test_shared_ids_raise(self, spark):
        from reactive_kinesis_spark.operators.similarity import margin_topk

        a = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
        )
        b = spark.createDataFrame(
            [(2, [1.0, 1.0])], "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError, match="share ids"):
            margin_topk(a, b, "vec_id", "embedding", k=1)


class TestIvfCertified:
    def test_full_probe_equals_exact_search(self, spark):
        # with n_probe == n_cells every cell is probed, so IVF degenerates
        # to exact search: results must be IDENTICAL to the brute-force
        # retriever (same cosine fold, same tie order) — the invariant
        # that pins the candidate stage as lossless-when-exhaustive
        from reactive_kinesis_spark.operators.similarity import (
            cosine_topk,
            ivf_topk_certified,
        )

        import random

        rng = random.Random(3)
        emb = spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(30)],
            "vec_id long, embedding array<float>",
        )
        q = emb.where(F.col("vec_id") < 5)
        ivf = ivf_topk_certified(
            emb, q, "vec_id", "embedding", k=3, n_cells=4, n_probe=4, iterations=1
        )
        exact = cosine_topk(emb, q, "vec_id", "embedding", k=3)
        got = sorted(
            (r.query_id, r.neighbor_id, r.rn, round(r.cosine_sim, 12))
            for r in ivf.collect()
        )
        want = sorted(
            (r.query_id, r.neighbor_id, r.rn, round(r.cosine_sim, 12))
            for r in exact.collect()
        )
        assert got == want and len(got) == 15

    def test_partial_probe_bounds_candidates(self, spark):
        # n_probe < n_cells: every query still gets up to k results and
        # each returned neighbor must come from a probed cell
        from reactive_kinesis_spark.operators.similarity import ivf_topk_certified

        import random

        rng = random.Random(4)
        emb = spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(40)],
            "vec_id long, embedding array<float>",
        )
        q = emb.where(F.col("vec_id") < 3)
        out = ivf_topk_certified(
            emb, q, "vec_id", "embedding", k=3, n_cells=8, n_probe=2, iterations=1
        )
        per = {r.query_id: r["count"] for r in out.groupBy("query_id").count().collect()}
        assert set(per) == {0, 1, 2} and all(v <= 3 for v in per.values())

    def test_n_cells_none_derives_from_corpus_size(self, spark):
        # the k ∝ N rule applied to IVF (r11 verdict Next #4): with
        # n_cells=None the cell count is max(16, n // target_cell_size),
        # so a huge target floors at 16 — bit-identical to the explicit
        # n_cells=16 call — while a small target scales the cell count
        # with the corpus instead of letting cells bloat
        from reactive_kinesis_spark.operators.similarity import ivf_topk_certified

        import random

        rng = random.Random(5)
        emb = spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(64)],
            "vec_id long, embedding array<float>",
        )
        q = emb.where(F.col("vec_id") < 3)
        derived = ivf_topk_certified(
            emb, q, "vec_id", "embedding", k=3, n_probe=6, iterations=1,
            n_cells=None, target_cell_size=1_000_000,
        )
        explicit = ivf_topk_certified(
            emb, q, "vec_id", "embedding", k=3, n_probe=6, iterations=1, n_cells=16
        )
        key = lambda r: (r.query_id, r.rn)
        assert sorted(map(tuple, derived.collect()), key=lambda t: (t[0], t[3])) == \
            sorted(map(tuple, explicit.collect()), key=lambda t: (t[0], t[3]))
        # small target -> more cells than the floor: 64 // 2 = 32
        with pytest.raises(ValueError, match="target_cell_size"):
            ivf_topk_certified(
                emb, q, "vec_id", "embedding", n_cells=None, target_cell_size=0
            )


class TestDerivedLshParams:
    def test_small_corpus_floors_at_balanced_geometry(self):
        from reactive_kinesis_spark.operators.similarity import derive_lsh_params

        # any corpus under bands*N/target = 1 floors at 3-bit bands —
        # exactly the 'balanced' preset's 15x5 geometry
        assert derive_lsh_params(1_000) == {"n_planes": 15, "bands": 5}
        assert derive_lsh_params(0) == {"n_planes": 15, "bands": 5}

    def test_bits_grow_with_log_n_and_cap(self):
        from reactive_kinesis_spark.operators.similarity import derive_lsh_params

        import math
        prev_bits = 0
        for n in (10**5, 10**6, 10**7, 10**9):
            p = derive_lsh_params(n, bands=5, target_candidates=4096)
            bits = p["n_planes"] // 5
            want = min(24, max(3, math.ceil(math.log2(max(1, 5 * n // 4096)))))
            assert bits == want
            assert bits >= prev_bits
            prev_bits = bits
        # the cap: an absurd corpus never exceeds 24-bit bands
        assert derive_lsh_params(10**14)["n_planes"] == 5 * 24
        import pytest as _p
        with _p.raises(ValueError, match="target_candidates"):
            derive_lsh_params(10, target_candidates=0)
        with _p.raises(ValueError, match="bands"):
            derive_lsh_params(10, bands=0)

    def test_ann_lsh_topk_derived_matches_explicit_floor(self, spark):
        # n_planes=None on a small corpus = the 15x5 floor -> identical
        # results to the explicit call (both families' registered shapes
        # untouched)
        from reactive_kinesis_spark.operators.similarity import ann_lsh_topk

        import random
        rng = random.Random(9)
        emb = spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)],
            "vec_id long, embedding array<float>",
        )
        q = emb.where(F.col("vec_id") < 3)
        a = sorted(map(tuple, ann_lsh_topk(emb, q, k=3, n_planes=None, dim=8).collect()))
        b = sorted(map(tuple, ann_lsh_topk(emb, q, k=3, dim=8).collect()))
        assert a == b and a


class TestSemanticDedupSampledTrainer:
    def test_sampled_trainer_flags_the_same_planted_duplicates(self, spark):
        # exact duplicate vectors collide in SOME cluster under ANY
        # trainer (identical vectors always share an assignment), so the
        # planted duplicates must be flagged by both paths even though
        # cluster ids differ
        from reactive_kinesis_spark.operators.similarity import semantic_dedup

        import random
        rng = random.Random(13)
        base = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(30)]
        rows = [(i, base[i]) for i in range(30)]
        rows += [(100 + i, base[i]) for i in range(5)]   # 5 exact dups
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        for trainer in ("certified", "sampled"):
            out = semantic_dedup(
                vecs, k=4, iterations=2, threshold=0.999, trainer=trainer
            ).agg(
                F.sum("n_dup_pairs").alias("p"), F.sum("n_dropped").alias("d")
            ).collect()[0]
            assert out["p"] >= 5 and out["d"] >= 5, trainer

    def test_sampled_trainer_validations(self, spark):
        from reactive_kinesis_spark.operators.similarity import semantic_dedup

        vecs = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(10)],
            "vec_id long, embedding array<double>",
        )
        with pytest.raises(ValueError, match="trainer"):
            semantic_dedup(vecs, trainer="nope")
        with pytest.raises(ValueError, match="train_sample"):
            semantic_dedup(vecs, k=2, trainer="sampled", train_sample=0)
        with pytest.raises(ValueError, match="> train_sample"):
            semantic_dedup(vecs, k=8, trainer="sampled", train_sample=4)
