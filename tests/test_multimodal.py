"""Multimodal plumbing tests: real Spark schema/batch behavior, fake codec."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reactive_kinesis_spark.operators import multimodal as M


@pytest.fixture()
def media_df(spark):
    rows = [(i, bytes([i % 256]) * (100 + i)) for i in range(20)]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    return M.with_media_meta(df, "image/fake")


def test_decode_requires_decoder(media_df):
    with pytest.raises(NotImplementedError, match="decoder"):
        M.decode_media(media_df)


def test_decode_with_fake_decoder(media_df):
    out = M.decode_media(media_df, decoder=M.fake_decoder).collect()
    assert len(out) == 20
    for r in out:
        assert 4 <= r.width <= 7 and 4 <= r.height <= 7
        assert r.n_channels == 3
        assert r.n_bytes >= 100
        assert len(r.checksum) == 32
    # determinism
    again = M.decode_media(media_df, decoder=M.fake_decoder).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_media_features_feed_similarity(spark, media_df):
    feats = M.media_features(media_df, dim=8, decoder=M.fake_decoder)
    rows = feats.collect()
    assert all(len(r.embedding) == 8 for r in rows)
    assert all(all(-1.0 <= v <= 1.0 for v in r.embedding) for r in rows)
    # embeddings flow straight into the similarity operator
    from reactive_kinesis_spark.operators.similarity import cosine_topk

    topk = cosine_topk(
        feats, feats.where(F.col("media_id") < 3), id_col="media_id", k=2
    ).collect()
    assert {r.query_id for r in topk} == {0, 1, 2}


def test_null_blob_never_fails_the_stage(spark):
    df = spark.createDataFrame(
        [(1, None), (2, b"abc")], "media_id long, media binary"
    )
    dec = {r.media_id: r for r in M.decode_media(df, decoder=M.fake_decoder).collect()}
    assert dec[1].width is None and dec[1].checksum is None
    assert dec[2].width is not None
    feats = {r.media_id: r.embedding for r in
             M.media_features(df, decoder=M.fake_decoder).collect()}
    assert feats[1] is None and feats[2] is not None
    assert {r.media_id for r in M.frame_sample(df).collect()} == {2}


def test_frame_sample_explodes_by_duration(spark):
    rows = [(1, b"x" * 1000, ("video/fake", None, None, 5000)),
            (2, b"y" * 300, ("video/fake", None, None, 1000))]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = M.frame_sample(df, every_ms=1000).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id[1]) == 5
    assert len(by_id[2]) == 1
    assert sorted(r.frame_idx for r in by_id[1]) == list(range(5))
    assert all(len(r.frame) > 0 for r in out)


# ---------------------------------------------------------------------------
# perceptual-hash near-dup
# ---------------------------------------------------------------------------


def _gray8(vals):
    """64 grayscale bytes as a raw 8x8x1 'image' blob."""
    return bytes(vals)


def _identity_decoder():
    # package-level codec: importable on executors (a module-local function
    # would pickle by reference to the unimportable test module)
    from reactive_kinesis_spark.operators.multimodal import raw_gray8_decoder

    return raw_gray8_decoder


class TestPhashNearDup:
    def _frame(self, spark, blobs):
        from reactive_kinesis_spark.operators.multimodal import with_media_meta

        df = spark.createDataFrame(
            [(i, b) for i, b in enumerate(blobs)], "media_id long, media binary"
        )
        return df

    def test_controlled_hamming_threshold(self, spark):
        from reactive_kinesis_spark.operators.multimodal import phash_neardup_pairs

        base = [200] * 32 + [10] * 32          # bits: 32 ones then 32 zeros
        near = list(base); near[0], near[32] = 10, 200   # flip 2 bits
        far = [200 if i % 2 else 10 for i in range(64)]  # ~32 bits away
        df = self._frame(spark, [_gray8(base), _gray8(near), _gray8(far)])
        out = {
            (r.id_1, r.id_2): r.hamming
            for r in phash_neardup_pairs(
                df, decoder=_identity_decoder(), max_hamming=3
            ).collect()
        }
        assert out == {(0, 1): 2}

    def test_exact_duplicates_hamming_zero(self, spark):
        from reactive_kinesis_spark.operators.multimodal import phash_neardup_pairs

        b = _gray8(list(range(64)))
        out = phash_neardup_pairs(
            self._frame(spark, [b, b]), decoder=_identity_decoder()
        ).collect()
        assert [(r.id_1, r.id_2, r.hamming) for r in out] == [(0, 1, 0)]

    def test_null_blob_skipped(self, spark):
        from reactive_kinesis_spark.operators.multimodal import phash_neardup_pairs

        df = spark.createDataFrame(
            [(0, _gray8([1] * 64)), (1, None)], "media_id long, media binary"
        )
        assert phash_neardup_pairs(df, decoder=_identity_decoder()).collect() == []

    def test_banding_validated(self, spark):
        import pytest
        from reactive_kinesis_spark.operators.multimodal import phash_neardup_pairs

        df = self._frame(spark, [_gray8([0] * 64)])
        with pytest.raises(ValueError, match="pigeonhole"):
            phash_neardup_pairs(df, decoder=_identity_decoder(), bands=3, max_hamming=3)
        with pytest.raises(ValueError, match="divide"):
            phash_neardup_pairs(df, decoder=_identity_decoder(), bands=5, max_hamming=2)

    def test_registry_recovers_reingested_copies(self, spark, sf_dir):
        from reactive_kinesis_spark.queries import load_all
        from reactive_kinesis_spark.tables import load_table

        rows = load_all()["q122_media_phash_neardup"].fn(spark, sf_dir).collect()
        expected = {
            (r.doc_id, r.doc_id + 10_000_000)
            for r in load_table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 10 == 0)
            .select("doc_id")
            .collect()
        }
        got = {(r.id_1, r.id_2) for r in rows if r.hamming == 0}
        # every re-ingested copy is recovered (chance band collisions may
        # add pairs at hamming<=3 but never hide a true duplicate)
        assert expected <= got


class TestPhashMaxBucket:
    def _frame(self, spark, blobs):
        return spark.createDataFrame(
            [(i, b) for i, b in enumerate(blobs)], "media_id long, media binary"
        )

    def test_constant_band_corpus_bounded(self, spark):
        """All-black-thumbnail corpus: every blob agrees on every band
        (one hub bucket per band). With max_bucket below the corpus size
        the hub buckets are dropped BEFORE the self-join — zero
        candidates, zero pairs — instead of n²/2 comparisons."""
        from reactive_kinesis_spark.operators.multimodal import phash_neardup_pairs

        black = _gray8([0] * 64)
        df = self._frame(spark, [black] * 200)
        out = phash_neardup_pairs(
            df, decoder=_identity_decoder(), max_bucket=50
        ).collect()
        assert out == []
        # uncapped control on a small slice: the hub emits its quadratic
        # pair set (3 blobs -> 3 pairs)
        out2 = phash_neardup_pairs(
            self._frame(spark, [black] * 3), decoder=_identity_decoder()
        ).collect()
        assert len(out2) == 3

    def test_cap_preserves_nonhub_pairs(self, spark):
        """Hub bucket dropped, but a genuine near-dup pair whose bands are
        NOT hub values still surfaces."""
        from reactive_kinesis_spark.operators.multimodal import phash_neardup_pairs

        black = _gray8([0] * 64)
        base = [200] * 32 + [10] * 32
        near = list(base); near[0], near[32] = 10, 200  # 2 bits away
        df = self._frame(spark, [black] * 40 + [_gray8(base), _gray8(near)])
        out = {
            (r.id_1, r.id_2): r.hamming
            for r in phash_neardup_pairs(
                df, decoder=_identity_decoder(), max_hamming=3, max_bucket=8
            ).collect()
        }
        assert out == {(40, 41): 2}

    def test_q123_capped_registry_query(self, spark, sf_dir):
        """The capped registry variant: constant-frame hub pairs are
        dropped; the re-ingest pairs of non-degenerate docs survive."""
        from pyspark.sql import functions as F

        from reactive_kinesis_spark.queries import load_all
        from reactive_kinesis_spark.tables import load_table

        rows = load_all()["q123_media_phash_capped"].fn(spark, sf_dir).collect()
        got0 = {(r.id_1, r.id_2) for r in rows if r.hamming == 0}
        doc_ids = [
            r.doc_id
            for r in load_table(spark, sf_dir, "documents")
            .select("doc_id").collect()
        ]
        # re-ingested non-degenerate docs must be recovered
        expected = {
            (d, d + 10_000_000)
            for d in doc_ids
            if d % 10 == 0 and d % 20 != 7
        }
        assert expected <= got0
        # no pair of two distinct constant-frame originals survives the cap
        # (their only agreement is the hub value in every band)
        degen = {d for d in doc_ids if d % 20 == 7}
        assert not any(
            a in degen and b in degen and a != b and b < 10_000_000
            for a, b in got0
        )
