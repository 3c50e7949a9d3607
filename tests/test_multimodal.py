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
