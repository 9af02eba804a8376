"""Multimodal binary-column plumbing: Arrow-batched decode / feature /
resize / frame-sample stages over the deterministic synthetic media format
(real codecs stubbed — no PIL/av in container)."""

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.functions.multimodal import (
    decode_features,
    resize_images,
    sample_frames,
    synth_media,
    with_media_sha256,
)


def test_synth_media_deterministic(spark):
    a = synth_media(spark, 10, "image").orderBy("doc_id").collect()
    b = synth_media(spark, 10, "image").orderBy("doc_id").collect()
    assert [bytes(r["data"]) for r in a] == [bytes(r["data"]) for r in b]
    assert all(r["modality"] == "image" and r["n_units"] == 3 for r in a)


def test_decode_features_shapes(spark):
    media = synth_media(spark, 20, "image")
    feats = decode_features(media, dims=16)
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows[:5]:
        assert len(r["embedding"]) == 16
        assert abs(sum(r["embedding"]) - 1.0) < 1e-6  # L1-normalized
        assert 0 <= r["mean_value"] <= 255


def test_features_feed_ann(spark):
    """The media features are ANN-compatible: brute-force top-k runs on them."""
    from data_ingestor_py_spark.functions.similarity import topk_cosine

    feats = decode_features(synth_media(spark, 30, "image")).withColumnRenamed(
        "doc_id", "vec_id"
    )
    out = topk_cosine(feats.where("vec_id < 2"), feats, k=3)
    assert out.count() == 6


def test_resize_downsamples(spark):
    media = synth_media(spark, 5, "image")
    small = resize_images(media, 4, 4)
    for r in small.collect():
        assert (r["width"], r["height"]) == (4, 4)
        assert len(bytes(r["data"])) == 11 + 4 * 4 * 3  # header + w*h*channels


def test_frame_sampling_expands_rows(spark):
    vids = synth_media(spark, 4, "video")
    n_frames = {r["doc_id"]: r["n_units"] for r in vids.collect()}
    frames = sample_frames(vids, every_k=2)
    got = frames.groupBy("doc_id").count().collect()
    for r in got:
        assert r["count"] == (n_frames[r["doc_id"]] + 1) // 2


def test_real_codec_is_clearly_stubbed(spark):
    df = spark.createDataFrame([(1, bytearray(b"\xff\xd8\xff\xe0JFIF-not-synm"))],
                               "doc_id long, data binary")
    with pytest.raises(Exception) as ei:
        decode_features(df).collect()
    assert "NotImplementedError" in str(ei.value) or "STUB" in str(ei.value)


def test_media_sha_invariant(spark):
    media = synth_media(spark, 5, "audio")
    hashed = with_media_sha256(media)
    assert hashed.where(F.length("_media_sha256") == 64).count() == 5