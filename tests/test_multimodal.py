"""Multimodal binary-column plumbing tests (decode stubbed, plumbing real)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tantivy_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, b"\xff\xd8\xff" + b"jpegdata" * 10),
        (1, b"\x89PNG\r\n" + b"png" * 50),
        (2, b"RIFF" + b"wavwav" * 30),
        (3, b"randomnoise" * 20),
    ]
    pdf = pd.DataFrame(rows, columns=["media_id", "blob"])
    return spark.createDataFrame(pdf)


def test_media_metadata_jvm_only(media):
    out = {r["media_id"]: r for r in
           M.media_metadata(media, "media_id", "blob").collect()}
    assert out[0]["container"] == "jpeg"
    assert out[1]["container"] == "png"
    assert out[2]["container"] == "riff"
    assert out[3]["container"] is None
    assert out[0]["n_bytes"] == 3 + 80
    # no Python in the plan
    plan = M.media_metadata(media, "media_id", "blob")._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_decode_unsupported_format_raises(media):
    # the media fixture blobs are fake JPEG/RIFF bytes — the REAL default
    # codec must refuse them loudly, not fake an answer
    with pytest.raises(Exception) as ei:
        M.decode_images(media, "media_id", "blob").collect()
    assert "ValueError" in str(ei.value) or "unsupported image format" in str(ei.value)


def test_decode_real_png_and_features(spark):
    # end-to-end REAL decode: build genuine PNG/BMP-free blobs with the
    # in-repo encoder, decode through the Spark pipeline, and verify
    # exact pixel stats
    import pandas as pd
    from tantivy_spark.functions.imagecodec import encode_png

    rng = np.random.default_rng(7)
    imgs = {i: rng.integers(0, 256, size=(6 + i, 5, 3), dtype=np.uint8)
            for i in range(4)}
    pdf = pd.DataFrame(
        {"media_id": list(imgs), "blob": [encode_png(a) for a in imgs.values()]})
    df = spark.createDataFrame(pdf)
    decoded = M.decode_images(df, "media_id", "blob")
    rows = {r.key: r for r in decoded.collect()}
    for i, arr in imgs.items():
        r = rows[i]
        assert (r.height, r.width, r.channels) == arr.shape
        assert np.array_equal(
            np.array(r.pixels, dtype=np.uint8).reshape(arr.shape), arr)
    feats = {r.key: r for r in M.image_features(decoded).collect()}
    for i, arr in imgs.items():
        assert abs(feats[i].mean_pixel - arr.mean()) < 1e-3
        assert abs(feats[i].std_pixel - arr.std()) < 1e-3


def test_decode_images_fake_deterministic(media):
    d1 = M.decode_images(media, "media_id", "blob",
                         deterministic_fake=True).collect()
    d2 = M.decode_images(media, "media_id", "blob",
                         deterministic_fake=True).collect()
    assert sorted(r["key"] for r in d1) == [0, 1, 2, 3]
    by_key1 = {r["key"]: r["pixels"] for r in d1}
    by_key2 = {r["key"]: r["pixels"] for r in d2}
    assert by_key1 == by_key2  # seeded by content -> reproducible
    r0 = next(r for r in d1 if r["key"] == 0)
    assert (r0["height"], r0["width"], r0["channels"]) == (8, 8, 3)
    assert len(r0["pixels"]) == 8 * 8 * 3


def test_decode_resize(media):
    out = M.decode_images(media, "media_id", "blob",
                          deterministic_fake=True, resize_to=(4, 2)).collect()
    for r in out:
        assert (r["height"], r["width"]) == (4, 2)
        assert len(r["pixels"]) == 4 * 2 * 3


def test_image_features(media):
    dec = M.decode_images(media, "media_id", "blob", deterministic_fake=True)
    feats = {r["key"]: r for r in M.image_features(dec).collect()}
    for k, r in feats.items():
        assert 0 <= r["mean_pixel"] <= 255
        assert r["std_pixel"] > 0


def test_sample_frames(media):
    frames = M.sample_frames(media, "media_id", "blob", every_n=10,
                             deterministic_fake=True).collect()
    by_key = {}
    for r in frames:
        by_key.setdefault(r["key"], []).append(r["frame_idx"])
    assert set(by_key) == {0, 1, 2, 3}
    for idxs in by_key.values():
        assert idxs == sorted(idxs)
        assert all(i % 10 == 0 for i in idxs)
        assert 2 <= len(idxs) <= 4  # 20-40 fake frames sampled every 10


def test_size_banding_partitioning(media, spark):
    out = M.size_banded(media, "blob", band_bytes=64, partitions=4)
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 4  # no rows lost
