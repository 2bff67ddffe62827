"""Multimodal plumbing: decode-stub contract, batch feature extraction,
nearest-neighbor resize (real numpy), audio features, frame sampling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from powershap_spark.operators.multimodal import (
    attach_fake_media,
    audio_features,
    decode_audio,
    decode_image,
    image_features,
    image_resize,
    resize_image,
)


@pytest.fixture()
def media(spark):
    return attach_fake_media(
        spark.range(20).withColumnRenamed("id", "doc_id"), "doc_id"
    )


def test_decode_stubs_raise_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"xx")
    with pytest.raises(NotImplementedError):
        decode_audio(b"xx")


def test_resize_image_nearest_neighbor_exact():
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = resize_image(img, 3, 2)
    assert out.shape == (2, 3, 3)
    # nearest-neighbor: row r maps to source row (r*4)//2, col c -> (c*6)//3
    for r in range(2):
        for c in range(3):
            assert (out[r, c] == img[(r * 4) // 2, (c * 6) // 3]).all()
    up = resize_image(img, 12, 8)
    assert up.shape == (8, 12, 3)


def test_image_resize_updates_metadata_and_bytes(spark, media):
    out = image_resize(media, target_w=4, target_h=3, fake=True).toPandas()
    assert (out.width == 4).all() and (out.height == 3).all()
    assert out.resized.map(len).eq(4 * 3 * 3).all()  # raw RGB bytes
    # deterministic: same input -> same bytes
    out2 = image_resize(media, target_w=4, target_h=3, fake=True).toPandas()
    a = out.sort_values("doc_id").resized.map(bytes).tolist()
    b = out2.sort_values("doc_id").resized.map(bytes).tolist()
    assert a == b


def test_audio_features_bounds(spark, media):
    out = audio_features(media, fake=True).toPandas()
    assert len(out) == 20
    assert ((out.rms > 0) & (out.rms <= 1.0)).all()
    assert ((out.zero_crossing_rate >= 0) & (out.zero_crossing_rate <= 1)).all()


def test_image_features_columns(spark, media):
    out = image_features(media, fake=True).toPandas()
    assert {"mean_intensity", "std_intensity"} <= set(out.columns)
    assert out.mean_intensity.between(0, 255).all()
