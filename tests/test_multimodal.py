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


def test_custom_decoder_seam(spark, media):
    """decoder= replaces the stdlib/fake decode inside the mapInPandas
    batch loop (the Pillow/soundfile plug-point): features reflect the
    injected decoder's output, not the default decoder's. The decoders
    are closures so cloudpickle ships them by value (a production plug-in
    would be an importable module-level function instead)."""

    def _const_img_decoder(blob: bytes) -> np.ndarray:
        # stand-in for a Pillow-backed decoder: every blob decodes to a
        # constant 2x2 gray image at the blob's first byte's intensity
        v = blob[0] if blob else 0
        return np.full((2, 2, 3), v, dtype=np.uint8)

    def _const_wave_decoder(blob: bytes) -> np.ndarray:
        return np.full(16, 0.5, dtype=np.float32)

    out = image_features(media, decoder=_const_img_decoder).toPandas()
    # constant image -> std 0, mean == first blob byte ('I' of b"IMG:")
    assert (out.std_intensity == 0.0).all()
    assert (out.mean_intensity == float(ord("I"))).all()

    aud = audio_features(media, decoder=_const_wave_decoder).toPandas()
    assert np.allclose(aud.rms, 0.5)
    assert (aud.zero_crossing_rate == 0.0).all()

    rez = image_resize(media, target_w=4, target_h=4, decoder=_const_img_decoder).toPandas()
    assert rez.resized.map(len).eq(4 * 4 * 3).all()
    assert all(set(bytes(b)) == {ord("I")} for b in rez.resized)


def test_real_png_pipeline_end_to_end(spark):
    """REAL decode path: actual PNG bytes (all five scanline filters
    exercised by the round-trip property test below) flow through
    image_features and image_resize with fake=False — no image library."""
    import numpy as np
    import pandas as pd

    from powershap_spark.operators.multimodal import (
        decode_png,
        encode_png,
        image_features,
        image_resize,
    )

    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 256, (12, 10, 3), dtype=np.uint8) for _ in range(5)]
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "media": [encode_png(im) for im in imgs],
            "width": np.int32(10),
            "height": np.int32(12),
        }
    )
    sdf = spark.createDataFrame(pdf)

    feats = image_features(sdf, fake=False).orderBy("doc_id").toPandas()
    for i, im in enumerate(imgs):
        assert feats.mean_intensity[i] == pytest.approx(float(im.mean()))
        assert feats.std_intensity[i] == pytest.approx(float(im.std()))

    rsz = image_resize(sdf, target_w=5, target_h=6, fake=False).orderBy(
        "doc_id"
    ).toPandas()
    assert list(rsz.width) == [5] * 5 and list(rsz.height) == [6] * 5
    got0 = np.frombuffer(rsz.resized[0], dtype=np.uint8).reshape(6, 5, 3)
    # nearest-neighbor rows/cols of the original
    rows = np.minimum((np.arange(6) * 12) // 6, 11)
    cols = np.minimum((np.arange(5) * 10) // 5, 9)
    assert (got0 == imgs[0][rows[:, None], cols[None, :]]).all()


def test_real_wav_pipeline_end_to_end(spark):
    """REAL decode path: PCM WAV bytes through audio_features with
    fake=False; RMS/ZCR computed on the decoded waveform."""
    import numpy as np
    import pandas as pd

    from powershap_spark.operators.multimodal import audio_features, encode_wav

    t = np.linspace(0, 1, 1600, endpoint=False)
    waves = [np.sin(2 * np.pi * 10 * t) * 0.5, np.sign(np.sin(2 * np.pi * 40 * t)) * 0.9]
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(2, dtype=np.int64),
            "media": [encode_wav(w) for w in waves],
        }
    )
    out = (
        audio_features(spark.createDataFrame(pdf), fake=False)
        .orderBy("doc_id")
        .toPandas()
    )
    # sine at amplitude 0.5 -> rms ~ 0.5/sqrt(2); square at 0.9 -> rms ~ 0.9
    assert out.rms[0] == pytest.approx(0.5 / np.sqrt(2), rel=1e-2)
    assert out.rms[1] == pytest.approx(0.9, rel=1e-2)
    # the 40 Hz square crosses zero ~4x more often than the 10 Hz sine
    assert out.zero_crossing_rate[1] > 3 * out.zero_crossing_rate[0]


def test_png_roundtrip_all_filters():
    """decode_png must invert every scanline filter type: round-trip images
    re-encoded with each filter forced."""
    import struct
    import zlib

    import numpy as np

    from powershap_spark.operators.multimodal import decode_png, _PNG_MAGIC

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (6, 5, 3), dtype=np.uint8)
    h, w, ch = img.shape
    for ftype in range(5):
        rows = []
        prior = np.zeros(w * ch, dtype=np.int32)
        for y in range(h):
            cur = img[y].reshape(-1).astype(np.int32)
            enc = np.zeros_like(cur)
            for x in range(w * ch):
                left = cur[x - ch] if x >= ch else 0
                up = prior[x]
                ul = int(prior[x - ch]) if x >= ch else 0
                if ftype == 0:
                    enc[x] = cur[x]
                elif ftype == 1:
                    enc[x] = cur[x] - left
                elif ftype == 2:
                    enc[x] = cur[x] - up
                elif ftype == 3:
                    enc[x] = cur[x] - ((left + up) >> 1)
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    enc[x] = cur[x] - pred
            rows.append(bytes([ftype]) + (enc & 0xFF).astype(np.uint8).tobytes())
            prior = cur

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        png = (
            _PNG_MAGIC
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b"")
        )
        assert (decode_png(png) == img).all(), f"filter {ftype}"


def test_image_resize_png_output_roundtrips(spark):
    """out_format='png': resized output is a VALID PNG decodable by the
    stdlib codec, pixel-equal to the raw nearest-neighbor result."""
    import numpy as np
    import pandas as pd

    from powershap_spark.operators.multimodal import (
        decode_png,
        encode_png,
        image_resize,
        resize_image,
    )

    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (10, 8, 3), dtype=np.uint8)
    pdf = pd.DataFrame(
        {
            "doc_id": [0],
            "media": [encode_png(img)],
            "width": np.int32(8),
            "height": np.int32(10),
        }
    )
    out = (
        image_resize(
            spark.createDataFrame(pdf), target_w=4, target_h=5, fake=False,
            out_format="png",
        )
        .toPandas()
    )
    got = decode_png(bytes(out.resized[0]))
    assert (got == resize_image(img, 4, 5)).all()
