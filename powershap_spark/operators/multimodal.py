"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (hash-derived
"pixels") exercises the real Spark-side plumbing — schema, batching,
partitioning, UDF signatures — which is what this module actually
provides and what the tests cover.

Scale shape: media bytes stay columnar (Arrow binary arrays) end to end;
feature extraction is per-batch vectorized; frame sampling emits multiple
rows per input via mapInPandas's iterator contract (no collect, no
per-row Python UDF).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_fake_media",
    "decode_image",
    "decode_audio",
    "image_features",
    "audio_features",
    "resize_image",
    "image_resize",
    "frame_sample",
]

_MEDIA_SCHEMA = "media binary, media_type string, width int, height int, n_frames int"


def attach_fake_media(df: DataFrame, id_col: str, seed: int = 42) -> DataFrame:
    """Attach a deterministic opaque binary 'media' column + typed metadata
    derived from the id — stands in for a real media ingest."""
    h = F.xxhash64(F.lit(seed), F.col(id_col))
    return df.select(
        "*",
        F.encode(F.concat(F.lit("IMG:"), F.hex(h)), "utf-8").alias("media"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("image/jpeg"), F.lit("video/mp4")),
            (F.pmod(h, F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        (F.pmod(h, F.lit(512)) + 32).cast("int").alias("width"),
        (F.pmod(F.xxhash64(h), F.lit(512)) + 32).cast("int").alias("height"),
        (F.pmod(h, F.lit(30)) + 1).cast("int").alias("n_frames"),
    )


def decode_image(media: bytes, fake: bool = False) -> np.ndarray:
    """Decode binary -> HxWx3 uint8 array. REAL decode requires
    Pillow/libjpeg, absent in this container -> NotImplementedError.
    fake=True: deterministic hash-derived pixels with the right shape."""
    if not fake:
        raise NotImplementedError(
            "image decode requires Pillow/opencv (not in this environment); "
            "pass fake=True for the deterministic test decoder"
        )
    h = np.frombuffer(media, dtype=np.uint8)
    rng = np.random.RandomState(int(h[:4].view(np.uint32)[0]) if len(h) >= 4 else 0)
    return rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)


def image_features(
    df: DataFrame,
    media_col: str = "media",
    fake: bool = True,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """Per-image features via mapInPandas: mean/std channel intensity.
    The UDF body is batch-vectorized; decode is the stubbed step."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", mean_intensity double, std_intensity double"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, stds = [], []
            for blob in pdf[media_col]:
                img = decode_image(bytes(blob), fake=fake)
                means.append(float(img.mean()))
                stds.append(float(img.std()))
            pdf = pdf.copy()
            pdf["mean_intensity"] = means
            pdf["std_intensity"] = stds
            yield pdf

    return df.mapInPandas(op, schema=out_schema)


def decode_audio(media: bytes, fake: bool = False, n_samples: int = 1024) -> np.ndarray:
    """Decode binary -> float32 mono waveform in [-1, 1]. REAL decode
    requires soundfile/ffmpeg, absent in this container ->
    NotImplementedError. fake=True: deterministic hash-derived waveform."""
    if not fake:
        raise NotImplementedError(
            "audio decode requires soundfile/ffmpeg (not in this "
            "environment); pass fake=True for the deterministic test decoder"
        )
    h = np.frombuffer(media, dtype=np.uint8)
    rng = np.random.RandomState(int(h[:4].view(np.uint32)[0]) if len(h) >= 4 else 0)
    return (rng.rand(n_samples).astype(np.float32) * 2.0) - 1.0


def audio_features(
    df: DataFrame, media_col: str = "media", fake: bool = True
) -> DataFrame:
    """Per-clip audio features via mapInPandas: RMS level + zero-crossing
    rate over the decoded waveform. Vectorized numpy per batch; decode is
    the stubbed step."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", rms double, zero_crossing_rate double"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rms, zcr = [], []
            for blob in pdf[media_col]:
                w = decode_audio(bytes(blob), fake=fake)
                rms.append(float(np.sqrt(np.mean(w * w))))
                zcr.append(float(np.mean(np.signbit(w[1:]) != np.signbit(w[:-1]))))
            pdf = pdf.copy()
            pdf["rms"] = rms
            pdf["zero_crossing_rate"] = zcr
            yield pdf

    return df.mapInPandas(op, schema=out_schema)


def resize_image(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize — REAL (pure numpy index arithmetic, no
    image library): works on any decoded HxWxC array, fake or real."""
    h, w = img.shape[:2]
    rows = np.minimum((np.arange(target_h) * h) // target_h, h - 1)
    cols = np.minimum((np.arange(target_w) * w) // target_w, w - 1)
    return img[rows[:, None], cols[None, :]]


def image_resize(
    df: DataFrame,
    target_w: int,
    target_h: int,
    media_col: str = "media",
    fake: bool = True,
) -> DataFrame:
    """Batch image resize via mapInPandas: decode (stubbed) ->
    nearest-neighbor resize (real numpy) -> raw-RGB bytes out, with the
    width/height metadata updated to the target shape. The Spark-side
    plumbing — binary in/out, Arrow batching, metadata columns — is real
    and what a libjpeg-backed decoder would plug into."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name not in ("width", "height")
    ) + ", width int, height int, resized binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf[media_col]:
                img = decode_image(bytes(blob), fake=fake)
                out.append(resize_image(img, target_w, target_h).tobytes())
            pdf = pdf.drop(columns=[c for c in ("width", "height") if c in pdf])
            pdf["width"] = np.int32(target_w)
            pdf["height"] = np.int32(target_h)
            pdf["resized"] = out
            yield pdf

    return df.mapInPandas(op, schema=out_schema)


def frame_sample(
    df: DataFrame,
    every_k: int = 5,
    media_col: str = "media",
    n_frames_col: str = "n_frames",
    id_cols: tuple = ("doc_id",),
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index
    (0, k, 2k, ...). Pure JVM expressions — the 1->N expansion is
    ``explode(sequence(0, n_frames-1, every_k))`` and the frame payload is
    ``media || little_endian_int32(frame_idx)``; no Python anywhere.
    Frame payloads stay opaque (decode is the stubbed step)."""
    fi = F.col("frame_idx")
    le_bytes = F.unhex(
        F.format_string(
            "%02x%02x%02x%02x",
            fi.bitwiseAND(F.lit(255)),
            F.shiftright(fi, 8).bitwiseAND(F.lit(255)),
            F.shiftright(fi, 16).bitwiseAND(F.lit(255)),
            F.shiftright(fi, 24).bitwiseAND(F.lit(255)),
        )
    )
    return (
        df.select(
            *[F.col(c).cast("long").alias(c) for c in id_cols],
            F.col(media_col).alias("__media"),
            # n_frames = 0 must yield zero rows, not a sequence(0,-1) error:
            # explode drops the null array
            F.explode(
                F.when(
                    F.col(n_frames_col) >= 1,
                    F.sequence(
                        F.lit(0), F.col(n_frames_col) - 1, F.lit(int(every_k))
                    ),
                )
            ).alias("frame_idx"),
        )
        .select(
            *id_cols,
            fi.cast("int").alias("frame_idx"),
            F.concat(F.col("__media"), le_bytes).alias("frame"),
        )
    )
