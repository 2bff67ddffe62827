"""Regenerate the committed parity fixtures under tests/fixtures/.

The transcript fixture is the deterministic synth table (synth.py is a pure
function of (seed, conv_id, turn_idx)) materialized ONCE as single-file
parquet so that BOTH engines of the correctness gate can read it: the Spark
side of ``q_transcript_features`` and the DuckDB oracle (`read_parquet`).
Committing the parquet removes any run-order dependence between the driver's
query pass and oracle pass. ``tests/test_synth.py`` asserts the generator
still reproduces the committed bytes' rows exactly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
TRANSCRIPTS = os.path.abspath(os.path.join(FIXTURE_DIR, "transcripts_small.parquet"))
PROBES = os.path.abspath(os.path.join(FIXTURE_DIR, "probes_small.parquet"))
MEDIA = os.path.abspath(os.path.join(FIXTURE_DIR, "media_small.parquet"))
SELECTION = os.path.abspath(
    os.path.join(FIXTURE_DIR, "selection_iterations.parquet")
)

N_CONV, MEAN_TURNS, PROBE_FRAC = 60, 15, 0.25
N_MEDIA = 100


def _naive(pdf):
    for c in pdf.columns:
        if getattr(pdf[c].dtype, "tz", None) is not None:
            pdf[c] = pdf[c].dt.tz_localize(None)
    return pdf


def main():
    from powershap_spark import synth
    from powershap_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    t = synth.transcripts(spark, n_conv=N_CONV, mean_turns=MEAN_TURNS)
    p = synth.probes(spark, t, probe_frac=PROBE_FRAC)
    tp = _naive(t.orderBy("conv_id", "turn_idx").toPandas())
    pp = _naive(p.orderBy("conv_id", "ts", "label").toPandas())
    os.makedirs(os.path.dirname(TRANSCRIPTS), exist_ok=True)
    # Spark cannot read TIMESTAMP(NANOS) parquet; all synth ts are integral
    # seconds so coercing to micros is lossless.
    kw = dict(coerce_timestamps="us", allow_truncated_timestamps=True)
    pq.write_table(pa.Table.from_pandas(tp, preserve_index=False), TRANSCRIPTS, **kw)
    pq.write_table(pa.Table.from_pandas(pp, preserve_index=False), PROBES, **kw)

    # fake-media table: xxhash64-derived opaque blobs + typed metadata; the
    # frame_sample oracle reads this committed copy because DuckDB cannot
    # recompute Spark's xxhash64
    from powershap_spark.operators.multimodal import attach_fake_media

    media = attach_fake_media(
        spark.range(N_MEDIA).withColumnRenamed("id", "doc_id"), "doc_id"
    )
    mp = media.orderBy("doc_id").toPandas()
    pq.write_table(pa.Table.from_pandas(mp, preserve_index=False), MEDIA, **kw)

    # the flagship selection loop's LONG iterations table (per-partition
    # checkpointed partials): the DuckDB side of the powershap_selection
    # value oracle reads this committed copy; the live Spark query
    # regenerates the identical table (deterministic seeds, vendored numpy
    # models) and aggregates it distributively. Pinned by tests/test_entry.py
    import __spark_entry__ as entry

    sp = (
        entry._selection_iterations(spark)
        .orderBy("iteration", "part_id", "feature")
        .toPandas()
    )
    pq.write_table(pa.Table.from_pandas(sp, preserve_index=False), SELECTION, **kw)

    # expected-output fixtures for the fake-decoder multimodal queries: the
    # numpy RandomState decode is deterministic but not SQL-expressible, so
    # the DuckDB side of those oracles reads these committed copies while
    # the live Spark query recomputes them from media_small.parquet
    for name in ("image_features_fake", "image_resize_fake", "audio_features_fake"):
        out = entry.queries()[name](spark, None).orderBy("doc_id").toPandas()
        path = os.path.abspath(
            os.path.join(FIXTURE_DIR, name.replace("_fake", "") + "_expected.parquet")
        )
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False), path, **kw)
        print(f"wrote {path} ({len(out)} rows)")

    # expected-output fixtures for the three non-SQL-expressible pipeline
    # queries (iterative BPE argmax / gradient-descent loop / first-fit-
    # decreasing): each runs live over a FIXED deterministic synth input,
    # so the committed expected output is the DuckDB side of a full value
    # oracle (the powershap_selection pattern). Pinned by tests/test_entry.py
    for qname, fname, order in (
        ("bpe_merges_documents", "bpe_merges_expected.parquet", ["merge_idx"]),
        ("quality_classifier_documents", "quality_clf_expected.parquet", ["doc_id"]),
        ("pack_sequences_documents", "pack_sequences_expected.parquet", ["doc_id"]),
    ):
        out = entry.queries()[qname](spark, None).orderBy(*order).toPandas()
        path = os.path.abspath(os.path.join(FIXTURE_DIR, fname))
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False), path, **kw)
        print(f"wrote {path} ({len(out)} rows)")

    # real-PNG media fixture + expected features (stdlib decoder path)
    import numpy as np

    from powershap_spark.operators.multimodal import encode_png

    png_rows = []
    for i in range(50):
        prng = np.random.RandomState(1000 + i)
        h, w = 8 + i % 5, 6 + i % 7
        img = prng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        png_rows.append(
            {"doc_id": np.int64(i), "media": encode_png(img),
             "width": np.int32(w), "height": np.int32(h)}
        )
    import pandas as pd

    png_pdf = pd.DataFrame(png_rows)
    pq.write_table(
        pa.Table.from_pandas(png_pdf, preserve_index=False),
        os.path.abspath(os.path.join(FIXTURE_DIR, "media_png_small.parquet")),
    )
    out = entry.queries()["image_features_real"](spark, None).orderBy("doc_id").toPandas()
    pq.write_table(
        pa.Table.from_pandas(out, preserve_index=False),
        os.path.abspath(
            os.path.join(FIXTURE_DIR, "image_features_real_expected.parquet")
        ),
    )
    print(f"wrote media_png_small + image_features_real_expected ({len(out)} rows)")

    # real-WAV media fixture + expected features (stdlib wave decoder path)
    from powershap_spark.operators.multimodal import encode_wav

    wav_rows = []
    for i in range(40):
        wrng = np.random.RandomState(2000 + i)
        n = 800 + 40 * (i % 9)
        tgrid = np.arange(n) / 16000.0
        freq = 50.0 + 25.0 * (i % 11)
        amp = 0.1 + 0.8 * wrng.rand()
        wave = amp * np.sin(2 * np.pi * freq * tgrid) + 0.05 * wrng.randn(n)
        wav_rows.append({"doc_id": np.int64(i), "media": encode_wav(wave)})
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(wav_rows), preserve_index=False),
        os.path.abspath(os.path.join(FIXTURE_DIR, "media_wav_small.parquet")),
    )
    out = entry.queries()["audio_features_real"](spark, None).orderBy("doc_id").toPandas()
    pq.write_table(
        pa.Table.from_pandas(out, preserve_index=False),
        os.path.abspath(
            os.path.join(FIXTURE_DIR, "audio_features_real_expected.parquet")
        ),
    )
    print(f"wrote media_wav_small + audio_features_real_expected ({len(out)} rows)")

    # distributed stumps-kernel iterations table: the stumps_selection_spark
    # oracle recomputes impact/p-value from this committed copy while the
    # live query regenerates the identical table through the applyInPandas
    # grid (bit-stability of the nonlinear kernel under partitioning)
    sp_st = (
        entry._stumps_selection_iterations(spark)
        .orderBy("iteration", "part_id", "feature")
        .toPandas()
    )
    path = os.path.abspath(os.path.join(FIXTURE_DIR, "stumps_iterations.parquet"))
    pq.write_table(pa.Table.from_pandas(sp_st, preserve_index=False), path, **kw)
    print(f"wrote {path} ({len(sp_st)} rows)")

    # nonlinear (stumps) selection expected output — numpy-deterministic
    sp2 = entry._stumps_selection_pdf()
    path = os.path.abspath(
        os.path.join(FIXTURE_DIR, "stumps_selection_expected.parquet")
    )
    pq.write_table(pa.Table.from_pandas(sp2, preserve_index=False), path, **kw)
    print(f"wrote {path} ({len(sp2)} rows)")

    print(
        f"wrote {TRANSCRIPTS} ({len(tp)} rows), {PROBES} ({len(pp)} rows), "
        f"{MEDIA} ({len(mp)} rows), {SELECTION} ({len(sp)} rows)"
    )


if __name__ == "__main__":
    main()
