"""Driver contract: entry() smoke + a DuckDB oracle spot-check of three
representative queries at sf0.001 (full battery runs via
tools/check_oracles.py)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as em
from tests.conftest import SF_DIR

SPOT = ["asof_join_events", "rolling_strict_past", "fingerprint_documents"]


def test_entry_returns_rows(spark):
    df = em.entry(spark)
    assert df.count() > 0
    assert "label" in df.columns


def test_queries_and_oracles_aligned():
    qs, os = em.queries(), em.oracle_sql()
    assert set(os) <= set(qs)
    assert len(qs) >= 20


@pytest.mark.parametrize("name", SPOT)
def test_oracle_spot(spark, name):
    con = duckdb.connect()
    for t in ["events", "documents", "embeddings", "lineitem"]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    sdf = em.queries()[name](spark, SF_DIR).toPandas()
    odf = con.sql(em.oracle_sql()[name]).df()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)

    def norm(p):
        p = p[sorted(p.columns)].copy()
        for c in p.columns:
            if "datetime" in str(p[c].dtype):
                p[c] = pd.to_datetime(p[c]).astype("datetime64[ns]").astype("int64")
            elif p[c].dtype.kind == "f":
                p[c] = p[c].round(6)
        return p.sort_values(list(p.columns), na_position="first").reset_index(drop=True)

    a, b = norm(sdf), norm(odf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_selection_iterations_fixture_is_deterministic(spark):
    """The powershap_selection value oracle hinges on the live engine
    regenerating tests/fixtures/selection_iterations.parquet bit-for-bit
    (deterministic probe seeds, sklearn-exact splits, vendored numpy
    models). Regenerate and compare values exactly — if this drifts, rerun
    tools/make_fixtures.py and investigate what changed in the kernel."""
    import os

    import numpy as np

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "selection_iterations.parquet")
    committed = pd.read_parquet(fix)
    live = (
        em._selection_iterations(spark)
        .orderBy("iteration", "part_id", "feature")
        .toPandas()
    )
    assert list(live.columns) == list(committed.columns)
    assert len(live) == len(committed)
    for c in ("iteration", "part_id", "feature", "n_val_rows"):
        assert (live[c].values == committed[c].values).all(), c
    # bit-exact float32 partials — the model-fit outputs themselves
    assert (
        live["mean_abs_shap"].values.view("uint32")
        == committed["mean_abs_shap"].values.view("uint32")
    ).all()


@pytest.mark.parametrize(
    "name",
    [
        "image_features_fake",
        "image_resize_fake",
        "audio_features_fake",
        "image_features_real",
        "audio_features_real",
    ],
)
def test_multimodal_expected_fixtures_are_deterministic(spark, name):
    """The fake-decoder multimodal oracles read committed expected-output
    fixtures; pin that the live mapInPandas run over media_small.parquet
    still reproduces them exactly (if the fake decoder or resize math
    changes, regenerate via tools/make_fixtures.py)."""
    import os

    fix = os.path.join(
        os.path.dirname(__file__),
        "fixtures",
        name.replace("_fake", "") + "_expected.parquet",
    )
    if name.endswith("_real"):
        fix = os.path.join(
            os.path.dirname(__file__), "fixtures", name + "_expected.parquet"
        )
    committed = pd.read_parquet(fix)
    live = em.queries()[name](spark, None).orderBy("doc_id").toPandas()
    assert list(live.columns) == list(committed.columns)
    pd.testing.assert_frame_equal(
        live.reset_index(drop=True), committed.reset_index(drop=True)
    )


@pytest.mark.parametrize(
    "name,fname,order",
    [
        ("bpe_merges_documents", "bpe_merges_expected.parquet", ["merge_idx"]),
        (
            "quality_classifier_documents",
            "quality_clf_expected.parquet",
            ["doc_id"],
        ),
        ("pack_sequences_documents", "pack_sequences_expected.parquet", ["doc_id"]),
    ],
)
def test_pipeline_expected_fixtures_are_deterministic(spark, name, fname, order):
    """The three non-SQL-expressible pipeline queries (BPE induction,
    classifier train+score, FFD packing) carry fixture-backed value
    oracles: the live run over the fixed deterministic synth input must
    reproduce the committed expected output exactly (if the operator or
    the synth generator changes, regenerate via tools/make_fixtures.py)."""
    import os

    fix = os.path.join(os.path.dirname(__file__), "fixtures", fname)
    committed = pd.read_parquet(fix)
    live = em.queries()[name](spark, None).orderBy(*order).toPandas()
    assert list(live.columns) == list(committed.columns)
    pd.testing.assert_frame_equal(
        live.reset_index(drop=True), committed.reset_index(drop=True)
    )


def test_stumps_selection_fixture_is_deterministic():
    """The stumps_selection value oracle hinges on the numpy boosting run
    reproducing the committed fixture exactly."""
    import os

    fix = os.path.join(
        os.path.dirname(__file__), "fixtures", "stumps_selection_expected.parquet"
    )
    committed = pd.read_parquet(fix)
    live = em._stumps_selection_pdf()
    pd.testing.assert_frame_equal(
        live.reset_index(drop=True), committed.reset_index(drop=True)
    )


def test_matrix_dtype_float64_restores_prefloat32_partials(spark, tmp_path):
    """matrix_dtype="float64" is documented to restore the pre-r5 (float64
    fit matrix) numerics exactly. Pin that promise: the flagship selection
    run with matrix_dtype="float64" must reproduce the ARCHIVED round-4
    fixture (tests/fixtures/selection_iterations_f64.parquet, extracted
    from git at the commit before the float32 switch) bit-for-bit. If this
    drifts, the restore path no longer restores — that is a bug, not a
    fixture-regeneration event."""
    import glob
    import os

    from powershap_spark import synth
    from powershap_spark.pipeline import select_features

    ck = str(tmp_path / "f64_ck")
    t = synth.transcripts(spark, n_conv=300, mean_turns=15)
    p = synth.probes(spark, t, probe_frac=0.3)
    select_features(
        t,
        p,
        power_iterations=5,
        n_parts=2,
        part_by="conv_id",
        checkpoint_dir=ck,
        run_id="oracle",
        matrix_dtype="float64",
    )
    files = sorted(glob.glob(os.path.join(ck, "oracle", "iter=main.*.parquet")))
    assert files, "selection checkpoints missing"
    live = (
        spark.read.parquet(*files)
        .select("iteration", "part_id", "feature", "mean_abs_shap", "n_val_rows")
        .orderBy("iteration", "part_id", "feature")
        .toPandas()
    )
    fix = os.path.join(
        os.path.dirname(__file__), "fixtures", "selection_iterations_f64.parquet"
    )
    committed = pd.read_parquet(fix)
    assert list(live.columns) == list(committed.columns)
    assert len(live) == len(committed)
    for c in ("iteration", "part_id", "feature", "n_val_rows"):
        assert (live[c].values == committed[c].values).all(), c
    assert (
        live["mean_abs_shap"].values.view("uint32")
        == committed["mean_abs_shap"].values.view("uint32")
    ).all()
