"""Robustness parity with the reference's NaN / Inf / categorical tests
(tests/test_catboost_powershap.py:44-113; the reference leans on catboost's
native missing-value and cat_features handling — the vendored kernel gets
the equivalent via train-mean imputation + per-block ordinal encoding)."""

import numpy as np
import pandas as pd
import pytest

from powershap_spark import synth
from powershap_spark.compat import PowerShap
from powershap_spark.kernel import impute_nonfinite


@pytest.fixture()
def clf_xy():
    return synth.parity_matrix(500, 10, task="classification")


def _informative_selected(selector, X):
    out = selector.transform(X)
    assert {"informative_0", "informative_1"} <= set(out.columns)
    assert not any(c.startswith("random") for c in out.columns)
    return out


def test_handle_nans(clf_xy):
    X, y = clf_xy
    X = X.copy()
    X.iloc[:5] = None
    X["nan_col"] = None
    assert np.any(pd.isna(X))
    sel = PowerShap(power_iterations=15, automatic=False).fit(X, y)
    out = _informative_selected(sel, X)
    assert "nan_col" not in out.columns


def test_handle_infs(clf_xy):
    X, y = clf_xy
    X = X.copy()
    X.iloc[:5] = np.inf
    X["inf_col"] = np.inf
    assert np.any(X.isin([np.inf, -np.inf]))
    sel = PowerShap(power_iterations=15, automatic=False).fit(X, y)
    out = _informative_selected(sel, X)
    assert "inf_col" not in out.columns


def test_handle_infs_nans(clf_xy):
    X, y = clf_xy
    X = X.copy()
    X.iloc[:5] = np.inf
    X.iloc[5:10] = None
    X["inf_col"] = np.inf
    X["nan_col"] = None
    sel = PowerShap(power_iterations=15, automatic=False).fit(X, y)
    _informative_selected(sel, X)


def test_handle_string_column(clf_xy):
    X, y = clf_xy
    X = X.copy()
    X["cat"] = pd.Series(
        np.where(np.arange(len(X)) % 3 == 0, "miauw", "woef"), index=X.index
    )
    sel = PowerShap(power_iterations=15, automatic=False).fit(X, y)
    out = _informative_selected(sel, X)
    assert "cat" not in out.columns


def test_handle_pandas_category_column(clf_xy):
    X, y = clf_xy
    X = X.copy()
    X["cat"] = pd.Series(
        np.where(np.arange(len(X)) % 2 == 0, "a", "b"), index=X.index
    ).astype("category")
    sel = PowerShap(power_iterations=15, automatic=False).fit(X, y)
    _informative_selected(sel, X)


def test_impute_nonfinite_train_means_only():
    Xt = np.array([[1.0, np.nan], [3.0, np.inf], [np.nan, 4.0]])
    Xv = np.array([[np.nan, np.nan]])
    it, iv = impute_nonfinite(Xt, Xv)
    assert it[2, 0] == 2.0  # mean of finite train col 0
    assert it[0, 1] == 4.0 and it[1, 1] == 4.0
    assert iv[0, 0] == 2.0 and iv[0, 1] == 4.0
    # all-non-finite column -> 0.0
    it2, iv2 = impute_nonfinite(np.array([[np.nan], [np.inf]]), np.array([[np.nan]]))
    assert (it2 == 0).all() and (iv2 == 0).all()


def test_text_pipeline_operators_on_empty_corpus(spark):
    """Every corpus-curation operator must handle a 0-row documents table
    (a filtered-out partition at scale) without crashing."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from powershap_spark.operators.dedup import (
        benchmark_contamination,
        exact_dedup,
        minhash_dedup,
    )
    from powershap_spark.operators.scrub import canonicalize_url, scrub_pii
    from powershap_spark.operators.text import (
        chunk_tokens,
        repetition_ratios,
        topk_ngrams,
    )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    empty = spark.createDataFrame([], schema=schema)

    assert exact_dedup(empty, "text", "doc_id").count() == 0
    assert minhash_dedup(empty, "text", "doc_id", num_hashes=8, bands=2).count() == 0
    assert scrub_pii(empty).count() == 0
    assert empty.select(canonicalize_url("text")).count() == 0
    assert chunk_tokens(empty, max_tokens=8).count() == 0
    assert topk_ngrams(empty, n=2, k=5).count() == 0
    r = repetition_ratios("text")
    assert empty.select(*[v.alias(k) for k, v in r.items()]).count() == 0
    assert benchmark_contamination(empty, empty).count() == 0
