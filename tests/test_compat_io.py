"""compat.PowerShap facade + TableIO parquet fallback."""

import numpy as np
import pytest

from powershap_spark.compat import PowerShap
from powershap_spark.sources.tableio import TableIO, iceberg_available
from powershap_spark.synth import parity_matrix


def test_compat_signature_defaults_match_reference():
    import inspect

    sig = inspect.signature(PowerShap.__init__)
    d = {k: v.default for k, v in sig.parameters.items() if v.default is not inspect.Parameter.empty}
    # reference powershap/powershap.py:23-42 signature defaults
    assert d["power_iterations"] == 10
    assert d["power_alpha"] == 0.01
    assert d["val_size"] == 0.2
    assert d["power_req_iterations"] == 0.99
    assert d["automatic"] is True
    assert d["limit_automatic"] == 10
    assert d["limit_incremental_iterations"] == 10
    assert d["limit_recursive_automatic"] == 3
    assert d["limit_convergence_its"] == 0
    assert d["force_convergence"] is False


def test_compat_fit_transform(clf_xy):
    X, y = clf_xy
    sel = PowerShap(automatic=True).fit(X, y)
    out = sel.transform(X)
    assert {"informative_0", "informative_1"} <= set(out.columns)


def test_compat_cv_not_supported():
    with pytest.raises(NotImplementedError):
        PowerShap(cv=object())


def test_tableio_parquet_roundtrip(spark, tmp_path):
    io = TableIO(spark, str(tmp_path))
    assert io.iceberg is False  # no iceberg jar in sandbox
    df = spark.range(100).withColumnRenamed("id", "x")
    io.write(df, "t1")
    assert io.read("t1").count() == 100
    io.append(df, "t1")
    assert io.read("t1").count() == 200


def test_iceberg_detection_without_catalog(spark):
    assert iceberg_available(spark) is False
