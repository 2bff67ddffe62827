"""Hashing-trick logistic-regression quality classifier
(operators/classifier.py): bit-exact parity of the distributed trainer
against a numpy reference over the SAME partition grouping, learnability
on a separable corpus, pure-DataFrame inference parity, and the
zero-per-epoch-Exchange plan shape."""

import io
from contextlib import redirect_stdout

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from powershap_spark.operators.classifier import (
    featurize_hashed,
    partial_grad,
    score_logreg,
    train_logreg,
)

DIM = 256
N_PARTS = 4


def _corpus(spark, n=120):
    """Separable weak-label corpus: positive docs carry 'alpha'-family
    tokens, negatives 'beta'-family; both share noise tokens."""
    rows = []
    for i in range(n):
        y = i % 2
        fam = ["alpha", "quality", "prose"] if y else ["beta", "spam", "junk"]
        noise = [f"noise{(i * 7 + j) % 11}" for j in range(4)]
        rows.append((i, " ".join(fam * (1 + i % 3) + noise), y))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def _reference_train(feat_pdf, dim, epochs, lr, l2=0.0):
    """Driver-side reference: same partition grouping, same partial_grad
    math, partials reduced in part_id order — the exact contract the
    distributed trainer documents."""
    w = np.zeros(dim + 1, np.float64)
    hist = []
    for _ in range(epochs):
        grad = np.zeros(dim + 1, np.float64)
        loss, n = 0.0, 0
        for pid in sorted(feat_pdf["part_id"].unique()):
            g, lo, cnt = partial_grad(
                feat_pdf[feat_pdf["part_id"] == pid], w, dim
            )
            grad += g
            loss += lo
            n += cnt
        grad /= n
        if l2:
            grad[:dim] += l2 * w[:dim]
        w = w - lr * grad
        hist.append(loss / n)
    return w, hist


def test_train_bit_exact_vs_reference(spark):
    feat = featurize_hashed(
        _corpus(spark), label_col="label", dim=DIM, n_parts=N_PARTS
    )
    w, hist = train_logreg(feat, dim=DIM, epochs=3, lr=0.7, l2=0.01,
                           n_parts=N_PARTS)
    ref_w, ref_hist = _reference_train(
        feat.toPandas(), DIM, epochs=3, lr=0.7, l2=0.01
    )
    assert np.array_equal(w, ref_w)  # bit-for-bit, not allclose
    assert hist == ref_hist


def test_train_separates_and_jvm_scoring_matches_numpy(spark):
    feat = featurize_hashed(
        _corpus(spark), label_col="label", dim=DIM, n_parts=N_PARTS
    ).persist()
    w, hist = train_logreg(feat, dim=DIM, epochs=40, lr=5.0, n_parts=N_PARTS)
    assert hist[-1] < hist[0] / 3  # loss actually fell
    scored = (
        score_logreg(feat, w, dim=DIM)
        .join(feat.select("doc_id", "label"), "doc_id")
        .toPandas()
    )
    pos, neg = scored[scored.label == 1], scored[scored.label == 0]
    assert pos.score.min() > neg.score.max()  # fully separated

    # JVM broadcast-join inference == numpy dot on the same sparse rows
    fp = feat.toPandas().set_index("doc_id")
    for did, row in scored.set_index("doc_id").iterrows():
        m = float(
            np.dot(
                w[np.asarray(fp.loc[did, "idxs"], np.int64)],
                np.asarray(fp.loc[did, "vals"], np.float64),
            )
        ) + w[DIM]
        assert abs(row.score - 1.0 / (1.0 + np.exp(-m))) < 1e-9
    feat.unpersist()


def test_featurize_drops_empty_docs_and_tf_normalizes(spark):
    df = spark.createDataFrame(
        [(0, "a a b", 1), (1, "   ", 0), (2, "", 0)],
        "doc_id long, text string, label int",
    )
    fp = featurize_hashed(df, label_col="label", dim=DIM).toPandas()
    assert fp.doc_id.tolist() == [0]  # token-free docs drop out
    assert sorted(fp.iloc[0].vals) == [pytest.approx(1 / 3), pytest.approx(2 / 3)]
    assert list(fp.iloc[0].idxs) == sorted(fp.iloc[0].idxs)


def test_epoch_plan_reads_cache_with_no_new_exchange(spark):
    import re

    from powershap_spark.operators.classifier import _grad_schema

    feat = featurize_hashed(
        _corpus(spark, n=40), label_col="label", dim=DIM, n_parts=N_PARTS
    )
    src = (
        feat.select("doc_id", "label", "part_id", "idxs", "vals")
        .repartition(N_PARTS, "part_id")
        .sortWithinPartitions("part_id", "doc_id")
        .persist()
    )
    src.count()
    w = np.zeros(DIM + 1)

    def fn(key, pdf):
        g, lo, n = partial_grad(pdf, w, DIM)
        return pd.DataFrame(
            {"part_id": [int(key[0])], "grad": [g.tolist()],
             "loss": [lo], "n": [n]}
        )

    out = src.groupBy("part_id").applyInPandas(fn, _grad_schema(DIM))
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert len(re.findall(r"\(\d+\) FlatMapGroupsInPandas\b", p)) == 1
    # per-epoch segment = everything above the InMemory scan: the one
    # shuffle happened at persist time, never again per epoch
    epoch_seg = p.split("InMemoryTableScan", 1)[0]
    assert "Exchange" not in epoch_seg, p
    src.unpersist()
