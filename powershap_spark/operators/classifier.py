"""Distributed quality-classifier training: hashing-trick logistic
regression over a text column — the fasttext-style quality/language
filter a web-corpus pipeline trains on weak labels and then applies as a
gate (GPT-3/LLaMA-style "looks like reference text" filtering).

Spark-first shape, mirroring how Spark MLlib itself trains linear models
(per-partition gradient partials + tree reduction), re-expressed on the
DataFrame API with the same zero-per-epoch-Exchange design as the
selection engine (``engine.py``):

- **featurize once**: tokens -> ``pmod(xxhash64(token), dim)`` feature
  hashing (JVM-side, no vocabulary build, no driver state), one
  ``(doc, idx)`` count aggregation, one per-doc sparse-vector rollup —
  two shuffles TOTAL, paid once, then persisted POST-shuffle hash-
  partitioned by ``part_id`` with ``sortWithinPartitions``;
- **per epoch**: one ``groupBy(part_id).applyInPandas`` over the
  persisted partitioning (plan shows NO new Exchange — the groupBy's
  required distribution is already satisfied), emitting one
  ``dim+1``-sized float64 gradient partial per group; the driver sums
  the ``n_parts`` partials in part_id order and re-broadcasts the
  updated weights. Driver traffic per epoch is ``n_parts x (dim+1)``
  doubles — independent of corpus size, the same treeAggregate contract
  MLlib relies on at cluster scale;
- **inference is pure DataFrame ops**: exploded features broadcast-join
  the (dim+1)-row weight table, one per-doc sum, a sigmoid — no Python
  at scoring time, so the trained gate fuses into the curation pipeline
  like any other filter.

Determinism: gradient math inside the Arrow UDF is sequential
(``np.bincount`` over rows in sorted doc order within a part, partials
reduced in part_id order), so training is bit-reproducible at ANY
parallelism — pinned by a numpy-reference parity pytest
(``tests/test_classifier.py``), the same evidence contract as the BPE
and packing operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["featurize_hashed", "train_logreg", "score_logreg"]


def featurize_hashed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str | None = None,
    dim: int = 4096,
    n_parts: int = 8,
) -> DataFrame:
    """Per-doc sparse hashed-count vectors ``(id, part_id, idxs, vals
    [, label])``: lowercase whitespace tokens, ``pmod(xxhash64(tok),
    dim)`` buckets, term-frequency-normalized counts, indices ascending.
    Docs with zero tokens drop out (nothing to learn from, and empty
    rows would poison the reduceat/bincount offsets downstream), as do
    rows with a NULL label — an unlabeled row would otherwise NaN-poison
    the whole gradient (``partial_grad`` hard-fails on non-finite labels
    as a backstop). Tokenization is the module-shared ``text._tokens``
    (trim/lower/whitespace split) so features and any heuristic weak
    label derive from the SAME token stream."""
    from .text import _tokens

    if label_col:
        df = df.filter(F.col(label_col).isNotNull())
    tok = df.select(
        F.col(id_col).alias("__id"),
        *([F.col(label_col).cast("double").alias("__y")] if label_col else []),
        # _tokens keeps a leading '' for tab/newline-padded text (trim
        # strips spaces only) — filter so '' never becomes a feature
        F.explode(
            F.filter(_tokens(text_col), lambda t: F.length(t) > 0)
        ).alias("tok"),
    ).withColumn("idx", F.pmod(F.xxhash64("tok"), F.lit(dim)).cast("int"))
    counted = tok.groupBy(
        "__id", *(["__y"] if label_col else []), "idx"
    ).agg(F.count("*").alias("cnt"))
    doc = counted.groupBy("__id", *(["__y"] if label_col else [])).agg(
        F.sort_array(F.collect_list(F.struct("idx", "cnt"))).alias("pairs"),
        F.sum("cnt").alias("n_tok"),
    )
    out = doc.select(
        F.col("__id").alias(id_col),
        *([F.col("__y").alias("label")] if label_col else []),
        F.pmod(F.xxhash64(F.col("__id")), F.lit(n_parts))
        .cast("int")
        .alias("part_id"),
        F.transform("pairs", lambda p: p["idx"]).alias("idxs"),
        F.transform(
            "pairs", lambda p: p["cnt"].cast("double") / F.col("n_tok")
        ).alias("vals"),
    )
    return out


def _grad_schema(dim: int) -> T.StructType:
    return T.StructType(
        [
            T.StructField("part_id", T.IntegerType()),
            T.StructField("grad", T.ArrayType(T.DoubleType())),
            T.StructField("loss", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )


def partial_grad(
    pdf: pd.DataFrame, w: np.ndarray, dim: int, id_col: str = "doc_id"
) -> tuple[np.ndarray, float, int]:
    """One partition's (gradient partial, loss partial, row count) for
    logistic loss, sequential and order-pinned: rows sorted by id,
    features concatenated in that order, sums via bincount/np.sum. The
    numpy parity reference in tests calls THIS function on the collected
    rows — the distributed path and the reference share the math by
    construction, and the parity test pins that they also share the
    floating-point result bit-for-bit."""
    pdf = pdf.sort_values(id_col, kind="mergesort")
    lens = pdf["idxs"].map(len).to_numpy(np.int64)
    y = pdf["label"].to_numpy(np.float64)
    if not np.isfinite(y).all():
        raise ValueError(
            "partial_grad: non-finite label(s) — a NULL/NaN label would "
            "NaN-poison the whole gradient (featurize_hashed filters "
            "these; check the label expression)"
        )
    idx = (
        np.concatenate([np.asarray(a, np.int64) for a in pdf["idxs"]])
        if len(pdf)
        else np.empty(0, np.int64)
    )
    val = (
        np.concatenate([np.asarray(a, np.float64) for a in pdf["vals"]])
        if len(pdf)
        else np.empty(0, np.float64)
    )
    offsets = np.zeros(len(pdf), np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    contrib = w[idx] * val
    margins = np.add.reduceat(contrib, offsets) if len(pdf) else np.empty(0)
    margins = margins + w[dim]
    p = 1.0 / (1.0 + np.exp(-margins))
    resid = p - y
    grad = np.zeros(dim + 1, np.float64)
    grad[:dim] = np.bincount(
        idx, weights=np.repeat(resid, lens) * val, minlength=dim
    )
    grad[dim] = np.sum(resid)
    loss = float(np.sum(np.logaddexp(0.0, margins) - y * margins))
    return grad, loss, len(pdf)


def train_logreg(
    feat: DataFrame,
    dim: int,
    epochs: int = 10,
    lr: float = 1.0,
    l2: float = 0.0,
    n_parts: int = 8,
    id_col: str = "doc_id",
) -> tuple[np.ndarray, list[float]]:
    """Full-batch gradient descent; returns ``(weights[dim+1], per-epoch
    mean losses)`` — weights[dim] is the bias. The featurized frame is
    persisted post-shuffle partitioned by part_id, so every epoch's
    FlatMapGroupsInPandas reads the in-memory scan with no new Exchange;
    per-epoch driver traffic is n_parts x (dim+1) doubles."""
    spark = feat.sparkSession
    src = (
        feat.select(id_col, "label", "part_id", "idxs", "vals")
        .repartition(max(1, n_parts), "part_id")
        .sortWithinPartitions("part_id", id_col)
        .persist()
    )
    src.count()  # eager: pay the featurize shuffles once, before epoch 1
    w = np.zeros(dim + 1, np.float64)
    history: list[float] = []
    try:
        for _ in range(epochs):
            bw = spark.sparkContext.broadcast(w)

            def _make_fn(_bw):
                def fn(key, pdf):
                    g, loss, n = partial_grad(pdf, _bw.value, dim, id_col)
                    return pd.DataFrame(
                        {
                            "part_id": [int(key[0])],
                            "grad": [g.tolist()],
                            "loss": [loss],
                            "n": [n],
                        }
                    )

                return fn

            fn = _make_fn(bw)

            rows = (
                src.groupBy("part_id")
                .applyInPandas(fn, _grad_schema(dim))
                .collect()
            )
            rows.sort(key=lambda r: r.part_id)
            grad = np.zeros(dim + 1, np.float64)
            loss = 0.0
            n = 0
            for r in rows:  # fixed part_id order -> deterministic reduce
                grad += np.asarray(r.grad, np.float64)
                loss += r.loss
                n += r.n
            bw.unpersist()
            if n == 0:
                raise ValueError("train_logreg: empty featurized frame")
            grad /= n
            if l2:
                grad[:dim] += l2 * w[:dim]  # bias not regularized
            w = w - lr * grad
            history.append(loss / n)
    finally:
        src.unpersist()
    return w, history


def score_logreg(
    feat: DataFrame, w: np.ndarray, dim: int, id_col: str = "doc_id"
) -> DataFrame:
    """Sigmoid scores as PURE DataFrame ops: exploded features broadcast-
    join the (dim+1)-row weight table, per-doc dot-product sum, sigmoid.
    No Python at inference time — the trained gate composes into the
    curation pipeline like any built-in filter. Weight table rows are
    (idx, w); docs whose every feature has zero weight still score (the
    join is on the doc's own indices; bias always applies)."""
    spark = feat.sparkSession
    wt = spark.createDataFrame(
        [(int(i), float(x)) for i, x in enumerate(w[:dim]) if x != 0.0],
        "idx int, w double",
    )
    bias = float(w[dim])
    ex = feat.select(
        id_col,
        F.explode(F.arrays_zip("idxs", "vals")).alias("f"),
    ).select(id_col, F.col("f.idxs").alias("idx"), F.col("f.vals").alias("val"))
    dot = (
        ex.join(F.broadcast(wt), "idx", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("w"), F.lit(0.0)) * F.col("val")).alias(
                "margin"
            )
        )
    )
    return dot.select(
        id_col,
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("margin") + F.lit(bias)))))
        .alias("score"),
    )
