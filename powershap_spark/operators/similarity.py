"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline — broadcast the (small)
  query set, JVM-side dot products via F.zip_with/F.aggregate, per-query
  top-k with a window over partial candidates;
- LSH-bucketed variant (random hyperplanes from seeded hashes): the scale
  path — candidates only within matching sign-bucket, turning the O(N*Q)
  scan into bucket-local work.

At 100 TB the pattern is: broadcast queries (they're small), scan the big
embedding table once, partial top-k per partition (groupBy query with
max_by-style aggregation), final top-k on the tiny union — never a global
sort of N*Q scores.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine_similarity_col", "brute_force_topk", "lsh_bucket", "lsh_topk"]


def cosine_similarity_col(a, b) -> "F.Column":
    """Cosine similarity between two array<numeric> columns, JVM-side."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. Queries are broadcast;
    the embedding table is scanned once. Returns
    (query_id, vec_id, cosine, rank)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qv")
    )
    scored = embeddings.select(
        F.col(id_col), F.col(vec_col).alias("__ev")
    ).crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col(id_col),
        cosine_similarity_col("__ev", "__qv").cast("double").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_bucket(
    vec_col, n_planes: int = 8, dim: int | None = None, seed: int = 5,
    hash_family: str = "xxhash",
) -> "F.Column":
    """Sign bucket from ``n_planes`` pseudo-random hyperplanes. Plane
    components are deterministic +-1: sign_p = sum_i(v_i * s_pi) > 0.
    Returns an int bucket in [0, 2^n_planes).

    The +-1 component trick keeps everything JVM-side (no literal random
    matrices shipped around) and is an unbiased random-projection family.
    hash_family="xxhash" derives s_pi from xxhash64(seed, plane, i);
    "poly" derives it from the parity of (a_p*(i+1)+b_p) % POLY_MOD — the
    engine-agnostic family the DuckDB oracle recomputes exactly."""
    from .dedup import POLY_MOD, affine_params

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    a_l, b_l = affine_params(n_planes, seed)
    bucket = F.lit(0)
    for p in range(n_planes):
        if hash_family == "xxhash":
            sign = lambda i: F.when(
                F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), F.lit(2)) == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
        else:
            a_p, b_p = a_l[p], b_l[p]
            sign = lambda i: F.when(
                F.pmod(
                    F.pmod(
                        F.lit(a_p).cast("long") * (i + 1) + F.lit(b_p).cast("long"),
                        F.lit(POLY_MOD),
                    ),
                    F.lit(2),
                )
                == 1,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
        proj = F.aggregate(
            F.zip_with(
                v,
                F.transform(F.sequence(F.lit(0), F.size(v) - 1), sign),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**p)).otherwise(0)
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 5,
    hash_family: str = "xxhash",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    Recall < 1 by design; rank/cosine computed exactly within the bucket."""
    e = embeddings.select(
        F.col(id_col),
        F.col(vec_col).alias("__ev"),
        lsh_bucket(vec_col, n_planes, seed=seed, hash_family=hash_family).alias("__bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qv"),
        lsh_bucket(query_vec_col, n_planes, seed=seed, hash_family=hash_family).alias("__bucket"),
    )
    scored = e.join(F.broadcast(q), "__bucket").select(
        "query_id",
        F.col(id_col),
        cosine_similarity_col("__ev", "__qv").cast("double").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
