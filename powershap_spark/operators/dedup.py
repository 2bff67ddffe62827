"""Deduplication operators for large-scale training-data pipelines.

Exact dedup, MinHash+LSH near-dup, SimHash, and n-gram Jaccard — all as
DataFrame compositions (hashes via JVM-side xxhash64/crc32 over shingle
arrays; no Python in the hot path except none at all).

Scale notes:
- exact dedup = one hash-groupBy (map-side partial agg); never a
  window-over-everything;
- MinHash/LSH: k permutations approximated by k seeded xxhash64 functions
  (standard practice, e.g. Spark MLlib MinHashLSH); candidate generation is
  an equi-join on (band_id, band_hash) buckets — shuffle proportional to
  bucket sizes, never a cross join;
- SimHash: 64-bit fingerprint from token-hash bit voting; near-dup = equal
  fingerprint (or banded prefix) buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "exact_dedup",
    "shingles",
    "minhash_signature",
    "lsh_candidate_pairs",
    "minhash_dedup",
    "simhash",
    "ngram_jaccard_pairs",
]


def normalize_text(col) -> "F.Column":
    """Canonical form for dedup: lowercase, collapse whitespace, strip."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", keep: str = "min"
) -> DataFrame:
    """Keep one representative per exact (normalized) text: the min/max id.
    One hash-aggregation; no sort, no window."""
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    keep_ids = (
        df.select(id_col, normalize_text(text_col).alias("__norm"))
        .groupBy("__norm")
        .agg(agg.alias(id_col))
        .select(id_col)
    )
    return df.join(keep_ids, id_col, "left_semi")


def shingles(col, n: int = 3) -> "F.Column":
    """Word n-gram shingle array (distinct) from a text column."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(normalize_text(c), " ")
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))
    )


def minhash_signature(shingle_col, num_hashes: int = 32, seed: int = 7) -> "F.Column":
    """MinHash signature: for each of ``num_hashes`` seeded hash functions,
    the minimum xxhash64 over the shingle set. Returns array<bigint>.

    Single pass over the shingle array: one aggregate folding an
    array-of-mins accumulator (the naive per-hash array_min(transform(...))
    re-evaluates the shingle expression num_hashes times — measured ~20x
    slower at bench scale)."""
    c = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col
    init = F.array(*[F.lit(2**63 - 1).cast("long") for _ in range(num_hashes)])
    seeds = F.array(*[F.lit(seed + i) for i in range(num_hashes)])
    return F.aggregate(
        c,
        init,
        lambda acc, s: F.zip_with(acc, seeds, lambda m, sd: F.least(m, F.xxhash64(s, sd))),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 8,
    num_hashes: int | None = None,
) -> DataFrame:
    """Banding: split the signature into ``bands`` rows, bucket-join on
    (band_id, band_hash). Returns candidate pairs (id_a < id_b) with the
    fraction of matching minhashes (estimated Jaccard)."""
    if num_hashes is None:
        num_hashes = int(df.select(F.size(sig_col).alias("n")).limit(1).collect()[0]["n"])
    rows_per_band = max(1, num_hashes // bands)

    banded = df.select(
        F.col(id_col).alias("__id"),
        F.col(sig_col).alias("__sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            F.slice(F.col(sig_col), b * rows_per_band + 1, rows_per_band)
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("__id", "__sig", "band.band_id", "band.band_hash")

    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sig").alias("sig_a"),
            F.col("b.__sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.size("sig_a")
    )
    return pairs.select("id_a", "id_b", est.cast("double").alias("est_jaccard"))


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-dup removal: LSH candidates -> estimated-Jaccard filter ->
    drop the higher id of each surviving pair (greedy, transitive via
    keeping only ids that are never a 'b' side)."""
    # cache the signatures: the LSH self-join reads them from both sides and
    # recomputing the shingle+hash expression tree twice dominates runtime
    sigs = df.select(
        F.col(id_col),
        minhash_signature(shingles(text_col, shingle_n), num_hashes).alias("minhash"),
    ).cache()
    dupes = (
        lsh_candidate_pairs(
            sigs, id_col=id_col, sig_col="minhash", bands=bands, num_hashes=num_hashes
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(dupes, id_col, "left_anti")


def simhash(col, bits: int = 64, seed: int = 11) -> "F.Column":
    """64-bit SimHash of the token set: per bit, sign of the sum over tokens
    of (+1 / -1) from that token's hash bit. Pure array expressions."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(F.split(normalize_text(c), " "))
    hashes = F.transform(toks, lambda t: F.xxhash64(t, F.lit(seed)))
    bit_votes = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        for i in range(bits)
    ]
    out = F.lit(0).cast("long")
    for i, v in enumerate(bit_votes):
        out = out + F.when(v > 0, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63))).otherwise(0)
    return out


def ngram_jaccard_pairs(
    df_a: DataFrame,
    df_b: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_jaccard: float = 0.0,
    join_on=None,
) -> DataFrame:
    """Exact n-gram Jaccard between pairs. Pairs come from ``join_on`` bucket
    columns (e.g. lang/source) — NEVER an unbucketed cross join at scale."""
    df_b = df_b or df_a
    a = df_a.select(
        F.col(id_col).alias("id_a"), shingles(text_col, n).alias("sh_a"), *(join_on or [])
    )
    b = df_b.select(
        F.col(id_col).alias("id_b"), shingles(text_col, n).alias("sh_b"), *(join_on or [])
    )
    joined = (
        a.join(b, on=join_on, how="inner") if join_on else a.crossJoin(b)
    ).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return joined.select(
        "id_a", "id_b", jac.cast("double").alias("jaccard")
    ).filter(F.col("jaccard") >= min_jaccard)
