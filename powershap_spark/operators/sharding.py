"""Global prefix-sum and token-budget sharding — writing BALANCED training
shards from a deduplicated corpus.

The naive Spark spelling of a corpus-wide running sum,
``Window.orderBy(order)`` with no ``partitionBy``, plans an
``Exchange SinglePartition``: every row moves to ONE task and the job is
sequential no matter how many executors exist — the canonical
does-not-survive-100x plan. ``global_running_sum`` computes the identical
values with the classic two-phase scan:

  1. range-bucket rows on the order key (boundary estimation only — the
     RESULT is boundary-independent, so approxQuantile's sampling noise
     cannot change a single output value);
  2. an in-bucket window cumsum (parallel across buckets);
  3. per-bucket totals -> driver (n_buckets scalars, the same
     scalar-sized-action discipline as salted.py) -> exclusive offsets
     folded back in as a literal CASE.

``token_budget_shards`` is the consumer: shard_id = exclusive-cumsum DIV
budget over deterministic id order, so each training shard holds a
contiguous id range with token mass ~= the budget (a document straddling a
boundary stays in the shard where it starts — shards never split a
document). Pure functions of the data: rerunning on any partitioning or
cluster size reproduces the same shard assignment bit-for-bit, which is
what makes shard manifests resumable/diffable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "global_running_sum",
    "token_budget_shards",
    "pack_sequences",
    "pack_contiguous",
    "deterministic_shuffle_shards",
]


def deterministic_shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 7,
    hash_family: str = "xxhash",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Reproducible global training-order shuffle: assign every row a
    ``(shard, pos)`` pair that is a pure function of ``(key, seed,
    n_shards)`` — the shuffled epoch order a data loader consumes (read
    shards in index order, rows by pos), identical across reruns,
    partitionings, and cluster sizes, unlike ``df.orderBy(rand())``
    (layout-dependent RNG) or ``rand()``-keyed sorts (not resumable).

    shard = pmod(hash(key, seed), n_shards); pos = row_number over a
    window PARTITIONED BY shard ordered by (hash, key) — parallel across
    shards, never an ``Exchange SinglePartition`` funnel (the global sort
    a naive ``orderBy(hash)`` + row_number would plan). One shuffle on
    the shard key. Changing the seed is a new epoch permutation; the key
    tie-break makes duplicate hash values deterministic.

    SIZE ``n_shards`` FOR THE DATA: each shard is sorted in one task, so
    shard count is the parallelism bound AND the per-task memory bound —
    pick ``n_shards ~ corpus_rows / target_shard_rows`` (training shards
    are loader-consumable units of 10^5-10^7 rows, so a 10^12-row corpus
    wants 10^5+ shards, not 8; 8 is sf0.01 scale). ``pos`` is emitted as
    BIGINT so even a mis-sized giant shard cannot overflow the position.

    hash_family="xxhash" is the scale path; "poly" uses the affine
    polynomial char-hash family so the DuckDB oracle reproduces the
    exact permutation (key stringified for the char hash)."""
    from .dedup import POLY_MOD, _poly_char_hash, affine_params

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    for c in (shard_col, pos_col, "__h"):
        if c in df.columns:
            raise ValueError(
                f"output column {c!r} already exists in the input frame"
            )
    k = F.col(key_col)
    if hash_family == "xxhash":
        h: Column = F.xxhash64(k, F.lit(seed))
    elif hash_family == "poly":
        a_l, b_l = affine_params(1, seed)
        h = F.pmod(
            a_l[0] * _poly_char_hash(k.cast("string")) + b_l[0],
            F.lit(POLY_MOD),
        )
    else:
        raise ValueError(f"unknown hash_family {hash_family!r}")
    w = Window.partitionBy(shard_col).orderBy(F.col("__h"), k)
    return (
        df.withColumn("__h", h)
        .withColumn(shard_col, F.pmod(F.col("__h"), F.lit(n_shards)).cast("int"))
        .withColumn(pos_col, F.row_number().over(w).cast("long"))
        .drop("__h")
    )


def global_running_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    out_col: str = "running_sum",
    inclusive: bool = True,
    n_buckets: int | None = None,
) -> DataFrame:
    """Corpus-wide running sum of ``value_col`` over total ``order_col``
    order WITHOUT an Exchange SinglePartition (plan-asserted in
    test_sharding.py). ``order_col`` must be numeric, non-null, and unique
    (a total order — ties would make "running" ill-defined); values are
    summed as longs. ``inclusive=False`` gives the exclusive prefix sum
    (0 for the first row).

    Triggers two scalar-sized driver actions (boundary estimation +
    n_buckets bucket totals); at 10^12 rows both remain O(n_buckets).
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    n_buckets = max(1, int(n_buckets))

    if n_buckets > 1:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        boundaries = sorted(set(df.stat.approxQuantile(order_col, qs, 0.001)))
    else:
        boundaries = []
    # bucket = #boundaries strictly below the key: contiguous ranges in
    # order-key order, so bucket-major + in-bucket order == global order
    bkt: Column = F.lit(0)
    for b in boundaries:
        bkt = bkt + F.when(F.col(order_col) > F.lit(b), 1).otherwise(0)
    with_bkt = df.withColumn("__bkt", bkt)

    w = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    )
    local = with_bkt.withColumn(
        out_col,
        F.coalesce(F.sum(F.col(value_col).cast("long")).over(w), F.lit(0).cast("long")),
    )

    totals = {
        r["__bkt"]: r["t"]
        for r in with_bkt.groupBy("__bkt")
        .agg(F.sum(F.col(value_col).cast("long")).alias("t"))
        .collect()
    }
    offset, offsets = 0, {}
    for k in sorted(totals):
        offsets[k] = offset
        offset += int(totals[k] or 0)
    off: Column = F.lit(0).cast("long")
    for k, v in offsets.items():
        if v:
            off = F.when(F.col("__bkt") == k, F.lit(v).cast("long")).otherwise(off)
    return local.withColumn(out_col, F.col(out_col) + off).drop("__bkt")


def token_budget_shards(
    docs: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Assign each document to a training shard of ~``budget_tokens``
    whitespace tokens, contiguous in ``id_col`` order:
    ``shard_id = (exclusive token cumsum) DIV budget``. Returns
    ``(id_col, n_tokens, shard_id)``. Pass ``token_count_col`` to shard on
    a precomputed count (e.g. a real tokenizer's) instead of the built-in
    whitespace count."""
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    if token_count_col is None:
        from .text import token_count

        toks = docs.select(
            F.col(id_col), token_count(text_col).alias("n_tokens")
        )
    else:
        toks = docs.select(
            F.col(id_col), F.col(token_count_col).cast("long").alias("n_tokens")
        )
    cum = global_running_sum(
        toks, "n_tokens", id_col, out_col="__cum_excl",
        inclusive=False, n_buckets=n_buckets,
    )
    return cum.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.expr(f"__cum_excl div {int(budget_tokens)}").alias("shard_id"),
    )


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    shard_budget_factor: int = 64,
    n_buckets: int | None = None,
) -> DataFrame:
    """Sample packing for LLM training: group documents into bins of at
    most ``max_tokens`` whitespace tokens with first-fit-decreasing, the
    classic packing heuristic (<= 11/9 OPT + 1 bins). A document longer
    than ``max_tokens`` gets its own bin with ``overflow=true`` (the
    trainer's chunker deals with it; packing never splits a document).

    Distributed shape: FFD is inherently sequential, so it runs INSIDE
    token-budget shards — ``token_budget_shards`` (two-phase global
    prefix-sum, no Exchange SinglePartition) first cuts the corpus into
    contiguous-in-id groups of ``shard_budget_factor * max_tokens`` tokens,
    then one ``applyInPandas`` packs each shard independently (numpy FFD
    over <= ~factor docs-worth of tokens per group; group size is bounded
    by the shard budget, not the corpus). Packing quality loss vs a global
    FFD is at most one underfull bin per shard — <= 1/factor of bins,
    driven to noise by the factor.

    Determinism: shard cuts are a pure function of (id, token count) and
    the in-shard FFD order is (n_tokens desc, id asc), so the full
    assignment is bit-identical across partitionings/cluster sizes
    (pytest-asserted). Returns ``(id, n_tokens, shard_id, bin_id,
    overflow)`` with ``bin_id`` unique within a shard.
    """
    import pandas as pd

    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    sharded = token_budget_shards(
        docs,
        budget_tokens=int(shard_budget_factor) * int(max_tokens),
        text_col=text_col,
        id_col=id_col,
        token_count_col=token_count_col,
        n_buckets=n_buckets,
    )

    cap = int(max_tokens)

    def _ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        room: list[int] = []  # remaining capacity per open bin
        bin_of = [0] * len(pdf)
        overflow = [False] * len(pdf)
        for i, n in enumerate(pdf["n_tokens"].astype(int)):
            if n > cap:
                bin_of[i] = len(room)
                room.append(0)  # full: nothing else joins an overflow bin
                overflow[i] = True
                continue
            for b, r in enumerate(room):  # first fit
                if r >= n:
                    bin_of[i] = b
                    room[b] = r - n
                    break
            else:
                bin_of[i] = len(room)
                room.append(cap - n)
        pdf["bin_id"] = pd.array(bin_of, dtype="int64")
        pdf["overflow"] = pd.array(overflow, dtype="boolean")
        return pdf

    out_schema = (
        f"{id_col} long, n_tokens long, shard_id long, bin_id long, overflow boolean"
    )
    return sharded.groupBy("shard_id").applyInPandas(_ffd, schema=out_schema)


def pack_contiguous(
    df: DataFrame,
    block_tokens: int,
    order_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
) -> DataFrame:
    """GPT-style contiguous sample packing: conceptually concatenate every
    document's token stream in total ``order_col`` order and cut the
    stream into EXACT ``block_tokens``-token blocks, crossing document
    boundaries — the packing pretraining loaders actually use (no
    padding, no underfull bins), complementary to ``pack_sequences``'
    whole-document FFD (which never splits a doc). Emits one row per
    (block, document) SPAN: ``(block_id, order_col, tok_from, tok_to,
    n_span)`` with ``tok_from``/``tok_to`` the doc-local token range
    [from, to) landing in that block — the loader's slice instructions.
    Every block except the last is exactly full; empty documents emit
    nothing.

    Scale shape: the only corpus-wide coordination is the EXCLUSIVE
    prefix sum of token counts, computed with ``global_running_sum``'s
    two-phase range-bucketed scan (never an Exchange SinglePartition —
    same plan contract, inherited assertion). Everything after is a pure
    projection: a doc spanning blocks b0..b1 explodes over
    ``sequence(b0, b1)`` (ceil(n/block_tokens)+1 rows max per doc) with
    the span arithmetic as column expressions. Determinism: block
    assignment is a pure function of (order key, token counts), so
    reruns and repartitionings emit identical packs."""
    if block_tokens < 1:
        raise ValueError(f"block_tokens must be >= 1, got {block_tokens}")
    reserved = {"block_id", "tok_from", "tok_to", "n_span", "__start", "__n"}
    if order_col in reserved:
        raise ValueError(
            f"order_col {order_col!r} collides with an output/internal column"
        )
    from .text import token_count

    L = int(block_tokens)
    # filter empty docs BEFORE the prefix sum: zero-token rows cannot
    # change an exclusive prefix sum for the surviving rows, and dropping
    # them first keeps them out of the boundary estimation + window sort
    toks = df.select(
        F.col(order_col), token_count(F.col(text_col)).alias("__n")
    ).filter(F.col("__n") > 0)
    nonempty = global_running_sum(
        toks, "__n", order_col, out_col="__start", inclusive=False,
        n_buckets=n_buckets,
    )
    b0 = F.floor(F.col("__start") / L).cast("long")
    b1 = F.floor((F.col("__start") + F.col("__n") - 1) / L).cast("long")
    blk = F.col("block_id")
    tok_from = F.greatest(blk * L - F.col("__start"), F.lit(0)).cast("long")
    tok_to = F.least(
        (blk + 1) * L - F.col("__start"), F.col("__n").cast("long")
    ).cast("long")
    return (
        nonempty.select(
            F.col(order_col),
            "__start",
            "__n",
            F.explode(F.sequence(b0, b1)).alias("block_id"),
        )
        .select(
            "block_id",
            F.col(order_col),
            tok_from.alias("tok_from"),
            tok_to.alias("tok_to"),
            (tok_to - tok_from).alias("n_span"),
        )
    )
