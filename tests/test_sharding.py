"""Global prefix-sum + token-budget sharding (operators/sharding.py) and
the stratified-sampling / transition-mining operators added with them."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from powershap_spark.operators.sharding import (
    global_running_sum,
    token_budget_shards,
)


@pytest.fixture(scope="module")
def vals(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "k": rng.permutation(np.arange(997, dtype=np.int64)),
            "v": rng.integers(0, 50, 997).astype(np.int64),
        }
    )
    return spark.createDataFrame(pdf).repartition(7), pdf


@pytest.mark.parametrize("n_buckets", [1, 4, 32])
def test_global_running_sum_matches_pandas_any_bucketing(spark, vals, n_buckets):
    """Values are exact and bucket-count-independent (the boundary
    estimation can only move rows between buckets, never change a sum)."""
    df, pdf = vals
    expect = pdf.sort_values("k").assign(
        inc=lambda d: d.v.cumsum(),
        exc=lambda d: d.v.cumsum() - d.v,
    )
    inc = (
        global_running_sum(df, "v", "k", out_col="s", n_buckets=n_buckets)
        .toPandas()
        .sort_values("k")
    )
    assert (inc.s.to_numpy() == expect.inc.to_numpy()).all()
    exc = (
        global_running_sum(
            df, "v", "k", out_col="s", inclusive=False, n_buckets=n_buckets
        )
        .toPandas()
        .sort_values("k")
    )
    assert (exc.s.to_numpy() == expect.exc.to_numpy()).all()


def test_global_running_sum_no_single_partition_exchange(spark, vals):
    """The plan property the operator exists for: the naive global-window
    spelling funnels every row through Exchange SinglePartition (one task,
    sequential at any cluster size); the two-phase scan never does."""
    df, _ = vals
    out = global_running_sum(df, "v", "k", out_col="s", n_buckets=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan

    naive = df.withColumn(
        "s",
        F.sum("v").over(
            Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" in naive_plan  # what we avoided


def test_token_budget_shards_properties(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(200, dtype=np.int64),
            "text": [" ".join(["w"] * (3 + (7 * i) % 23)) for i in range(200)],
        }
    )
    docs = spark.createDataFrame(pdf).repartition(5)
    budget = 64
    out = (
        token_budget_shards(docs, budget_tokens=budget, n_buckets=4)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n_tok = pdf.text.str.split().str.len().to_numpy()
    assert (out.n_tokens.to_numpy() == n_tok).all()
    expect_shard = (np.cumsum(n_tok) - n_tok) // budget
    assert (out.shard_id.to_numpy() == expect_shard).all()
    # contiguous in id order, shards start at 0 with no gaps
    sid = out.shard_id.to_numpy()
    assert (np.diff(sid) >= 0).all() and sid[0] == 0
    assert set(np.diff(sorted(set(sid)))) <= {1}
    # token mass per shard ~ budget: a shard exceeds it only by its one
    # straddling document (shards never split a doc)
    per_shard = out.groupby("shard_id").n_tokens.sum()
    assert (per_shard.iloc[:-1] + out.n_tokens.max() > budget).all()
    assert (per_shard < budget + out.n_tokens.max()).all()


def test_stratified_sample_semantics(spark):
    from powershap_spark.operators.dedup import (
        deterministic_sample,
        stratified_sample,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(4000, dtype=np.int64),
            "lang": np.tile(["en", "de", "fr", "zh"], 1000),
        }
    )
    df = spark.createDataFrame(pdf)
    fr = {"en": 0.5, "de": 0.2}
    out = stratified_sample(df, "doc_id", "lang", fr, default_fraction=0.05)
    got = out.toPandas()
    rates = got.lang.value_counts() / 1000.0
    assert abs(rates.get("en", 0) - 0.5) < 0.08
    assert abs(rates.get("de", 0) - 0.2) < 0.06
    assert rates.get("fr", 0) < 0.12 and rates.get("zh", 0) < 0.12

    # per-stratum equivalence: within a stratum the membership set is
    # exactly deterministic_sample at that stratum's rate (same seed)
    en_direct = deterministic_sample(
        df.filter(F.col("lang") == "en"), "doc_id", 0.5
    ).toPandas()
    assert set(got[got.lang == "en"].doc_id) == set(en_direct.doc_id)

    # nested growth: raising ONE stratum's rate keeps every sampled row
    # and touches no other stratum
    wider = stratified_sample(
        df, "doc_id", "lang", {"en": 0.7, "de": 0.2}, default_fraction=0.05
    ).toPandas()
    assert set(got.doc_id) <= set(wider.doc_id)
    assert set(got[got.lang != "en"].doc_id) == set(wider[wider.lang != "en"].doc_id)

    with pytest.raises(ValueError):
        stratified_sample(df, "doc_id", "lang", {"en": 1.5})


def test_upsample_mixture_semantics(spark):
    from powershap_spark.operators.dedup import upsample_mixture

    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(4000, dtype=np.int64),
            "lang": np.tile(["en", "de", "fr", "zh"], 1000),
        }
    )
    df = spark.createDataFrame(pdf)
    w = {"en": 0.7, "de": 2.4, "fr": 0.0}
    out = upsample_mixture(df, "doc_id", "lang", w, default_weight=1.0)
    got = out.toPandas()

    # weight 0 drops the stratum; integer part is guaranteed per row
    assert (got.lang != "fr").all()
    de = got[got.lang == "de"].groupby("doc_id").copy_idx.agg(["count", "max"])
    assert (de["count"] >= 2).all() and (de["count"] <= 3).all()
    # copies are numbered 1..n
    assert (de["max"] == de["count"]).all()
    # realized rates hit the fractional expectation (Bernoulli tail)
    assert abs(len(de) / 1000.0 - 1.0) < 1e-9  # every de doc kept >= twice
    assert abs(de["count"].mean() - 2.4) < 0.08
    en = got[got.lang == "en"].groupby("doc_id").size()
    assert (en == 1).all() and abs(len(en) / 1000.0 - 0.7) < 0.08
    # default weight 1.0 = exactly one copy of every row
    zh = got[got.lang == "zh"]
    assert len(zh) == 1000 and (zh.copy_idx == 1).all()

    # determinism across partitionings: identical (doc_id, copy_idx) sets
    got2 = (
        upsample_mixture(
            df.repartition(13), "doc_id", "lang", w, default_weight=1.0
        )
        .toPandas()
    )
    key = lambda g: set(zip(g.doc_id, g.copy_idx))  # noqa: E731
    assert key(got2) == key(got)

    # the fractional top-up is the SAME draw as deterministic_sample:
    # en's kept set == the 0.7 sample of the en stratum
    from powershap_spark.operators.dedup import deterministic_sample

    en_direct = deterministic_sample(
        df.filter(F.col("lang") == "en"), "doc_id", 0.7
    ).toPandas()
    assert set(en.index) == set(en_direct.doc_id)

    with pytest.raises(ValueError):
        upsample_mixture(df, "doc_id", "lang", {"en": -0.1})
    with pytest.raises(ValueError):
        upsample_mixture(df, "doc_id", "lang", w, copy_col="lang")


def test_transition_counts(spark):
    from powershap_spark.operators.windows import transition_counts

    pdf = pd.DataFrame(
        {
            "conv": ["a"] * 4 + ["b"] * 3,
            "ts": [1, 2, 3, 4, 1, 2, 3],
            "tool": ["search", "read", "search", "read", "read", "search", "read"],
        }
    )
    out = (
        transition_counts(spark.createDataFrame(pdf), "conv", ["ts"], "tool")
        .toPandas()
        .set_index(["prev_action", "tool"])
        .n_transitions.to_dict()
    )
    # a: search>read, read>search, search>read; b: read>search, search>read
    assert out == {
        ("search", "read"): 3,
        ("read", "search"): 2,
    }


def test_stratified_quota_sample_exact_and_prefilter_identical(spark):
    from powershap_spark.operators.dedup import stratified_quota_sample

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "doc_id": rng.permutation(np.arange(900, dtype=np.int64)),
            # uneven strata: 500 en / 350 de / 50 fr
            "lang": ["en"] * 500 + ["de"] * 350 + ["fr"] * 50,
        }
    )
    df = spark.createDataFrame(pdf)
    k = 20
    plain = stratified_quota_sample(df, "doc_id", "lang", k).toPandas()
    assert plain.lang.value_counts().to_dict() == {"en": k, "de": k, "fr": k}

    # tiny stratum: quota clamps to the stratum size
    small = stratified_quota_sample(
        df.filter(F.col("lang") != "en"), "doc_id", "lang", 400
    ).toPandas()
    assert small.lang.value_counts().to_dict() == {"de": 350, "fr": 50}

    # the prefilter path must be BIT-identical, generous or starved
    # (factor 1.05 starves some stratum with high probability, exercising
    # the verified fallback; either way the contract is exact equality)
    for factor in (8.0, 1.05):
        pre = stratified_quota_sample(
            df, "doc_id", "lang", k, prefilter_factor=factor
        ).toPandas()
        assert set(map(tuple, pre[["doc_id", "lang"]].to_numpy())) == set(
            map(tuple, plain[["doc_id", "lang"]].to_numpy())
        ), f"factor={factor}"

    # layout-invariant: same set under a different partitioning
    rep = stratified_quota_sample(df.repartition(13), "doc_id", "lang", k).toPandas()
    assert set(rep.doc_id) == set(plain.doc_id)

    with pytest.raises(ValueError):
        stratified_quota_sample(df, "doc_id", "lang", 0)
    with pytest.raises(ValueError):
        stratified_quota_sample(df, "doc_id", "lang", 5, prefilter_factor=0.5)


def test_profile_numeric_matches_pandas(spark):
    from powershap_spark.operators.profile import profile_numeric

    pdf = pd.DataFrame(
        {
            "a": [1.0, 2.0, np.nan, 4.0, 100.0],
            "b": [10, 20, 30, 40, 50],
        }
    )
    out = (
        profile_numeric(spark.createDataFrame(pdf), ["a", "b"])
        .toPandas()
        .set_index("column")
    )
    assert list(out.columns) == ["n_rows", "n_null", "mean", "min", "max", "p50", "p95"]
    a = out.loc["a"]
    assert a.n_rows == 5 and a.n_null == 1
    assert a["mean"] == round((1 + 2 + 4 + 100) / 4, 4)
    assert a["min"] == 1.0 and a["max"] == 100.0
    assert a.p50 == 3.0  # median of [1,2,4,100]
    b = out.loc["b"]
    assert b.n_null == 0 and b["mean"] == 30.0 and b.p50 == 30.0
    assert b.p95 == round(np.percentile(pdf.b, 95, method="linear"), 4)

    # approx path: same shape, plausible values (GK sketch is exact at
    # this size with the default accuracy)
    ap = (
        profile_numeric(spark.createDataFrame(pdf), ["b"], approx=True)
        .toPandas()
        .set_index("column")
    )
    assert ap.loc["b"].n_rows == 5 and ap.loc["b"]["max"] == 50.0

    with pytest.raises(ValueError):
        profile_numeric(spark.createDataFrame(pdf), [])
    with pytest.raises(ValueError):
        profile_numeric(spark.createDataFrame(pdf), ["a"], percentiles=(1.5,))


def test_pack_sequences_ffd(spark):
    from powershap_spark.operators.sharding import pack_sequences

    rng = np.random.default_rng(5)
    lens = rng.integers(5, 120, 300)
    lens[7] = 700  # overflow doc (> max_tokens)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(300, dtype=np.int64),
            "text": [" ".join(["w"] * int(n)) for n in lens],
        }
    )
    docs = spark.createDataFrame(pdf).repartition(6)
    cap = 256
    out = pack_sequences(docs, cap, shard_budget_factor=8, n_buckets=4).toPandas()

    # every doc assigned exactly once
    assert sorted(out.doc_id) == list(range(300))
    # capacity respected for non-overflow bins; overflow bins are singletons
    g = out.groupby(["shard_id", "bin_id"])
    for (_, _), grp in g:
        if grp.overflow.any():
            assert len(grp) == 1
        else:
            assert grp.n_tokens.sum() <= cap
    assert out[out.doc_id == 7].overflow.all()
    assert not out[out.doc_id != 7].overflow.any()

    # packing quality: within 15% of the fractional lower bound
    n_bins = g.ngroups
    lower = int(np.ceil((lens.sum() - 700) / cap)) + 1  # +1 overflow bin
    assert n_bins <= int(lower * 1.15) + out.shard_id.nunique()

    # bit-identical across partitionings
    out2 = pack_sequences(
        docs.repartition(17), cap, shard_budget_factor=8, n_buckets=4
    ).toPandas()
    key = ["doc_id", "n_tokens", "shard_id", "bin_id", "overflow"]
    a = out[key].sort_values("doc_id").reset_index(drop=True)
    b = out2[key].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    with pytest.raises(ValueError):
        pack_sequences(docs, 0)


def test_entity_split_disjoint_deterministic(spark):
    from powershap_spark.operators.dedup import entity_split

    pdf = pd.DataFrame(
        {
            "conv": np.repeat([f"c{i}" for i in range(500)], 4),
            "x": np.arange(2000),
        }
    )
    df = spark.createDataFrame(pdf)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = entity_split(df, "conv", w).toPandas()
    # entity-disjoint: one split per conversation
    assert (out.groupby("conv").split.nunique() == 1).all()
    # rough proportions over 500 entities
    ent = out.drop_duplicates("conv").split.value_counts() / 500.0
    assert abs(ent["train"] - 0.8) < 0.07
    assert abs(ent.get("val", 0) - 0.1) < 0.05
    assert abs(ent.get("test", 0) - 0.1) < 0.05
    # layout-invariant + stable under corpus growth: assignments of the
    # original entities are unchanged when new entities appear
    grown = spark.createDataFrame(
        pd.concat(
            [pdf, pd.DataFrame({"conv": [f"n{i}" for i in range(100)], "x": 0})]
        )
    )
    g = entity_split(grown.repartition(9), "conv", w).toPandas()
    merged = out.drop_duplicates("conv").merge(
        g.drop_duplicates("conv"), on="conv", suffixes=("_a", "_b")
    )
    assert (merged.split_a == merged.split_b).all()

    with pytest.raises(ValueError):
        entity_split(df, "conv", {"train": 0.5, "val": 0.4})
    with pytest.raises(ValueError):
        entity_split(df, "conv", {})


def test_write_training_shards_layout_and_manifest(spark, tmp_path):
    from powershap_spark.operators.sharding import pack_sequences, token_budget_shards
    from powershap_spark.sources.tableio import write_training_shards

    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(60, dtype=np.int64),
            "text": ["w " * (5 + (i * 7) % 40) for i in range(60)],
        }
    )
    docs = spark.createDataFrame(pdf).repartition(5)
    assign = token_budget_shards(docs, budget_tokens=200)
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, assign, path).toPandas()

    # one directory per shard, hive-partitioned
    dirs = sorted(p.name for p in (tmp_path / "shards").iterdir()
                  if p.name.startswith("shard_id="))
    assert dirs == [f"shard_id={s}" for s in sorted(manifest.shard_id)]

    # reading the dataset back reconstitutes every row with its shard
    back = spark.read.parquet(path).toPandas()
    assert len(back) == 60
    expect = assign.toPandas().set_index("doc_id").sort_index()
    got = back.set_index("doc_id").sort_index()
    assert (got.shard_id.astype(int) == expect.shard_id.astype(int)).all()

    # manifest aggregates match a direct recount, and totals tie out
    direct = assign.toPandas().groupby("shard_id").agg(
        n_docs=("doc_id", "count"), n_tokens=("n_tokens", "sum"))
    m = manifest.set_index("shard_id").sort_index()
    assert (m.n_docs == direct.n_docs).all()
    assert (m.n_tokens == direct.n_tokens).all()
    assert m.n_docs.sum() == 60
    # persisted manifest == returned manifest
    stored = spark.read.parquet(path + "/_manifest").toPandas()
    assert sorted(stored.shard_id) == sorted(manifest.shard_id)

    # packing assignment adds the n_bins column
    packed = pack_sequences(docs, max_tokens=64, shard_budget_factor=8)
    m2 = write_training_shards(
        docs, packed, str(tmp_path / "packed"), max_records_per_file=16
    ).toPandas()
    assert "n_bins" in m2.columns
    assert (m2.n_bins >= 1).all()

    # deterministic: re-running yields a row-identical manifest
    m3 = write_training_shards(docs, assign, str(tmp_path / "again")).toPandas()
    assert m3.sort_values("shard_id").reset_index(drop=True).equals(
        manifest.sort_values("shard_id").reset_index(drop=True))


def test_pack_contiguous_semantics(spark):
    """Spark spans == a pure-python stream cut: concatenate token streams
    in id order, cut at exact block boundaries; every block except the
    last is exactly full; spans tile each doc; empty docs emit nothing;
    partitioning-invariant."""
    from powershap_spark.operators.sharding import pack_contiguous

    texts = {1: "a b c d e", 2: "f g", 3: "", 4: "h i j k l m n", 5: "o"}
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    L = 4
    out = (
        pack_contiguous(docs, block_tokens=L)
        .toPandas()
        .sort_values(["block_id", "doc_id"])
        .reset_index(drop=True)
    )

    stream = []
    for i in sorted(texts):
        ts = texts[i].split() if texts[i].strip() else []
        stream.extend((i, p) for p in range(len(ts)))
    blocks = {}
    for pos, (i, p) in enumerate(stream):
        blocks.setdefault(pos // L, {}).setdefault(i, []).append(p)
    exp = [
        (b, i, min(ps), max(ps) + 1, len(ps))
        for b in sorted(blocks)
        for i, ps in sorted(blocks[b].items())
    ]
    assert [tuple(r) for r in out.to_numpy()] == exp

    # invariants: full blocks except the last; spans tile each doc
    per_block = out.groupby("block_id").n_span.sum()
    assert (per_block.iloc[:-1] == L).all()
    n_total = sum(len(t.split()) for t in texts.values() if t.strip())
    assert per_block.sum() == n_total
    for i, t in texts.items():
        spans = out[out.doc_id == i].sort_values("tok_from")
        n = len(t.split()) if t.strip() else 0
        if n == 0:
            assert len(spans) == 0
            continue
        assert spans.tok_from.iloc[0] == 0 and spans.tok_to.iloc[-1] == n
        assert (spans.tok_from.values[1:] == spans.tok_to.values[:-1]).all()

    # partitioning invariance (the prefix sum is bucket-independent)
    out2 = (
        pack_contiguous(docs.repartition(7), block_tokens=L, n_buckets=3)
        .toPandas()
        .sort_values(["block_id", "doc_id"])
        .reset_index(drop=True)
    )
    assert out2.equals(out)

    # inherited plan contract: the prefix sum never funnels the corpus
    # through one task
    plan = (
        pack_contiguous(docs, block_tokens=L, n_buckets=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan, plan

    with pytest.raises(ValueError):
        pack_contiguous(docs, block_tokens=0)
    with pytest.raises(ValueError):
        pack_contiguous(docs.withColumnRenamed("doc_id", "block_id"),
                        block_tokens=4, order_col="block_id")


def test_deterministic_shuffle_shards_properties(spark):
    from powershap_spark.operators.sharding import deterministic_shuffle_shards

    d = spark.range(500).withColumnRenamed("id", "doc_id")

    def run(df, **kw):
        return (
            deterministic_shuffle_shards(df, "doc_id", n_shards=8, seed=11, **kw)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    out = run(d)
    # partition-invariance: same permutation from any physical layout
    assert run(d.repartition(13)).equals(out)
    assert run(d.coalesce(1)).equals(out)
    # (shard, pos) is a total order: per shard positions are exactly 1..n
    for _, g in out.groupby("shard"):
        assert sorted(g.pos) == list(range(1, len(g) + 1))
    assert len(out) == 500 and out.doc_id.nunique() == 500
    # a different seed is a different epoch permutation
    other = (
        deterministic_shuffle_shards(d, "doc_id", n_shards=8, seed=12)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert not other[["shard", "pos"]].equals(out[["shard", "pos"]])
    # poly family: same structure (different permutation is fine)
    pol = run(d, hash_family="poly")
    for _, g in pol.groupby("shard"):
        assert sorted(g.pos) == list(range(1, len(g) + 1))

    # scale contract: the pos window partitions by shard — the plan never
    # funnels the corpus through one task
    plan = (
        deterministic_shuffle_shards(d, "doc_id", n_shards=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan, plan

    with pytest.raises(ValueError):
        deterministic_shuffle_shards(d, "doc_id", n_shards=0)
    with pytest.raises(ValueError):
        deterministic_shuffle_shards(d, "doc_id", n_shards=8, hash_family="nope")
