"""Dump explain('formatted') physical plans of the headline queries to
PLANS.md — the artifact showing pushdown/pruning/broadcast/shuffle shape
(predicate pushdown into parquet, pruned ReadSchema, broadcast joins where
a side is small, a single exchange per window block, Arrow-batched UDF
stages)."""

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    import __spark_entry__ as em
    from powershap_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    sf = "/root/testdata/sf0.001"

    sections = []

    # 1. pushdown + pruning: filter + 2-column projection on lineitem
    li = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .filter(F.col("l_shipdate") < "1996-01-01")
        .select("l_orderkey", "l_extendedprice")
    )
    sections.append(("filter+projection pushdown (lineitem)", plan_of(li)))

    sections.append(
        ("as-of join (union+window sort-merge)", plan_of(em.q_asof_join_events(spark, sf)))
    )
    sections.append(
        ("broadcast as-of variant", plan_of(em.q_asof_join_broadcast_events(spark, sf)))
    )
    sections.append(
        ("windowed features block (single exchange)", plan_of(em.q_rolling_strict_past(spark, sf)))
    )
    sections.append(
        ("point-in-time feature matrix (flagship)", plan_of(em.entry(spark)))
    )
    sections.append(
        ("broadcast equi-join", plan_of(em.q_equi_join_orders_customer(spark, sf)))
    )
    sections.append(
        (
            "frame sampling (pure JVM explode+concat, no Python stage)",
            plan_of(em.q_frame_sample_fake(spark, sf)),
        )
    )
    sections.append(
        (
            "IVF ANN top-k (broadcast probe cells, candidate equi-join)",
            plan_of(em.q_ivf_topk_embeddings(spark, sf)),
        )
    )
    sections.append(
        (
            "minhash LSH dedup (ids-only band self-join, cached signatures)",
            plan_of(em.q_minhash_dedup_documents(spark, sf)),
        )
    )

    # round-6: the selection explain batch over the POST-shuffle persisted
    # matrix — the per-batch plan must be the Arrow grouped-map UDF reading
    # the InMemory scan directly (zero Exchange, zero Sort; the one shuffle
    # ran at backend init and lives inside the cached relation's build plan)
    import numpy as np
    import pandas as pd

    from powershap_spark.engine import _RESULT_SCHEMA, SparkExplainBackend, _make_group_fn

    rng = np.random.RandomState(0)
    fcols = [f"f{i}" for i in range(4)]
    mpdf = pd.DataFrame(rng.rand(400, 4), columns=fcols)
    mpdf["label"] = (mpdf.f0 > 0.5).astype("int64")
    mpdf["row_id"] = np.arange(len(mpdf))
    be = SparkExplainBackend(
        spark.createDataFrame(mpdf), fcols, "label", n_parts=4,
        sort_cols=["row_id"], min_rows_per_part=50,
    )
    gfn = _make_group_fn(
        fcols, "label", [(0, 0)], 0, 0.2, None, None, None,
        "positional", None, ["row_id"],
    )
    sections.append(
        (
            "selection explain batch (cached post-shuffle matrix: zero "
            "Exchange / zero Sort above the InMemory scan)",
            plan_of(be.df.groupBy("part_id").applyInPandas(gfn, schema=_RESULT_SCHEMA)),
        )
    )
    be.release()

    # round-4 additions
    from powershap_spark import synth
    from powershap_spark.pipeline import turn_features

    t = synth.transcripts(spark, n_conv=30, mean_turns=8)
    sections.append(
        (
            "turn-features window block (ONE sort: rows frames ordered by "
            "(epoch, turn_idx), range frame prefix-satisfied)",
            plan_of(turn_features(t, skew_safe=False)),
        )
    )
    sections.append(
        (
            "token chunking (pure JVM explode+slice, no shuffle)",
            plan_of(em.q_chunk_tokens_documents(spark, sf)),
        )
    )
    sections.append(
        (
            "benchmark decontamination (broadcast benchmark shingle set)",
            plan_of(em.q_contamination_documents(spark, sf)),
        )
    )
    sections.append(
        (
            "corpus top-k n-grams (map-side combine + TakeOrderedAndProject)",
            plan_of(em.q_topk_ngrams_documents(spark, sf)),
        )
    )

    # round-6 late additions
    sections.append(
        (
            "token-budget shards via two-phase global prefix-sum (window "
            "partitioned by range bucket — NO Exchange SinglePartition)",
            plan_of(em.q_token_budget_shards_documents(spark, sf)),
        )
    )
    sections.append(
        (
            "single-scan column profile (one partial+final aggregate for "
            "all columns, explode of the one agg row)",
            plan_of(em.q_profile_lineitem(spark, sf)),
        )
    )
    sections.append(
        (
            "exact substring (span) dedup (two id/hash-keyed exchanges, "
            "dup starts broadcast back — text in no shuffle)",
            plan_of(em.q_dedup_spans_documents(spark, sf)),
        )
    )
    sections.append(
        (
            "LM perplexity filter (chained window counts over 8-byte "
            "context/bigram hashes, V as a 1-row broadcast — token "
            "strings in no shuffle)",
            plan_of(em.q_lm_perplexity_documents(spark, sf)),
        )
    )
    sections.append(
        (
            "fractional-epoch mixture upsampling (pure projection + "
            "explode(sequence) — zero exchange)",
            plan_of(em.q_upsample_mixture_documents(spark, sf)),
        )
    )
    sections.append(
        (
            "tf-idf keywords (map-side tf combine, df as hash-keyed window "
            "count, WindowGroupLimit pruning rank<=k below the exchange)",
            plan_of(em.q_tfidf_keywords_documents(spark, sf)),
        )
    )
    from powershap_spark.caching import tracking_scope
    from powershap_spark.operators.text import token_shift

    d6 = spark.read.parquet(f"{sf}/documents.parquet")
    with tracking_scope():
        sections.append(
            (
                "token distribution shift (side-tagged single-scan counts, "
                "persisted diamond, TakeOrderedAndProject top-k — vocab "
                "never funnels to one task)",
                plan_of(
                    token_shift(
                        d6.filter(F.col("doc_id") % 7 != 1),
                        d6.filter(F.col("doc_id") % 7 != 2),
                        k=20,
                    )
                ),
            )
        )

    sections.append(
        (
            "WARC ingest (splittable lineSep text scan, all-JVM header "
            "regex + byte-exact payload slice — no Python, no shuffle)",
            plan_of(em.q_warc_ingest_docs(spark, sf)),
        )
    )
    sections.append(
        (
            "HTML -> text extraction (regexp/array built-ins only: one "
            "scan, zero Exchange, no Python stage)",
            plan_of(em.q_html_extract_documents(spark, sf)),
        )
    )

    sections.append(
        (
            "BPE encode, inline path (chained replace projection: one "
            "scan, zero Exchange, no Python stage)",
            plan_of(em.q_bpe_encode_documents(spark, sf)),
        )
    )
    sections.append(
        (
            "vocab build + token ids (TakeOrderedAndProject vocab cut, "
            "BroadcastHashJoin id mapping)",
            plan_of(em.q_vocab_ids_documents(spark, sf)),
        )
    )
    sections.append(
        (
            "deterministic epoch shuffle (window PARTITIONED BY shard — "
            "one hash Exchange, no Exchange SinglePartition)",
            plan_of(em.q_shuffle_shards_documents(spark, sf)),
        )
    )

    # quality-classifier training epoch: the same zero-per-epoch-Exchange
    # contract as the selection batch — grouped-map UDF reading the
    # post-shuffle InMemory scan directly
    from powershap_spark.operators.classifier import (
        _grad_schema,
        featurize_hashed,
        partial_grad,
    )

    feat = featurize_hashed(
        d6.select("doc_id", "text", F.lit(1).alias("label")),
        label_col="label", dim=256, n_parts=4,
    )
    fsrc = (
        feat.repartition(4, "part_id")
        .sortWithinPartitions("part_id", "doc_id")
        .persist()
    )
    fsrc.count()
    wz = np.zeros(257)

    def _epoch_fn(key, pdf):
        g, lo, n = partial_grad(pdf, wz, 256)
        return pd.DataFrame(
            {"part_id": [int(key[0])], "grad": [g.tolist()],
             "loss": [lo], "n": [n]}
        )

    sections.append(
        (
            "quality-classifier training epoch (grouped-map gradient "
            "partials over the post-shuffle cached features: zero new "
            "Exchange per epoch)",
            plan_of(fsrc.groupBy("part_id").applyInPandas(_epoch_fn, _grad_schema(256))),
        )
    )
    fsrc.unpersist()

    sections.append(
        (
            "time-range (interval) join (bucketed equi-join on (key, "
            "bucket) + residual range predicate — bounded right-row "
            "replication, no CartesianProduct)",
            plan_of(em.q_range_join_events(spark, sf)),
        )
    )

    sections.append(
        (
            "decayed strictly-past mean (full-frame per-key min + two "
            "range-frame sums share ONE exchange; exact power-of-two "
            "long weights)",
            plan_of(em.q_decayed_mean_events(spark, sf)),
        )
    )

    with open("PLANS.md", "w") as f:
        f.write(
            "# Physical plans (explain 'formatted') — pushdown / broadcast /"
            " shuffle-shape evidence\n\nRegenerate: `python tools/dump_plans.py`."
            " Things to check:\n"
            "- parquet scans carry `PushedFilters` and a pruned `ReadSchema`\n"
            "- small sides go through `BroadcastExchange` / BroadcastHashJoin\n"
            "- each window block costs ONE `Exchange hashpartitioning` + sort\n"
            "- the selection kernel appears as a single Arrow"
            " `FlatMapGroupsInPandas` after one exchange\n\n"
        )
        for title, text in sections:
            f.write(f"## {title}\n\n```\n{text}\n```\n\n")
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
