"""End-to-end corpus pipeline composition: the full crawl-to-tensors
chain every stage of which ships individually — WARC ingest -> HTML
extraction -> PII scrub -> quality gate -> exact dedup -> BPE learn ->
BPE encode -> vocab ids -> contiguous packing -> epoch shuffle. The
point is the SEAMS: schemas line up, token mass is conserved stage to
stage, and the whole chain runs on one SparkSession without collecting
anything corpus-sized."""

from pyspark.sql import functions as F


def _mini_crawl(tmp_path):
    """Four response records over two .warc shards: two distinct pages,
    one exact duplicate (dedup fodder), one low-quality page (gate
    fodder)."""
    pages = {
        0: "<html><body><h1>Corpus article one</h1><p>the lower river "
           "flows lower and lower into the low valley</p></body></html>",
        1: "<html><body><p>newer networks learn newer and newer lower "
           "features over the river</p></body></html>",
        2: "<html><body><h1>Corpus article one</h1><p>the lower river "
           "flows lower and lower into the low valley</p></body></html>",
        3: "<html><body><p>x@y.com 1 2</p></body></html>",  # short + PII
    }
    shards = {0: [], 1: []}
    for i, html in pages.items():
        payload = html.encode()
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: https://x/{i}\r\n".encode()
            + f"WARC-Record-ID: <urn:uuid:{i}>\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n" + payload + b"\r\n\r\n"
        )
        shards[i % 2].append(rec)
    d = tmp_path / "crawl"
    d.mkdir()
    for s, recs in shards.items():
        (d / f"shard{s}.warc").write_bytes(b"".join(recs))
    return str(d), pages


def test_crawl_to_tensors_chain(spark, tmp_path):
    from powershap_spark.operators.dedup import exact_dedup
    from powershap_spark.operators.scrub import extract_html_text, scrub_pii
    from powershap_spark.operators.sharding import (
        deterministic_shuffle_shards,
        pack_contiguous,
    )
    from powershap_spark.operators.text import (
        bpe_encode,
        bpe_learn,
        build_vocab,
        token_count,
        tokens_to_ids,
    )
    from powershap_spark.sources.warc import read_warc

    crawl_dir, pages = _mini_crawl(tmp_path)

    # 1. ingest + extract + scrub: one fused projection over the records
    docs = (
        read_warc(spark, crawl_dir)
        .filter(~F.col("_warc_malformed") & (F.col("warc_type") == "response"))
        .select(
            F.regexp_extract("target_uri", r"/(\d+)$", 1)
            .cast("long")
            .alias("doc_id"),
            extract_html_text("payload", min_words=2).alias("text"),
        )
    )
    docs = scrub_pii(docs).drop("text").withColumnRenamed("text_scrubbed", "text")
    got = docs.toPandas().set_index("doc_id").sort_index()
    assert len(got) == 4 and got.loc[3, "n_email"] == 1
    assert "x@y.com" not in got.loc[3, "text"]

    # 2. quality gate: drop short docs (the PII page dies here)
    gated = docs.filter(token_count("text") >= 5)

    # 3. exact dedup: the duplicate article collapses to its min id
    kept = exact_dedup(gated, text_col="text", id_col="doc_id")
    kept_ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert kept_ids == [0, 1]

    # 4. tokenizer: learn merges on the SURVIVING corpus, encode with them
    merges = bpe_learn(kept, n_merges=6)
    enc = bpe_encode(kept, merges, out_col="tokens")

    # 5. ids: vocab over the encoded corpus -> input_ids
    #    (build_vocab tokenizes a text column, so join the subword stream
    #    back as text — the seam is array-in/array-out via tokens_to_ids)
    vocab = build_vocab(
        enc.select(F.array_join("tokens", " ").alias("text")), size=64
    )
    ids = tokens_to_ids(enc.select("doc_id", "tokens"), vocab)
    idp = ids.toPandas().set_index("doc_id").sort_index()
    enc_p = enc.select("doc_id", "tokens").toPandas().set_index("doc_id")
    for i in idp.index:
        assert len(idp.loc[i, "input_ids"]) == len(enc_p.loc[i, "tokens"])
    assert int(idp.n_unk.sum()) == 0  # vocab built on this corpus: no OOV

    # 6. packing: contiguous blocks over deterministic id order conserve
    #    total token mass (pack_contiguous consumes a text column — feed
    #    it the id stream, the loader-facing representation)
    id_stream = ids.select(
        "doc_id", F.array_join("input_ids", " ").alias("text")
    )
    total = ids.agg(F.sum(F.size("input_ids"))).collect()[0][0]
    packed = pack_contiguous(id_stream, block_tokens=8, n_buckets=2)
    packed_total = packed.agg(F.sum("n_span")).collect()[0][0]
    assert packed_total == total
    # every block except the last is exactly full
    per_block = (
        packed.groupBy("block_id").agg(F.sum("n_span").alias("n"))
        .orderBy("block_id").collect()
    )
    assert all(r.n == 8 for r in per_block[:-1]) and per_block[-1].n <= 8

    # 7. epoch order: every surviving doc gets a reproducible (shard, pos)
    order = deterministic_shuffle_shards(ids, "doc_id", n_shards=2, seed=3)
    op = order.select("doc_id", "shard", "pos").toPandas()
    assert sorted(op.doc_id) == kept_ids
    op2 = deterministic_shuffle_shards(
        ids.repartition(5), "doc_id", n_shards=2, seed=3
    ).select("doc_id", "shard", "pos").toPandas()
    assert op2.sort_values("doc_id").reset_index(drop=True).equals(
        op.sort_values("doc_id").reset_index(drop=True)
    )
