"""Fused curation pipeline (operators/curate.py): plan shape (one scan,
one exchange, no sorts/joins/Python stages), semantic equivalence with the
chained individual stages, and sample-nesting / no-scrub variants."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")


def test_curate_plan_single_scan_single_exchange(spark):
    """The whole pipeline — scrub + score + gate + dedup + sample — must
    compile to ONE parquet scan and ONE shuffle: no join-back re-scan (the
    chained exact_dedup would add both), no Python stage, and the only
    sorts are the SortAggregate's, ordering the 16-byte hash-pair group
    key — never the document text."""
    import re

    from powershap_spark.operators.curate import curate_corpus

    out = curate_corpus(
        _docs(spark), langs=("en",), min_quality=0.5, sample_fraction=0.5
    )
    p = _plan(out)
    # exactly one scan node and one Exchange node (detail headers are
    # "(N) Scan parquet" / "(N) Exchange", unique per physical node)
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", p))) == 1, p
    assert len(set(re.findall(r"\((\d+)\) Exchange\b", p))) == 1, p
    assert "Join" not in p, p
    assert "FlatMapGroupsInPandas" not in p and "ArrowEvalPython" not in p, p
    # Sort nodes (the SortAggregate's) order only the hash-pair key
    lines = p.splitlines()
    sort_idx = [i for i, ln in enumerate(lines) if re.search(r"\(\d+\) Sort\b", ln)]
    assert sort_idx, p  # min_by(struct) plans as SortAggregate
    for i in sort_idx:
        args = next(
            ln for ln in lines[i + 1 : i + 6] if ln.strip().startswith("Arguments:")
        )
        # the grouping expressions are the two xxhash64 longs ("...L");
        # sorting must never touch a string column
        keys = re.findall(r"(\w+#\d+L?)\s+ASC", args)
        assert keys and all(k.endswith("L") for k in keys), args
        assert "text" not in args, args


def test_curate_equals_chained_stages(spark):
    """Fusion is an optimization, not a semantic fork: identical output to
    scrub_pii |> lang/quality filter |> exact_dedup |> deterministic_sample
    run as separate operators."""
    from powershap_spark.operators.curate import curate_corpus
    from powershap_spark.operators.dedup import deterministic_sample, exact_dedup
    from powershap_spark.operators.scrub import scrub_pii
    from powershap_spark.operators.text import lang_id, quality_score

    d = _docs(spark)
    fused = curate_corpus(
        d, langs=("en", "de"), min_quality=0.55, sample_fraction=0.5
    )

    t = F.col("text_scrubbed")
    chained = (
        scrub_pii(d, "text", "text_scrubbed")
        .withColumns({"pred_lang": lang_id(t), "quality": quality_score(t)})
        .filter(F.col("pred_lang").isin("en", "de") & (F.col("quality") >= 0.55))
    )
    chained = exact_dedup(chained, "text_scrubbed", "doc_id")
    chained = deterministic_sample(chained, "doc_id", 0.5, seed=7)
    chained = chained.select(*fused.columns)

    a = sorted(map(tuple, fused.collect()))
    b = sorted(map(tuple, chained.collect()))
    assert a == b
    assert len(a) > 0  # the gate keeps something at sf0.001


def test_curate_sample_nesting_and_gate(spark):
    """Hash-membership sampling nests (f1 <= f2 -> subset) on the curated
    output, and every surviving row respects the language/quality gate."""
    from powershap_spark.operators.curate import curate_corpus

    d = _docs(spark)
    full = curate_corpus(d, langs=("en",), min_quality=0.5, sample_fraction=1.0)
    rows = full.collect()
    assert rows and all(r.pred_lang == "en" and r.quality >= 0.5 for r in rows)

    small = curate_corpus(d, langs=("en",), min_quality=0.5, sample_fraction=0.25)
    big = curate_corpus(d, langs=("en",), min_quality=0.5, sample_fraction=0.75)
    ids_small = {r.doc_id for r in small.select("doc_id").collect()}
    ids_big = {r.doc_id for r in big.select("doc_id").collect()}
    ids_full = {r.doc_id for r in rows}
    assert ids_small <= ids_big <= ids_full


def test_curate_no_scrub_dedups_injected_duplicates(spark):
    """scrub=False path: no count columns, and injected exact duplicates
    collapse to the min doc_id per normalized text."""
    from powershap_spark.operators.curate import curate_corpus

    d = _docs(spark).withColumn(
        "text",
        F.when(
            F.pmod("doc_id", F.lit(5)) == 0,
            F.lit("it is the same boilerplate page and you know that"),
        ).otherwise(F.col("text")),
    )
    out = curate_corpus(d, langs=None, min_quality=0.0, scrub=False)
    assert out.columns == ["doc_id", "pred_lang", "quality", "text_scrubbed"]
    boiler = [r for r in out.collect() if "boilerplate" in r.text_scrubbed]
    n_injected = d.filter(F.pmod("doc_id", F.lit(5)) == 0).count()
    assert n_injected > 1 and len(boiler) == 1
    assert boiler[0].doc_id == 0  # min id representative


# ---------------------------------------------------------------------------
# HTML -> text extraction (operators/scrub.py: extract_html_text)


def test_html_extract_strips_boilerplate_and_decodes_entities(spark):
    from powershap_spark.operators.scrub import extract_html_text

    page = (
        "<html><head><title>T</title>"
        "<script type='x'>var a = '<p>not text</p>';</script>"
        "<STYLE>.c { color: red }</STYLE></head>"
        "<body><!-- comment\nwith newline -->"
        "<div class='nav'><ul><li>Home</li><li>About</li></ul></div>"
        "<h1>A real heading here</h1>"
        "<p>First&nbsp;paragraph with &quot;quotes&quot; &amp; ampersand.</p>"
        "<p>Tom &#39;s 1 &lt; 2 &gt; 0 claim</p>"
        "<br/><table><tr><td>cell</td></tr></table>"
        "</body></html>"
    )
    df = spark.createDataFrame([(page,)], "html string")
    out = df.select(extract_html_text("html").alias("t")).collect()[0].t
    assert out == (
        "A real heading here\n"
        'First paragraph with "quotes" & ampersand.\n'
        "Tom 's 1 < 2 > 0 claim"
    )
    # script/style/comment content never leaks
    assert "not text" not in out and "color" not in out and "comment" not in out


def test_html_extract_entity_order_and_min_words(spark):
    from powershap_spark.operators.scrub import extract_html_text

    df = spark.createDataFrame(
        [("<p>literal &amp;lt; stays escaped here</p>",), ("<p>too short</p>",)],
        "html string",
    )
    got = [r.t for r in df.select(extract_html_text("html").alias("t")).collect()]
    # &amp;lt; decodes to the literal text "&lt;" (NOT to "<"): &amp; last
    assert got[0] == "literal &lt; stays escaped here"
    # a 2-word line is dropped at the default min_words=3 -> empty doc
    assert got[1] == ""
    loose = [
        r.t
        for r in df.select(extract_html_text("html", min_words=2).alias("t")).collect()
    ]
    assert loose[1] == "too short"


def test_html_extract_composes_with_warc_ingest(spark):
    """The Common Crawl chain end-to-end: WARC records -> response
    payloads -> visible text."""
    import os

    from powershap_spark.operators.scrub import extract_html_text
    from powershap_spark.sources.warc import read_warc

    path = os.path.join(os.path.dirname(__file__), "fixtures", "docs_small.warc")
    out = (
        read_warc(spark, path)
        .filter(~F.col("_warc_malformed") & (F.col("warc_type") == "response"))
        .select("target_uri", extract_html_text("payload", min_words=2).alias("t"))
        .orderBy("target_uri")
        .collect()
    )
    texts = {r.target_uri: r.t for r in out}
    assert texts["https://example.com/a"] == "hello world"
