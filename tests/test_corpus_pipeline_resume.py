"""CorpusPipeline: staged checkpoint/resume for the crawl-to-tensors
chain — completed stages load from parquet and their stage functions are
NEVER re-invoked; a crash mid-chain resumes after the last durable stage;
a changed chain invalidates from the first mismatch."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from powershap_spark.corpus import CorpusPipeline, Stage


def _counting_stages(calls):
    def src(spark, prev):
        calls.append("src")
        assert prev is None
        return spark.range(100).withColumnRenamed("id", "doc_id")

    def doubled(spark, prev):
        calls.append("doubled")
        return prev.withColumn("v", F.col("doc_id") * 2)

    def gated(spark, prev):
        calls.append("gated")
        return prev.filter(F.col("v") % 4 == 0)

    return [
        Stage("src", src),
        Stage("doubled", doubled),
        Stage("gated", gated, repartition=2),
    ]


def test_chain_runs_and_resume_skips_completed(spark, tmp_path):
    calls: list[str] = []
    pipe = CorpusPipeline(str(tmp_path), "run1", _counting_stages(calls))
    out = pipe.run(spark)
    assert out.count() == 50
    assert calls == ["src", "doubled", "gated"]
    assert pipe.completed() == ["src", "doubled", "gated"]

    # full resume: nothing recomputes, result identical from parquet
    calls2: list[str] = []
    pipe2 = CorpusPipeline(str(tmp_path), "run1", _counting_stages(calls2))
    out2 = pipe2.run(spark)
    assert calls2 == []
    a = sorted(out.toPandas().values.tolist())
    b = sorted(out2.toPandas().values.tolist())
    assert a == b

    # lineage: one metrics line per stage with rows + wall
    m = pipe2.metrics()
    assert [r["stage"] for r in m] == ["src", "doubled", "gated"]
    assert all(r["rows"] > 0 and r["wall_s"] >= 0 for r in m)


def test_crash_mid_chain_resumes_after_last_durable_stage(spark, tmp_path):
    calls: list[str] = []
    stages = _counting_stages(calls)

    def boom(spark_, prev):
        calls.append("boom")
        raise RuntimeError("tokenizer OOM")

    crashing = stages[:2] + [Stage("gated", boom)]
    pipe = CorpusPipeline(str(tmp_path), "run2", crashing)
    with pytest.raises(RuntimeError, match="tokenizer OOM"):
        pipe.run(spark)
    assert pipe.completed() == ["src", "doubled"]

    # resume with the fixed stage: only the failed stage runs
    calls2: list[str] = []
    pipe2 = CorpusPipeline(str(tmp_path), "run2", _counting_stages(calls2))
    out = pipe2.run(spark)
    assert calls2 == ["gated"]
    assert out.count() == 50


def test_changed_chain_invalidates_from_first_mismatch(spark, tmp_path):
    calls: list[str] = []
    CorpusPipeline(str(tmp_path), "run3", _counting_stages(calls)).run(spark)

    # rename stage 2: its marker path no longer matches -> stages 2+ rerun
    calls2: list[str] = []
    stages = _counting_stages(calls2)
    renamed = [
        stages[0],
        Stage("doubled_v2", stages[1].fn),
        stages[2],
    ]
    out = CorpusPipeline(str(tmp_path), "run3", renamed).run(spark)
    assert calls2 == ["doubled", "gated"]  # src still served from parquet
    assert out.count() == 50


def test_validation(tmp_path):
    with pytest.raises(ValueError):
        CorpusPipeline(str(tmp_path), "r", [])
    s = Stage("a", lambda sp, p: None)
    with pytest.raises(ValueError):
        CorpusPipeline(str(tmp_path), "r", [s, Stage("a", lambda sp, p: None)])


def test_stale_markers_cleared_before_recompute(spark, tmp_path):
    """The r7 review scenario: a fully-completed chain is resumed with a
    renamed middle stage and CRASHES on the last stage — the last stage's
    OLD marker (same index+name as the new chain's) must not survive to
    mark stale parquet as completed on the next resume."""
    calls: list[str] = []
    CorpusPipeline(str(tmp_path), "run4", _counting_stages(calls)).run(spark)

    def boom(spark_, prev):
        raise RuntimeError("mid-chain crash")

    calls2: list[str] = []
    stages2 = _counting_stages(calls2)
    crashing = [stages2[0], Stage("doubled_v2", stages2[1].fn), Stage("gated", boom)]
    pipe = CorpusPipeline(str(tmp_path), "run4", crashing)
    with pytest.raises(RuntimeError, match="mid-chain crash"):
        pipe.run(spark)
    # the old 02_gated.COMPLETE must be gone: completion stops at doubled_v2
    assert pipe.completed() == ["src", "doubled_v2"]

    # the next resume recomputes ONLY the crashed stage, from fresh parquet
    calls3: list[str] = []
    stages3 = _counting_stages(calls3)
    fixed = [stages3[0], Stage("doubled_v2", stages3[1].fn), stages3[2]]
    out = CorpusPipeline(str(tmp_path), "run4", fixed).run(spark)
    assert calls3 == ["gated"]
    assert out.count() == 50


def test_submit_corpus_chain_cli_runs_and_resumes(spark, tmp_path, capsys):
    """The spark-submit chain entry point (tools/submit_corpus_chain.py)
    runs the standard crawl-to-tensors chain over the fixture crawl and
    fully resumes from markers on a second invocation."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import submit_corpus_chain as cli

    fixtures = os.path.dirname(__file__) + "/fixtures"
    argv = [
        "--crawl-dir", fixtures, "--work-dir", str(tmp_path), "--run-id", "t",
        "--block-tokens", "64", "--n-shards", "4", "--min-words", "2",
        "--local", "4",
    ]
    cli.main(argv)
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["resumed_past"] == []
    assert [s["stage"] for s in first["stages"]] == [
        "ingest_extract", "pii_scrub", "exact_dedup",
        "ppl_gate", "pack_contiguous", "epoch_shuffle",
    ]
    assert first["blocks"] >= 1

    cli.main(argv)
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(second["resumed_past"]) == 6
    assert second["blocks"] == first["blocks"]
