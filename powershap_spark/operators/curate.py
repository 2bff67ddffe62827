"""Fused corpus-curation pipeline: PII scrub -> language/quality gate ->
exact dedup -> deterministic sample, composed as ONE declarative plan.

Why a fused operator exists alongside the individual stages
(``scrub.scrub_pii``, ``text.lang_id`` / ``text.quality_score``,
``dedup.exact_dedup``, ``dedup.deterministic_sample``): a real ingestion
pipeline runs all of them on every shard, and the naive composition is
shaped wrong at 100 TB. ``exact_dedup`` (dedup.py:95) is a
groupBy-then-join-back: it reads its input twice and shuffles twice, which
is the right call when dedup is the *only* stage (the join-back avoids
dragging wide payload columns through the aggregate) but wasteful in the
middle of a chain whose upstream is a non-trivial projection — the regex
scrub + scoring would be recomputed per scan or force a full materialized
cache of the corpus.

The fused plan instead:

  scan (pruned to id + text)
    -> ONE projection (scrub rewrites + PII counts + lang vote + quality
       score — all built-in regex/array expressions, whole-stage codegen)
    -> filter (lang allow-list + quality floor; drops rows BEFORE the
       shuffle, so junk never pays network)
    -> ONE hash shuffle: groupBy(128-bit hash pair of the normalized
       text) . agg(min_by(row, id)) — the full surviving row rides the
       aggregation buffer, so there is no join-back and no second scan;
       partial (map-side) min_by keeps per-key network cost at one row
       per distinct text per mapper. min_by over a struct is not
       hash-aggregable (non-primitive buffer), so Spark plans a
       SortAggregate — grouping on the hash PAIR instead of the text
       means that sort orders 16-byte keys, not documents (plan-asserted:
       the Sort keys are exactly the two hash columns). Collisions need
       BOTH independent xxhash64 seeds to collide: P ~ n^2 / 2^129 —
       ~4e-19 at 10^10 docs, strictly stronger than the 64-bit content
       hashes production dedup pipelines already trust.
    -> hash-membership sample filter (pure function of (id, seed), no RNG
       state, stable across partitionings/reruns/cluster sizes)

Total: 1 scan, 1 exchange, 0 joins, 0 Python UDFs, sorts only on the
16-byte group key (plan-asserted in tests/test_curate.py). Equivalence
with the chained individual stages is also pytest-pinned, so the fusion
is an optimization, never a semantic fork.

Known cost, accepted deliberately: Catalyst pushes the gate's Filter
below the scoring Project, so the formatted plan shows the scrub-regex
chain inlined into both the filter condition and the projection.
Whole-stage codegen's subexpression elimination dedupes repeats WITHIN
each operator, so the chain runs at most twice per input row — still
strictly cheaper than the chained composition, which recomputes it on a
SECOND full scan (join-back dedup) on top of the same filter/project
duplication.

Reference parity note: the reference engine (powershap) has no corpus
operators — this module is part of the mandated beyond-reference
training-data-pipeline surface (SURVEY.md "LLM-data-pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import deterministic_sample, normalize_text
from .scrub import scrub_pii
from .text import lang_id, quality_score

__all__ = ["curate_corpus"]


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    langs: tuple[str, ...] | None = ("en",),
    min_quality: float = 0.0,
    sample_fraction: float = 1.0,
    seed: int = 7,
    hash_family: str = "xxhash",
    scrub: bool = True,
) -> DataFrame:
    """Curate a document table in one scan + one shuffle.

    Output columns: ``id_col``, ``pred_lang``, ``quality``, the scrubbed
    text as ``text_scrubbed`` and (when ``scrub=True``) the
    n_url/n_email/n_ipv4/n_phone redaction counts.

    - ``langs``: keep rows whose stopword-vote language is in the list
      (None/empty = keep all languages, including 'und').
    - ``min_quality``: floor on the [0,1] heuristic quality score.
    - Dedup keeps the MIN ``id_col`` per normalized scrubbed text —
      identical semantics to ``exact_dedup(keep="min")`` (modulo a
      ~2^-129-per-pair double-hash collision, see module docstring),
      different (single-pass) physical shape.
    - ``sample_fraction`` < 1 applies ``deterministic_sample`` on
      ``id_col`` (``hash_family="poly"`` for oracle-reproducible
      membership, "xxhash" as the scale path).

    All scoring/filtering runs on the SCRUBBED text: redaction placeholders
    are what a downstream trainer would actually see, and scoring the
    post-redaction form keeps a document's fate independent of the exact
    PII bytes it carried.
    """
    if scrub:
        base = scrub_pii(df, text_col, "text_scrubbed")
        count_cols = ["n_url", "n_email", "n_ipv4", "n_phone"]
    else:
        base = df.withColumn("text_scrubbed", F.col(text_col))
        count_cols = []
    t = F.col("text_scrubbed")
    enriched = base.withColumns(
        {"pred_lang": lang_id(t), "quality": quality_score(t)}
    )

    cond = F.col("quality") >= F.lit(float(min_quality))
    if langs:
        cond = F.col("pred_lang").isin(list(langs)) & cond
    filtered = enriched.filter(cond)

    out_cols = [id_col, "pred_lang", "quality", *count_cols, "text_scrubbed"]
    row = F.struct(*[F.col(c) for c in out_cols])
    norm = normalize_text(t)
    deduped = (
        filtered.groupBy(
            F.xxhash64(norm, F.lit(1)).alias("__h1"),
            F.xxhash64(norm, F.lit(2)).alias("__h2"),
        )
        .agg(F.min_by(row, F.col(id_col)).alias("__row"))
        .select("__row.*")
    )

    if sample_fraction < 1.0:
        deduped = deterministic_sample(
            deduped, id_col, sample_fraction, seed=seed, hash_family=hash_family
        )
    return deduped
