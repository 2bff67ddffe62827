"""PII scrubbing for training-data pipelines: redact emails, URLs, IPv4
addresses, and phone-shaped digit runs from a text column, with per-category
match counts for corpus auditing.

Pure ``regexp_replace`` / ``regexp_count`` expressions — whole-stage
codegen, no Python, trivially parallel (per-row, no shuffle). The regexes
deliberately use only syntax shared by Java's regex engine and RE2
(no lookaround), so the DuckDB oracle replicates matches exactly.

Scale shape: a 100-TB scrub is a single mapper pass; the only design
decision that matters is NOT materializing intermediate scrubbed copies —
the four rewrites compose into one projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "URL_SCHEME_HOST",
    "URL_CANON_STEPS",
    "HTML_BLOCK_DROP",
    "HTML_NEWLINE_TAGS",
    "HTML_ANY_TAG",
    "HTML_ENTITIES",
    "scrub_pii",
    "pii_counts",
    "canonicalize_url",
    "extract_html_text",
]

# URL canonicalization rewrite chain, applied in order after the
# scheme/host lowering. Replacement strings use Java's $N group syntax;
# the DuckDB oracle translates $N -> \N (RE2) over the SAME literals.
# No lookaround anywhere (RE2 has none).
URL_SCHEME_HOST = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
URL_CANON_STEPS = [
    (r"#.*$", ""),  # fragment
    # tracking params (leading '?' or '&' consumed with the param)
    (r"[?&](utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=[^&#]*", ""),
    (r"\?&", "?"),  # '?utm=..&q=..' -> '?&q' -> '?q'
    (r"^([^?&]*)&", r"$1?"),  # first '&' that lost its '?' head
    (r"/\?", "?"),  # path/?q -> path?q
    (r"\?$", ""),  # empty query
    # default ports, tied to their scheme (http:443 / https:80 are real
    # non-default ports and must survive); capture the tail instead of a
    # lookahead (an unmatched optional group substitutes "")
    (r"^(http://[^/?:]+):80([/?].*)?$", r"$1$2"),
    (r"^(https://[^/?:]+):443([/?].*)?$", r"$1$2"),
    (r"(://[^/?#]+/.+?)/$", r"$1"),  # trailing slash on non-root path
]

# HTML -> text extraction rewrite chain (CCNet/RefinedWeb-style
# boilerplate stripping, heuristic not DOM-aware). Same Java/RE2-shared
# syntax subset as URL_CANON_STEPS so the DuckDB oracle replicates the
# extraction byte-for-byte. Applied in list order BEFORE the newline/tag
# passes: non-content blocks (script/style/comments/head) vanish whole.
HTML_BLOCK_DROP = [
    r"(?is)<script\b.*?</script\s*>",
    r"(?is)<style\b.*?</style\s*>",
    r"(?s)<!--.*?-->",
    r"(?is)<head\b.*?</head\s*>",
]
# Block-level boundaries become newlines so line-level filtering (and any
# downstream line dedup, dedup_lines) sees the document's visual structure.
HTML_NEWLINE_TAGS = (
    r"(?i)<(?:br|hr)\s*/?\s*>"
    r"|</(?:p|div|li|tr|h[1-6]|ul|ol|table|blockquote|pre|title"
    r"|section|article|header|footer|nav|aside)\s*>"
)
HTML_ANY_TAG = r"(?s)<[^>]*>"
# Fixed named-entity set, plain string replaces (identical semantics in
# Spark `replace` and DuckDB `replace`); `&amp;` is decoded LAST so
# `&amp;lt;` correctly yields the literal text `&lt;`, not `<`.
HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def extract_html_text(col, min_words: int = 3) -> "F.Column":
    """Visible text from an HTML payload — the step between WARC ingest
    (``sources/warc.py``) and the text pipeline (scrub -> lang_id ->
    quality -> dedup), i.e. the CCNet/RefinedWeb extraction stage:

    - script/style/comment/head blocks dropped whole;
    - block-level tag boundaries -> newlines, remaining tags -> spaces;
    - the six universal named entities decoded (``&amp;`` last);
    - per line: whitespace collapsed + trimmed, then short boilerplate
      lines (fewer than ``min_words`` whitespace-separated words — nav
      items, button labels, table cells) dropped, RefinedWeb-style.

    Pure built-in expressions (regexp_replace / replace / split /
    transform / filter / array_join): whole-stage codegen, per-row, no
    shuffle — a 100-TB extraction is a single mapper pass fused with the
    WARC record parse it follows. Java/RE2-shared regex subset only (no
    lookaround, no backrefs; ``\\s`` divergence on vertical-tab is the
    one documented gap), so the DuckDB oracle mirrors the chain exactly.
    Deliberately heuristic: a DOM/readability extractor plugs in behind
    the same column contract if fidelity beats throughput."""
    c = F.col(col) if isinstance(col, str) else col
    for pat in HTML_BLOCK_DROP:
        c = F.regexp_replace(c, pat, " ")
    c = F.regexp_replace(c, HTML_NEWLINE_TAGS, "\n")
    c = F.regexp_replace(c, HTML_ANY_TAG, " ")
    for ent, ch in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    lines = F.transform(
        F.split(c, "\n"),
        lambda ln: F.trim(F.regexp_replace(ln, r"\s+", " ")),
    )
    kept = F.filter(
        lines,
        lambda ln: (F.length(ln) > 0)
        & (F.size(F.split(ln, " ")) >= F.lit(min_words)),
    )
    return F.array_join(kept, "\n")


# Ordered: URLs first (an email-shaped substring inside a URL should be
# redacted as part of the URL, not leave a dangling "<EMAIL>" mid-token).
PII_PATTERNS = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def pii_counts(col) -> dict:
    """Per-category match-count columns (pre-redaction text). Counts are
    computed on the ORIGINAL text, before any rewrite, so categories don't
    consume each other's matches."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        f"n_{name}": F.regexp_count(c, F.lit(pat)).cast("int")
        for name, pat, _ in PII_PATTERNS
    }


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_scrubbed"
) -> DataFrame:
    """Append ``out_col`` (redacted text) + n_url/n_email/n_ipv4/n_phone
    count columns. One projection; rewrites applied in PII_PATTERNS order."""
    scrubbed = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.withColumns({**pii_counts(text_col), out_col: scrubbed})


def canonicalize_url(col) -> "F.Column":
    """Canonical URL form for web-corpus dedup / grouping:

    - scheme and host lowercased (path case is significant, left alone);
    - fragment (#...) stripped;
    - tracking params (utm_*, fbclid, gclid, ref) stripped, '?'/'&'
      artifacts cleaned up, empty query dropped;
    - default ports (:80 http, :443 https) dropped;
    - trailing slash on a non-root path dropped.

    Pure regex rewrites in the Java/RE2-shared syntax subset, so the
    DuckDB oracle replicates the canonical form exactly. One projection;
    the canonical string is the join/dedup key a crawl pipeline groups on
    (same-page URLs differing only in tracking params collapse)."""
    c = F.col(col) if isinstance(col, str) else col
    # lowercase scheme://host, leave path+query untouched (no-scheme
    # strings pass through: the extract yields "" and the tail rewrite
    # matches nothing)
    u = F.concat(
        F.lower(F.regexp_extract(c, URL_SCHEME_HOST, 1)),
        F.regexp_replace(c, URL_SCHEME_HOST, ""),
    )
    for pat, repl in URL_CANON_STEPS:
        u = F.regexp_replace(u, pat, repl)
    return u
