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
    "scrub_pii",
    "pii_counts",
    "canonicalize_url",
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
