r"""Text normalization and PII-pattern redaction (JVM-side regex chains).

The cleanup pass an LLM-training-data pipeline runs before dedup and
quality scoring: strip control characters, collapse whitespace, and
mask personally-identifiable patterns (emails, URLs, phone numbers,
long ID-like digit runs).

Everything here is `regexp_replace` / `regexp_extract_all` on built-in
functions — whole-stage-codegen'd, no UDFs, no shuffle (pure per-row
projection, so it scales as a map over the corpus scan at 100 TB).

Pattern notes: every regex below is restricted to syntax with identical
semantics in Java regex (Spark) and RE2 (DuckDB oracle): character
classes, bounded repetition, alternation, `\b`/`\d`/`\s`. POSIX
`[[:cntrl:]]` == Java `\p{Cntrl}` (both = ASCII 0x00-0x1F + 0x7F).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters: URLs first (they may contain '@' or digit runs), then
# emails, then phones, then bare long digit runs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[A-Za-z0-9./_%-]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3,4}-\d{4}\b", "<PHONE>"),
    ("idnum", r"\b\d{9,}\b", "<NUM>"),
]

_CNTRL = r"[\x00-\x1f\x7f]"


def normalize_text(c: Column | str) -> Column:
    """Control chars → space, whitespace runs → one space, trim.

    (Unicode NFC normalization is out of scope: Spark has no built-in
    normalizer and a Python UDF would put a per-row interpreter hop in
    the hottest path of the pipeline; upstream ingest should normalize.)
    """
    if isinstance(c, str):
        c = F.col(c)
    c = F.regexp_replace(c, _CNTRL, " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def redact_pii(c: Column | str) -> Column:
    """Apply every PII mask in declaration order."""
    if isinstance(c, str):
        c = F.col(c)
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(c: Column | str) -> list[Column]:
    """Per-pattern match counts (aliased ``n_<kind>``), counted on the
    same progressively-redacted text the masks see — so an email inside
    a URL is counted once as URL, never double-counted as email."""
    if isinstance(c, str):
        c = F.col(c)
    out = []
    for kind, pat, repl in PII_PATTERNS:
        out.append(F.size(F.regexp_extract_all(c, F.lit(pat), 0)).alias(f"n_{kind}"))
        c = F.regexp_replace(c, pat, repl)
    return out
