"""PII detection and redaction over text columns — the scrubbing pass a
training-data pipeline runs before anything else ships (emails, phone
numbers, IP addresses, SSN-shaped ids), in the spirit of the public
C4/Dolma/FineWeb pipelines' regex-based PII stage.

Pure `regexp_count` / `regexp_replace` built-ins: per-row O(len) JVM
work inside whole-stage codegen — scan-parallel, shuffle-free, and the
detection counts are map-side columns any downstream filter can push
down. Patterns are deliberately ASCII/RE2-conservative so the same
regex text runs identically under Java, DuckDB and Python `re` (the
cross-engine property tests/test_pii.py pins). Recall/precision match
the public pipelines' regex stage, not an NER model — that would be a
Pandas-UDF integration point, out of scope by design.

Replacement order matters and is fixed: EMAIL → IP → SSN → PHONE.
Email first is load-bearing — a domain embedding a dotted quad
(user@mail.123.456.78.90.example.com) must be absorbed whole, not have
an <IP> punched into it (pinned in tests/test_pii.py). IP/SSN before
phone keeps the digit-group shapes from racing: the loose phone pattern
can legitimately match 3-3-4 dotted runs that are NOT valid quads
(123.456.7890), and must only see them after the stricter shapes have
claimed theirs. Tests pin the composition, not just the parts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# local@domain.tld — conservative: no quoted locals, no unicode domains
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# dotted-quad IPv4; \b so version strings like 1.2.3.4.5 still match a
# leading quad (the public pipelines accept that over-trigger)
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
# US-shaped phone: optional +1, separators space/dot/dash, optional parens
PHONE_RE = r"(?:\+?1[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b"
# 3-2-4 digit groups with dashes (SSN shape)
SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"

# applied in this order — see module docstring
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("ssn", SSN_RE, "<SSN>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def pii_counts(col) -> dict[str, Column]:
    """Per-kind match counts: {'email': Column, ...} — detection only."""
    col = F.col(col) if isinstance(col, str) else col
    return {
        kind: F.regexp_count(col, F.lit(pat)) for kind, pat, _ in PII_PATTERNS
    }


def scrub_text(col) -> Column:
    """Redact all PII kinds in the fixed order; later patterns run over
    the earlier patterns' output, so e.g. a phone never half-matches
    inside an already-redacted <IP> token."""
    col = F.col(col) if isinstance(col, str) else col
    for _, pat, token in PII_PATTERNS:
        col = F.regexp_replace(col, pat, token)
    return col


def add_pii_columns(df, text_col: str = "text", scrubbed_col: str = "scrubbed"):
    """Detection counts + redacted text + total, as columns:
    ``n_pii_email / n_pii_ip / n_pii_ssn / n_pii_phone / n_pii /
    <scrubbed_col>``. Counts are computed on the ORIGINAL text (the
    audit signal); the scrub is the composed rewrite."""
    counts = pii_counts(text_col)
    for kind, c in counts.items():
        df = df.withColumn(f"n_pii_{kind}", c)
    total = None
    for kind in counts:
        col = F.col(f"n_pii_{kind}")
        total = col if total is None else total + col
    return df.withColumn("n_pii", total).withColumn(
        scrubbed_col, scrub_text(text_col)
    )
