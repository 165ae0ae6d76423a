"""PII detection and redaction over text columns — the scrubbing pass every
LLM training-data pipeline runs before anything else sees the text.

Pure JVM regex expressions (``regexp_count`` / ``regexp_replace``) — no
Python in the path, so the scan→scrub→write pipeline stays inside
whole-stage codegen and scales with the corpus like any other projection.

The regex dialect is the intersection of Java (Spark) and RE2 (DuckDB):
character classes, bounded repetition, literal anchors — no backreferences,
no lookaround, no ``\\b`` word boundaries (RE2 supports them but Java's
semantics differ at string edges). That keeps every pattern oracle-provable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Each pattern is valid and IDENTICAL in meaning for Java regex and RE2.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,4}"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

PATTERNS = {"email": EMAIL_RE, "phone": PHONE_RE, "ipv4": IPV4_RE}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind occurrence counts, one codegen'd regexp_count each."""
    t = _col(text)
    return {k: F.regexp_count(t, F.lit(p)) for k, p in PATTERNS.items()}


def redact(text: Column | str, token: str = "<PII>") -> Column:
    """Replace every PII span with ``token``; kinds applied in a fixed order
    (email, phone, ipv4) so overlapping matches resolve identically in the
    oracle. regexp_replace is global in both engines."""
    t = _col(text)
    for p in PATTERNS.values():
        t = F.regexp_replace(t, p, token)
    return t


def with_pii_stats(df, text_col: str = "text"):
    """Adds n_email / n_phone / n_ipv4 / clean_len columns — clean_len (the
    redacted length) proves the redaction byte-identical to the oracle's
    without shipping the redacted text through the compare."""
    counts = pii_counts(text_col)
    return df.select(
        "*",
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ipv4"].alias("n_ipv4"),
        F.length(redact(text_col)).alias("clean_len"),
    )
