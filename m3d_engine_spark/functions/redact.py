"""PII redaction — regex scrubbing with per-pattern hit counts.

Beyond-reference capability. Pre-training pipelines scrub obvious PII
(emails, phone numbers, IP addresses) before anything else sees the
text; auditability requires counting what was removed, per pattern,
per document.

Pure JVM ``regexp_replace`` + ``regexp_count`` chain — a zero-exchange
projection over the scan (pinned in tests/test_plans.py). Patterns are
RE2-compatible (no lookarounds, no backrefs) so the DuckDB oracle runs
the identical expressions via ``regexp_extract_all``.

Order matters: emails are scrubbed FIRST (an email's local part can
contain digit runs a phone pattern would otherwise bite into), then
IPs (dotted quads would pairwise match a phone pattern), then phones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)+"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d{1,3}[- ]\d{3}[- ]\d{4}\b"

# applied in this order; token is what replaces each match
PATTERNS: list[tuple[str, str, str]] = [
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("ips", IP_RE, "<IP>"),
    ("phones", PHONE_RE, "<PHONE>"),
]


def scrub_text(text: Column) -> Column:
    """``text`` with every PII pattern replaced by its token."""
    out = text
    for _, pattern, token in PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, scrubbed, n_emails, n_ips, n_phones) — the redacted text
    plus per-pattern hit counts. Counts are taken on the SAME
    intermediate the replacement ran on (email counts before any
    replacement, IP counts after email scrub, …), so counts and
    replacements can never disagree."""
    d = df.select(F.col(id_col), F.col(text_col).alias("_txt"))
    counts = []
    cur = F.col("_txt")
    for name, pattern, token in PATTERNS:
        counts.append(
            F.regexp_count(cur, F.lit(pattern)).cast("int").alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pattern, token)
    return d.select(F.col(id_col), cur.alias("scrubbed"), *counts)
