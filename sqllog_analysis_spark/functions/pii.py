"""PII detection/redaction and URL/domain extraction — pure column
expressions (JVM-side regex, whole-stage codegen; no Python).

Training corpora are scrubbed of emails / phone numbers / IP addresses
before the text reaches a model, and filtered against domain blocklists.
Both are narrow per-row projections — at 100 TB they cost one scan, no
shuffle — so the engine-level concern is (a) regexes that behave
identically across engines (Java regex here, RE2 in the DuckDB oracle:
the patterns below stay inside the common subset — no backrefs, no
lookaround) and (b) the blocklist join being a broadcast, never a
shuffle.

Pattern scope is deliberately conservative-deterministic (a real
deployment would swap in a vetted PII library via the same column slots):

- email: RFC-ish ``local@domain.tld``
- ipv4: four dotted 1-3 digit runs on word boundaries
- phone: ``+``-prefixed international-style digit runs (the unambiguous
  form; bare digit runs collide with ids/quantities and are left alone)
- url: ``http(s)://`` up to whitespace
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d[\d() -]{5,}\d"
URL_RE = r"https?://[^\s]+"
_DOMAIN_FROM_URL_RE = r"https?://([^/:\s]+)"


def _count(col: str | Column, pattern: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))).cast("long")


def email_count(col: str | Column = "text") -> Column:
    return _count(col, EMAIL_RE)


def ipv4_count(col: str | Column = "text") -> Column:
    return _count(col, IPV4_RE)


def phone_count(col: str | Column = "text") -> Column:
    return _count(col, PHONE_RE)


def scrub_pii(col: str | Column = "text") -> Column:
    """Redact emails → ``<EMAIL>``, IPv4s → ``<IP>``, phones → ``<PHONE>``.

    Replacement order matters and is fixed: emails first (their local
    part may contain digits a later pass could nibble), then IPs (dotted
    digit runs), then phones (the ``+``-anchored remainder).  The oracle
    SQL applies the same three ``regexp_replace(..., 'g')`` in the same
    order, so scrubbed text is hash-comparable across engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, IPV4_RE, "<IP>")
    return F.regexp_replace(c, PHONE_RE, "<PHONE>")


def extract_urls(col: str | Column = "text") -> Column:
    """All ``http(s)://…`` matches, in document order (may repeat)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(URL_RE), F.lit(0))


def url_domains(col: str | Column = "text") -> Column:
    """Distinct, sorted registrable-host parts of every URL in the text.

    Narrow: extract_urls → per-element regexp_extract → dedup/sort, all
    inside one projection.
    """
    return F.array_sort(
        F.array_distinct(
            F.transform(
                extract_urls(col),
                lambda u: F.regexp_extract(u, _DOMAIN_FROM_URL_RE, 1),
            )
        )
    )
