"""PII redaction for training-corpus curation.

Web-scale training pipelines scrub personally-identifying strings
(emails, IP addresses, long account/credit-card digit runs) before a
corpus is packed for training. The redaction here is a chain of
`regexp_replace` expressions — pure Catalyst, whole-stage-codegen'd,
zero UDFs, zero shuffles — so it composes with the scan at any scale:
a 100-TB corpus is scrubbed in one map-only pass with column pruning
and predicate pushdown intact.

The patterns deliberately stay inside the regex dialect shared by
Java's `Pattern` (Spark) and RE2 (DuckDB, the correctness oracle):
no back-references, no look-around. Replacement order matters and is
fixed: emails first (an email's host part could otherwise leave a
dotted-quad-like fragment), then IPv4, then long digit runs.

Reference parity: the reference engine (weso/shaclex) has no PII
stage — this module is part of the training-data-pipeline extension
requested by the build brief, alongside dedup/sampling/packing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Dialect-portable (Java Pattern == RE2 semantics for these):
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
LONG_DIGITS_RE = r"\d{9,}"

_REDACTIONS: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("number", LONG_DIGITS_RE, "<NUM>"),
]


def scrub_text(col: Column) -> Column:
    """Redact emails, IPv4 addresses and >=9-digit runs, in that
    order. A single chained expression — one codegen'd projection."""
    out = col
    for _, pat, marker in _REDACTIONS:
        out = F.regexp_replace(out, pat, marker)
    return out


def _count(col: Column, pat: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(f"({pat})"), 1))


def pii_scrub(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Per-document scrubbed text plus per-kind match counts
    (counted on the ORIGINAL text, before any replacement, so the
    counts are order-independent and auditable).

    Plan shape: scan -> one projection. No shuffle, no UDF; the
    only cost is the regex automata over the text bytes, which runs
    JVM-side inside whole-stage codegen.
    """
    c = F.col(text_col)
    return docs.select(
        F.col(id_col),
        scrub_text(c).alias("scrubbed"),
        _count(c, EMAIL_RE).alias("n_emails"),
        _count(c, IPV4_RE).alias("n_ips"),
        _count(c, LONG_DIGITS_RE).alias("n_numbers"),
    )
