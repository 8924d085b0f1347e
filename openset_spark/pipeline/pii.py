"""PII detection and scrubbing — the redaction pass an LLM training
pipeline runs before anything else ships (emails, IPv4 addresses,
URLs, international-format phone numbers).

Patterns are deliberately restricted to the regex subset that means
THE SAME THING in Java regex (Spark's engine) and RE2 (DuckDB's):
no backreferences, no lookaround, plain classes/quantifiers/\\b —
so the DuckDB oracle replays the counts verbatim and the operator's
behavior is engine-portable by construction. The corpus testdata is
synthetic word soup with zero PII, so the registry oracle verifies
the cross-engine NO-FALSE-POSITIVE property end-to-end; the positive
semantics (what each pattern catches, scrub order, overlap rules)
are pinned by unit fixtures in tests/test_r9_ops.py.

Everything is built-in regexp expressions — JVM-side, codegen'd, one
scan, no Python in the hot path.

Relationship to ``cleaning.redact_pii``: that is the legacy cheap
column-level redaction inside clean_documents (email/IP/phone, no
URL — its output is pinned by the clean_documents oracle key and
must not drift). This module is the AUDIT layer on top: typed
counts, URL handling with the overlap-resolving scrub order, kinds=
selection, and the per-source report."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Scrub ORDER matters: URLs first (an email-shaped userinfo or an
# IPv4 host inside a URL belongs to the URL), then emails, then IPs,
# then phones. The dict is ordered accordingly.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "url": (r"https?://\S+", "<URL>"),
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # international format: +CC then 7+ digits with common separators
    "phone": (r"\+\d[\d ().-]{6,}\d", "<PHONE>"),
}


def pii_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII hit counts: (id, n_url, n_email, n_ipv4,
    n_phone, n_pii). Counts are on the RAW text (no scrub-order
    masking): a doc whose only URL embeds an email reports both —
    the auditing view wants every signal, the scrubber resolves
    overlaps."""
    cols = [F.col(id_col)]
    total = F.lit(0).cast("long")
    for name, (pat, _rep) in PII_PATTERNS.items():
        c = F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        cols.append(c.alias(f"n_{name}"))
        total = total + c
    cols.append(total.alias("n_pii"))
    return df.select(*cols)


def scrub_pii(
    df: DataFrame, text_col: str = "text", kinds: tuple[str, ...] = ()
) -> DataFrame:
    """Rewrite ``text_col`` with every PII span replaced by its
    typed placeholder, in the documented order (URL > email > IP >
    phone — an address inside an already-scrubbed URL is gone
    before the narrower pattern runs). ``kinds`` restricts which
    patterns apply (default: all)."""
    out = F.col(text_col)
    for name, (pat, rep) in PII_PATTERNS.items():
        if kinds and name not in kinds:
            continue
        out = F.regexp_replace(out, pat, rep)
    return df.withColumn(text_col, out)


def pii_source_report(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source PII audit: (group, n_docs, docs_with_pii, n_url,
    n_email, n_ipv4, n_phone) — the data-card table that decides
    which feeds need scrubbing before mixing. One scan, one
    map-side-combinable aggregate."""
    cols = [F.col(group_col), F.col(id_col)]
    total = F.lit(0).cast("long")
    for name, (pat, _rep) in PII_PATTERNS.items():
        c = F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        cols.append(c.alias(f"n_{name}"))
        total = total + c
    scored = df.select(*cols, total.alias("n_pii"))
    return scored.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("n_pii") > 0).cast("long")).alias("docs_with_pii"),
        *[
            F.sum(f"n_{name}").cast("long").alias(f"n_{name}")
            for name in PII_PATTERNS
        ],
    )
