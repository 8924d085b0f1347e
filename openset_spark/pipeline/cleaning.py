"""Text cleaning for training-data pipelines: PII redaction, markup
stripping, whitespace normalization, corpus-level n-gram counts.

All regexp/array built-ins — these run inside whole-stage codegen
over the full corpus. Patterns stick to syntax Java and RE2 share so
the DuckDB oracles verify the exact same semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openset_spark.functions.text import shingles_from_tokens, tokens

# deliberately simple, oracle-checkable patterns (production would
# layer smarter validators AFTER this cheap first pass)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
HTML_TAG_RE = r"<[^>]+>"


def redact_pii(
    text: Column,
    email: str = "<EMAIL>",
    phone: str = "<PHONE>",
    ip: str = "<IP>",
) -> Column:
    """Replace emails, phone-like runs and IPv4 addresses with tokens.
    Order matters: emails first (their digits would otherwise feed the
    phone pattern), then IPs, then phones."""
    out = F.regexp_replace(text, EMAIL_RE, email)
    out = F.regexp_replace(out, IPV4_RE, ip)
    return F.regexp_replace(out, PHONE_RE, phone)


def strip_markup(text: Column) -> Column:
    """Drop HTML/XML tags and collapse the leftover whitespace."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(text, HTML_TAG_RE, " "), r"\s+", " ")
    )


def clean_documents(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """markup-strip + PII-redact in one projection."""
    return df.withColumn(out_col, redact_pii(strip_markup(F.col(text_col))))


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(ngram, occurrences, docs) the k most frequent word n-grams in
    the corpus — explode + one hash aggregate; the global top-k is a
    TakeOrderedAndProject (per-partition top-k merged at the driver,
    never a full sort)."""
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    grams = toked.select(
        F.col(id_col),
        F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("ngram"),
    )
    return (
        grams.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct(id_col).alias("docs"),
        )
        .orderBy(F.desc("occurrences"), F.asc("ngram"))
        .limit(k)
    )
