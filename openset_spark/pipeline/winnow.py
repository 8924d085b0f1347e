"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 — the MOSS algorithm) and fingerprint-overlap matching.

Winnowing guarantees: any shared substring of at least w+k-1 tokens
between two documents is caught by at least one shared fingerprint,
while storing only ~2/(w+1) of all k-gram hashes. It is the classic
local-similarity / plagiarism primitive and complements the global
sketches already in pipeline/dedup.py (MinHash = whole-doc Jaccard,
SimHash = whole-doc cosine, substring_dup_pairs = fixed-stride exact
windows): winnowing gives POSITION-AWARE, guaranteed-coverage
fingerprints at a tunable density.

Portability: the k-gram hash is the md5-prefix integer used across
this repo (see pipeline/dsir.py::_bucket) so the DuckDB oracle
reproduces every selected fingerprint bit-for-bit. Rightmost-min tie
break (the paper's rule) is encoded arithmetically: minimizing
``h * 2^20 + (2^20-1 - pos)`` picks the smallest hash and, among
equal hashes, the largest position — pure integer math in both
engines (h < 2^32, pos < 2^20, product < 2^52 < 2^63).

Scale shape: everything before the final dedup is per-document
(narrow after one explode); the only wide ops are the window over
(doc, pos) — bounded by document length — and the distinct on
selected fingerprints. Match-finding joins on the fingerprint hash
with a document-frequency cap riding the SAME shuffle (the
boilerplate-hash guard from pipeline/dedup.py::substring_dup_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openset_spark.functions.text import shingles_from_tokens, tokens

# pos fits in 20 bits: winnowing positions index k-grams of a SINGLE
# document; 1M tokens/doc is far above any pretraining corpus policy
_POS_BITS = 20
_POS_CAP = 1 << _POS_BITS


def winnow_fingerprints(
    df: DataFrame,
    k: int = 4,
    w: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, kpos, khash) — the winnowed fingerprint set per document.

    k = k-gram size in TOKENS, w = winnowing window in k-grams.
    Documents shorter than k + w - 1 tokens (no full window) yield no
    fingerprints — the paper's definition; callers wanting short-doc
    coverage lower k/w or fall back to whole-doc hashing.
    """
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    grams = (
        toked.filter(F.size("_toks") >= k + w - 1)
        .select(
            id_col,
            (F.size("_toks") - (k - 1)).alias("_ng"),
            F.posexplode(shingles_from_tokens(F.col("_toks"), k)).alias(
                "_p0", "_g"
            ),
        )
        .select(
            id_col,
            (F.col("_p0") + 1).alias("pos"),
            F.conv(F.substring(F.md5("_g"), 1, 8), 16, 10)
            .cast("long")
            .alias("h32"),
            "_ng",
        )
    )
    comb = grams.select(
        id_col,
        "pos",
        (
            F.col("h32") * F.lit(_POS_CAP)
            + (F.lit(_POS_CAP - 1) - F.col("pos"))
        ).alias("_comb"),
        "_ng",
    )
    sel_w = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    )
    selected = (
        comb.withColumn("_sel", F.min("_comb").over(sel_w))
        # full windows only: the last w-1 positions start short windows
        .filter(F.col("pos") <= F.col("_ng") - (w - 1))
        .select(
            id_col,
            (F.lit(_POS_CAP - 1) - F.col("_sel") % F.lit(_POS_CAP))
            .cast("long")
            .alias("kpos"),
            F.expr(f"CAST(_sel DIV {_POS_CAP} AS BIGINT)").alias("khash"),
        )
        .distinct()
    )
    return selected


def winnow_matches(
    df: DataFrame,
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_hash_df: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_a, id_b, shared) — document pairs sharing >= ``min_shared``
    winnowed fingerprints (MOSS's match report, minus the positional
    merge step).

    Fingerprint hashes occurring in more than ``max_hash_df``
    documents are dropped BEFORE pairing — the same boilerplate guard
    as substring_dup_pairs: K documents sharing one boilerplate run
    would otherwise put K^2/2 pairs on a single join key.

    Shape: ONE groupBy on the hash — the doc set per hash gives both
    the df cap (array size) and the pairs (JVM-side nested transform,
    shared with dedup._bucket_pairs), so the winnowing pipeline runs
    exactly once. The earlier self-join form executed the full
    tokenize→explode→window pipeline once per side AND needed a
    separate count-window pass for the cap — the exact
    double-evaluation _bucket_pairs documents and avoids.
    """
    from openset_spark.pipeline.dedup import _pairs_expr

    fps = winnow_fingerprints(df, k, w, text_col, id_col).select(
        F.col(id_col), "khash"
    ).distinct()
    grouped = (
        fps.groupBy("khash")
        .agg(F.array_sort(F.collect_set(id_col)).alias("_ids"))
        .filter(
            (F.size("_ids") >= 2) & (F.size("_ids") <= max_hash_df)
        )
    )
    return (
        grouped.select(F.explode(_pairs_expr(F.col("_ids"))).alias("_p"))
        .groupBy(
            F.col("_p.id_a").alias("id_a"), F.col("_p.id_b").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
