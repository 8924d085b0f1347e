"""Importance-resampling data selection (the DSIR shape, Xie et al.
2023): score every raw document by how target-like its hashed n-gram
profile is, then keep the highest-weight (or Gumbel-sampled) subset.
This is the public method behind "select pretraining data that looks
like Wikipedia/books" pipelines.

Features are hashed unigram+bigram counts in ``k`` buckets; the
target and raw corpora each induce a smoothed bucket distribution
(Laplace, +1/+k), and a document's log importance weight is the sum
of log(p_target/p_raw) over its gram buckets.

Spark-first shape: both corpus distributions are single hash
aggregates ending in ≤ k rows, broadcast to the scoring join; the
document side is the same one-explode n-gram pass every text
operator uses; nothing iterative, nothing driver-side. The bucket
hash is md5-prefix based (not xxhash64) deliberately: DuckDB computes
the identical value, so the whole scorer is oracle-checkable
end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openset_spark.functions.text import tokens


def _bucket(col: Column, k: int) -> Column:
    """Portable gram bucket: first 8 md5 hex digits as an integer,
    mod k. (`conv(substr(md5(g),1,8),16,10)` == DuckDB's
    `CAST(concat('0x', substr(md5(g),1,8)) AS UBIGINT)`.)"""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % k
    )


def _gram_buckets(df: DataFrame, k: int, text_col: str, *keep):
    """(…keep, bucket) — one row per unigram AND bigram instance."""
    toked = df.select(*keep, tokens(F.col(text_col)).alias("_toks"))
    uni = toked.select(*keep, F.explode("_toks").alias("g"))
    bi = toked.filter(F.size("_toks") >= 2).select(
        *keep,
        F.explode(
            F.expr(
                "transform(sequence(0, size(_toks)-2), "
                "i -> concat(element_at(_toks, i+1), ' ', "
                "element_at(_toks, i+2)))"
            )
        ).alias("g"),
    )
    return uni.unionByName(bi).select(*keep, _bucket(F.col("g"), k).alias("bucket"))


def _bucket_counts(df: DataFrame, k: int, text_col: str, prefix: str):
    """Bucket histogram (<= k rows) + its total. The histogram is
    localCheckpoint'd (r15): it is BOUNDED by k, and without the cut
    the ``total`` branch re-executes the whole md5-per-gram corpus
    pass (AQE does not reuse the exchange across the two branches —
    measured: the old plan ran FIVE gram passes for one
    importance_weights call, see plans/r15/dsir_weights_before.txt)."""
    counts = (
        _gram_buckets(df, k, text_col)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias(f"{prefix}c"))
        .localCheckpoint()
    )
    total = counts.agg(F.sum(f"{prefix}c").alias(f"{prefix}tot"))
    return counts, total


def importance_weights(
    docs: DataFrame,
    target: DataFrame,
    raw: DataFrame | None = None,
    k: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_grams, log_weight): per-document summed
    log(p_target(bucket)/p_raw(bucket)) with Laplace smoothing.
    ``raw`` defaults to ``docs`` (score against their own
    distribution, the common DSIR setup). Documents with no tokens
    produce the empty gram set and are excluded."""
    pc, ptot = _bucket_counts(target, k, text_col, "p")
    lr = F.log(
        (F.coalesce(F.col("pc"), F.lit(0)) + 1) / (F.col("ptot") + F.lit(k))
    ) - F.log(
        (F.coalesce(F.col("qc"), F.lit(0)) + 1) / (F.col("qtot") + F.lit(k))
    )
    if raw is not None:
        # explicit raw distribution: its counts need their own pass
        qc, qtot = _bucket_counts(raw, k, text_col, "q")
        dg = _gram_buckets(docs, k, text_col, F.col(id_col))
        scored = (
            dg.join(F.broadcast(pc), "bucket", "left")
            .join(F.broadcast(qc), "bucket", "left")
            .crossJoin(F.broadcast(ptot))
            .crossJoin(F.broadcast(qtot))
            .withColumn("_lr", lr)
        )
        return scored.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.sum("_lr"), 4).alias("log_weight"),
        )
    # raw defaults to docs: derive the raw bucket counts FROM the
    # scoring pass instead of scanning + hashing the corpus grams a
    # second time (r15; guide §2.4/§1.2 — remove passes). The
    # (id, bucket) count frame is bounded by |docs| * k rows (vs the
    # raw gram-instance stream) and localCheckpoint'd so the qc
    # branch and the scoring branch both read the materialization —
    # AQE does not reuse the exchange across plan branches
    # (measured), so without the cut each branch re-runs the
    # md5-per-gram pass. Net: 5 corpus-scale gram passes -> 2 (docs
    # once, target once). Summing cnt * lr per bucket replaces
    # adding lr once per gram instance — the same <=1e-13 relative
    # reassociation already accepted by the ROUND(4) contract (the
    # oracle's own instance sum runs in DuckDB's order); locked
    # green against the oracle at sf0.001/0.01/0.1.
    bc = (
        _gram_buckets(docs, k, text_col, F.col(id_col))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .localCheckpoint()
    )
    qc = bc.groupBy("bucket").agg(F.sum("_cnt").alias("qc"))
    qtot = qc.agg(F.sum("qc").alias("qtot"))
    scored = (
        bc.join(F.broadcast(pc), "bucket", "left")
        .join(F.broadcast(qc), "bucket", "left")
        .crossJoin(F.broadcast(ptot))
        .crossJoin(F.broadcast(qtot))
        .withColumn("_lr", lr)
    )
    return scored.groupBy(id_col).agg(
        F.sum("_cnt").alias("n_grams"),
        F.round(F.sum(F.col("_cnt") * F.col("_lr")), 4).alias("log_weight"),
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    n: int,
    k: int = 1024,
    gumbel_seed: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the ``n`` most target-like documents. With
    ``gumbel_seed`` set, selection is importance RESAMPLING instead
    of top-k: each doc's key is log_weight + a Gumbel draw from its
    own md5-based uniform (deterministic per (doc, seed), so the
    sample is reproducible on any cluster at any partitioning —
    the Gumbel-top-k trick samples ∝ exp(log_weight)). Ordering ties
    break on id."""
    w = importance_weights(docs, target, k=k, text_col=text_col, id_col=id_col)
    key = F.col("log_weight")
    if gumbel_seed is not None:
        u = (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("_", F.col(id_col), F.lit(gumbel_seed))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(1 << 32))
        )
        key = key + (-F.log(-F.log(u)))
    ranked = w.withColumn("_key", key)
    return (
        ranked.orderBy(F.col("_key").desc(), F.col(id_col).asc())
        .limit(n)
        .drop("_key")
    )
