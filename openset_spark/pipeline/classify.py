"""Reference-vs-crawl quality classification — the CCNet / DCLM /
fastText-filter workhorse: train a cheap linear text classifier on
"known good" (reference) vs "everything else" (crawl) shards, score
the whole corpus, keep the top of the distribution. The production
systems use fastText; the statistically equivalent pure-relational
form is binary multinomial Naive Bayes over token counts, whose
log-odds weights are closed-form count ratios — so training IS two
hash aggregates and scoring IS a join+sum. No model runtime, no UDF,
nothing leaves the JVM.

Scale shape (same posture as pipeline/lm.py, which shares the
tokenizer):

* training: one token-count aggregate per class over the labeled
  shards (map-side combinable); the model is a bounded (token,
  weight) frame — vocabulary-sized, AQE broadcasts it when small;
* scoring: explode doc tokens once, LEFT join the weight frame
  (unseen tokens take the closed-form OOV weight), one per-doc sum.
  At 100 TB the explode+join rides the documents' natural
  partitioning; there is no global state beyond the model frame.

Determinism: all counts are exact integers; weights are ln() of
integer ratios computed identically by Spark and DuckDB (the
lm_perplexity precedent — avg_logp has been cross-engine green since
r7); the per-doc score ships ROUND(·, 4) like every float the
oracle layer compares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openset_spark.functions.text import tokens


def _class_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(token, c) exact token-occurrence counts for one class."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def nb_quality_model(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
) -> tuple[DataFrame, float]:
    """Binary multinomial NB with Laplace smoothing, as a (token,
    weight) frame plus the out-of-vocabulary weight:

        weight(w) = ln((c_pos(w)+1)/(N_pos+V)) - ln((c_neg(w)+1)/(N_neg+V))
        oov       = ln(N_neg+V) - ln(N_pos+V)   (both counts 0)

    V counts distinct tokens across BOTH classes, so a token seen
    only in one class still gets a finite (and strongly signed)
    weight. The three scalars (N_pos, N_neg, V) come from one tiny
    collect of pre-aggregated counts — never a row collect."""
    cp = _class_counts(pos, text_col)
    cn = _class_counts(neg, text_col)
    joined = cp.withColumnRenamed("c", "c_pos").join(
        cn.withColumnRenamed("c", "c_neg"), "token", "full"
    ).select(
        "token",
        F.coalesce("c_pos", F.lit(0)).alias("c_pos"),
        F.coalesce("c_neg", F.lit(0)).alias("c_neg"),
    )
    totals = joined.agg(
        F.sum("c_pos").alias("np"),
        F.sum("c_neg").alias("nn"),
        F.count(F.lit(1)).alias("v"),
    ).first()
    n_pos, n_neg, v = int(totals.np), int(totals.nn), int(totals.v)
    weights = joined.select(
        "token",
        (
            F.log((F.col("c_pos") + 1) / F.lit(float(n_pos + v)))
            - F.log((F.col("c_neg") + 1) / F.lit(float(n_neg + v)))
        ).alias("weight"),
    )
    import math

    oov = math.log(n_neg + v) - math.log(n_pos + v)
    return weights, oov


def nb_quality_scores(
    docs: DataFrame,
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, score) for every doc with >= 1 token: the NB
    log-odds sum of its tokens under the pos-vs-neg model (positive
    = reference-like). The class prior is a per-corpus constant that
    shifts every score equally — thresholding happens downstream, so
    it is deliberately not baked in."""
    weights, oov = nb_quality_model(pos, neg, text_col)
    toked = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "")
    scored = toked.join(weights, "token", "left").select(
        id_col,
        F.coalesce("weight", F.lit(float(oov))).alias("_w"),
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum("_w"), 4).alias("score"),
    )


def quality_classifier_keep(
    docs: DataFrame,
    pos: DataFrame,
    neg: DataFrame,
    keep_fraction: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The end-to-end filter: score every doc and keep the best
    ``keep_fraction`` by (score desc, id asc) — rank via the
    distributed prefix sum (range partitions + broadcast offsets;
    epoch_shuffle's shape), never a global single-partition window."""
    from openset_spark.pipeline.sampling import distributed_cumsum

    scored = nb_quality_scores(docs, pos, neg, text_col, id_col)
    total = scored.count()
    n_keep = int(total * keep_fraction)
    ranked = distributed_cumsum(
        scored.withColumn("_one", F.lit(1)),
        [F.desc("score"), F.asc(id_col)],
        "_one",
    )
    return ranked.filter(F.col("_cum") <= n_keep).select(
        id_col, "n_tokens", "score"
    )
