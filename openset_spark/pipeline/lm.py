"""N-gram language-model quality scoring (the CCNet-style filter).

Public pretraining pipelines (CCNet, Gopher, Llama) keep or bucket
documents by the perplexity of a small language model trained on a
trusted corpus — fluent text scores low, gibberish and boilerplate
score high. A bigram model with Laplace smoothing captures the shape
of that filter with pure relational algebra, so the whole scorer is
two aggregates and two joins — no model runtime, no UDF:

* TRAIN: bigram counts C(w1,w2) and unigram counts C(w1) over the
  trusted corpus (two hash aggregates; ``min_count`` prunes hapax
  bigrams to bound the model table — smoothing treats them as unseen).
* SCORE: each document's bigrams left-join the model;
  log p(w2|w1) = ln((C12 + 1) / (C1 + V)) with V the training
  vocabulary size (Laplace); unseen contexts fall back to ln(1/V).
  Per-doc average log-prob and perplexity = exp(-avg).

Scale posture: the model is a (w1, w2, count) table joined on its
natural key — a plain shuffle join that AQE broadcasts whenever the
trained model is small; the document side is the same single n-gram
explode every other text operator uses. Nothing is collected to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openset_spark.functions.text import tokens


def _bigrams(df: DataFrame, text_col: str, *keep):
    toked = df.select(*keep, tokens(F.col(text_col)).alias("_toks")).filter(
        F.size("_toks") >= 2
    )
    pair = F.expr(
        "transform(sequence(0, size(_toks)-2), "
        "i -> struct(element_at(_toks, i+1) as w1, "
        "element_at(_toks, i+2) as w2))"
    )
    return toked.select(*keep, F.explode(pair).alias("_p")).select(
        *keep, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )


def train_bigram_lm(
    corpus: DataFrame, text_col: str = "text", min_count: int = 1
) -> dict:
    """The model as three lazy frames: bigram counts, context
    (unigram) counts, and the 1-row vocabulary size."""
    bg = (
        _bigrams(corpus, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= min_count)
    )
    toked = corpus.select(
        F.explode(tokens(F.col(text_col))).alias("w")
    )
    uni = toked.groupBy(F.col("w").alias("w1")).agg(
        F.count(F.lit(1)).alias("c1")
    )
    vocab = toked.agg(F.countDistinct("w").alias("v"))
    return {"bigrams": bg, "unigrams": uni, "vocab": vocab}


def lm_perplexity(
    docs: DataFrame,
    lm_corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """Score ``docs`` against a bigram LM trained on ``lm_corpus``:
    (doc_id, n_bigrams, avg_logp, perplexity). Documents with fewer
    than 2 tokens have no bigrams and are excluded (no evidence
    either way — the quality pipeline passes them to length filters
    instead)."""
    lm = train_bigram_lm(lm_corpus, text_col, min_count)
    doc_bg = _bigrams(docs, text_col, F.col(id_col))
    scored = (
        doc_bg.join(lm["bigrams"], ["w1", "w2"], "left")
        .join(lm["unigrams"], "w1", "left")
        .crossJoin(F.broadcast(lm["vocab"]))
        .withColumn(
            "_logp",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + 1)
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
            ),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("_logp").alias("_avg"),
    )
    return agg.select(
        id_col,
        "n_bigrams",
        F.round("_avg", 4).alias("avg_logp"),
        F.round(F.exp(-F.col("_avg")), 2).alias("perplexity"),
    )
