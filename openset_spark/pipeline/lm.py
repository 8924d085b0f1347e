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
    """The model as three frames: bigram counts, context (unigram)
    counts (both eagerly checkpointed), and the 1-row vocabulary
    size derived from the unigram table."""
    # r15: the model frames are the natural materialization point
    # (train once, score many — the kneser_ney twin already
    # checkpoints its bigram table). The cuts mean each training
    # pass runs exactly once per execution, and the vocabulary size
    # is COUNT(*) of the unigram table (same integer as
    # countDistinct over the token stream) instead of a third full
    # corpus pass: 3 training scans -> 2.
    bg = (
        _bigrams(corpus, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= min_count)
        .localCheckpoint()
    )
    uni = (
        corpus.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy(F.col("w").alias("w1"))
        .agg(F.count(F.lit(1)).alias("c1"))
        .localCheckpoint()
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    return {"bigrams": bg, "unigrams": uni, "vocab": vocab}


def _scored_bigrams(
    docs: DataFrame, lm: dict, text_col: str, id_col: str
) -> DataFrame:
    """Per-instance (id, w1, w2, _logp) rows of ``docs`` under a
    trained Laplace bigram model — the shared scoring frame of
    lm_perplexity and mink_prob (identical joins, so their logps
    are the same IEEE doubles)."""
    doc_bg = _bigrams(docs, text_col, F.col(id_col))
    return (
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
    scored = _scored_bigrams(docs, lm, text_col, id_col)
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


def train_kneser_ney_lm(
    corpus: DataFrame, text_col: str = "text", min_count: int = 1
) -> dict:
    """Interpolated Kneser-Ney bigram statistics (Kneser & Ney 1995;
    Chen & Goodman 1999 eq. 4.24 shape) as four lazy frames, every
    one a groupBy OF the single bigram-count aggregate:

    * ``bigrams``  — (w1, w2, c12)
    * ``contexts`` — (w1, c1=SUM c12, n1fw=#distinct followers);
      c1 counts w1 as a CONTEXT (non-final positions), the KN
      denominator, not the raw unigram count
    * ``cont``     — (w2, n1bw=#distinct predecessors), the
      continuation counts that make KN KN: "how many contexts has
      this word completed", not "how often has it occurred"
    * ``totals``   — 1 row: n1all=#bigram types, v=#distinct w2
      types (the continuation-smoothing denominator)

    The bigram frame is checkpointed lazily (the collocations rule:
    one frame feeding 3+ aggregates is materialized once)."""
    bg = (
        _bigrams(corpus, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= min_count)
        .localCheckpoint()
    )
    ctx = bg.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1fw")
    )
    cont = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("n1bw"))
    totals = bg.agg(
        F.count(F.lit(1)).alias("n1all"),
        F.countDistinct("w2").alias("v"),
    )
    return {"bigrams": bg, "contexts": ctx, "cont": cont, "totals": totals}


def kneser_ney_score(
    docs: DataFrame,
    lm_corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    min_count: int = 1,
) -> DataFrame:
    """Score ``docs`` with an interpolated Kneser-Ney bigram model
    trained on ``lm_corpus``: (doc_id, n_bigrams, avg_logp_kn).

    P(w2|w1) for a seen context interpolates the discounted ML
    estimate with the continuation distribution::

        P = (max(c12 - D, 0) + D * n1fw * Pc(w2)) / c1

    an unseen context backs off to Pc directly. Pc is the
    continuation probability with add-one smoothing over bigram
    TYPES — ``(n1bw + 1) / (n1all + v)`` — so out-of-vocabulary
    words keep a nonzero floor (no ln(0)) and the whole scorer
    stays a pure closed-form the SQL oracle replays term for term.
    Same float posture as ``lm_perplexity``: integer counts until
    the final expression, ROUND(avg, 4), no exp() in the frame."""
    lm = train_kneser_ney_lm(lm_corpus, text_col, min_count)
    d = F.lit(float(discount))
    doc_bg = _bigrams(docs, text_col, F.col(id_col))
    pc = (F.coalesce(F.col("n1bw"), F.lit(0)) + 1) / (
        F.col("n1all") + F.col("v")
    )
    p_seen = (
        F.greatest(F.coalesce(F.col("c12"), F.lit(0)) - d, F.lit(0.0))
        + d * F.col("n1fw") * pc
    ) / F.col("c1")
    scored = (
        doc_bg.join(lm["bigrams"], ["w1", "w2"], "left")
        .join(lm["contexts"], "w1", "left")
        .join(lm["cont"], "w2", "left")
        .crossJoin(F.broadcast(lm["totals"]))
        .withColumn(
            "_logp",
            F.log(F.when(F.col("c1").isNotNull(), p_seen).otherwise(pc)),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("_logp").alias("_avg"),
    )
    return agg.select(
        id_col, "n_bigrams", F.round("_avg", 4).alias("avg_logp_kn")
    )


def perplexity_buckets(
    docs: DataFrame,
    lm_corpus: DataFrame,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """CCNet-style head/middle/tail corpus partition: score every
    document against the trusted-corpus bigram LM and split the
    ranking into ``n_buckets`` equal tiles — the standard quality
    stratification that downstream mixtures sample from (CCNet keeps
    "head", samples "middle", drops "tail").

    Determinism across engines: docs are ranked by the ROUNDED
    avg_logp (4 dp — the cross-engine-stable key lm_perplexity
    already proves) descending with doc_id as the total-order tie
    break, so the tile boundaries are engine-exact.

    Scale shape: NO global window. The rank is a distributed prefix
    sum of unit weights (range partitions -> per-partition local
    windows -> broadcast offsets — the token_budget_select
    decomposition, proved exact by that operator's oracle), and the
    tile is the closed-form NTILE assignment computed from (rank,
    total): with N rows, k tiles, q = N div k, r = N mod k, the
    first r tiles hold q+1 rows —

        tile = 1 + (rank-1) div (q+1)            if rank <= r*(q+1)
               1 + r + (rank-1-r*(q+1)) div q    otherwise

    which is SQL NTILE's exact distribution row for row (note the
    simpler floor((rank-1)*k/N) is NOT: at N=10,k=4 it deals sizes
    3,2,3,2 vs NTILE's 3,3,2,2). The scored frame is checkpointed
    once so the LM-scoring subtree isn't re-executed by the
    range-boundary sampling or the total-count aggregate.
    Output: (doc_id, n_bigrams, avg_logp, bucket) with bucket in
    head/middle/tail (or tile_<i> beyond 3)."""
    from openset_spark.pipeline.sampling import distributed_cumsum

    scored = (
        lm_perplexity(
            docs, lm_corpus, text_col=text_col, id_col=id_col,
            min_count=min_count,
        )
        .select(id_col, "n_bigrams", "avg_logp", F.lit(1).alias("_one"))
        .localCheckpoint()
    )
    order = [F.desc("avg_logp"), F.asc(id_col)]
    ranked = distributed_cumsum(scored, order, "_one").withColumnRenamed(
        "_cum", "_rank"
    )
    totals = scored.agg(F.count(F.lit(1)).alias("_N"))
    names = (
        ["head", "middle", "tail"] if n_buckets == 3
        else [f"tile_{i + 1}" for i in range(n_buckets)]
    )
    name_map = F.array(*[F.lit(s) for s in names])
    with_n = ranked.crossJoin(F.broadcast(totals)).select(
        F.col(id_col),
        "n_bigrams",
        "avg_logp",
        F.expr(f"_N div {n_buckets}").alias("_q"),
        F.expr(f"_N % {n_buckets}").alias("_r"),
        F.col("_rank"),
    )
    big = F.col("_r") * (F.col("_q") + 1)  # rows living in the q+1 tiles
    tile = F.when(
        F.col("_rank") <= big,
        1 + F.expr("(_rank - 1) div (_q + 1)"),
    ).otherwise(
        # greatest(_q,1): the branch is unreachable when _q = 0 (every
        # rank <= _r = N there) but ANSI mode still evaluates the div
        1 + F.col("_r")
        + F.expr("(_rank - 1 - _r * (_q + 1)) div greatest(_q, 1L)")
    )
    return with_n.select(
        id_col,
        "n_bigrams",
        "avg_logp",
        F.element_at(name_map, tile.cast("int")).alias("bucket"),
    )


def mink_prob(
    docs: DataFrame,
    lm_corpus: DataFrame,
    k_pct: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """Min-K% probability — the pretraining-data membership signal
    (Shi et al. 2023, "Detecting Pretraining Data from Large
    Language Models"): a document the model has SEEN has few
    surprisingly-low-probability tokens, so the mean of its lowest
    k% token log-probs separates members from non-members better
    than the full-average perplexity. Here the model is the same
    Laplace bigram LM lm_perplexity scores with (identical joins —
    identical IEEE logps).

    Selection is integer-exact and engine-portable: n_low =
    max(1, ceil(n * k / 100)) via (n*k + 99) div 100; bigram
    instances collapse to (w1, w2, count) types, types order by
    (logp ASC, w1, w2) — a total order because logp is a function
    of (w1, w2) — and each type contributes
    min(count, n_low - cum_before) instances, a windowed partial
    take. The per-doc window is bounded by the doc's bigram
    VOCABULARY. Output: (id, n_bigrams, n_scored,
    mink_logp = ROUND(sum/n_low, 4)) — same float posture as
    lm_perplexity's proven avg-then-round key."""
    from pyspark.sql import Window

    lm = train_bigram_lm(lm_corpus, text_col, min_count)
    scored = _scored_bigrams(docs, lm, text_col, id_col)
    types = scored.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).alias("_c"), F.max("_logp").alias("_logp")
    )
    w_doc = Window.partitionBy(id_col)
    w_ord = Window.partitionBy(id_col).orderBy(
        F.asc("_logp"), F.asc("w1"), F.asc("w2")
    )
    staged = (
        types.withColumn("_n", F.sum("_c").over(w_doc))
        .withColumn(
            "_before",
            F.coalesce(
                F.sum("_c").over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "_nlow",
            F.greatest(F.lit(1), F.expr(f"(_n * {int(k_pct)} + 99) div 100")),
        )
        .withColumn(
            "_take",
            F.greatest(
                F.lit(0), F.least(F.col("_c"), F.col("_nlow") - F.col("_before"))
            ),
        )
    )
    return staged.groupBy(id_col).agg(
        F.max("_n").cast("long").alias("n_bigrams"),
        F.max("_nlow").cast("long").alias("n_scored"),
        F.round(
            F.sum(F.col("_logp") * F.col("_take")) / F.max("_nlow"), 4
        ).alias("mink_logp"),
    )
