"""Corpus-level redundancy and collocation statistics.

Two reports a pretraining data card wants that none of the per-doc
operators produce:

- ``source_ngram_overlap``: pairwise n-gram Jaccard BETWEEN sources
  (crawls, dumps, snapshots) — the redundancy matrix that decides
  which sources to drop or down-weight before any per-doc dedup
  runs. Scale shape: the distinct (source, shingle) frame is the
  only corpus-wide aggregate; pair generation groups by shingle
  (sources-per-shingle is bounded by the SOURCE COUNT, a catalog
  constant, so the collect_set row and pair fan-out are tiny by
  construction — unlike document pairing, which needs df caps).

- ``collocations``: top-k PMI word bigrams (collocation / phrase
  mining). All marginals derive from the single bigram-count
  aggregate: cL/cR are groupBys OF the count frame (vocabulary
  cardinality), N is a 1-row broadcast. PMI = ln(c12*N/(cL*cR)),
  ranked on the ROUNDED value with a (w1, w2) tie-break so the
  DuckDB oracle reproduces the ordering bit-for-bit (the
  pipeline/ir.py portability pattern).

- ``zipf_fit``: per-source Zipf power-law fit — OLS of ln(freq) on
  ln(rank) over the top-R word frequencies. Natural corpora track
  slope ~ -1 (Zipf's law); synthetic, templated, or spam-heavy
  sources flatten toward 0 — a one-number distribution-shape
  screen a corpus card reports per crawl/dump. Shape: one word
  count aggregate, a per-source top-R rank window (partition
  cardinality = that source's vocabulary — bounded by Heaps' law,
  the tfidf-rank-window shape), then a 5-number OLS aggregate per
  source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openset_spark.functions.text import shingles_from_tokens, tokens


def source_ngram_overlap(
    df: DataFrame,
    n: int = 5,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source_a, source_b, shared, jaccard) for every source pair
    sharing at least one distinct word n-gram; source_a < source_b."""
    sh = (
        df.select(
            F.col(group_col),
            tokens(F.col(text_col)).alias("_toks"),
        )
        .filter(F.size("_toks") >= n)
        .select(
            F.col(group_col),
            F.explode(
                F.array_distinct(shingles_from_tokens(F.col("_toks"), n))
            ).alias("_g"),
        )
        .distinct()
    )
    sizes = sh.groupBy(group_col).agg(F.count(F.lit(1)).alias("_sz"))
    from openset_spark.pipeline.dedup import _pairs_expr

    grouped = (
        sh.groupBy("_g")
        .agg(F.array_sort(F.collect_set(group_col)).alias("_ids"))
        .filter(F.size("_ids") >= 2)
    )
    shared = (
        grouped.select(F.explode(_pairs_expr(F.col("_ids"))).alias("_p"))
        .groupBy(
            F.col("_p.id_a").alias("source_a"),
            F.col("_p.id_b").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    sa = sizes.select(
        F.col(group_col).alias("source_a"), F.col("_sz").alias("_sza")
    )
    sb = sizes.select(
        F.col(group_col).alias("source_b"), F.col("_sz").alias("_szb")
    )
    jac = F.col("shared") / (
        F.col("_sza") + F.col("_szb") - F.col("shared")
    )
    return (
        shared.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "shared",
            F.round(jac, 6).alias("jaccard"),
        )
    )


def collocations(
    df: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` PMI word bigrams over the corpus:
    (w1, w2, c12, pmi, rank). Marginals are the bigram table's own
    left/right sums; bigrams rarer than ``min_count`` are dropped
    before scoring (PMI's low-count pathology)."""
    toked = df.select(tokens(F.col(text_col)).alias("_toks")).filter(
        F.size("_toks") >= 2
    )
    big = (
        toked.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_toks)-2), i -> "
                    "struct(element_at(_toks, i+1) AS w1, "
                    "element_at(_toks, i+2) AS w2))"
                )
            ).alias("_b")
        )
        .groupBy(F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    # the bigram-count frame feeds three aggregates + the final join:
    # materialize once (the tfidf_top_terms rule)
    big = big.localCheckpoint(eager=False)
    cl = big.groupBy("w1").agg(F.sum("c12").alias("_cl"))
    cr = big.groupBy("w2").agg(F.sum("c12").alias("_cr"))
    n_tot = F.broadcast(big.agg(F.sum("c12").alias("_n")))
    # doubles BEFORE multiplying: c12*N and cL*cR overflow int64 on a
    # web-scale corpus (c12 ~ 1e9, N ~ 1e13); the oracle mirrors the
    # exact cast+operation order so the IEEE results are identical
    pmi = F.log(
        F.col("c12").cast("double")
        * F.col("_n")
        / (F.col("_cl").cast("double") * F.col("_cr"))
    )
    scored = (
        big.filter(F.col("c12") >= min_count)
        .join(cl, "w1")
        .join(cr, "w2")
        .crossJoin(n_tot)
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.round(pmi, 4).alias("pmi"),
        )
    )
    # global top-k as sort+limit -> TakeOrderedAndProject (the bm25
    # pattern: distributed partial top-k, rank stamped after the
    # limit over <= k rows — never a single-partition window)
    order = (F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def zipf_fit(
    df: DataFrame,
    top_r: int = 100,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_ranks, slope, intercept): least-squares fit of
    ln(count) = slope*ln(rank) + intercept over the ``top_r`` most
    frequent words of each source.

    Rank ties break on the word itself so the rank assignment (and
    therefore the fitted line) is deterministic and engine-portable.
    The regression uses the closed form on plain AVG aggregates —
    slope = (E[xy] - E[x]E[y]) / (E[x^2] - E[x]^2) — computed in the
    same expression shape the DuckDB oracle uses, with the final
    values rounded to 4 (the lm_perplexity float posture). Sources
    with a single ranked word have zero x-variance and yield NULL
    slope/intercept rather than a division error."""
    cnt = (
        df.select(F.col(group_col), F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy(group_col, "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rw = Window.partitionBy(group_col).orderBy(F.desc("c"), F.asc("w"))
    ranked = (
        cnt.withColumn("r", F.row_number().over(rw))
        .filter(F.col("r") <= top_r)
        .select(
            group_col,
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_ranks"),
        F.avg("x").alias("_ax"),
        F.avg("y").alias("_ay"),
        F.avg(F.col("x") * F.col("y")).alias("_axy"),
        F.avg(F.col("x") * F.col("x")).alias("_axx"),
    )
    var = F.col("_axx") - F.col("_ax") * F.col("_ax")
    slope = F.when(
        var > 0,
        (F.col("_axy") - F.col("_ax") * F.col("_ay")) / var,
    )
    return agg.select(
        group_col,
        "n_ranks",
        F.round(slope, 4).alias("slope"),
        F.round(F.col("_ay") - slope * F.col("_ax"), 4).alias("intercept"),
    )


def oov_rate(
    df: DataFrame,
    vocab_size: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc out-of-vocabulary rate against the corpus's own top-V
    word vocabulary — the coverage screen run before committing to a
    tokenizer vocab size (docs with high OOV under the candidate
    vocab will fragment into byte fallbacks).

    Vocabulary = the ``vocab_size`` most frequent tokens, ordered
    (count DESC, token ASC) so the cut is deterministic under count
    ties. Scale shape: the token-count aggregate map-side combines to
    vocabulary cardinality; the top-V is a TakeOrdered (no global
    sort) whose V-row result broadcasts to the instance join — the
    only shuffle over raw instances is the final per-doc aggregate.
    OOV fraction surfaces as exact integer basis points (integer
    division; see lexical_diversity for why not ROUND)."""
    inst = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    vocab = (
        inst.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("_inv"))
    )
    joined = inst.join(F.broadcast(vocab), "tok", "left")
    n_tok = F.count(F.lit(1))
    n_oov = F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0))
    return joined.groupBy(id_col).agg(
        n_tok.cast("long").alias("n_tokens"),
        n_oov.cast("long").alias("n_oov"),
        F.expr(
            "10000 * sum(case when _inv is null then 1 else 0 end) "
            "div count(1)"
        ).alias("oov_x10k"),
    )
