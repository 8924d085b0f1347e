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
    sharing at least one distinct word n-gram; source_a < source_b.

    ONE corpus pass (r15): the shingle explode feeds a single
    groupBy(gram) whose collect_set dedups (source, gram) map-side
    (the former separate ``.distinct()`` exchange is subsumed), and
    BOTH the pair counts and the per-source set sizes come out of one
    exploded stream over that frame — each gram row emits its
    C(|ids|,2) pair structs plus one (source, NULL) singleton per
    member, so ``sizes`` is the NULL-partner margin of the same
    bounded counts frame instead of a second (and third — it is
    referenced for both join sides) corpus scan. The counts frame is
    ≤ |sources|² + |sources| rows — catalog-constant — and is
    localCheckpointed so the sa/sb references read the
    materialization (AQE does not reuse exchanges across plan
    branches)."""
    from openset_spark.pipeline.dedup import _pairs_expr

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
    )
    grouped = sh.groupBy("_g").agg(
        F.array_sort(F.collect_set(group_col)).alias("_ids")
    )
    units = F.concat(
        F.transform(
            F.col("_ids"),
            lambda x: F.struct(
                x.alias("id_a"), F.lit(None).cast("string").alias("id_b")
            ),
        ),
        _pairs_expr(F.col("_ids")),
    )
    counts = (
        grouped.select(F.explode(units).alias("_p"))
        .groupBy(
            F.col("_p.id_a").alias("source_a"),
            F.col("_p.id_b").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .localCheckpoint()
    )
    shared = counts.filter(F.col("source_b").isNotNull())
    sa = counts.filter(F.col("source_b").isNull()).select(
        "source_a", F.col("shared").alias("_sza")
    )
    sb = counts.filter(F.col("source_b").isNull()).select(
        F.col("source_a").alias("source_b"), F.col("shared").alias("_szb")
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
    big = big.localCheckpoint()
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


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc novelty attribution: of each document's DISTINCT word
    ``n``-grams, how many occur for the FIRST time in this document
    (first = the minimum doc id over the whole corpus)? The curve of
    novelty over ingestion order is the marginal-value report a crawl
    schedule wants — once new snapshots stop contributing novel
    n-grams, further crawling of that source is pure dedup load
    (reference models this as its corpus "freshness" report over
    ingest batches; cf. the reference's dedup suite which only
    answers the pairwise question).

    Scale shape: ONE distinct (doc, gram) frame feeds both sides —
    the per-doc distinct-gram count is a groupBy(doc), and the
    first-occurrence attribution is groupBy(gram)->min(doc) followed
    by a count-by-min-doc, i.e. the novelty counts come off the
    GRAM-keyed aggregate (vocabulary cardinality) rather than a
    join-back over gram instances. The final join is per-doc
    (corpus-row cardinality, two slim sides).

    Output: (doc_id, n_grams, n_novel, novelty_x10k) with the ratio
    as exact integer basis points (integer division — the
    lexical_diversity portability posture)."""
    dg = (
        df.select(
            F.col(id_col),
            tokens(F.col(text_col)).alias("_toks"),
        )
        .filter(F.size("_toks") >= n)
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(shingles_from_tokens(F.col("_toks"), n))
            ).alias("_g"),
        )
    )
    # both aggregates consume the same shingle frame: materialize
    # once (the tfidf_top_terms rule; measured 8.8 -> ~4s at sf0.1)
    dg = dg.localCheckpoint()
    per_doc = dg.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    novel = (
        dg.groupBy("_g")
        .agg(F.min(id_col).alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_novel"))
    )
    return (
        per_doc.join(novel, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.expr(
                "10000 * coalesce(n_novel, 0) div n_grams"
            ).alias("novelty_x10k"),
        )
    )


#: (rule name, ordered) — the quality_funnel stage sequence. Bands are
#: integer/rational-exact so any engine reproduces the booleans.
FUNNEL_RULES = (
    "n_tokens_band",     # 20 <= n_tokens <= 90
    "mean_word_len",     # 4*n <= total_chars <= 6*n  (mean in [4, 6])
    "dup_fraction",      # distinct tokens * 2 >= n_tokens (dup frac <= 1/2)
    "top_token_share",   # max single-token count * 8 <= n_tokens (<= 12.5%)
)


def quality_funnel(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cumulative rule-attrition report: for each filter stage, how
    many docs ENTER it and how many SURVIVE it (a doc reaches stage k
    only if it passed stages 1..k-1). This is the funnel table every
    cleaning-pipeline data card publishes — per-doc pass flags
    (gopher_quality) answer "is this doc ok", the funnel answers
    "which rule is eating my corpus".

    All four rule comparisons are integer-exact (counts against
    count*constant), so the booleans are engine-portable with no
    float posture at all. Scale shape: every rule input (token
    total, char total, distinct count, modal-token count) comes off
    ONE (doc, token) count aggregate — per-doc group cardinality is
    the doc's vocabulary, never its length, so a pathological
    100k-token doc costs its vocab, not vocab x length (the naive
    array_distinct x filter form is quadratic per doc). The global
    funnel aggregate map-side combines to 5 numbers; the 4-row
    stack after it is constant-size.

    Stage-1 entrants = EVERY corpus doc (a count off the raw frame,
    cross-joined as a single-row literal — not a per-doc join):
    docs whose text produces no token rows (NULL text — explode
    drops them) still enter the funnel and fail the n_tokens_band
    rule, so n_in at stage 1 is the corpus size, and n1..n4 are
    unaffected (such a doc is false on every rule)."""
    inst = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok")
    )
    tc = inst.groupBy(id_col, "_tok").agg(F.count(F.lit(1)).alias("_c"))
    per_doc = tc.groupBy(id_col).agg(
        F.sum("_c").alias("_n"),
        F.count(F.lit(1)).alias("_nd"),
        F.max("_c").alias("_top"),
        F.sum(F.length("_tok") * F.col("_c")).alias("_len"),
    )
    n, sum_len = F.col("_n"), F.col("_len")
    n_dist, top = F.col("_nd"), F.col("_top")
    flagged = per_doc.select(
        (n.between(20, 90)).alias("_b1"),
        ((sum_len >= 4 * n) & (sum_len <= 6 * n)).alias("_b2"),
        (n_dist * 2 >= n).alias("_b3"),
        (top * 8 <= n).alias("_b4"),
    )
    totals = df.agg(F.count(F.lit(1)).alias("_n0"))
    agg = flagged.agg(
        F.sum(F.col("_b1").cast("long")).alias("_n1"),
        F.sum((F.col("_b1") & F.col("_b2")).cast("long")).alias("_n2"),
        F.sum(
            (F.col("_b1") & F.col("_b2") & F.col("_b3")).cast("long")
        ).alias("_n3"),
        F.sum(
            (
                F.col("_b1") & F.col("_b2") & F.col("_b3") & F.col("_b4")
            ).cast("long")
        ).alias("_n4"),
    )
    agg = totals.crossJoin(agg).select(
        "_n0",
        *[F.coalesce(F.col(f"_n{i}"), F.lit(0)).alias(f"_n{i}") for i in (1, 2, 3, 4)],
    )
    stack = ", ".join(
        f"{i + 1}L, '{rule}', _n{i}, _n{i + 1}"
        for i, rule in enumerate(FUNNEL_RULES)
    )
    return agg.select(
        F.expr(f"stack({len(FUNNEL_RULES)}, {stack})").alias(
            "stage", "rule", "n_in", "n_pass"
        )
    )


def cooccur_pmi(
    df: DataFrame,
    window: int = 3,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` PMI of UNORDERED word pairs co-occurring within a
    ±``window`` token distance — the skip-gram association table
    (word2vec's training signal; collocations only sees adjacent
    ordered bigrams). Pair marginals are the pair table's own
    per-word sums (each pair contributes its count to both member
    words), N is the total pair count.

    Scale shape: pair generation is a per-row array expression (no
    self-join on positions — the position self-join shuffles token
    instances twice and explodes on long docs); everything after is
    the collocations shape: one pair-count aggregate, marginals as
    groupBys OF that frame, doubles-before-multiply PMI, global
    top-k as sort+limit (TakeOrderedAndProject)."""
    toked = df.select(tokens(F.col(text_col)).alias("_toks")).filter(
        F.size("_toks") >= 2
    )
    pair_expr = F.expr(
        "flatten(transform(sequence(1, size(_toks) - 1), i -> "
        f"transform(sequence(i + 1, least(i + {int(window)}, size(_toks))), "
        "j -> struct("
        "least(element_at(_toks, i), element_at(_toks, j)) AS a, "
        "greatest(element_at(_toks, i), element_at(_toks, j)) AS b))))"
    )
    pc = (
        toked.select(F.explode(pair_expr).alias("_p"))
        .groupBy(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    # feeds two marginal aggregates + total + the scored join:
    # materialize once (the tfidf_top_terms rule)
    pc = pc.localCheckpoint()
    marg = (
        pc.select(F.col("a").alias("w"), "c_ab")
        .unionAll(pc.select(F.col("b").alias("w"), "c_ab"))
        .groupBy("w")
        .agg(F.sum("c_ab").alias("_m"))
    )
    n_tot = F.broadcast(pc.agg(F.sum("c_ab").alias("_n")))
    ma = marg.select(F.col("w").alias("a"), F.col("_m").alias("_ma"))
    mb = marg.select(F.col("w").alias("b"), F.col("_m").alias("_mb"))
    pmi = F.log(
        F.col("c_ab").cast("double")
        * F.col("_n")
        / (F.col("_ma").cast("double") * F.col("_mb"))
    )
    scored = (
        pc.filter(F.col("c_ab") >= min_count)
        .join(ma, "a")
        .join(mb, "b")
        .crossJoin(n_tot)
        .select(
            "a",
            "b",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.round(pmi, 4).alias("pmi"),
        )
    )
    order = (F.desc("pmi"), F.asc("a"), F.asc("b"))
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


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


def dataset_card(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-row corpus summary — the header block of a dataset card
    (what every corpus release publishes first): document and token
    totals, source/language cardinalities, exact unique-text count
    and the duplicate-doc remainder, and mean tokens per doc as
    exact integer centitokens. Everything is integer-exact (counts,
    count distincts, integer division) — no float posture.

    Scale note: the unique-text count here is an EXACT
    count-distinct over the normalized-text md5 (one shuffle of the
    hash). At 100 TB swap in approx_count_distinct for the
    interactive path — the exact form is the oracle-checkable
    contract, and the dedup suite already materializes the same
    hash frame, so a real deployment reads it from there."""
    return df.select(
        F.col(id_col),
        F.col("source"),
        F.col("lang"),
        tokens(F.col(text_col)).alias("_toks"),
        F.md5(F.concat_ws(" ", tokens(F.col(text_col)))).alias("_th"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size("_toks")).cast("long").alias("n_tokens"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("_th").cast("long").alias("n_unique_texts"),
        (
            F.count(F.lit(1)) - F.countDistinct("_th")
        ).cast("long").alias("dup_docs"),
        F.expr("100 * sum(size(_toks)) div count(1)").cast("long").alias(
            "mean_tokens_x100"
        ),
    )


def source_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Distributional-shift screen: per source, the TOTAL VARIATION
    distance between its unigram distribution and the whole corpus's
    — TV = (1/2) sum_w |p_s(w) - p(w)|. The source a curation pass
    investigates first is the one furthest from the mix it is
    supposed to blend into (an injected domain, a language
    mislabel, a scraper gone wrong all spike it).

    Cross-engine exactness: the numerator sum_w |c_sw * T - c_w *
    T_s| is computed in EXACT integer arithmetic (products up to
    corpus-tokens x source-tokens need 128-bit headroom — DECIMAL(38)
    on the Spark side, DuckDB's HUGEINT on the oracle side), then the
    one division is IEEE double over exact operands. tv_ppm = the
    integer div form for the hash-stable ranking key.

    Scale shape: one (group, word) count aggregate (map-side
    combinable), a broadcast of the |vocab|-row global counts onto
    it, and a per-group sum. The |p_s - p| terms for words ABSENT
    from a source still contribute — handled in closed form: absent
    words add c_w * T_s in total, i.e. (T - sum of c_w over PRESENT
    words) * T_s, so the join stays per-(source, present-word) and
    never explodes to the source x vocab cross product."""
    toks = df.select(
        F.col(group_col), F.explode(tokens(F.col(text_col))).alias("w")
    )
    # r15: every marginal is an exact integer fold of the (source,
    # word) count table — derive all three from ONE tokenize+explode
    # pass instead of four (AQE does not share the scan across plan
    # branches; measured 4 document scans -> 1). sw is bounded by
    # |vocab| x |sources| rows — far below the token-instance stream
    # — so the lineage cut is the model-sized materialization.
    sw = (
        toks.groupBy(group_col, "w")
        .agg(F.count(F.lit(1)).alias("c_sw"))
        .localCheckpoint()
    )
    wtot = sw.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    stot = sw.groupBy(group_col).agg(F.sum("c_sw").alias("t_s"))
    gtot = sw.agg(F.sum("c_sw").alias("t"))
    d38 = "decimal(38,0)"
    joined = (
        sw.join(wtot, "w")
        .join(F.broadcast(stot), group_col)
        .crossJoin(F.broadcast(gtot))
    )
    per_src = joined.groupBy(group_col).agg(
        F.sum(
            F.abs(
                F.col("c_sw").cast(d38) * F.col("t").cast(d38)
                - F.col("c_w").cast(d38) * F.col("t_s").cast(d38)
            )
        ).alias("_present"),
        # closed form for words this source never uses:
        # sum over absent w of c_w * t_s = (t - sum of PRESENT c_w) * t_s
        F.sum(F.col("c_w").cast(d38)).alias("_cw_present"),
        F.max("t_s").alias("t_s"),
        F.max("t").alias("t"),
    )
    with_num = per_src.withColumn(
        "_num",
        F.col("_present")
        + (F.col("t").cast(d38) - F.col("_cw_present"))
        * F.col("t_s").cast(d38),
    )
    # integer `div`, NOT cast-of-division: Spark's decimal division
    # rounds HALF_UP before a long cast truncates (4.9999999 -> 5),
    # while DuckDB's `//` floors — `div` is the true floor on both
    return with_num.select(
        group_col,
        F.col("t_s").cast("long").alias("n_tokens"),
        F.expr(
            "CAST((_num * 1000000) div"
            " (2 * CAST(t_s AS decimal(38,0))"
            "  * CAST(t AS decimal(38,0))) AS BIGINT)"
        ).alias("tv_ppm"),
        F.round(
            F.col("_num").cast("double")
            / (
                F.lit(2.0)
                * F.col("t_s").cast("double")
                * F.col("t").cast("double")
            ),
            6,
        ).alias("tv"),
    )


def filter_agreement(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    entropy_min: float = 2.0,
) -> DataFrame:
    """Pairwise agreement report across the cheap quality-filter
    ensemble — "do my filters measure the same thing?", the
    governance table a pipeline reads before chaining filters whose
    overlap decides how much corpus survives the cascade
    (quality_funnel reports attrition ORDER; this reports filter
    REDUNDANCY). Filters: ``gopher`` (gopher_quality_flags.keep),
    ``repetition`` (NOT repetition_signals.flagged), ``entropy``
    (char_entropy.entropy_bits >= entropy_min, compared on the
    ROUND(4) value both engines lock).

    One row per unordered filter pair: docs evaluated (inner join —
    repetition_signals excludes <2-token docs by contract, so n_docs
    surfaces the restriction), both-keep / both-drop counts, raw
    agreement in exact integer ppm, and Cohen's kappa in ppm. Kappa
    stays in exact integer/decimal arithmetic end-to-end: po/pe as
    *_ppm via integer div (pe's cross products ride DECIMAL(38) —
    ka*kb*1e6 overflows int64 past ~90M docs), kappa_ppm =
    (po_ppm - pe_ppm)*1e6 div (1e6 - pe_ppm) with the negative
    numerator routed through -((-x) div d) — Spark's `div` truncates
    toward zero while DuckDB's `//` floors, so a bare signed div
    diverges on every worse-than-chance pair (the source_divergence
    hazard, sign form). pe_ppm == 1e6 (a degenerate always-keep /
    always-drop marginal pair) yields NULL kappa.

    Scale shape (r15 — ONE corpus pass, down from four; ZERO
    corpus-sized shuffles, down from two gram-stream exchanges):
    every row-local statistic (the full gopher rule set, token
    counts, normalized length) rides ONE projection via gopher's
    ``extra_cols``/``stage_cols`` hooks, and the two explode-shaped
    signals become row-LOCAL array computations — char frequencies
    for entropy via the script_profile length-difference trick
    (one codegen'd ``replace`` scan per DISTINCT char), the
    repetition top-bigram via run lengths of the sorted per-doc
    bigram array — so the per-(doc,gram) counting that used to ride
    an explode + groupBy exchange never leaves the scan task. The
    whole query is scan → staged projections → one single-row
    reduce, unpivoted to 3 pair rows by a constant-size stack.
    Value-identical to composing gopher_quality_flags /
    repetition_signals / char_entropy (replay-tested): run lengths
    of a sorted array ARE the per-gram counts, the top-bigram
    tiebreak (max count, then lexicographically greatest bigram)
    falls out of the ascending sort order, and entropy's
    sum(c*log2(c)) accumulates in array_distinct's first-occurrence
    order — a summation order the ROUND(4) contract already absorbs
    (the DuckDB oracle sums in its own hash order today).
    """
    from openset_spark.functions.text import normalize
    from openset_spark.pipeline.textstats import gopher_quality_flags

    # Run lengths of a sorted array ARE the per-gram counts. The
    # cheap per-element pass is a boundary FILTER (bare comparisons,
    # no per-element state allocation — a named_struct fold state
    # measured ~0.3s slower at sf0.1); the per-run arithmetic then
    # runs over the tiny boundary array. `_cb`/`_bb` hold the
    # 1-based END positions of each run, so run j's length is
    # bounds[j] - bounds[j-1] and run j's gram is element_at(arr,
    # bounds[j]). The i = size(...) disjunct short-circuits before
    # the lookahead so element_at stays in bounds under ANSI; the
    # size-0 guard dodges sequence(1, 0) being DESCENDING.
    def _run_bounds(arr: str) -> str:
        return (
            f"if(size({arr}) = 0, array(), "
            f"filter(sequence(1, size({arr})), "
            f"i -> i = size({arr}) "
            f"or element_at({arr}, i + 1) != element_at({arr}, i)))"
        )

    rowloc = gopher_quality_flags(
        df,
        text_col,
        id_col,
        stage_cols={"_norm": normalize(F.col(text_col))},
        extra_cols={
            "_norm": F.col("_norm"),
            "_nd": F.size(F.array_distinct(F.col("_toks"))),
            "_nc": F.length(F.col("_norm")),
            "_chs": F.expr("filter(split(_norm, ''), c -> c != '')"),
            "_bgs": F.expr(
                "array_sort(transform(sequence(0, size(_toks)-2), "
                "i -> concat(element_at(_toks, i+1), ' ', "
                "element_at(_toks, i+2))))"
            ),
        },
    ).filter(F.col("n_words") >= 2)
    staged = rowloc.select(
        "*",
        F.expr(_run_bounds("_bgs")).alias("_bb"),
    )

    # entropy's sum(c*log2(c)) by the script_profile length-difference
    # house trick: count of char c = (len(s) - len(replace(s, c, '')))
    # / len(c) — `replace` is a codegen'd byte scan, so the only
    # interpreted lambda runs once per DISTINCT char (~dozens), not
    # once per char (a sorted run-length fold measured ~0.2s slower at
    # sf0.1). The len(c) divisor keeps surrogate-pair (2-code-unit)
    # chars exact. Summation order is array_distinct's
    # first-occurrence order — inside the ROUND(4) contract that
    # already absorbs the oracle's own hash order.
    clog = F.expr(
        "aggregate("
        "transform(array_distinct(_chs), "
        "c -> (length(_norm) - length(replace(_norm, c, ''))) div length(c)), "
        "cast(0 as double), (a, cc) -> a + cc * log2(cc))"
    )
    # max-count bigram: struct-max over (run length, gram at run end)
    # — array_max's struct ordering (count, then gram) replicates the
    # original max(struct(c, bigram)) tiebreak exactly
    best = F.expr(
        "array_max(zip_with("
        "transform(_bb, (b, j) -> b - if(j = 0, 0, element_at(_bb, j))), "
        "transform(_bb, b -> element_at(_bgs, b)), "
        "(r, g) -> struct(cast(r as bigint) as c, g as bigram)))"
    )
    n_ch = F.size("_chs")

    dup = 1.0 - F.col("_nd") / F.col("n_words")
    frac = F.col("_big.c") * F.length("_big.bigram") / F.col("_nc")
    entropy_bits = F.round(
        F.log2("_n_ch") - F.col("_clog") / F.col("_n_ch"), 4
    )
    flags = staged.select(
        F.col(id_col),
        F.col("keep").alias("k_gopher"),
        F.col("n_words"),
        F.col("_nd"),
        F.col("_nc"),
        clog.alias("_clog"),
        best.alias("_big"),
        n_ch.alias("_n_ch"),
    ).select(
        F.col(id_col),
        F.col("k_gopher"),
        (~((dup > 0.5) | (frac > 0.2))).alias("k_repetition"),
        (entropy_bits >= F.lit(entropy_min)).alias("k_entropy"),
    )

    names = ["entropy", "gopher", "repetition"]
    combos = [(a, b) for a in names for b in names if a < b]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for a in names:
        aggs.append(
            F.sum(F.col(f"k_{a}").cast("long")).alias(f"_k_{a}")
        )
    for a, b in combos:
        both = F.col(f"k_{a}") & F.col(f"k_{b}")
        neither = ~F.col(f"k_{a}") & ~F.col(f"k_{b}")
        aggs.append(F.sum(both.cast("long")).alias(f"_bk_{a}_{b}"))
        aggs.append(F.sum(neither.cast("long")).alias(f"_bd_{a}_{b}"))
    one = flags.agg(*aggs)

    pairs = [
        F.struct(
            F.lit(a).alias("filter_a"),
            F.lit(b).alias("filter_b"),
            F.col(f"_bk_{a}_{b}").alias("n_both_keep"),
            F.col(f"_bd_{a}_{b}").alias("n_both_drop"),
            F.col(f"_k_{a}").alias("_ka"),
            F.col(f"_k_{b}").alias("_kb"),
        )
        for a, b in combos
    ]
    long = (
        one.select("_n", F.explode(F.array(*pairs)).alias("p"))
        .select("_n", "p.*")
        .select(
            "*",
            F.expr(
                "(n_both_keep + n_both_drop) * 1000000 div _n"
            ).alias("po_ppm"),
            F.expr(
                "CAST((CAST(_ka AS DECIMAL(38,0)) * _kb"
                " + CAST((_n - _ka) AS DECIMAL(38,0)) * (_n - _kb))"
                " * 1000000"
                " div (CAST(_n AS DECIMAL(38,0)) * _n) AS BIGINT)"
            ).alias("pe_ppm"),
        )
    )
    kappa = F.when(
        F.col("pe_ppm") < 1_000_000,
        F.when(
            F.col("po_ppm") >= F.col("pe_ppm"),
            F.expr(
                "(po_ppm - pe_ppm) * 1000000 div (1000000 - pe_ppm)"
            ),
        ).otherwise(
            -F.expr(
                "(pe_ppm - po_ppm) * 1000000 div (1000000 - pe_ppm)"
            )
        ),
    )
    return long.select(
        "filter_a",
        "filter_b",
        F.col("_n").alias("n_docs"),
        "n_both_keep",
        "n_both_drop",
        F.col("po_ppm").alias("agree_ppm"),
        kappa.alias("kappa_ppm"),
    )
