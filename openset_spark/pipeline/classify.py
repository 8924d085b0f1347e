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

import re as _re

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


def _model_from_counts(joined: DataFrame) -> tuple[DataFrame, float]:
    """(weights, oov) off a (token, c_pos, c_neg) count frame. The
    frame is referenced twice (the totals collect + the weights
    projection) and is bounded by the VOCABULARY, so it is
    checkpointed — without the cut each reference re-ran the full
    training corpus scan(s) under AQE's no-cross-branch exchange
    reuse (the kmv/dsir r15 posture; same rule as the nb_lang gram
    counts pinned in r13)."""
    joined = joined.localCheckpoint()
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
    collect of pre-aggregated counts — never a row collect.

    When pos and neg are complementary label filters over ONE frame,
    use :func:`nb_quality_model_labeled` instead: one training scan
    instead of two."""
    cp = _class_counts(pos, text_col)
    cn = _class_counts(neg, text_col)
    joined = cp.withColumnRenamed("c", "c_pos").join(
        cn.withColumnRenamed("c", "c_neg"), "token", "full"
    ).select(
        "token",
        F.coalesce("c_pos", F.lit(0)).alias("c_pos"),
        F.coalesce("c_neg", F.lit(0)).alias("c_neg"),
    )
    return _model_from_counts(joined)


def nb_quality_model_labeled(
    docs: DataFrame,
    pos_label,
    text_col: str = "text",
) -> tuple[DataFrame, float]:
    """:func:`nb_quality_model` for the common case where the two
    classes are complementary subsets of ONE frame (``pos_label`` a
    boolean Column): per-class token counts come from a SINGLE
    exploded pass with a conditional sum — identical integers, half
    the training scans. Rows whose label is NULL belong to neither
    class and are excluded, exactly as ``filter(label)`` /
    ``filter(~label)`` would exclude them on the two-pass path."""
    joined = (
        docs.select(pos_label.alias("_pos"), F.col(text_col))
        .filter(F.col("_pos").isNotNull())
        .select("_pos", F.explode(tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(
            F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("c_pos"),
            F.sum(F.when(F.col("_pos"), 0).otherwise(1)).alias("c_neg"),
        )
    )
    return _model_from_counts(joined)


def nb_quality_scores(
    docs: DataFrame,
    pos: DataFrame | None = None,
    neg: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    pos_label=None,
) -> DataFrame:
    """(id, n_tokens, score) for every doc with >= 1 token: the NB
    log-odds sum of its tokens under the pos-vs-neg model (positive
    = reference-like). The class prior is a per-corpus constant that
    shifts every score equally — thresholding happens downstream, so
    it is deliberately not baked in.

    Pass either (pos, neg) frames, or ``pos_label`` (a boolean Column
    over ``docs``) when the classes are complementary subsets of the
    scored frame itself — the labeled form trains in ONE corpus scan
    instead of two (identical counts, identical weights)."""
    if pos_label is not None:
        weights, oov = nb_quality_model_labeled(docs, pos_label, text_col)
    else:
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


def _doc_grams(
    df: DataFrame, text_col: str, key, key_name: str, n: int,
    extra: tuple = (),
) -> DataFrame:
    """(key_name[, extra...], gram) exploded char n-grams — the
    normalized text is projected to a REAL column before the gram
    transform (no CSE inside transform lambdas: gramming over
    normalize(text) directly re-runs the normalize regex once per
    gram, O(len²) per doc — see char_ngrams_from_norm). ``extra``
    names per-row columns carried through the explode (the
    lang_script_agreement fusion hook: a consumer that needs another
    doc column can ride this scan instead of re-scanning + joining)."""
    from openset_spark.functions.text import (
        char_ngrams_from_norm,
        normalize,
    )

    return df.select(
        key.alias(key_name),
        *[F.col(c) for c in extra],
        normalize(F.col(text_col)).alias("_nt"),
    ).select(
        key_name,
        *extra,
        F.explode(char_ngrams_from_norm(F.col("_nt"), n)).alias("gram"),
    ).filter(F.col("gram") != "")


def nb_lang_model(
    seed: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 3,
) -> tuple[DataFrame, list[str], dict[str, float]]:
    """Multiclass multinomial NB over character n-grams — the
    fastText-class language identifier (Joulin et al. 2016 use char
    n-gram features for exactly this task), in the same closed-form
    count-ratio shape as nb_quality_model so training IS one hash
    aggregate and scoring IS a broadcast join + sum:

        weight(g, l) = ln((c(g, l) + 1) / (N_l + V))
        oov(l)       = -ln(N_l + V)            (gram unseen in l)

    V counts distinct grams across ALL languages (a gram seen only
    in one language still gets a finite, strongly-signed weight
    everywhere). Returns (weights, langs, oov): ``weights`` is ONE
    bounded wide frame (gram, _w_<lang>...) — V x (L+1), charset^n
    -bounded, broadcast at score time so each exploded gram row is
    touched once (the long (gram x lang) form would multiply the
    100 TB explode by L) — ``langs`` the sorted label set, ``oov``
    the per-language unseen-gram weights. The per-language totals
    come from one L-row collect of pre-aggregated counts — never a
    row collect. Replaces nothing: textstats.lang_id stays as the
    cheap stopword prefilter (VERDICT r12 ask #2)."""
    import math

    if n < 1:
        raise ValueError(f"n must be >= 1: {n}")
    # the gram-count frame feeds THREE actions (totals collect, V
    # collect, the score-time weights evaluation) — pin the bounded
    # (V x L)-row table or the seed normalize+explode+aggregate runs
    # once per action (the Catalyst multi-reference rule; code
    # review r13)
    cnt = (
        _doc_grams(seed, text_col, F.col(label_col), "_lang", n)
        .groupBy("_lang", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    # bounded: L rows + 1 row, both pre-aggregated
    totals = {
        r["_lang"]: int(r["nl"])
        for r in cnt.groupBy("_lang").agg(F.sum("c").alias("nl")).collect()
    }
    v = int(cnt.select(F.countDistinct("gram").alias("v")).first()["v"])
    langs = sorted(totals)
    if not langs:
        raise ValueError("seed corpus has no grams")
    # labels become column names (score_<lang>, _w_<lang>) referenced
    # via F.col — a label with '.', '`', spaces or other specials
    # would break resolution or collide after aliasing (ADVICE r13
    # #5); fail loudly at train time, not at some downstream select
    bad = [l for l in langs if not _re.fullmatch(r"[A-Za-z0-9_\-]+", l)]
    if bad:
        raise ValueError(
            "labels must match [A-Za-z0-9_-]+ (they become column "
            f"names): {bad}"
        )
    oov = {l: -math.log(totals[l] + v) for l in langs}
    wide = cnt.groupBy("gram").pivot("_lang", langs).sum("c")
    # a gram in V but unseen in language l takes the SAME literal the
    # fully-unseen path takes: ln((0+1)/(N_l+V)) == -ln(N_l+V)
    # mathematically, but the two expression SHAPES can differ by an
    # ulp between engines — the oracle's COALESCE fallback computes
    # -ln(), so zero-count pivot cells must too (code review r13; the
    # binary nb precedent mirrors its (c+1)/(N+V) form for the same
    # reason)
    weights = wide.select(
        "gram",
        *[
            F.when(F.col(f"`{l}`").isNull(), F.lit(float(oov[l])))
            .otherwise(
                F.log(
                    (F.col(f"`{l}`") + 1) / F.lit(float(totals[l] + v))
                )
            )
            .alias(f"_w_{l}")
            for l in langs
        ],
    )
    return weights, langs, oov


def nb_lang_scores(
    docs: DataFrame,
    seed: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 3,
    id_col: str = "doc_id",
    extra_cols: tuple = (),
) -> DataFrame:
    """(id, n_grams, score_<lang>..., lang_nb) for every doc with at
    least one char n-gram: per-language NB log-likelihood sums under
    the seed-trained model and the argmax guess. The argmax compares
    the ROUND(·, 4) scores (the values the oracle layer locks) with
    a lexicographically-smallest tiebreak, so the guess is exactly
    reproducible from the emitted columns. Uniform prior — the seed
    class mix is a corpus accident, not evidence (and a constant
    per-language shift, trivially re-addable downstream)."""
    weights, langs, oov = nb_lang_model(seed, text_col, label_col, n)
    # extra_cols ride the scoring scan (functionally dependent on the
    # doc id, so adding them to the group keys changes nothing) —
    # a consumer needing another doc column gets it WITHOUT a second
    # corpus scan + join (nb_lang_confusion: 2 scans -> 1, r16)
    grams = _doc_grams(
        docs, text_col, F.col(id_col), id_col, n, extra=extra_cols
    )
    joined = grams.join(F.broadcast(weights), "gram", "left")
    scored = joined.groupBy(id_col, *extra_cols).agg(
        F.count(F.lit(1)).alias("n_grams"),
        *[
            F.round(
                F.sum(F.coalesce(F.col(f"_w_{l}"), F.lit(float(oov[l])))), 4
            ).alias(f"score_{l}")
            for l in langs
        ],
    )
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    guess = F.coalesce(
        *[F.when(F.col(f"score_{l}") == best, F.lit(l)) for l in langs]
    )
    return scored.select(
        id_col,
        *extra_cols,
        "n_grams",
        *[f"score_{l}" for l in langs],
        guess.alias("lang_nb"),
    )


def nb_lang_confusion(
    docs: DataFrame,
    seed: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """(lang, lang_nb, n_docs) confusion matrix of the NB guess vs
    the labeled column — the audit that says what the classifier
    actually does on a corpus (and, run beside lang_confusion's
    stopword audit, what the upgrade buys). One bounded L x L
    aggregate over the scored frame. The gold label rides the
    scoring scan via the extra_cols hook (r16): before, a second
    full corpus scan + join re-fetched a column the scan already
    read — the inner join on the doc id kept exactly the scored
    docs, which is what the fused form emits."""
    scored = nb_lang_scores(
        docs, seed, text_col, label_col, n, id_col,
        extra_cols=(label_col,),
    )
    return (
        scored.select(F.col(label_col).alias("lang"), "lang_nb")
        .groupBy("lang", "lang_nb")
        .agg(F.count(F.lit(1)).alias("n_docs"))
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
