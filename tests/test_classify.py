"""NB quality classifier (pipeline/classify.py): hand-computed
log-odds on a tiny corpus, OOV weight handling, end-to-end keep
filter. The registry oracle (`nb_quality_scores`) replays the full
model cross-engine at sf0.01."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from openset_spark.pipeline.classify import (
    nb_quality_model,
    nb_quality_scores,
    quality_classifier_keep,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_nb_weights_match_hand_computation(spark):
    pos = _docs(spark, [(1, "good clean prose"), (2, "good words")])
    neg = _docs(spark, [(3, "spam spam junk")])
    weights, oov = nb_quality_model(pos, neg)
    got = {r.token: r.weight for r in weights.collect()}
    # N_pos=5, N_neg=3, V=6 distinct tokens
    np_, nn, v = 5, 3, 6
    def w(cp, cn):
        return math.log((cp + 1) / (np_ + v)) - math.log((cn + 1) / (nn + v))
    assert got["good"] == pytest.approx(w(2, 0), abs=1e-12)
    assert got["spam"] == pytest.approx(w(0, 2), abs=1e-12)
    assert got["prose"] == pytest.approx(w(1, 0), abs=1e-12)
    assert oov == pytest.approx(math.log(nn + v) - math.log(np_ + v))
    assert set(got) == {"good", "clean", "prose", "words", "spam", "junk"}


def test_nb_scores_sum_and_oov(spark):
    pos = _docs(spark, [(1, "good clean prose"), (2, "good words")])
    neg = _docs(spark, [(3, "spam spam junk")])
    target = _docs(
        spark, [(10, "good unseen"), (11, "spam junk"), (12, "")]
    )
    out = {
        r.doc_id: (r.n_tokens, r.score)
        for r in nb_quality_scores(target, pos, neg).collect()
    }
    np_, nn, v = 5, 3, 6
    w_good = math.log(3 / (np_ + v)) - math.log(1 / (nn + v))
    oov = math.log(nn + v) - math.log(np_ + v)
    w_spam = math.log(1 / (np_ + v)) - math.log(3 / (nn + v))
    w_junk = math.log(1 / (np_ + v)) - math.log(2 / (nn + v))
    assert out[10] == (2, round(w_good + oov, 4))
    assert out[11] == (2, round(w_spam + w_junk, 4))
    assert 12 not in out  # empty doc: no tokens, no evidence
    # reference-like text scores above spam-like text
    assert out[10][1] > 0 > out[11][1]


def test_nb_lang_scores_recovers_planted_languages(spark):
    """Two planted 'languages' with disjoint character inventories:
    the char-3-gram NB must classify held-out docs of each, the
    per-language scores must match a hand NB computation, and the
    confusion matrix must be diagonal."""
    from openset_spark.pipeline.classify import (
        nb_lang_confusion,
        nb_lang_scores,
    )

    seed = spark.createDataFrame(
        [
            (1, "aaa bbb aab", "aa"),
            (2, "aba bab aab", "aa"),
            (3, "xxx yyy xxy", "xx"),
            (4, "xyx yxy xyy", "xx"),
        ],
        "doc_id long, text string, lang string",
    )
    docs = spark.createDataFrame(
        [(10, "aab aba", "aa"), (11, "xxy yxy", "xx")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in nb_lang_scores(docs, seed).collect()}
    assert out[10].lang_nb == "aa"
    assert out[11].lang_nb == "xx"
    # hand NB for doc 10: grams of "aab aba" under each class
    import collections

    def grams(t):
        return [t[i : i + 3] for i in range(len(t) - 2)]

    cnt = {"aa": collections.Counter(), "xx": collections.Counter()}
    for _, t, l in seed.collect():
        cnt[l].update(grams(t))
    v = len(set(cnt["aa"]) | set(cnt["xx"]))
    for lang in ("aa", "xx"):
        n_l = sum(cnt[lang].values())
        s = sum(
            math.log((cnt[lang][g] + 1) / (n_l + v))
            for g in grams("aab aba")
        )
        got = getattr(out[10], f"score_{lang}")
        assert got == pytest.approx(round(s, 4), abs=1e-9), lang
    conf = {
        (r.lang, r.lang_nb): r.n_docs
        for r in nb_lang_confusion(docs, seed).collect()
    }
    assert conf == {("aa", "aa"): 1, ("xx", "xx"): 1}


def test_nb_lang_rejects_unsafe_labels(spark):
    """Labels become column names (score_<lang>, _w_<lang>); a label
    with '.', '`' or spaces would break or collide at column
    resolution, so nb_lang_model must refuse it at train time
    (ADVICE r13 #5). Hyphens are safe in F.col and stay allowed."""
    from openset_spark.pipeline.classify import nb_lang_model, nb_lang_scores

    bad_seed = spark.createDataFrame(
        [(1, "aaa bbb", "en.US"), (2, "xxx yyy", "fr")],
        "doc_id long, text string, lang string",
    )
    with pytest.raises(ValueError, match="labels must match"):
        nb_lang_model(bad_seed)
    ok_seed = spark.createDataFrame(
        [(1, "aaa bbb aab", "en-US"), (2, "xxx yyy xxy", "fr_FR")],
        "doc_id long, text string, lang string",
    )
    docs = spark.createDataFrame(
        [(10, "aab aba", "en-US")], "doc_id long, text string, lang string"
    )
    out = nb_lang_scores(docs, ok_seed).collect()
    assert out[0]["lang_nb"] == "en-US"


def test_nb_lang_short_doc_and_tiebreak(spark):
    """A doc shorter than the gram width still scores (one truncated
    gram — the char_ngrams k<=0 contract); a doc whose rounded
    scores tie across languages takes the lexicographically smallest
    label (the documented argmax tiebreak)."""
    from openset_spark.pipeline.classify import nb_lang_scores

    seed = spark.createDataFrame(
        [(1, "abcabc", "l1"), (2, "abcabc", "l2")],
        "doc_id long, text string, lang string",
    )
    docs = spark.createDataFrame(
        [(10, "ab", "l1"), (11, "abc", "l1")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in nb_lang_scores(docs, seed).collect()}
    # identical seed corpora per class -> identical scores -> 'l1'
    assert out[10].n_grams == 1  # the single truncated gram "ab"
    assert out[10].score_l1 == out[10].score_l2
    assert out[10].lang_nb == "l1"
    assert out[11].lang_nb == "l1"


def test_quality_classifier_keep_fraction(spark):
    pos = _docs(spark, [(1, "alpha beta gamma")])
    neg = _docs(spark, [(2, "zock zock pow")])
    target = _docs(
        spark,
        [(i, "alpha beta") for i in range(10, 16)]
        + [(i, "zock pow") for i in range(20, 26)],
    )
    kept = {
        r.doc_id
        for r in quality_classifier_keep(
            target, pos, neg, keep_fraction=0.5
        ).collect()
    }
    assert kept == set(range(10, 16))


def test_group_cap_equals_window_rank(spark):
    """group_cap's grouped-prefix-sum rank must equal the per-group
    row_number filter on fuzzed data with heavy group skew (one group
    holds half the rows) and duplicate order values."""
    import random

    from pyspark.sql import Window

    from openset_spark.pipeline.sampling import group_cap

    rnd = random.Random(83)
    for trial in range(3):
        rows = [
            (
                i,
                "g0" if rnd.random() < 0.5 else f"g{rnd.randrange(1, 6)}",
                rnd.randrange(20),  # many ties
            )
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "id long, grp string, v long")
        k = rnd.randrange(3, 40)
        got = {
            r.id
            for r in group_cap(
                df, ["grp"], [F.desc("v"), F.asc("id")], k
            ).collect()
        }
        w = Window.partitionBy("grp").orderBy(F.desc("v"), F.asc("id"))
        want = {
            r.id
            for r in df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .collect()
        }
        assert got == want, (trial, k)


def test_edit1_pairs_finds_all_single_edits(spark):
    """Deletion-neighborhood exactness: substitution, insertion,
    deletion and equality pairs are all found with correct distances;
    distance-2 strings are not."""
    from openset_spark.pipeline.dedup import edit1_pairs

    rows = [
        (1, "spark rules"),
        (2, "spark rulez"),   # substitution -> dist 1
        (3, "spark rule"),    # deletion of 's' from 1 -> dist 1
        (4, "sparkk rules"),  # insertion -> dist 1 vs 1
        (5, "spark rules"),   # exact dup of 1 -> dist 0
        (6, "totally different"),
        (7, "spork rulez"),   # dist 2 from 1: must NOT pair with 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, title string")
    got = {
        (r.id_a, r.id_b): r.dist
        for r in edit1_pairs(df, "title").collect()
    }
    assert got[(1, 5)] == 0
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(1, 4)] == 1
    assert got[(2, 5)] == 1 and got[(3, 5)] == 1 and got[(4, 5)] == 1
    assert (1, 7) not in got and (5, 7) not in got
    assert got.get((2, 7)) == 1  # spork rulez vs spark rulez
    assert not any(6 in p for p in got)


def test_edit1_pairs_fuzz_vs_naive_levenshtein(spark):
    """Candidate completeness on random short strings: the
    neighborhood join must find EXACTLY the naive all-pairs
    levenshtein<=1 set."""
    import random

    from openset_spark.pipeline.dedup import edit1_pairs

    rnd = random.Random(29)
    alpha = "abc"
    for trial in range(3):
        rows = [
            (
                i,
                "".join(
                    rnd.choice(alpha) for _ in range(rnd.randrange(1, 7))
                ),
            )
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "doc_id long, title string")
        got = sorted(
            (r.id_a, r.id_b)
            for r in edit1_pairs(df, "title").collect()
        )
        a = df.selectExpr("doc_id AS id_a", "title AS ta")
        b = df.selectExpr("doc_id AS id_b", "title AS tb")
        naive = sorted(
            (r.id_a, r.id_b)
            for r in a.join(b, F.col("id_a") < F.col("id_b"))
            .filter(F.levenshtein("ta", "tb") <= 1)
            .collect()
        )
        assert got == naive, trial


def test_edit1_against_corpus_screen(spark):
    from openset_spark.pipeline.dedup import edit1_against

    corpus = spark.createDataFrame(
        [(100, "spark rules"), (101, "other title")],
        "doc_id long, title string",
    )
    docs = spark.createDataFrame(
        [
            (1, "spark rulez"),   # sub -> matches 100
            (2, "spark rules"),   # exact -> matches 100 dist 0
            (3, "sprk rules"),    # deletion -> matches 100
            (4, "unrelated text"),
            (5, "othr title"),    # deletion -> matches 101
        ],
        "doc_id long, title string",
    )
    got = {
        (r.doc_id, r.corpus_id): r.dist
        for r in edit1_against(docs, corpus, "title").collect()
    }
    assert got == {(1, 100): 1, (2, 100): 0, (3, 100): 1, (5, 101): 1}


def test_incremental_apply_equals_full_recompute(spark, sf_dir):
    """corpus_diff-driven incremental maintenance: carrying unchanged
    outputs + recomputing only added/changed docs must equal the full
    recompute EXACTLY, for a per-document operator (token counts +
    char entropy here); removed docs drop out."""
    from openset_spark.pipeline.compose import incremental_apply
    from openset_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter("doc_id % 11 <> 3")  # some ids absent from old
    new = docs.filter("doc_id % 7 <> 2").withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" CHANGED")))
        .otherwise(F.col("text")),
    )

    def per_doc(df):
        from openset_spark.functions.text import token_count

        return df.select(
            "doc_id",
            token_count(F.col("text")).alias("n_tokens"),
            F.length("text").alias("n_chars"),
        )

    old_out = per_doc(old)
    got = sorted(
        map(tuple, incremental_apply(old, new, old_out, per_doc).collect())
    )
    want = sorted(map(tuple, per_doc(new).collect()))
    assert got == want and len(want) > 50


def test_nb_lang_routes_real_natural_language(spark):
    """Realism check the synthetic corpus cannot give (its labels are
    uncorrelated with text): train on a few real sentences per
    language, classify held-out sentences of each — char-3-gram NB
    must route all of them, including the diacritic-free German/
    Spanish ones a stopword list would need exact word hits for."""
    from openset_spark.pipeline.classify import nb_lang_scores

    seed_rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "this is a short example of english prose for training", "en"),
        (3, "we went to the market and bought some fresh bread", "en"),
        (4, "der schnelle braune fuchs springt über den faulen hund", "de"),
        (5, "das ist ein kurzes beispiel für deutschen text", "de"),
        (6, "wir gingen zum markt und kauften frisches brot", "de"),
        (7, "le renard brun rapide saute par dessus le chien", "fr"),
        (8, "ceci est un court exemple de texte français", "fr"),
        (9, "nous sommes allés au marché acheter du pain frais", "fr"),
        (10, "el rápido zorro marrón salta sobre el perro perezoso", "es"),
        (11, "este es un breve ejemplo de texto en español", "es"),
        (12, "fuimos al mercado y compramos pan fresco", "es"),
    ]
    seed = spark.createDataFrame(
        seed_rows, "doc_id long, text string, lang string"
    )
    held_out = spark.createDataFrame(
        [
            (100, "the dog sleeps while the fox runs through the field", "en"),
            (101, "der hund schläft während der fuchs durch das feld läuft", "de"),
            (102, "le chien dort pendant que le renard court", "fr"),
            (103, "el perro duerme mientras el zorro corre", "es"),
            (104, "ein weiteres beispiel mit einigen deutschen worten", "de"),
            (105, "un autre exemple avec quelques mots", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        r.doc_id: r.lang_nb
        for r in nb_lang_scores(held_out, seed).collect()
    }
    want = {r.doc_id: r.lang for r in held_out.collect()}
    assert got == want


def test_nb_labeled_model_bit_identical_to_two_pass(spark):
    """The one-scan labeled trainer must produce bit-identical weights
    and oov to the two-pass (pos, neg) form, including NULL-label rows
    (neither class) and tokens seen in only one class."""
    from openset_spark.pipeline.classify import nb_quality_model_labeled

    docs = spark.createDataFrame(
        [
            (1, "good clean prose", "ref"),
            (2, "good words", "ref"),
            (3, "spam spam junk", "crawl"),
            (4, "orphan words", None),  # NULL label: excluded
        ],
        "doc_id long, text string, src string",
    )
    lbl = F.col("src") == "ref"
    pos = docs.filter(lbl)
    neg = docs.filter(~lbl)
    w2, oov2 = nb_quality_model(pos, neg)
    w1, oov1 = nb_quality_model_labeled(docs, lbl)
    assert oov1 == oov2
    m2 = {r.token: r.weight for r in w2.collect()}
    m1 = {r.token: r.weight for r in w1.collect()}
    assert m1 == m2  # bit-identical doubles, same vocabulary
    assert "orphan" not in m1

    s2 = sorted(map(tuple, nb_quality_scores(docs, pos, neg).collect()))
    s1 = sorted(
        map(tuple, nb_quality_scores(docs, pos_label=lbl).collect())
    )
    assert s1 == s2
