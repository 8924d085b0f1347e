"""Unigram-LM (SentencePiece-family) tokenizer training: EM
likelihood monotonicity, Viterbi semantics, lossless encoding,
determinism under partitioning, and the distributed encode path."""

from __future__ import annotations

import math

from pyspark.sql import functions as F  # noqa: F401

CORPUS = [
    (1, "low low low low low lower lower newest newest newest"),
    (2, "newest newest newest widest widest low lowest lowest"),
    (3, "new new new wider wider wide wide low low lower"),
]


def _train(spark, vocab_size=40, **kw):
    from openset_spark.pipeline.unigram import train_unigram

    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    return train_unigram(df, vocab_size=vocab_size, seed_size=60, **kw)


def test_em_likelihood_monotone_without_pruning(spark):
    # vocab_size big enough that no pruning round fires: every
    # recorded round is a pure (E, M) sweep -> LL must not decrease
    model, history = _train(spark, vocab_size=200, em_iters=4)
    assert len(history) >= 4
    for a, b in zip(history, history[1:]):
        assert b >= a - 1e-9, history


def test_multi_char_pieces_learned_and_bounded(spark):
    model, _ = _train(spark, vocab_size=12)
    multi = {p for p in model if len(p) > 1}
    chars = {p for p in model if len(p) == 1}
    # the reusable stems of the classic corpus survive pruning
    assert any("low" in p or "new" in p or "est" in p for p in multi)
    # bound respected: multi-char pieces fit vocab_size minus chars
    assert len(multi) <= max(12 - len(chars), 0) or len(multi) <= 12
    # a proper distribution over surviving pieces (chars may sit at
    # the floor): non-floor mass sums to ~1
    total = sum(math.exp(lp) for lp in model.values() if lp > -99)
    assert abs(total - 1.0) < 1e-6


def test_viterbi_prefers_likely_segmentation():
    from openset_spark.pipeline.unigram import viterbi_encode_word

    model = {
        "un": math.log(0.3),
        "related": math.log(0.3),
        "unrelated": math.log(0.05),
        "u": math.log(0.05),
        "n": math.log(0.05),
        "r": math.log(0.05),
        "e": math.log(0.05),
        "l": math.log(0.05),
        "a": math.log(0.05),
        "t": math.log(0.05),
        "d": math.log(0.05),
    }
    # P(un)*P(related) = 0.09 > P(unrelated) = 0.05 > char spelling
    assert viterbi_encode_word("unrelated", model, 9) == ["un", "related"]
    # single-piece wins when its prob beats the product
    model["unrelated"] = math.log(0.5)
    assert viterbi_encode_word("unrelated", model, 9) == ["unrelated"]


def test_viterbi_oov_chars_fall_back_lossless():
    from openset_spark.pipeline.unigram import viterbi_encode_word

    model = {"ab": math.log(0.9), "a": math.log(0.05), "b": math.log(0.05)}
    pieces = viterbi_encode_word("abxab", model)
    assert "".join(pieces) == "abxab"
    assert "x" in pieces  # OOV char spelled at the floor, not dropped


def test_training_deterministic_under_partitioning(spark):
    from openset_spark.pipeline.unigram import train_unigram

    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    m1, h1 = train_unigram(df.repartition(1), vocab_size=15, seed_size=60)
    m7, h7 = train_unigram(df.repartition(7), vocab_size=15, seed_size=60)
    assert m1 == m7
    assert h1 == h7


def test_unigram_encode_dataframe_path(spark):
    from openset_spark.pipeline.unigram import (
        train_unigram,
        unigram_encode,
        viterbi_encode_word,
    )

    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    model, _ = train_unigram(df, vocab_size=20, seed_size=60)
    out = unigram_encode(df, model).collect()
    assert {r.doc_id for r in out} == {1, 2, 3}
    by_id = {r.doc_id: r for r in out}
    for doc_id, text in CORPUS:
        r = by_id[doc_id]
        assert r.n_pieces == len(r.uni_pieces)
        # lossless: concatenation restores the whitespace-split words
        assert "".join(r.uni_pieces) == text.replace(" ", "")
        # distributed path == driver-side Viterbi, word by word
        expect = []
        for w in text.split():
            expect.extend(viterbi_encode_word(w, model))
        assert r.uni_pieces == expect


def test_unigram_encode_null_text(spark):
    from openset_spark.pipeline.unigram import unigram_encode

    df = spark.createDataFrame(
        [(1, None), (2, "ab")], "doc_id long, text string"
    )
    model = {"a": math.log(0.5), "b": math.log(0.5)}
    out = {r.doc_id: r for r in unigram_encode(df, model).collect()}
    assert out[1].uni_pieces == [] and out[1].n_pieces == 0
    assert out[2].uni_pieces == ["a", "b"]
