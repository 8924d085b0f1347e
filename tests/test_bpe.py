"""BPE tokenizer training (pipeline/bpe.py): hand-verified merges on
the classic Sennrich-style corpus, encode correctness, lossless
reconstruction, and partitioning-independence of the learned table."""

from __future__ import annotations

from pyspark.sql import functions as F

from openset_spark.pipeline.bpe import (
    END,
    bpe_encode,
    encode_word,
    train_bpe,
    word_counts,
)

CORPUS = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


def _corpus_df(spark, partitions=1):
    rows = [(i, w) for i, w in enumerate(CORPUS)]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(
        partitions
    )


def test_train_bpe_hand_verified_merges(spark):
    """First four merges computed by hand: pair frequencies are
    (e,s)=(s,t)=(t,</w>)=9 in round 1 — the lexicographically
    greatest pair wins each tie — then the est</w> chain collapses,
    then (o,w)=7 beats (l,o)=7 on the same rule."""
    merges = train_bpe(_corpus_df(spark), num_merges=4)
    assert merges == [
        ("t", END),
        ("s", "t" + END),
        ("e", "st" + END),
        ("o", "w"),
    ]


def test_encode_word_applies_ranks_in_order(spark):
    merges = train_bpe(_corpus_df(spark), num_merges=4)
    ranks = {p: i for i, p in enumerate(merges)}
    # 'lowest' never appears in the corpus but reuses its merges
    assert encode_word("lowest", ranks) == ["l", "ow", "est" + END]
    # no applicable merges -> characters + end marker
    assert encode_word("qq", ranks) == ["q", "q", END]


def test_bpe_encode_lossless_and_monotone(spark):
    df = spark.createDataFrame(
        [(1, "the lowest low"), (2, "newest widest lower"), (3, None)],
        "doc_id long, text string",
    )
    train = _corpus_df(spark)
    few = train_bpe(train, num_merges=2)
    many = train_bpe(train, num_merges=12)

    out_few = {r.doc_id: r for r in bpe_encode(df, few).collect()}
    out_many = {r.doc_id: r for r in bpe_encode(df, many).collect()}

    # lossless: concatenating pieces and splitting on </w> restores
    # the normalized words
    for out in (out_few, out_many):
        joined = "".join(out[1].bpe_pieces)
        assert joined == "the" + END + "lowest" + END + "low" + END
    # more merges never produce more pieces
    for d in (1, 2):
        assert out_many[d].n_pieces <= out_few[d].n_pieces
    assert out_many[3].bpe_pieces == [] and out_many[3].n_pieces == 0


def test_train_bpe_partitioning_independent(spark):
    """Same corpus, 1 vs 8 partitions -> identical merge table (the
    determinism contract: tie-breaks never depend on row order)."""
    m1 = train_bpe(_corpus_df(spark, 1), num_merges=10)
    m8 = train_bpe(_corpus_df(spark, 8), num_merges=10)
    assert m1 == m8 and len(m1) == 10


def test_word_counts_min_freq_prunes(spark):
    wc = {
        r.word: r.freq
        for r in word_counts(_corpus_df(spark), min_freq=3).collect()
    }
    assert wc == {"low": 5, "newest": 6, "widest": 3}
