"""Unigram language-model tokenizer training (SentencePiece family).

The Kudo 2018 algorithm ("Subword Regularization"), split exactly the
way ``pipeline/bpe.py`` splits BPE — and the way SentencePiece itself
splits it:

* the CORPUS pass is distributed — the single (word, freq) hash
  aggregate (shared with BPE via ``word_counts``) is the only pass
  that touches raw text at 100 TB;
* SEED + EM + PRUNE run on that aggregated vocabulary, explicitly
  bounded by ``min_freq`` / ``max_words`` (rare words carry
  negligible likelihood mass — the same pruning every production
  trainer applies). Each EM round is one forward-backward lattice
  pass per distinct word — pure Python over the bounded table;
* ENCODING is per-word Viterbi over the learned piece log-probs,
  run inside Arrow batches with a per-batch word memo (cost per
  DISTINCT word), the model shipping once per executor in the UDF
  closure.

Determinism: seed selection breaks count ties on the piece string,
EM iterates words and spans in sorted order, pruning breaks
expected-count ties on the piece string — so the same corpus yields
the same model under ANY partitioning (asserted in tests). Single
characters are never pruned, so every in-vocabulary word stays
segmentable; characters absent from the model fall back to a
floor log-prob, keeping encoding total (lossless reconstruction is
asserted property-style).

EM guarantee: each (E, M) round cannot decrease the corpus marginal
likelihood; the returned ``history`` exposes per-round
log-likelihoods and the test suite asserts monotonicity.
"""

from __future__ import annotations

import math

import pandas as pd  # noqa: F401 — resolves the pandas-UDF type hints
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openset_spark.pipeline.bpe import word_counts

_UNK_LOGP = -100.0  # floor for characters outside the model


def _logsumexp(vals: list[float]) -> float:
    m = max(vals)
    if m == -math.inf:
        return m
    return m + math.log(sum(math.exp(v - m) for v in vals))


def _seed_vocab(
    words: list[tuple[str, int]], seed_size: int, max_piece_len: int
) -> dict[str, float]:
    """Frequent-substring seed: every substring up to
    ``max_piece_len`` weighted by word frequency; top ``seed_size``
    by (count, piece) with single characters always retained."""
    counts: dict[str, int] = {}
    for w, f in words:
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0) + f
    chars = {p for p in counts if len(p) == 1}
    multi = sorted(
        ((c, p) for p, c in counts.items() if len(p) > 1),
        key=lambda cp: (-cp[0], cp[1]),
    )
    keep = {p for _, p in multi[: max(seed_size - len(chars), 0)]} | chars
    total = sum(counts[p] for p in keep)
    return {p: math.log(counts[p] / total) for p in sorted(keep)}


def _word_spans(w: str, model: dict[str, float], max_len: int):
    """Lattice edges: (start, end, piece, logp) for every model piece
    occurring in ``w``; bare characters get the UNK floor when
    missing so the lattice always connects."""
    n = len(w)
    for i in range(n):
        for j in range(i + 1, min(i + max_len, n) + 1):
            p = w[i:j]
            lp = model.get(p)
            if lp is not None:
                yield i, j, p, lp
            elif j == i + 1:
                yield i, j, p, _UNK_LOGP


def _forward_backward(
    w: str, model: dict[str, float], max_len: int
) -> tuple[float, dict[str, float]]:
    """One word's marginal log-likelihood and per-piece posterior
    expected counts under the current model."""
    n = len(w)
    spans = list(_word_spans(w, model, max_len))
    alpha = [-math.inf] * (n + 1)
    alpha[0] = 0.0
    by_end: list[list] = [[] for _ in range(n + 1)]
    by_start: list[list] = [[] for _ in range(n + 1)]
    for i, j, p, lp in spans:
        by_end[j].append((i, p, lp))
        by_start[i].append((j, p, lp))
    for j in range(1, n + 1):
        vals = [alpha[i] + lp for i, _, lp in by_end[j]]
        if vals:
            alpha[j] = _logsumexp(vals)
    beta = [-math.inf] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        vals = [lp + beta[j] for j, _, lp in by_start[i]]
        if vals:
            beta[i] = _logsumexp(vals)
    z = alpha[n]
    counts: dict[str, float] = {}
    if z == -math.inf:  # unreachable by construction, kept defensive
        return z, counts
    for i, j, p, lp in spans:
        post = math.exp(alpha[i] + lp + beta[j] - z)
        counts[p] = counts.get(p, 0.0) + post
    return z, counts


def _em_round(
    words: list[tuple[str, int]], model: dict[str, float], max_len: int
) -> tuple[dict[str, float], float]:
    """One full (E, M) sweep: returns (new model, corpus
    log-likelihood under the INPUT model)."""
    expected: dict[str, float] = {}
    ll = 0.0
    for w, f in words:
        z, counts = _forward_backward(w, model, max_len)
        ll += f * z
        for p, c in counts.items():
            if p in model:  # UNK floor chars carry no parameter
                expected[p] = expected.get(p, 0.0) + f * c
    total = sum(expected.values())
    if total == 0.0:  # degenerate corpus (no segmentable words)
        return dict(model), ll
    new = {
        p: math.log(expected[p] / total)
        for p in sorted(model)
        if expected.get(p, 0.0) > 0.0
    }
    # pieces with zero posterior mass vanish; single chars are kept
    # at the floor so the lattice stays total
    for p in model:
        if len(p) == 1 and p not in new:
            new[p] = _UNK_LOGP
    return new, ll


def train_unigram(
    corpus: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    min_freq: int = 1,
    max_words: int = 1_000_000,
    seed_size: int = 2_000,
    max_piece_len: int = 8,
    em_iters: int = 2,
    prune_frac: float = 0.25,
) -> tuple[dict[str, float], list[float]]:
    """Learn a unigram tokenizer model: returns (piece -> log-prob,
    per-round corpus log-likelihood history). The driver holds only
    the pruned (word, freq) vocabulary and the (bounded) piece
    table — never corpus text."""
    wc = word_counts(corpus, text_col, min_freq)
    rows = (
        wc.orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    words = sorted((r["word"], r["freq"]) for r in rows)
    model = _seed_vocab(words, seed_size, max_piece_len)
    history: list[float] = []
    while True:
        for _ in range(em_iters):
            model, ll = _em_round(words, model, max_piece_len)
            history.append(ll)
        n_multi = sum(1 for p in model if len(p) > 1)
        n_chars = len(model) - n_multi
        target_multi = max(vocab_size - n_chars, 0)
        if n_multi <= target_multi:
            break
        # prune the lowest-expected-mass multi-char pieces (ties on
        # the piece string), at most prune_frac of them per round —
        # the SentencePiece schedule, keeping EM between cuts
        expected: dict[str, float] = {}
        for w, f in words:
            z, counts = _forward_backward(w, model, max_piece_len)
            for p, c in counts.items():
                if p in model and len(p) > 1:
                    expected[p] = expected.get(p, 0.0) + f * c
        ranked = sorted(
            ((expected.get(p, 0.0), p) for p in model if len(p) > 1),
            key=lambda cp: (cp[0], cp[1]),
        )
        n_cut = min(
            max(int(n_multi * prune_frac), 1), n_multi - target_multi
        )
        for _, p in ranked[:n_cut]:
            del model[p]
    # final renormalization pass so log-probs sum to 1
    model, ll = _em_round(words, model, max_piece_len)
    history.append(ll)
    return model, history


def viterbi_encode_word(
    word: str, model: dict[str, float], max_piece_len: int = 8
) -> list[str]:
    """Single best segmentation under the model (ties prefer the
    longer trailing piece, deterministically)."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(j - max_piece_len, 0), j):
            p = word[i:j]
            lp = model.get(p)
            if lp is None:
                if j - i > 1:
                    continue
                lp = _UNK_LOGP
            cand = best[i] + lp
            if cand > best[j] or (
                cand == best[j]
                and back[j] is not None
                and i < back[j][0]
            ):
                best[j] = cand
                back[j] = (i, p)
    out: list[str] = []
    j = n
    while j > 0:
        i, p = back[j]
        out.append(p)
        j = i
    out.reverse()
    return out


def unigram_encode(
    df: DataFrame,
    model: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "uni_pieces",
    max_piece_len: int = 8,
) -> DataFrame:
    """Tokenize documents with a trained unigram model: (id, pieces
    array, n_pieces) — Arrow batches, per-batch word memo, model in
    the executor closure (the bpe_encode shape)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return []
            out = []
            for w in text.lower().split():
                if w not in memo:
                    memo[w] = viterbi_encode_word(w, model, max_piece_len)
                out.extend(memo[w])
            return out

        return texts.map(enc)

    return df.select(
        F.col(id_col),
        _encode(F.col(text_col)).alias(out_col),
    ).withColumn("n_pieces", F.size(F.col(out_col)))
