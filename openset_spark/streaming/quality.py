"""Live quality gate — the streaming twin of the NB reference-vs-
crawl classifier (pipeline/classify.py): score every arriving
document against a FROZEN model and tag or drop it at ingest, before
anything downstream pays for it."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openset_spark.functions.text import tokens


def stream_nb_quality(
    docs: DataFrame,
    weights: dict[str, float],
    oov: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, score) per arriving document with >= 1 token —
    the 24th parity surface. The model (token -> log-odds weight +
    closed-form OOV weight) is trained batch-side by
    ``nb_quality_model`` and shipped as a plain dict in the closure:
    vocabulary-bounded, the contamination-frozenset precedent, so
    there is no state store and no stream-static join — scoring is a
    stateless Arrow pass, exact for any micro-batch split.

    Tokenization happens JVM-SIDE with the exact ``tokens()``
    expression the batch scorer uses (the pandas worker only sees
    token arrays), so the twins cannot drift on regex/locale
    semantics; the score is rounded JVM-side on the output frame
    (both twins HALF_UP — the r9 streaming-drift lesson)."""
    import pandas as pd
    from typing import Iterator

    toked = docs.select(
        F.col(id_col),
        F.filter(tokens(F.col(text_col)), lambda t: t != "").alias(
            "_toks"
        ),
    ).filter(F.size("_toks") >= 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        get = weights.get
        for pdf in batches:
            ids, ns, scores = [], [], []
            for did, toks in zip(pdf[id_col], pdf["_toks"]):
                s = 0.0
                for t in toks:
                    s += get(t, oov)
                ids.append(did)
                ns.append(len(toks))
                scores.append(s)
            yield pd.DataFrame(
                {id_col: ids, "n_tokens": ns, "_raw": scores}
            )

    id_type = docs.schema[id_col].dataType.simpleString()
    scored = toked.mapInPandas(
        run, f"{id_col} {id_type}, n_tokens long, _raw double"
    )
    return scored.select(
        id_col, "n_tokens", F.round("_raw", 4).alias("score")
    )


def stream_lang_id(
    docs: DataFrame,
    weights: dict[str, list[float]],
    langs: list[str],
    oov: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(id, n_grams, score_<lang>..., lang_nb) per arriving document —
    the live ingest router twin of ``classify.nb_lang_scores`` (36th
    parity surface). The frozen model maps gram -> per-language
    weight vector (aligned with ``langs``; ``oov`` is the unseen-gram
    vector), trained batch-side by ``nb_lang_model`` and shipped in
    the closure like stream_nb_quality's dict — vocabulary-bounded,
    no state store, no stream-static join; scoring is a stateless
    Arrow pass, exact for any micro-batch split.

    Gram construction happens JVM-SIDE with the exact char_ngrams
    expression the batch scorer uses; per-language sums are rounded
    JVM-side and the argmax compares the ROUNDED scores with the
    batch twin's lexicographic tiebreak — so stream and batch cannot
    drift on normalization, rounding, or tie policy."""
    import pandas as pd
    from typing import Iterator

    from openset_spark.functions.text import (
        char_ngrams_from_norm,
        normalize,
    )

    if len(oov) != len(langs):
        raise ValueError("oov vector must align with langs")
    # normalize projected FIRST — no CSE inside transform lambdas
    # (see char_ngrams_from_norm; O(len²) per doc otherwise)
    grammed = docs.select(
        F.col(id_col), normalize(F.col(text_col)).alias("_nt")
    ).select(
        F.col(id_col),
        F.filter(
            char_ngrams_from_norm(F.col("_nt"), n), lambda g: g != ""
        ).alias("_grams"),
    ).filter(F.size("_grams") >= 1)
    width = len(langs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        get = weights.get
        for pdf in batches:
            ids, ns, sums = [], [], [[] for _ in range(width)]
            for did, grams in zip(pdf[id_col], pdf["_grams"]):
                acc = [0.0] * width
                for g in grams:
                    w = get(g, oov)
                    for i in range(width):
                        acc[i] += w[i]
                ids.append(did)
                ns.append(len(grams))
                for i in range(width):
                    sums[i].append(acc[i])
            yield pd.DataFrame(
                {id_col: ids, "n_grams": ns}
                | {f"_raw_{i}": sums[i] for i in range(width)}
            )

    # the id's Arrow schema follows the INPUT column type — a
    # hardcoded 'long' would kill the query on string ids despite
    # id_col= advertising generality (code review r13)
    id_type = docs.schema[id_col].dataType.simpleString()
    raw_schema = f"{id_col} {id_type}, n_grams long, " + ", ".join(
        f"_raw_{i} double" for i in range(width)
    )
    scored = grammed.mapInPandas(run, raw_schema).select(
        id_col,
        "n_grams",
        *[
            F.round(f"_raw_{i}", 4).alias(f"score_{l}")
            for i, l in enumerate(langs)
        ],
    )
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    guess = F.coalesce(
        *[F.when(F.col(f"score_{l}") == best, F.lit(l)) for l in langs]
    )
    return scored.select(
        id_col,
        "n_grams",
        *[f"score_{l}" for l in langs],
        guess.alias("lang_nb"),
    )
