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

    scored = toked.mapInPandas(
        run, f"{id_col} long, n_tokens long, _raw double"
    )
    return scored.select(
        id_col, "n_tokens", F.round("_raw", 4).alias("score")
    )
