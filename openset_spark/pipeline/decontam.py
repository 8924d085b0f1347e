"""Benchmark decontamination — the training-data hygiene pass that
removes (or flags) documents overlapping an evaluation benchmark
(the n-gram-overlap shape of GPT-3 App. C / Gopher App. A1.2): a
document is contaminated when any of its word n-grams appears in the
benchmark corpus; the overlap fraction grades severity.

Spark-first scale posture: benchmark corpora are SMALL by nature
(eval sets, not training sets), so the benchmark n-gram set is
distinct-ed and BROADCAST; the 100 TB corpus side is one explode +
one hash-aggregate with no shuffle of raw text. The n-grams are over
the same normalized whitespace tokens every other text operator uses
(``functions/text.py::tokens``), so oracles compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openset_spark.functions.text import tokens


def _ngram_expr(col: str, n: int):
    """Sliding word n-grams of a token-array column (JVM higher-order
    functions — no Python in the loop)."""
    return F.expr(
        f"transform(sequence(0, size({col})-{n}), "
        f"i -> concat_ws(' ', slice({col}, i+1, {n})))"
    )


def benchmark_ngrams(
    benchmark: DataFrame, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """The distinct n-gram set of a benchmark corpus (broadcast side)."""
    return (
        benchmark.select(tokens(F.col(text_col)).alias("toks"))
        .filter(F.size("toks") >= n)
        .select(F.explode(_ngram_expr("toks", n)).alias("ng"))
        .distinct()
    )


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document benchmark overlap: (doc_id, n_ngrams, n_hits,
    overlap_frac, contaminated). ``contaminated`` is any-hit — the
    conservative decontamination rule; filter on ``overlap_frac`` for
    a graded policy. Documents with fewer than ``n`` tokens have no
    n-grams and are excluded (they cannot leak a benchmark item)."""
    bench = F.broadcast(
        benchmark_ngrams(benchmark, n=n, text_col=text_col).withColumn(
            "_hit", F.lit(1)
        )
    )
    doc_grams = (
        corpus.select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
        .filter(F.size("toks") >= n)
        .select(id_col, F.explode(_ngram_expr("toks", n)).alias("ng"))
    )
    agg = doc_grams.join(bench, "ng", "left").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.count("_hit").alias("n_hits"),
    )
    return agg.select(
        id_col,
        "n_ngrams",
        "n_hits",
        F.round(F.col("n_hits") / F.col("n_ngrams"), 4).alias("overlap_frac"),
        (F.col("n_hits") > 0).alias("contaminated"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    max_overlap: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop contaminated documents from the corpus: keeps rows whose
    benchmark n-gram overlap fraction is <= ``max_overlap`` (0.0 =
    any-hit removal). Anti-join on the flagged id set — the corpus
    rows themselves are never shuffled."""
    flagged = ngram_overlap(
        corpus, benchmark, n=n, text_col=text_col, id_col=id_col
    ).filter(F.col("overlap_frac") > max_overlap)
    return corpus.join(
        F.broadcast(flagged.select(id_col)), id_col, "left_anti"
    )
