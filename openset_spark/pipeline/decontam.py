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


def benchmark_ngram_hashes(
    benchmark: DataFrame, n: int = 5, text_col: str = "text"
) -> list[int]:
    """The benchmark's distinct n-gram xxhash64 set, collected to the
    driver. Eval benchmarks are small by definition (the same reason
    the batch path broadcasts them), so this is a bounded collect —
    the list becomes a literal in the streaming filter expression."""
    rows = (
        benchmark_ngrams(benchmark, n=n, text_col=text_col)
        .select(F.xxhash64("ng").alias("h"))
        .collect()
    )
    return sorted(r.h for r in rows)


def contamination_flag(
    bench_hashes: list[int], n: int = 5, text_col: str = "text"
):
    """A pure COLUMN expression flagging documents that share any
    word n-gram with the benchmark: the document's n-gram hashes are
    built with JVM higher-order functions and probed against the
    benchmark hash set as an array literal (the same
    literals-in-expression trick the IVF centroids use). No join, no
    state — safe in any context, including Structured Streaming.
    Documents with fewer than ``n`` tokens (or null text) produce an
    empty gram array and flag false. Tokenization and hashing match
    ``benchmark_ngram_hashes`` exactly (normalize + split + xxhash64
    of the space-joined gram)."""
    t = f"split(trim(regexp_replace(lower({text_col}), '\\\\s+', ' ')), ' ')"
    grams = F.expr(
        f"CASE WHEN size({t}) >= {n} THEN "
        f"transform(sequence(0, size({t}) - {n}), "
        f"i -> xxhash64(concat_ws(' ', slice({t}, i+1, {n})))) "
        f"ELSE cast(array() as array<bigint>) END"
    )
    if not bench_hashes:
        return F.lit(False)
    bench = F.array(*[F.lit(h) for h in bench_hashes])
    return F.arrays_overlap(grams, bench)


def stream_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Ingest-time decontamination for a document STREAM: drop any
    arriving document sharing an n-gram with the benchmark. Stateless
    (a row either overlaps the fixed benchmark or it doesn't), so it
    composes with any downstream streaming operator; the batch
    `decontaminate` with max_overlap=0 is its oracle (parity-tested).
    Documents with fewer than ``n`` tokens pass through — they cannot
    leak a benchmark item."""
    flag = contamination_flag(
        benchmark_ngram_hashes(benchmark, n=n, text_col=text_col),
        n=n,
        text_col=text_col,
    )
    return docs.filter(~flag)
