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

import pandas as pd  # noqa: F401 — resolves the pandas-UDF type hints
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
    # no forced broadcast here: the flagged-id set scales with
    # CONTAMINATION VOLUME (unbounded), not the small benchmark — a
    # heavily contaminated corpus would blow the broadcast limit. AQE
    # picks broadcast at runtime whenever the set is in fact small
    # (ADVICE r6).
    return corpus.join(flagged.select(id_col), id_col, "left_anti")


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


MAX_LITERAL_HASHES = 65_536


def contamination_flag(
    bench_hashes: list[int],
    n: int = 5,
    text_col: str = "text",
    max_literal_hashes: int = MAX_LITERAL_HASHES,
):
    """A COLUMN expression flagging documents that share any word
    n-gram with the benchmark. No join, no state — safe in any
    context, including Structured Streaming. Documents with fewer
    than ``n`` tokens (or null text) produce an empty gram array and
    flag false. Tokenization and hashing match
    ``benchmark_ngram_hashes`` exactly (normalize + split + xxhash64
    of the space-joined gram).

    Two probe strategies, same exact result (parity-locked either
    way):

    * up to ``max_literal_hashes`` benchmark grams, the hash set is
      an array LITERAL probed with ``arrays_overlap`` — pure JVM,
      whole-stage codegen (the same literals-in-expression trick the
      IVF centroids use);
    * above it (a consolidated benchmark suite can reach 10⁶–10⁷
      distinct grams), a multi-million-element literal would blow up
      codegen/plan serialization long before memory, so the set ships
      once per executor inside an Arrow-batched pandas UDF closure
      and each document's JVM-built gram array is probed against a
      Python frozenset — EXACT membership (no Bloom false positives
      to break batch parity), still stateless and streaming-safe.
    """
    t = f"split(trim(regexp_replace(lower({text_col}), '\\\\s+', ' ')), ' ')"
    grams = F.expr(
        f"CASE WHEN size({t}) >= {n} THEN "
        f"transform(sequence(0, size({t}) - {n}), "
        f"i -> xxhash64(concat_ws(' ', slice({t}, i+1, {n})))) "
        f"ELSE cast(array() as array<bigint>) END"
    )
    if not bench_hashes:
        return F.lit(False)
    if len(bench_hashes) <= max_literal_hashes:
        bench = F.array(*[F.lit(h) for h in bench_hashes])
        return F.arrays_overlap(grams, bench)

    from pyspark.sql.functions import pandas_udf

    hs = frozenset(bench_hashes)

    @pandas_udf("boolean")
    def _probe(gram_arrays: pd.Series) -> pd.Series:
        return gram_arrays.map(
            lambda arr: arr is not None and any(int(g) in hs for g in arr)
        )

    return _probe(grams)


def stream_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    bench_hashes: list[int] | None = None,
    max_literal_hashes: int = MAX_LITERAL_HASHES,
) -> DataFrame:
    """Ingest-time decontamination for a document STREAM: drop any
    arriving document sharing an n-gram with the benchmark. Stateless
    (a row either overlaps the fixed benchmark or it doesn't), so it
    composes with any downstream streaming operator; the batch
    `decontaminate` with max_overlap=0 is its oracle (parity-tested).
    Documents with fewer than ``n`` tokens pass through — they cannot
    leak a benchmark item. Small benchmarks probe as a JVM array
    literal; above ``max_literal_hashes`` the exact
    pandas-UDF-closure path takes over (see `contamination_flag`).
    ``bench_hashes`` accepts a precomputed hash set (e.g. persisted
    from a previous run) instead of deriving it from ``benchmark``."""
    if bench_hashes is None:
        bench_hashes = benchmark_ngram_hashes(benchmark, n=n, text_col=text_col)
    flag = contamination_flag(
        bench_hashes,
        n=n,
        text_col=text_col,
        max_literal_hashes=max_literal_hashes,
    )
    return docs.filter(~flag)


def ngram_coverage(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-side coverage — the inverse direction of
    `ngram_overlap`: for every BENCHMARK document, how many of its
    distinct n-grams appear anywhere in the training corpus. The
    eval-integrity report reads this ("which benchmark items does
    the corpus already contain"), while decontamination reads the
    corpus-side report.

    Scale shape: the corpus collapses to its DISTINCT n-gram set
    ONCE (one hash aggregate — the join key frame, not the corpus,
    flows into the join) and benchmark grams probe it with a left
    join; n_covered uses exact integer counts. Output per benchmark
    doc: (doc_id, n_grams, n_covered, coverage_ppm) with
    coverage_ppm = (n_covered * 1_000_000) div n_grams — integer
    floor division, engine-exact."""
    corpus_grams = (
        corpus.select(tokens(F.col(text_col)).alias("toks"))
        .filter(F.size("toks") >= n)
        .select(F.explode(_ngram_expr("toks", n)).alias("ng"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    bench_grams = (
        benchmark.select(
            F.col(id_col), tokens(F.col(text_col)).alias("toks")
        )
        .filter(F.size("toks") >= n)
        .select(
            id_col,
            F.explode(F.array_distinct(_ngram_expr("toks", n))).alias("ng"),
        )
    )
    agg = bench_grams.join(corpus_grams, "ng", "left").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("_hit").alias("n_covered"),
    )
    return agg.select(
        id_col,
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_covered").cast("long").alias("n_covered"),
        F.expr(
            "(CAST(n_covered AS BIGINT) * 1000000) div n_grams"
        ).alias("coverage_ppm"),
    )
