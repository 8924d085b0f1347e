"""Corpus-level relevance scoring: TF-IDF top terms and BM25 search.

Training-data pipelines use these constantly — TF-IDF terms as cheap
document keywords / topic proxies, BM25 to pull query-relevant shards
out of a web-scale corpus (e.g. targeted data selection a la
"retrieve then filter").

Scale shape (100 TB posture):
- one token explode + per-(doc, term) count is the only wide shuffle;
- the term -> document-frequency table is vocabulary-sized: small
  next to the corpus but unbounded, so its join onto the tf frame is
  left to AQE (broadcast when it fits, shuffle join when it doesn't);
  BM25's df table is query-sized and always broadcast;
- corpus-level scalars (doc count, average doc length) ride a 1-row
  broadcast cross join;
- top-k per doc is a bounded window partitioned by doc_id.

All math is JVM built-ins (ln/round) — no Python in the hot path.
Scores are ROUND(x, 4) and ranked on the ROUNDED value with a term /
doc_id tie-break, so the DuckDB oracle reproduces the ordering
bit-for-bit (the same portability pattern as pipeline/lm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openset_spark.functions.text import tokens


def _tf(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, tf) — the one wide shuffle both operators share."""
    return (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    idf = ln(N / df_t) over raw counts (no smoothing — every scored
    term occurs somewhere, so df_t >= 1). Rank orders by the ROUNDED
    score desc then term asc: rounding first makes the float ordering
    engine-portable, and the term tie-break makes it total.
    Returns (id, term, tf, score, rank).
    """
    # the tf frame feeds BOTH the df aggregate and the scored join —
    # without materialization the corpus explode executes twice (the
    # same double-evaluation distributed_cumsum's materialize_input
    # and winnow_matches' one-groupBy rewrite exist to avoid); a lazy
    # localCheckpoint pins it to executor storage after first compute
    tf = _tf(df, text_col, id_col).localCheckpoint()
    # document frequencies are VOCABULARY-sized — small next to the
    # corpus but unbounded (1e9+ distinct terms on a web corpus), so
    # no forced broadcast: AQE picks broadcast when it actually fits
    dfk = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfc"))
    n = F.broadcast(df.agg(F.count(F.lit(1)).alias("n_docs")))
    scored = (
        tf.join(dfk, "term")
        .crossJoin(n)
        .select(
            id_col,
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("dfc")), 4
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 (Robertson/Sparck Jones) document scores for a bag-of-words
    query; the standard retrieval scorer, here as a corpus-selection
    primitive (pull the ``top_n`` most query-relevant documents out of
    a pretraining corpus).

        idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        s(d, t) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b*dl/avgdl))

    Document frequencies are computed over the FULL vocabulary shuffle
    once (same frame TF-IDF uses); the per-query work after that
    touches only rows whose term is in the query — a literal IN filter
    that prunes the tf frame before any join. Returns
    (id, n_hit_terms, score, rank) for the top ``top_n``, ranked on
    the rounded score (doc id tie-break).
    """
    tf = _tf(df, text_col, id_col)
    dl = df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).alias("dl")
    )
    scalars = F.broadcast(
        dl.agg(
            F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
        )
    )
    # query-pruned, but still rooted in the full corpus explode: both
    # the df aggregate and the scoring join consume it — materialize
    # once (same rule as tfidf_top_terms above)
    hits = tf.filter(F.col("term").isin(*query_terms)).localCheckpoint()
    dfk = F.broadcast(
        hits.groupBy("term").agg(F.count(F.lit(1)).alias("dfc"))
    )
    per_term = (
        hits.join(dfk, "term")
        .join(dl, id_col)
        .crossJoin(scalars)
        .select(
            id_col,
            F.log(
                1.0
                + (F.col("n_docs") - F.col("dfc") + 0.5) / (F.col("dfc") + 0.5)
            ).alias("idf"),
            (
                F.col("tf") * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("tfn"),
        )
    )
    scores = per_term.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
        F.round(F.sum(F.col("idf") * F.col("tfn")), 4).alias("score"),
    )
    # global top-n as sort+limit -> TakeOrderedAndProject (distributed
    # partial top-n per partition, never a single-partition window);
    # the rank column is stamped AFTER the limit, over <= top_n rows
    top = scores.orderBy(F.desc("score"), F.asc(id_col)).limit(top_n)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))
