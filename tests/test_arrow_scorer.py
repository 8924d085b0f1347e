"""r15: the Arrow-batch cross scorer must be BIT-identical to the
interpreted HOF crossJoin it replaces on the brute-force scoring
paths (brute_force_topk / _label_scored): same sequential left fold
for dot and norm, same ``dot / (cnorm * qnorm)`` association. Any
reassociation (a BLAS/pairwise reduction would be one) surfaces here
as a bit mismatch before it can reach an oracle hash.

Also fences the fallback contract: non-double vectors and exotic id
types must return None so callers keep the JVM path.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from openset_spark.functions.vector import dot, norm
from openset_spark.pipeline.similarity import _arrow_cross_scores


def _frames(spark, n, nq, dim, seed=7):
    rng = random.Random(seed)

    def vec():
        v = [rng.uniform(-2, 2) for _ in range(dim)]
        for i in rng.sample(range(dim), 2):
            v[i] = -0.0 if rng.random() < 0.5 else 0.0
        return v

    corpus = spark.createDataFrame(
        [(i, i % 5, vec()) for i in range(n)],
        "vec_id long, label int, embedding array<double>",
    )
    queries = corpus.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    return corpus, queries


def _jvm_scores(corpus, queries, label=False, exclude_self=False):
    qcols = [
        F.col("query_id"),
        F.col("embedding").alias("_qvec"),
        norm(F.col("embedding")).alias("_qnorm"),
    ]
    if label:
        qcols.insert(1, F.col("label").alias("_qlabel"))
    q = F.broadcast(queries.select(*qcols))
    c = corpus.select(
        F.col("vec_id"),
        F.col("label"),
        F.col("embedding"),
        norm(F.col("embedding")).alias("_cnorm"),
    )
    paired = c.crossJoin(q)
    if exclude_self:
        paired = paired.filter(F.col("vec_id") != F.col("query_id"))
    out = [F.col("query_id")]
    if label:
        out.append(F.col("_qlabel"))
    out.append(F.col("vec_id"))
    if label:
        out.append(F.col("label"))
    out.append(
        (
            dot(F.col("embedding"), F.col("_qvec"))
            / (F.col("_cnorm") * F.col("_qnorm"))
        ).alias("cos_sim")
    )
    return paired.select(*out)


def _key(rows):
    # cos_sim compared through full repr (bit-level for doubles)
    return sorted(tuple(r) for r in rows)


def test_arrow_scorer_bit_identical_plain(spark):
    corpus, queries = _frames(spark, 40, 6, 9)
    got = _arrow_cross_scores(
        corpus, queries, "vec_id", "embedding", "query_id"
    )
    assert got is not None
    exp = _jvm_scores(corpus, queries)
    assert _key(got.collect()) == _key(exp.collect())


def test_arrow_scorer_bit_identical_labeled_excl_self(spark):
    corpus, queries = _frames(spark, 40, 6, 16, seed=13)
    got = _arrow_cross_scores(
        corpus,
        queries,
        "vec_id",
        "embedding",
        "query_id",
        label_col="label",
        exclude_self=True,
    )
    assert got is not None
    exp = _jvm_scores(corpus, queries, label=True, exclude_self=True)
    grows = _key(got.collect())
    erows = _key(exp.collect())
    assert grows == erows
    # self pairs really are gone
    assert all(r[0] != r[2] for r in grows)


def test_arrow_scorer_declines_float_vectors(spark):
    corpus, queries = _frames(spark, 10, 2, 4)
    corpus32 = corpus.withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    assert (
        _arrow_cross_scores(
            corpus32, queries, "vec_id", "embedding", "query_id"
        )
        is None
    )


def test_brute_force_topk_routes_through_arrow(spark):
    """Double-typed input plans as a MapInArrow pass, and the result
    equals the JVM-fold pipeline bit-for-bit."""
    from openset_spark.pipeline.similarity import brute_force_topk

    corpus, queries = _frames(spark, 60, 5, 8, seed=3)
    out = brute_force_topk(corpus, queries, k=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan, plan
    corpus32 = corpus.withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    ).withColumn("embedding", F.col("embedding").cast("array<double>"))
    # reference: force the JVM path by scoring manually + same window
    from pyspark.sql import Window

    scored = _jvm_scores(corpus, queries)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    ref = scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= 4)
    assert _key(out.collect()) == _key(ref.collect())
