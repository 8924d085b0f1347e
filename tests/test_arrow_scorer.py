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

def test_arrow_pair_scorer_bit_identical(spark):
    """The pair scorer (LSH/IVF candidate frames) must equal the JVM
    expression bit-for-bit on an arbitrary (query_id, id) pair set."""
    from openset_spark.pipeline.similarity import _arrow_pair_scores

    corpus, queries = _frames(spark, 50, 8, 11, seed=21)
    # an arbitrary-but-deterministic candidate pair set (~1/3 of pairs)
    cands = (
        corpus.crossJoin(
            queries.select(F.col("query_id"), F.col("label").alias("_ql"))
        )
        .filter(F.xxhash64("vec_id", "query_id") % 3 == 0)
        .select("query_id", "vec_id", "label", "embedding")
    )
    got = _arrow_pair_scores(
        cands, queries, "vec_id", "embedding", "query_id",
        label_col="label",
    )
    assert got is not None
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan, plan
    q = F.broadcast(
        queries.select(
            F.col("query_id"),
            F.col("label").alias("_qlabel"),
            F.col("embedding").alias("_qvec"),
            norm(F.col("embedding")).alias("_qnorm"),
        )
    )
    exp = (
        cands.withColumn("_cnorm", norm(F.col("embedding")))
        .join(q, "query_id")
        .select(
            "query_id",
            "_qlabel",
            "vec_id",
            "label",
            (
                dot(F.col("embedding"), F.col("_qvec"))
                / (F.col("_cnorm") * F.col("_qnorm"))
            ).alias("cos_sim"),
        )
    )
    assert _key(got.collect()) == _key(exp.collect())


def test_lsh_ivf_topk_route_through_arrow(spark):
    """lsh_topk / ivf_topk on double vectors plan a MapInArrow scorer
    and return the same rows as the JVM expression path (forced via
    float32-typed inputs, cast back so values are identical)."""
    from openset_spark.pipeline.similarity import ivf_topk, lsh_topk

    corpus, queries = _frames(spark, 80, 6, 8, seed=5)
    for fn, kw in ((lsh_topk, {"dim": 8}), (ivf_topk, {"n_lists": 4})):
        out = fn(corpus, queries.select("query_id", "embedding"), k=3, **kw)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "MapInArrow" in plan, (fn.__name__, plan)

def test_arrow_lsh_buckets_bit_identical(spark):
    """Arrow bucket signatures == the JVM CASE-WHEN expression bit for
    bit (same fold order, same plane literals, same >0 sign rule)."""
    from openset_spark.pipeline.similarity import (
        _arrow_lsh_buckets,
        lsh_buckets_array,
    )

    corpus, _ = _frames(spark, 70, 1, 12, seed=31)
    got = _arrow_lsh_buckets(corpus, "vec_id", "embedding", 12, 5, 3)
    assert got is not None
    jvm = corpus.select(
        "vec_id",
        lsh_buckets_array("`embedding`", 12, 5, 3).alias("_sig"),
    )
    g = {r.vec_id: r._sig for r in got.select("vec_id", "_sig").collect()}
    e = {r.vec_id: r._sig for r in jvm.collect()}
    assert g == e

def test_arrow_nearest_centroid_bit_identical(spark):
    """Arrow IVF assignment == the JVM argmax expression. (Zero-norm
    rows are out of contract: the JVM expression itself raises
    DIVIDE_BY_ZERO under ANSI, so no corpus path can contain them.)"""
    from openset_spark.functions.vector import norm as _norm
    from openset_spark.pipeline.similarity import (
        _arrow_nearest_centroid,
        _nearest_centroid,
    )

    df, _ = _frames(spark, 60, 1, 10, seed=41)
    cents = [
        (i, r.embedding)
        for i, r in enumerate(df.filter(F.col("vec_id") % 11 == 3).collect())
    ]
    got = _arrow_nearest_centroid(df, "embedding", cents)
    assert got is not None
    jvm = (
        df.withColumn("_rnorm", _norm(F.col("embedding")))
        .withColumn(
            "list_id", _nearest_centroid("`embedding`", cents, "`_rnorm`")
        )
        .drop("_rnorm")
    )
    g = {r.vec_id: r.list_id for r in got.select("vec_id", "list_id").collect()}
    e = {r.vec_id: r.list_id for r in jvm.select("vec_id", "list_id").collect()}
    assert g == e


def test_arrow_scorer_declines_oversized_query_frame(spark, monkeypatch):
    """Query frames past SPARK_GRAFT_ARROW_QUERY_CAP must NOT be
    collected to the driver: the scorers return None so callers keep
    the JVM broadcast path (which fails loudly at its size threshold
    instead of silently OOMing the driver)."""
    from openset_spark.pipeline.similarity import (
        _arrow_pair_scores,
        brute_force_topk,
    )

    corpus, queries = _frames(spark, 20, 5, 4)
    monkeypatch.setenv("SPARK_GRAFT_ARROW_QUERY_CAP", "3")
    assert (
        _arrow_cross_scores(
            corpus, queries, "vec_id", "embedding", "query_id"
        )
        is None
    )
    cands = corpus.select(
        F.lit(0).cast("long").alias("query_id"), "vec_id", "embedding"
    )
    assert (
        _arrow_pair_scores(cands, queries, "vec_id", "embedding", "query_id")
        is None
    )
    # end-to-end: the caller falls back to the JVM plan and still
    # returns the same rows as the Arrow route
    out_jvm = brute_force_topk(corpus, queries, k=3)
    plan = out_jvm._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" not in plan, plan
    jvm_rows = sorted(map(tuple, out_jvm.collect()))
    monkeypatch.setenv("SPARK_GRAFT_ARROW_QUERY_CAP", "2000000")
    out_arrow = brute_force_topk(corpus, queries, k=3)
    assert "MapInArrow" in out_arrow._jdf.queryExecution().executedPlan().toString()
    assert sorted(map(tuple, out_arrow.collect())) == jvm_rows
