"""Product-quantization ANN (pipeline/pq.py) — Jegou et al. 2011.

Strategy mirrors tests/test_pipeline.py's ANN sections: exact small
cases for the deterministic pieces (encode argmin, ADC ranking
identity), a planted-structure corpus where PQ must find the
neighbors (the testdata embeddings are near-random, so recall there
is measured, not asserted tight), and a Lloyd-improves-distortion
property for training.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from openset_spark.pipeline.pq import pq_codebooks, pq_encode, pq_topk


def _unit(v):
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def test_pq_encode_argmin_exact(spark):
    # 4-dim, m=2, dsub=2; codebooks chosen so the nearest centroid
    # per subspace is unambiguous after normalization
    books = [
        [[1.0, 0.0], [0.0, 1.0]],
        [[0.5, 0.5], [-0.5, 0.5]],
    ]
    df = spark.createDataFrame(
        [
            (1, [10.0, 0.0, 5.0, 5.0]),  # sub0 -> c0, sub1 -> c0
            (2, [0.0, 10.0, -5.0, 5.0]),  # sub0 -> c1, sub1 -> c1
        ],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: list(r.codes) for r in pq_encode(df, books).collect()}
    assert got == {1: [0, 0], 2: [1, 1]}


def test_pq_encode_tie_breaks_low_cid(spark):
    # equidistant centroids: argmin must pick the lower centroid id
    books = [[[1.0, 0.0], [0.0, 1.0]]]
    df = spark.createDataFrame(
        [(1, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    row = pq_encode(df, books).collect()[0]
    assert list(row.codes) == [0]


def test_pq_topk_recovers_planted_clusters(spark):
    # 10 well-separated cluster centers in 16-dim; 20 points each
    # (tiny deterministic jitter). A query near a center must get
    # >= 9/10 of its exact top-10 through ADC + re-rank.
    import random

    rng = random.Random(7)
    centers = [
        [(10.0 if d % 10 == c else 0.0) + rng.uniform(-0.1, 0.1) for d in range(16)]
        for c in range(10)
    ]
    rows = []
    vid = 0
    for c, ctr in enumerate(centers):
        for _ in range(20):
            rows.append(
                (vid, [x + rng.uniform(-0.5, 0.5) for x in ctr])
            )
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = df.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    from openset_spark.pipeline.similarity import brute_force_topk

    ann = pq_topk(
        df, queries, k=10, m=4, ksub=8, shortlist=30, refine_iters=2
    )
    got = {(r.query_id, r.vec_id) for r in ann.collect()}
    exact = [
        (r.query_id, r.vec_id)
        for r in brute_force_topk(df, queries, k=10).collect()
    ]
    per_q: dict[int, int] = {}
    for qid, vidd in exact:
        per_q[qid] = per_q.get(qid, 0) + ((qid, vidd) in got)
    assert min(per_q.values()) >= 9
    # rank column well-formed
    one = ann.filter(F.col("query_id") == 0).orderBy("rank").collect()
    assert [r.rank for r in one] == list(range(1, 11))


def test_pq_lloyd_reduces_distortion(spark):
    import random

    rng = random.Random(3)
    df = spark.createDataFrame(
        [
            (i, [rng.gauss(0, 1) for _ in range(8)])
            for i in range(300)
        ],
        "vec_id long, embedding array<double>",
    )

    def distortion(books):
        # mean squared quantization error over the corpus
        m, dsub = len(books), len(books[0][0])
        coded = pq_encode(df, books)
        joined = coded.join(df, "vec_id").collect()
        tot = 0.0
        for r in joined:
            v = _unit(list(r.embedding))
            for s in range(m):
                c = books[s][r.codes[s]]
                tot += sum(
                    (v[s * dsub + t] - c[t]) ** 2 for t in range(dsub)
                )
        return tot / len(joined)

    b0 = pq_codebooks(df, m=2, ksub=8, refine_iters=0)
    b2 = pq_codebooks(df, m=2, ksub=8, refine_iters=2)
    assert distortion(b2) < distortion(b0)


def test_pq_encode_partitioning_invariant(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(80)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    books = pq_codebooks(df, m=2, ksub=4, refine_iters=1)
    a = {
        r.vec_id: list(r.codes) for r in pq_encode(df, books).collect()
    }
    b = {
        r.vec_id: list(r.codes)
        for r in pq_encode(df.repartition(13), books).collect()
    }
    assert a == b


def test_pq_encode_numpy_matches_sql(spark):
    import random

    rng = random.Random(5)
    df = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(120)],
        "vec_id long, embedding array<double>",
    ).repartition(5)
    books = pq_codebooks(df, m=2, ksub=8, refine_iters=1)
    a = {
        r.vec_id: list(r.codes) for r in pq_encode(df, books).collect()
    }
    b = {
        r.vec_id: list(r.codes)
        for r in pq_encode(df, books, method="numpy").collect()
    }
    assert a == b


def test_pq_codebooks_numpy_close_to_sql(spark):
    import random

    rng = random.Random(9)
    df = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(200)],
        "vec_id long, embedding array<double>",
    ).repartition(4)
    bs = pq_codebooks(df, m=2, ksub=4, refine_iters=2)
    bn = pq_codebooks(df, m=2, ksub=4, refine_iters=2, method="numpy")
    # same seeds, same assignment rule -> identical Lloyd trajectories
    # up to float summation order in the mean update
    for s in range(2):
        for j in range(4):
            for t in range(4):
                assert abs(bs[s][j][t] - bn[s][j][t]) < 1e-9


def test_pq_adc_numpy_matches_sql_path(spark):
    import random

    rng = random.Random(21)
    df = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(150)],
        "vec_id long, embedding array<double>",
    ).repartition(6)
    queries = df.filter(F.col("vec_id") % 30 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    books = pq_codebooks(df, m=2, ksub=8, refine_iters=1)
    a = sorted(
        (r.query_id, r.vec_id, r.rank)
        for r in pq_topk(
            df, queries, k=5, shortlist=20, books=books
        ).collect()
    )
    b = sorted(
        (r.query_id, r.vec_id, r.rank)
        for r in pq_topk(
            df, queries, k=5, shortlist=20, books=books,
            adc_method="numpy",
        ).collect()
    )
    assert a == b


# ------------------------------------------------------------------
# IVF-PQ composite (r9c)
# ------------------------------------------------------------------
def _planted(n_clusters=10, per=20, dim=16, seed=7):
    import random

    rng = random.Random(seed)
    centers = [
        [(10.0 if d % 10 == c else 0.0) + rng.uniform(-0.1, 0.1)
         for d in range(dim)]
        for c in range(n_clusters)
    ]
    rows = []
    vid = 0
    for ctr in centers:
        for _ in range(per):
            rows.append((vid, [x + rng.uniform(-0.5, 0.5) for x in ctr]))
            vid += 1
    return rows


def test_ivfpq_build_shape_and_determinism(spark):
    from openset_spark.pipeline.pq import ivfpq_build

    df = spark.createDataFrame(
        _planted(), "vec_id long, embedding array<double>"
    )
    cents, books, index = ivfpq_build(
        df, n_lists=8, m=4, ksub=8, coarse_refine=1, pq_refine=1
    )
    assert len(cents) == 8 and len(books) == 4 and len(books[0]) == 8
    rows = index.collect()
    assert len(rows) == 200
    assert all(0 <= r.list_id < 8 for r in rows)
    assert all(len(r.codes) == 4 for r in rows)
    assert all(0 <= c < 8 for r in rows for c in r.codes)
    # deterministic rebuild: same centroids, books, codes
    cents2, books2, index2 = ivfpq_build(
        df, n_lists=8, m=4, ksub=8, coarse_refine=1, pq_refine=1
    )
    assert cents == cents2 and books == books2
    assert sorted((r.vec_id, r.list_id, tuple(r.codes))
                  for r in rows) == sorted(
        (r.vec_id, r.list_id, tuple(r.codes)) for r in index2.collect()
    )


def test_ivfpq_topk_recovers_planted_clusters(spark):
    from openset_spark.pipeline.pq import ivfpq_build, ivfpq_topk
    from openset_spark.pipeline.similarity import brute_force_topk

    df = spark.createDataFrame(
        _planted(), "vec_id long, embedding array<double>"
    )
    queries = df.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents, books, index = ivfpq_build(
        df, n_lists=10, m=4, ksub=8, coarse_refine=2, pq_refine=2
    )
    ann = ivfpq_topk(
        df, queries, cents, books, index, k=10, nprobe=3, shortlist=40
    )
    got = {(r.query_id, r.vec_id) for r in ann.collect()}
    exact = [
        (r.query_id, r.vec_id)
        for r in brute_force_topk(df, queries, k=10).collect()
    ]
    per_q: dict[int, int] = {}
    for qid, vid in exact:
        per_q[qid] = per_q.get(qid, 0) + ((qid, vid) in got)
    assert min(per_q.values()) >= 9
    one = ann.filter(F.col("query_id") == 0).orderBy("rank").collect()
    assert [r.rank for r in one] == list(range(1, 11))


def test_ivfpq_nprobe_monotone_recall(spark):
    """Cross-list ADC comparability: with the full ||q_resid||^2 term
    in the tables, growing nprobe can only add candidates — recall is
    monotone. (Dropping the per-list constant breaks exactly this.)"""
    from openset_spark.pipeline.pq import ivfpq_build, ivfpq_topk
    from openset_spark.pipeline.similarity import brute_force_topk

    df = spark.createDataFrame(
        _planted(), "vec_id long, embedding array<double>"
    )
    queries = df.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents, books, index = ivfpq_build(
        df, n_lists=10, m=4, ksub=8, coarse_refine=2, pq_refine=2
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(df, queries, k=10).collect()
    }

    def recall(nprobe):
        got = {
            (r.query_id, r.vec_id)
            for r in ivfpq_topk(
                df, queries, cents, books, index,
                k=10, nprobe=nprobe, shortlist=40,
            ).collect()
        }
        return len(got & exact) / len(exact)

    r1, r3, r10 = recall(1), recall(3), recall(10)
    assert r1 <= r3 <= r10
    assert r10 >= 0.95  # all lists probed ~ flat PQ quality or better
