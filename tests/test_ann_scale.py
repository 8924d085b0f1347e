"""ANN scale-separation gates: on a corpus big enough that bucketed
ANN matters, LSH and IVF must stay >= 0.9 recall@10 vs the exact
oracle and their plans must contain no CartesianProduct. The full-size
(200k) timing separation is the bench's job (bench.py ann_scale);
this runs the same machinery at 40k to keep the suite fast."""

from __future__ import annotations

import json
import shutil
import tempfile

import pytest

from openset_spark.pipeline.ann_bench import (
    DIM,
    IVF_NPROBE,
    K,
    LSH_PLANES,
    LSH_TABLES,
    ensure_corpus,
    ensure_ivf_index,
    ensure_lsh_index,
    _recall,
)
from openset_spark.pipeline.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)

N = 40_000
NQ = 20


@pytest.fixture(scope="module")
def ann40k(spark):
    cache = tempfile.mkdtemp(prefix="oss-ann-")
    cpath, qpath = ensure_corpus(cache, n=N, n_queries=NQ)
    lpath = ensure_lsh_index(spark, cpath, cache)
    apath, centpath = ensure_ivf_index(spark, cpath, cache)
    with open(centpath) as f:
        centroids = [(int(i), v) for i, v in json.load(f)]
    yield {
        "corpus": spark.read.parquet(cpath),
        "queries": spark.read.parquet(qpath),
        "lsh": spark.read.parquet(lpath),
        "ivf": (spark.read.parquet(apath), centroids),
    }
    shutil.rmtree(cache, ignore_errors=True)


def test_lsh_recall_and_plan(ann40k):
    exact = brute_force_topk(ann40k["corpus"], ann40k["queries"], k=K)
    approx = lsh_topk(
        ann40k["corpus"],
        ann40k["queries"],
        dim=DIM,
        k=K,
        n_planes=LSH_PLANES,
        n_tables=LSH_TABLES,
        bucketed_corpus=ann40k["lsh"],
    )
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert _recall(approx, exact) >= 0.9


def test_ivf_recall_and_plan(ann40k):
    exact = brute_force_topk(ann40k["corpus"], ann40k["queries"], k=K)
    approx = ivf_topk(
        ann40k["corpus"],
        ann40k["queries"],
        k=K,
        nprobe=IVF_NPROBE,
        index=ann40k["ivf"],
    )
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert _recall(approx, exact) >= 0.9


def test_exact_oracle_is_exact(ann40k):
    # the query vectors are noise-perturbed corpus points: the exact
    # top-1 must recover the source point for (nearly) every query
    exact = brute_force_topk(ann40k["corpus"], ann40k["queries"], k=1)
    rows = exact.collect()
    assert len(rows) == NQ
    assert all(r.cos_sim > 0.95 for r in rows)
