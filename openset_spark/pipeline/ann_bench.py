"""ANN scale-separation benchmark harness.

The testdata embeddings table (~2k vectors at sf0.1) is far below the
crossover where bucketed ANN beats a brute-force scan — at that size
the approximate paths only add overhead. This module materializes a
~200k-vector clustered corpus plus ingest-time LSH/IVF indexes so the
bench can demonstrate the actual scale separation: the LSH/IVF QUERY
paths against prebuilt indexes vs the exact scan, with recall@k
measured against the brute-force oracle on the same queries.

Index build is deliberately excluded from query timings — signatures
and list assignments are written once at ingest (the 100 TB layout:
the exploded (table, bucket) index and the list_id-partitioned
corpus), exactly like the reference's index maintenance happening at
insert time, not query time.

Everything is deterministic (seeded numpy) and cached under a local
directory so repeated bench runs pay generation once.
"""

from __future__ import annotations

import json
import math
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openset_spark.pipeline.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_buckets_array,
    lsh_topk,
)

DEFAULT_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "ann_bench",
)

N_VECS = 200_000
DIM = 32
N_CLUSTERS = 64
N_QUERIES = 50
K = 10
LSH_PLANES = 12
LSH_TABLES = 8
IVF_LISTS = 64
IVF_NPROBE = 8
SEED = 7
PQ_M = 8
PQ_KSUB = 256  # FAISS-standard 8-bit codes; coarse codebooks on a
# clustered corpus collapse whole clusters into one code -> giant
# ADC tie groups and recall ~0.33 (measured at ksub=16)
PQ_SHORTLIST = 200
IVFPQ_KSUB = 64  # residual codebooks don't fight between-cluster
# variance, so 6-bit codes already separate within-list neighbours
IVFPQ_NPROBE = 8


def _gen_corpus(n: int, dim: int, n_clusters: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centroids = rng.normal(size=(n_clusters, dim))
    assign = np.arange(n) % n_clusters
    return (centroids[assign] + rng.normal(scale=0.35, size=(n, dim))).astype(
        np.float32
    )


def _write_vectors(path: str, ids: np.ndarray, vecs: np.ndarray, id_name: str) -> None:
    table = pa.table(
        {
            id_name: pa.array(ids, pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), pa.float32()), vecs.shape[1]
            ).cast(pa.list_(pa.float32())),
        }
    )
    # write-then-rename so a killed process never leaves a partial
    # file that a later run's exists() check would trust
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _spark_dir_ready(path: str) -> bool:
    """True only when a Spark-written parquet directory is COMPLETE.

    A bare os.path.exists() is not enough: a bench process killed
    mid-write leaves the directory created but empty (observed — the
    next run then dies with UNABLE_TO_INFER_SCHEMA instead of
    rebuilding). Spark's commit protocol writes the _SUCCESS marker
    last, so its presence is the completeness signal."""
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def ensure_corpus(
    cache_dir: str = DEFAULT_CACHE,
    n: int = N_VECS,
    dim: int = DIM,
    n_clusters: int = N_CLUSTERS,
    n_queries: int = N_QUERIES,
    seed: int = SEED,
) -> tuple[str, str]:
    """Materialize (corpus.parquet, queries.parquet); queries are
    noise-perturbed corpus points so ground-truth neighbors exist."""
    os.makedirs(cache_dir, exist_ok=True)
    cpath = os.path.join(cache_dir, f"corpus_{n}_{dim}.parquet")
    qpath = os.path.join(cache_dir, f"queries_{n}_{dim}_{n_queries}.parquet")
    if not (os.path.exists(cpath) and os.path.exists(qpath)):
        vecs = _gen_corpus(n, dim, n_clusters, seed)
        _write_vectors(cpath, np.arange(n), vecs, "vec_id")
        rng = np.random.default_rng(seed + 1)
        pick = rng.choice(n, size=n_queries, replace=False)
        qvecs = vecs[pick] + rng.normal(scale=0.05, size=(n_queries, dim)).astype(
            np.float32
        )
        _write_vectors(qpath, np.arange(n_queries), qvecs.astype(np.float32), "query_id")
    return cpath, qpath


def ensure_lsh_index(
    spark: SparkSession,
    corpus_path: str,
    cache_dir: str = DEFAULT_CACHE,
    dim: int = DIM,
    n_planes: int = LSH_PLANES,
    n_tables: int = LSH_TABLES,
    seed: int = 42,
) -> str:
    """Ingest-time LSH index: the exploded (table, bucket, vec_id,
    embedding) rows, written once. At 100 TB this is partitioned by
    (table, bucket % P) so the probe join prunes files."""
    tag = os.path.basename(corpus_path).removesuffix(".parquet")
    path = os.path.join(cache_dir, f"lsh_{tag}_{n_planes}x{n_tables}.parquet")
    if not _spark_dir_ready(path):
        corpus = spark.read.parquet(corpus_path)
        sig = lsh_buckets_array("`embedding`", dim, n_planes, n_tables, seed)
        corpus.select(
            "vec_id", "embedding", F.posexplode(sig).alias("table", "bucket")
        ).write.mode("overwrite").parquet(path)
    return path


def ensure_ivf_index(
    spark: SparkSession,
    corpus_path: str,
    cache_dir: str = DEFAULT_CACHE,
    n_lists: int = IVF_LISTS,
    refine_iters: int = 0,
) -> tuple[str, str]:
    """Ingest-time IVF index: corpus with list_id + centroid JSON.
    ``refine_iters`` Lloyd-refines the quantizer at build time (an
    ingest-time cost, cached like the rest of the index)."""
    tag = os.path.basename(corpus_path).removesuffix(".parquet")
    rtag = f"_r{refine_iters}" if refine_iters else ""
    apath = os.path.join(cache_dir, f"ivf_{tag}_{n_lists}{rtag}.parquet")
    cpath = os.path.join(
        cache_dir, f"ivf_{tag}_{n_lists}{rtag}_centroids.json"
    )
    if not (_spark_dir_ready(apath) and os.path.exists(cpath)):
        from openset_spark.pipeline.similarity import ivf_index

        corpus = spark.read.parquet(corpus_path)
        assigned, centroids = ivf_index(
            corpus, n_lists, refine_iters=refine_iters
        )
        # partitioned by list_id: the broadcast probe join triggers
        # dynamic partition pruning, so a query batch touching few
        # lists reads only those directories — the 100 TB layout
        assigned.write.partitionBy("list_id").mode("overwrite").parquet(apath)
        with open(cpath, "w") as f:
            json.dump(centroids, f)
    return apath, cpath


def ensure_pq_index(
    spark: SparkSession,
    corpus_path: str,
    cache_dir: str = DEFAULT_CACHE,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    refine_iters: int = 2,
) -> tuple[str, str]:
    """Ingest-time PQ index: the M-byte code table + codebook JSON.
    The byte story is the point — at DIM=32 fp32 a vector is 128 B,
    its code row 8 B, so the ADC scan reads ~6% of the corpus bytes
    (and at 100 TB the code table is what stays hot)."""
    tag = os.path.basename(corpus_path).removesuffix(".parquet")
    codes_path = os.path.join(cache_dir, f"pq_{tag}_{m}x{ksub}.parquet")
    books_path = os.path.join(
        cache_dir, f"pq_{tag}_{m}x{ksub}_books.json"
    )
    if not (_spark_dir_ready(codes_path) and os.path.exists(books_path)):
        from openset_spark.pipeline.pq import pq_codebooks, pq_encode

        corpus = spark.read.parquet(corpus_path)
        books = pq_codebooks(
            corpus, m=m, ksub=ksub, refine_iters=refine_iters,
            method="numpy",
        )
        pq_encode(corpus, books, method="numpy").write.mode(
            "overwrite"
        ).parquet(codes_path)
        with open(books_path, "w") as f:
            json.dump(books, f)
    return codes_path, books_path


def _recall(approx: DataFrame, exact: DataFrame) -> float:
    """Mean fraction of the exact top-k ids the approximate result
    recovered, per query."""
    a = approx.groupBy("query_id").agg(F.collect_set("vec_id").alias("got"))
    e = exact.groupBy("query_id").agg(F.collect_set("vec_id").alias("want"))
    row = (
        a.join(e, "query_id")
        .select(
            (
                F.size(F.array_intersect("got", "want"))
                / F.size(F.col("want"))
            ).alias("r")
        )
        .agg(F.avg("r"))
        .first()
    )
    return float(row[0])


def run_scale_bench(
    spark: SparkSession,
    cache_dir: str = DEFAULT_CACHE,
    reps: int = 1,
    n: int = N_VECS,
    n_queries: int = N_QUERIES,
) -> dict:
    """Time the three query paths on the synthetic corpus and report
    recall@k of the approximate paths vs the exact oracle."""
    cpath, qpath = ensure_corpus(cache_dir, n=n, n_queries=n_queries)
    lpath = ensure_lsh_index(spark, cpath, cache_dir)
    apath, centpath = ensure_ivf_index(spark, cpath, cache_dir)

    corpus = spark.read.parquet(cpath)
    queries = spark.read.parquet(qpath)
    lsh_index = spark.read.parquet(lpath)
    ivf_assigned = spark.read.parquet(apath)
    with open(centpath) as f:
        centroids = [(int(i), v) for i, v in json.load(f)]
    # warm file listings so the first timed run isn't IO-noise
    for df in (corpus, queries, lsh_index, ivf_assigned):
        df.count()

    def timed(build):
        best = math.inf
        for _ in range(reps):
            t0 = time.time()
            build().count()
            best = min(best, time.time() - t0)
        return round(best, 3)

    brute = lambda: brute_force_topk(corpus, queries, k=K)  # noqa: E731
    lsh = lambda: lsh_topk(  # noqa: E731
        corpus,
        queries,
        dim=DIM,
        k=K,
        n_planes=LSH_PLANES,
        n_tables=LSH_TABLES,
        bucketed_corpus=lsh_index,
    )
    ivf = lambda: ivf_topk(  # noqa: E731
        corpus,
        queries,
        k=K,
        nprobe=IVF_NPROBE,
        index=(ivf_assigned, centroids),
    )

    # the exact scan runs ONCE: the timed execution also persists the
    # (tiny, n_queries x k row) result both recalls compare against
    exact = brute().persist()
    t0 = time.time()
    exact.count()
    brute_sec = round(time.time() - t0, 3)
    out = {
        "n_vectors": n,
        "n_queries": n_queries,
        "k": K,
        "brute_sec": brute_sec,
        "lsh_sec": timed(lsh),
        "ivf_sec": timed(ivf),
        "lsh_recall": round(_recall(lsh(), exact), 4),
        "ivf_recall": round(_recall(ivf(), exact), 4),
    }
    # Lloyd-refined quantizer (r5): same probe path against the
    # 2-iteration ingest-time index — shows the recall lift k-means
    # buys at the same nprobe; the refine cost is ingest-time and
    # cached like every other index artifact.
    ra_path, rc_path = ensure_ivf_index(
        spark, cpath, cache_dir, refine_iters=2
    )
    r_assigned = spark.read.parquet(ra_path)
    with open(rc_path) as f:
        r_centroids = [(int(i), v) for i, v in json.load(f)]
    r_assigned.count()
    ivf_r = lambda: ivf_topk(  # noqa: E731
        corpus,
        queries,
        k=K,
        nprobe=IVF_NPROBE,
        index=(r_assigned, r_centroids),
    )
    out["ivf_refined_sec"] = timed(ivf_r)
    out["ivf_refined_recall"] = round(_recall(ivf_r(), exact), 4)
    # PQ/ADC (r8): flat code-table scan + exact re-rank against the
    # ingest-time codebooks/codes — times the 16x-fewer-bytes path.
    from openset_spark.pipeline.pq import pq_topk

    codes_path, books_path = ensure_pq_index(spark, cpath, cache_dir)
    pq_codes = spark.read.parquet(codes_path)
    pq_codes.count()
    with open(books_path) as f:
        pq_books = json.load(f)
    pq_q = lambda: pq_topk(  # noqa: E731
        corpus,
        queries,
        k=K,
        shortlist=PQ_SHORTLIST,
        books=pq_books,
        codes=pq_codes,
        adc_method="numpy",
    )
    out["pq_sec"] = timed(pq_q)
    out["pq_recall"] = round(_recall(pq_q(), exact), 4)
    # IVF-PQ composite (r9c): coarse lists + residual PQ — the query
    # reads nprobe/n_lists of a code table that is itself ~6% of the
    # float bytes, against the ingest-time partitioned index.
    from openset_spark.pipeline.pq import ivfpq_topk

    ivfpq_path, ivfpq_meta = ensure_ivfpq_index(spark, cpath, cache_dir)
    ivfpq_index = spark.read.parquet(ivfpq_path)
    ivfpq_index.count()
    with open(ivfpq_meta) as f:
        meta = json.load(f)
    ivfpq_cents = [(int(i), v) for i, v in meta["centroids"]]
    ivfpq_books = meta["books"]
    ivfpq_q = lambda: ivfpq_topk(  # noqa: E731
        corpus,
        queries,
        ivfpq_cents,
        ivfpq_books,
        ivfpq_index,
        k=K,
        nprobe=IVFPQ_NPROBE,
        shortlist=PQ_SHORTLIST,
    )
    out["ivfpq_sec"] = timed(ivfpq_q)
    out["ivfpq_recall"] = round(_recall(ivfpq_q(), exact), 4)
    # Label-aware kNN, candidate-driven (r10): agreement over the
    # same 200k corpus through the IVF payload-candidate path — the
    # shape hard_negatives/knn_label_agreement run at corpus scale.
    # The EXACT agreement is derived from the persisted brute top-k
    # frame (it IS the true kNN — zero extra cost), so the section
    # reports both the speedup vs the exact scorer (brute_sec is the
    # same crossJoin + top-k machinery) and the agreement deviation.
    from openset_spark.pipeline.similarity import (
        ivf_candidate_pairs,
        knn_label_agreement,
    )

    lab_corpus = corpus.select(
        "vec_id", (F.col("vec_id") % 8).cast("int").alias("label"), "embedding"
    )
    lab_queries = queries.select(
        "query_id",
        (F.col("query_id") % 8).cast("int").alias("label"),
        "embedding",
    )
    lab_assigned = ivf_assigned.select(
        "vec_id",
        (F.col("vec_id") % 8).cast("int").alias("label"),
        "embedding",
        "list_id",
    )
    knn_cand = lambda: knn_label_agreement(  # noqa: E731
        lab_corpus,
        lab_queries,
        k=K,
        candidates=ivf_candidate_pairs(
            lab_corpus,
            lab_queries,
            nprobe=IVF_NPROBE,
            index=(lab_assigned, centroids),
            payload_cols=("label", "embedding"),
        ),
        assume_distinct=True,
    )
    out["knn_cand_sec"] = timed(knn_cand)
    out["knn_cand_speedup"] = round(
        out["brute_sec"] / max(out["knn_cand_sec"], 1e-9), 2
    )
    # exact agreement from the persisted brute frame
    q_lab = F.broadcast(
        lab_queries.select("query_id", F.col("label").alias("_qlabel"))
    )
    exact_agree = {
        r.label: r.match_ppm
        for r in (
            exact.join(q_lab, "query_id")
            .join(lab_corpus.select("vec_id", "label"), "vec_id")
            .groupBy("query_id", "_qlabel")
            .agg(
                F.sum(
                    F.when(F.col("label") == F.col("_qlabel"), 1).otherwise(0)
                ).alias("_m")
            )
            .groupBy(F.col("_qlabel").alias("label"))
            .agg(F.count("*").alias("nq"), F.sum("_m").alias("_mm"))
            .selectExpr(
                "label", f"(_mm * 1000000) div ({K} * nq) AS match_ppm"
            )
            .collect()
        )
    }
    cand_agree = {r.label: r.match_ppm for r in knn_cand().collect()}
    out["knn_cand_max_ppm_dev"] = max(
        abs(cand_agree.get(lbl, 0) - ppm) for lbl, ppm in exact_agree.items()
    )
    exact.unpersist()
    out["lsh_speedup"] = round(out["brute_sec"] / max(out["lsh_sec"], 1e-9), 2)
    out["ivf_speedup"] = round(out["brute_sec"] / max(out["ivf_sec"], 1e-9), 2)
    out["pq_speedup"] = round(out["brute_sec"] / max(out["pq_sec"], 1e-9), 2)
    out["ivfpq_speedup"] = round(
        out["brute_sec"] / max(out["ivfpq_sec"], 1e-9), 2
    )
    return out


def ensure_ivfpq_index(
    spark: SparkSession,
    corpus_path: str,
    cache_dir: str = DEFAULT_CACHE,
    n_lists: int = IVF_LISTS,
    m: int = PQ_M,
    ksub: int = IVFPQ_KSUB,
) -> tuple[str, str]:
    """Ingest-time IVF-PQ index: the (id, list_id, codes) table
    written PARTITIONED BY list_id (probes prune partitions) +
    centroids/books JSON. Residual codes spend the same M bytes on
    within-list geometry — the recall-per-byte story vs flat PQ."""
    tag = os.path.basename(corpus_path).removesuffix(".parquet")
    ipath = os.path.join(
        cache_dir, f"ivfpq_{tag}_{n_lists}_{m}x{ksub}.parquet"
    )
    jpath = os.path.join(
        cache_dir, f"ivfpq_{tag}_{n_lists}_{m}x{ksub}_meta.json"
    )
    if not (_spark_dir_ready(ipath) and os.path.exists(jpath)):
        from openset_spark.pipeline.pq import ivfpq_build

        corpus = spark.read.parquet(corpus_path)
        cents, books, index = ivfpq_build(
            corpus, n_lists=n_lists, m=m, ksub=ksub,
            coarse_refine=2, pq_refine=2,
        )
        index.write.partitionBy("list_id").mode("overwrite").parquet(
            ipath
        )
        with open(jpath, "w") as f:
            json.dump({"centroids": cents, "books": books}, f)
    return ipath, jpath
