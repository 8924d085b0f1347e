"""Product-quantization (PQ) ANN — Jegou, Douze & Schmid, "Product
Quantization for Nearest Neighbor Search" (TPAMI 2011), the FAISS
``IndexPQ`` shape.

Split each d-dim vector into M contiguous subvectors, vector-quantize
every subspace to ``ksub`` centroids (a codebook of M * ksub * (d/M)
floats — driver-literal tiny), and store M small codes per vector.
Queries score candidates by Asymmetric Distance Computation (ADC):
one per-query table of query-subvector-to-centroid distances, after
which every candidate costs M table lookups + adds instead of d
multiplies.

Why this is the 100 TB path: the win is not FLOPs but BYTES. A
64-dim fp32 embedding is 256 B; its M=8 code row is 8 B — the ADC
scan reads ~3% of the bytes of a float scan, so the same cluster
sweeps ~30x the corpus per unit time, then an exact re-rank touches
only the shortlist. Vectors are normalized before encoding, so
reduced-L2 ADC order is exactly monotone with cosine — the re-rank
fixes quantization error, not metric mismatch.

Spark-first shape (same rules as pipeline/similarity.py): codebooks
train with a one-scan-per-iteration distributed Lloyd (the update
shuffle is M * ksub * dsub partial rows, corpus-size independent);
encode / ADC are FLAT codegen'd expression strings (nesting the dots
inside transform() over a 2D literal drops out of codegen — measured
in similarity._centroid_sims), built as ONE string so plan build
stays O(1) py4j calls.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openset_spark.functions.vector import dot, norm

Codebooks = list[list[list[float]]]  # [subspace][centroid][component]


def _unit_vec_sql(vec_sql: str) -> str:
    """Normalized copy of a vector column (zero-norm guarded)."""
    n = f"sqrt(aggregate({vec_sql},0D,(a,v)->a+CAST(v AS DOUBLE)*v))"
    return (
        f"transform({vec_sql},"
        f" x -> CAST(x AS DOUBLE) / (CASE WHEN {n} = 0D THEN 1D"
        f" ELSE {n} END))"
    )


def _sub_l2_sql(vec_sql: str, s: int, dsub: int, cent: list[float]) -> str:
    """Reduced squared L2 of subspace ``s`` of ``vec_sql`` vs a
    centroid literal: ``-2 * dot(sub, c) + |c|^2`` — the ``|sub|^2``
    term is constant per (row, subspace) so it cannot change an
    argmin over centroids nor a sum-over-subspaces ranking.

    The dot is FLAT indexed arithmetic (``v[i]*c_i + ...``), not
    aggregate/zip_with: higher-order functions run INTERPRETED in
    Spark, and at M*ksub copies the lambda forest also blew plan
    analysis time to ~20-35s per action (measured at 128 terms);
    the flat form codegens and plans in ms — same lesson as
    similarity.lsh_buckets_array's 3072-term signatures."""
    off = s * dsub
    d = "+".join(
        f"CAST({vec_sql}[{off + t}] AS DOUBLE)*{float(c)!r}D"
        for t, c in enumerate(cent)
    )
    c2 = sum(float(x) * float(x) for x in cent)
    return f"(-2D*({d})+{c2!r}D)"


def _dist_array_sql(vec_sql: str, s: int, cents: list[list[float]]) -> str:
    """``array<double>`` of reduced-L2 distances of subspace ``s``
    vs every centroid in its codebook."""
    dsub = len(cents[0])
    return (
        "array("
        + ",".join(_sub_l2_sql(vec_sql, s, dsub, c) for c in cents)
        + ")"
    )


def _encode_codes(df: DataFrame, nv_sql: str, books: Codebooks) -> DataFrame:
    """Append ``_codes array<int>`` (per-subspace argmin centroid) to
    ``df``. Two projections: distance ARRAYS first (flat codegen'd
    arithmetic), then ``array_position(d, array_min(d)) - 1`` — the
    first-match semantics of array_position IS the lowest-centroid-id
    tie-break. The earlier named_struct + array_sort argmin ran
    interpreted at ~2 ms/row (402 s for one Lloyd pass over 200k at
    ksub=64); this form is plain arithmetic + two linear array scans."""
    m = len(books)
    dists = df.select(
        "*",
        *[
            F.expr(_dist_array_sql(nv_sql, s, books[s])).alias(f"_d{s}")
            for s in range(m)
        ],
    )
    codes = ",".join(
        f"CAST(array_position(_d{s}, array_min(_d{s})) - 1 AS INT)"
        for s in range(m)
    )
    return dists.select(*df.columns, F.expr(f"array({codes})").alias("_codes"))


def pq_dtab_expr(qvec_sql: str, books: Codebooks) -> Column:
    """Per-query ADC lookup table ``array<array<double>>``:
    ``dtab[s][j]`` = reduced-L2 of the query's subspace ``s`` vs
    centroid ``j``. M * ksub expressions, one plan string."""
    subs = []
    for s, cents in enumerate(books):
        dsub = len(cents[0])
        subs.append(
            "array("
            + ",".join(_sub_l2_sql(qvec_sql, s, dsub, c) for c in cents)
            + ")"
        )
    return F.expr("array(" + ",".join(subs) + ")")


def _np_normalize(mat):
    import numpy as np

    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return mat / n


def _np_codes(mat, books_np):
    """(n, M) int32 codes for normalized rows ``mat`` — np.argmin's
    first-match rule matches the SQL path's lowest-cid tie-break."""
    import numpy as np

    m = len(books_np)
    dsub = books_np[0].shape[1]
    out = np.empty((mat.shape[0], m), dtype=np.int32)
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        c = books_np[s]
        d = -2.0 * (sub @ c.T) + (c * c).sum(axis=1)
        out[:, s] = np.argmin(d, axis=1)
    return out


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    refine_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "sql",
    normalize: bool = True,
) -> Codebooks:
    """Train PQ codebooks: seed every subspace from the same
    ``ksub``-vector hash-order sample (deterministic, clustering-free
    — the ivf_index seeding rule), then ``refine_iters`` distributed
    Lloyd rounds run over ALL subspaces in one corpus scan each: the
    assignment is the codegen'd encode expression; the update is ONE
    shuffle of (subspace, code, component) partial means — bounded by
    M * ksub * dsub rows, never by corpus size. Trains on normalized
    vectors (see module docstring).

    ``method='sql'`` (default here) keeps assignment as the codegen'd
    expression. ``method='numpy'`` runs assignment + partial sums per
    Arrow batch (BLAS) — the bulk shape for large ksub, where the
    M*ksub-term projection outgrows whole-stage codegen's method
    limits and falls back to interpreted eval (measured 402 s -> 78 s
    -> ~s per Lloyd pass on 200k x ksub=64 across struct-sort /
    flat-SQL / numpy). :func:`pq_topk`'s in-query builds ALSO default
    to numpy (``build_method='numpy'``): the flat SQL encode at even
    m=8 x ksub=16 exceeds janino's 64 KB method limit and pays a
    failed compile per action. Caveat: the numpy Lloyd mean is
    F.sum(sm)/F.sum(cnt) over BLAS partials, ~1e-9-close to the SQL
    F.avg trajectory but summation-order/platform-dependent, so
    cross-platform bit-reproducibility of the SHORTLIST is not
    guaranteed (near-tie argmin flips can change code assignments);
    the exact cosine re-rank in pq_topk is what pins the final
    results. Pass ``build_method='sql'`` when shortlist-level
    determinism across engines matters more than build speed.

    ``normalize=False`` trains on the raw vectors — the IVF-PQ
    residual path, where the input is already (unit vector − coarse
    centroid) and re-normalizing would destroy the residual
    geometry."""
    nv_expr = (
        _unit_vec_sql(f"`{vec_col}`")
        if normalize
        else f"cast(`{vec_col}` as array<double>)"
    )
    unit = corpus.select(F.col(id_col), F.expr(nv_expr).alias("_nv"))
    seeds = unit.orderBy(F.xxhash64(F.col(id_col))).limit(ksub).collect()
    vecs = [[float(x) for x in r["_nv"]] for r in seeds]
    dim = len(vecs[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    books: Codebooks = [
        [v[s * dsub : (s + 1) * dsub] for v in vecs] for s in range(m)
    ]
    for _ in range(refine_iters):
        if method == "numpy":
            import numpy as np
            import pandas as pd

            books_np = [np.asarray(b, dtype=np.float64) for b in books]

            def _partials(batches):
                for pdf in batches:
                    mat = np.asarray(
                        [np.asarray(v, dtype=np.float64) for v in pdf["_nv"]]
                    )
                    if mat.size == 0:
                        continue
                    codes = _np_codes(mat, books_np)
                    for s in range(m):
                        sub = mat[:, s * dsub : (s + 1) * dsub]
                        sums = np.zeros((ksub, dsub))
                        cnts = np.zeros(ksub, dtype=np.int64)
                        np.add.at(sums, codes[:, s], sub)
                        np.add.at(cnts, codes[:, s], 1)
                        nz = np.nonzero(cnts)[0]
                        yield pd.DataFrame(
                            {
                                "s": np.full(len(nz) * dsub, s, dtype="int32"),
                                "c": np.repeat(nz, dsub).astype("int32"),
                                "t": np.tile(
                                    np.arange(dsub, dtype="int32"), len(nz)
                                ),
                                "sm": sums[nz].ravel(),
                                "cnt": np.repeat(cnts[nz], dsub),
                            }
                        )

            stats = (
                unit.select("_nv")
                .mapInPandas(
                    _partials, "s int, c int, t int, sm double, cnt long"
                )
                .groupBy("s", "c", "t")
                .agg((F.sum("sm") / F.sum("cnt")).alias("m"))
                .collect()
            )
        else:
            coded = _encode_codes(unit.select("_nv"), "`_nv`", books)
            stats = (
                coded.select(F.posexplode("_nv").alias("p", "x"), "_codes")
                .select(
                    F.expr(f"p div {dsub}").cast("int").alias("s"),
                    (F.col("p") % dsub).cast("int").alias("t"),
                    F.expr(f"_codes[p div {dsub}]").alias("c"),
                    F.col("x").cast("double").alias("x"),
                )
                .groupBy("s", "c", "t")
                .agg(F.avg("x").alias("m"))
                .collect()
            )
        upd: dict[tuple[int, int], dict[int, float]] = {}
        for r in stats:
            upd.setdefault((r.s, r.c), {})[r.t] = float(r.m)
        books = [
            [
                # empty cells keep their previous centroid (standard
                # Lloyd, same rule as ivf_index)
                [upd[(s, j)][t] for t in range(dsub)]
                if (s, j) in upd
                else cent
                for j, cent in enumerate(cents)
            ]
            for s, cents in enumerate(books)
        ]
    return books


def pq_encode(
    corpus: DataFrame,
    books: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "sql",
    normalize: bool = True,
) -> DataFrame:
    """(id, codes array<int>) — the stored PQ index table. At scale
    this is what gets written back (8 B/vector at M=8) and scanned by
    ADC instead of the float corpus. ``method='numpy'`` encodes per
    Arrow batch with BLAS — the ingest-time bulk path (see
    :func:`pq_codebooks`); both paths share the argmin tie rule."""
    if method == "numpy":
        import numpy as np
        import pandas as pd

        books_np = [np.asarray(b, dtype=np.float64) for b in books]

        def _enc(batches):
            for pdf in batches:
                mat = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                if mat.size == 0:
                    continue
                codes = _np_codes(
                    _np_normalize(mat) if normalize else mat, books_np
                )
                yield pd.DataFrame(
                    {id_col: pdf[id_col].values, "codes": list(codes)}
                )

        # Preserve the id column's real type (string/int ids work on
        # the SQL path; hardcoding `long` here would miscast them).
        id_type = corpus.schema[id_col].dataType.simpleString()
        return corpus.select(id_col, vec_col).mapInPandas(
            _enc, f"{id_col} {id_type}, codes array<int>"
        )
    # normalize into a real column FIRST: inlining the normalization
    # into every one of the M*ksub distance terms re-evaluates it per
    # term and multiplies the expression tree Catalyst must analyze
    nv_expr = (
        _unit_vec_sql(f"`{vec_col}`")
        if normalize
        else f"cast(`{vec_col}` as array<double>)"
    )
    nv = corpus.select(F.col(id_col), F.expr(nv_expr).alias("_nv"))
    return _encode_codes(nv, "`_nv`", books).select(
        F.col(id_col), F.col("_codes").alias("codes")
    )


def _adc_shortlist_np(
    codes: DataFrame,
    queries: DataFrame,
    books: Codebooks,
    shortlist: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """(query_id, id) ADC shortlist via a vectorized numpy scan of
    the code table: distance tables for ALL queries are computed
    driver-side (the query batch is small by contract — it broadcasts
    in every path) and shipped in the closure; each Arrow batch
    scores every query with one fancy-indexed gather+sum and yields
    its per-partition partial top-``shortlist``; a final window takes
    the global cut over the tiny partial union. Ties break on id in
    both cuts, so the result is partitioning-invariant."""
    import numpy as np
    import pandas as pd

    qrows = queries.select(query_id_col, vec_col).collect()
    qids = np.asarray([r[query_id_col] for r in qrows], dtype=np.int64)
    qmat = _np_normalize(
        np.asarray([list(r[vec_col]) for r in qrows], dtype=np.float64)
    )
    m = len(books)
    dsub = len(books[0][0])
    # dtabs (Q, M, ksub): reduced-L2 of each query subvector vs
    # every centroid — same formula as _sub_l2_sql
    dtabs = np.empty((len(qids), m, len(books[0])), dtype=np.float64)
    for s in range(m):
        c = np.asarray(books[s], dtype=np.float64)
        qs = qmat[:, s * dsub : (s + 1) * dsub]
        dtabs[:, s, :] = -2.0 * (qs @ c.T) + (c * c).sum(axis=1)

    def _scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cmat = np.stack(pdf["codes"].to_numpy())  # (n, M) int
            ids = pdf[id_col].to_numpy()
            adc = np.zeros((len(qids), len(ids)), dtype=np.float64)
            for s in range(m):
                adc += dtabs[:, s, cmat[:, s]]
            k = min(shortlist, len(ids))
            for qi in range(len(qids)):
                # lexsort: primary adc, tie-break id — the same
                # (adc asc, id asc) rule as the SQL path
                top = np.lexsort((ids, adc[qi]))[:k]
                yield pd.DataFrame(
                    {
                        query_id_col: np.full(k, qids[qi]),
                        id_col: ids[top],
                        "_adc": adc[qi][top],
                    }
                )

    partial = codes.mapInPandas(
        _scan, f"{query_id_col} long, {id_col} long, _adc double"
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("_adc"), F.asc(id_col)
    )
    return (
        partial.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= shortlist)
        .select(query_id_col, id_col)
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    shortlist: int = 64,
    refine_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    books: Codebooks | None = None,
    codes: DataFrame | None = None,
    adc_method: str = "sql",
    build_method: str = "numpy",
) -> DataFrame:
    """ADC top-k with exact cosine re-rank: scan the code table once
    per query batch (queries + their ADC tables broadcast), take the
    ``shortlist`` best by ADC per query, join back the float vectors
    for ONLY those rows, exact-cosine re-rank to top ``k``.

    Pass ``books``/``codes`` (an ingest-time build) to skip training
    and encoding on the query path; otherwise ``build_method``
    selects the in-query build ('numpy' default for speed, 'sql' for
    cross-engine shortlist determinism — see :func:`pq_codebooks`).
    Output matches similarity.ivf_topk:
    (query_id, vec_id, cos_sim, rank).

    ``adc_method='sql'`` keeps the scan declarative — right for
    modest ksub (the registry/oracle config). ``adc_method='numpy'``
    is the scale path: query distance tables are computed driver-side
    and shipped in the task closure; each Arrow batch scores ALL
    queries with one fancy-indexed sum and emits only its
    per-partition partial top-``shortlist`` (a monotone selection, so
    the global cut is exact). The SQL form at large ksub pays a
    16 KB dtab copy into every BroadcastNestedLoop output row —
    measured 94 s vs brute-force 46 s at 200k x ksub=256; the numpy
    scan touches only the 8-byte code rows."""
    # r15: in-query builds use the Arrow/numpy assignment. The flat
    # SQL encode at m=8 x ksub=16 over dim-64 input already exceeds
    # whole-stage codegen's 64 KB method limit (the consume method
    # cannot split when its input is a deserialized local variable),
    # so every action paid a ~17k-line janino compile that FAILED
    # before falling back — compile failures are not cached, so the
    # cost recurred per execution. numpy codebooks/codes verified
    # element-identical to the SQL path at sf0.001/0.01/0.1.
    if books is None:
        books = pq_codebooks(
            corpus, m, ksub, refine_iters, id_col, vec_col,
            method=build_method,
        )
    m = len(books)
    if codes is None:
        codes = pq_encode(
            corpus, books, id_col, vec_col, method=build_method
        )

    if adc_method == "numpy":
        short = _adc_shortlist_np(
            codes, queries, books, shortlist, id_col, vec_col,
            query_id_col,
        )
    else:
        # ADC scan rows stay NARROW: (query_id, id, adc) only.
        # Carrying the query vector/norm through the 10M-row
        # shortlist shuffle cost more than the scan itself (measured
        # 36s -> re-join form below); the query frame is tiny and
        # re-joins after the cut.
        qtab = F.broadcast(
            queries.select(
                F.col(query_id_col),
                F.expr(_unit_vec_sql(f"`{vec_col}`")).alias("_qnv"),
            ).select(
                query_id_col,
                pq_dtab_expr("`_qnv`", books).alias("_dtab"),
            )
        )
        adc = "+".join(
            f"element_at(_dtab,{s + 1})[_codes[{s}]]" for s in range(m)
        )
        scored = (
            codes.withColumnRenamed("codes", "_codes")
            .crossJoin(qtab)
            .select(query_id_col, id_col, F.expr(adc).alias("_adc"))
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.asc("_adc"), F.asc(id_col)
        )
        short = (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= shortlist)
            .select(query_id_col, id_col)
        )
    return _exact_rerank(
        short, corpus, queries, k, id_col, vec_col, query_id_col
    )


def _exact_rerank(
    short: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Exact-cosine re-rank of a (query_id, id) shortlist: join the
    float vectors back for ONLY those rows — at scale the ADC scan
    never touches the float corpus. Shared by the flat-PQ and IVF-PQ
    query paths."""
    qvecs = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qvec"),
            norm(F.col(vec_col)).alias("_qnorm"),
        )
    )
    rer = (
        short.join(corpus.select(F.col(id_col), F.col(vec_col)), id_col)
        .join(qvecs, query_id_col)
        .select(
            query_id_col,
            id_col,
            (
                dot(F.col(vec_col), F.col("_qvec"))
                / (norm(F.col(vec_col)) * F.col("_qnorm"))
            ).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return rer.withColumn(
        "rank", F.row_number().over(w2).cast("long")
    ).filter(F.col("rank") <= k)


# --------------------------------------------------------------------
# IVF-PQ composite (Jegou et al. 2011 §V, the FAISS IndexIVFPQ shape):
# coarse inverted lists + product-quantized RESIDUALS.
# --------------------------------------------------------------------
def ivfpq_build(
    corpus: DataFrame,
    n_lists: int = 64,
    m: int = 8,
    ksub: int = 64,
    coarse_refine: int = 2,
    pq_refine: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[tuple[int, list[float]]], Codebooks, DataFrame]:
    """Ingest-time IVF-PQ index build ->
    (coarse centroids, residual codebooks, (id, list_id, codes)).

    Why residuals: a flat PQ codebook must cover the whole corpus
    spread, so on a clustered corpus most codes burn on BETWEEN-
    cluster variance. Quantizing (vector - coarse centroid) spends
    the same M x ksub codes on the WITHIN-list geometry — the recall
    the bench shows flat PQ giving up at equal bytes.

    Scale shape: the coarse quantizer is similarity.ivf_index on the
    unit vectors (distributed Lloyd, collects only n_lists x dim);
    codebooks train on the residual frame with the numpy Lloyd
    (normalize=False — residuals are NOT re-normalized); the final
    pass fuses residual + encode per Arrow batch. At 100 TB the
    returned frame is written back partitioned by list_id (like
    ann_bench's IVF layout) so probes prune partitions; centroids +
    books are driver JSON like every other index artifact."""
    import numpy as np
    import pandas as pd

    from openset_spark.pipeline.similarity import ivf_index

    nv = corpus.select(
        F.col(id_col), F.expr(_unit_vec_sql(f"`{vec_col}`")).alias("_nv")
    )
    assigned, centroids = ivf_index(
        nv, n_lists, id_col=id_col, vec_col="_nv",
        refine_iters=coarse_refine,
    )
    centmat = np.asarray([v for _, v in centroids], dtype=np.float64)

    def _resid(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["_nv"]]
            )
            lids = pdf["list_id"].to_numpy()
            res = mat - centmat[lids]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "list_id": lids,
                    "resid": list(res),
                }
            )

    residuals = assigned.select(id_col, "list_id", "_nv").mapInPandas(
        _resid, f"{id_col} long, list_id int, resid array<double>"
    )
    books = pq_codebooks(
        residuals,
        m=m,
        ksub=ksub,
        refine_iters=pq_refine,
        id_col=id_col,
        vec_col="resid",
        method="numpy",
        normalize=False,
    )
    index = ivfpq_encode_frame(
        corpus, centroids, books, id_col=id_col, vec_col=vec_col
    )
    return centroids, books, index


def ivfpq_encode_frame(
    vecs: DataFrame,
    centroids: list[tuple[int, list[float]]],
    books: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, list_id, codes) for ``vecs`` against an EXISTING IVF-PQ
    index (centroids + residual books): JVM normalize + coarse argmax
    (the exact assignment expressions ivf_index uses, so list
    membership and argmin tie-breaks are identical to the build),
    then the numpy residual-encode per Arrow batch.

    Works on batch AND streaming frames — pure projections, no
    state — which makes it the LIVE INDEX WRITER: vectors arriving
    after the nightly build get list_id + codes on ingest, appended
    to the same list_id-partitioned layout the batch build wrote,
    and the result is bit-identical to re-running the batch encode
    over the union (17th parity surface)."""
    import numpy as np
    import pandas as pd

    from openset_spark.pipeline.similarity import (
        _arrow_nearest_centroid,
        _nearest_centroid,
    )

    centmat = np.asarray([v for _, v in centroids], dtype=np.float64)
    books_np = [np.asarray(b, dtype=np.float64) for b in books]
    nv = vecs.select(
        F.col(id_col), F.expr(_unit_vec_sql(f"`{vec_col}`")).alias("_nv")
    )
    # r15: the coarse argmax vectorizes through the Arrow assignment
    # pass when eligible (bit-identical list ids — the JVM expression
    # here had no staged norm, so it re-folded the row norm once per
    # centroid); the JVM expression stays the fallback
    assigned = _arrow_nearest_centroid(nv, "_nv", centroids)
    if assigned is None:
        assigned = nv.withColumn(
            "list_id", _nearest_centroid("`_nv`", centroids).cast("int")
        )

    def _enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["_nv"]]
            )
            lids = pdf["list_id"].to_numpy()
            codes = _np_codes(mat - centmat[lids], books_np)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "list_id": lids,
                    "codes": list(codes),
                }
            )

    return assigned.select(id_col, "list_id", "_nv").mapInPandas(
        _enc, f"{id_col} long, list_id int, codes array<int>"
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    books: Codebooks,
    index: DataFrame,
    k: int = 10,
    nprobe: int = 8,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-PQ query path: probe the ``nprobe`` nearest coarse lists
    per query (cosine, the assignment metric), ADC-scan ONLY those
    lists' code rows, exact-cosine re-rank the shortlist.

    The per-(query, list) distance tables carry the FULL reduced L2
    ||q_resid_sub||^2 - 2 q_resid_sub . b + ||b||^2 — the first term
    varies across lists, so dropping it (legal for single-list PQ)
    would make scores incomparable ACROSS probed lists.

    Scale shape: the probe set is a partition-pruning filter on the
    list_id-partitioned index (nprobe/n_lists of the bytes read);
    dtabs are Q x nprobe x M x ksub driver doubles shipped in the
    closure (tiny — the query batch broadcasts in every ANN path
    here); each Arrow batch emits per-partition partial top-
    ``shortlist`` rows and a window takes the exact global cut."""
    import numpy as np
    import pandas as pd

    qrows = queries.select(query_id_col, vec_col).collect()
    qids = np.asarray([r[query_id_col] for r in qrows], dtype=np.int64)
    qmat = _np_normalize(
        np.asarray([list(r[vec_col]) for r in qrows], dtype=np.float64)
    )
    centmat = np.asarray([v for _, v in centroids], dtype=np.float64)
    cnorm = np.linalg.norm(centmat, axis=1)
    cnorm[cnorm == 0.0] = 1.0
    # probe by cosine — the ivf_index assignment metric
    sims = (qmat @ centmat.T) / cnorm
    nprobe = min(nprobe, centmat.shape[0])
    probed = np.argsort(-sims, axis=1)[:, :nprobe]  # (Q, nprobe)

    mm = len(books)
    dsub = len(books[0][0])
    ksub = len(books[0])
    books_np = [np.asarray(b, dtype=np.float64) for b in books]
    # dtabs[(q, list)] -> (M, ksub) FULL reduced-L2 tables
    dtabs: dict[tuple[int, int], object] = {}
    for qi in range(len(qids)):
        for lid in probed[qi]:
            qr = qmat[qi] - centmat[lid]
            tab = np.empty((mm, ksub), dtype=np.float64)
            for s in range(mm):
                qs = qr[s * dsub : (s + 1) * dsub]
                b = books_np[s]
                tab[s] = (qs * qs).sum() - 2.0 * (b @ qs) + (b * b).sum(
                    axis=1
                )
            dtabs[(qi, int(lid))] = tab
    per_q_lists = [set(int(x) for x in probed[qi]) for qi in range(len(qids))]
    all_lists = sorted(set().union(*per_q_lists)) if len(qids) else []

    def _scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cmat = np.stack(pdf["codes"].to_numpy())
            ids = pdf[id_col].to_numpy()
            lids = pdf["list_id"].to_numpy()
            for qi in range(len(qids)):
                mask = np.isin(lids, list(per_q_lists[qi]))
                if not mask.any():
                    continue
                sel_ids = ids[mask]
                sel_codes = cmat[mask]
                sel_lids = lids[mask]
                adc = np.zeros(len(sel_ids), dtype=np.float64)
                for lid in per_q_lists[qi]:
                    lm = sel_lids == lid
                    if not lm.any():
                        continue
                    tab = dtabs[(qi, lid)]
                    part = np.zeros(int(lm.sum()), dtype=np.float64)
                    lc = sel_codes[lm]
                    for s in range(mm):
                        part += tab[s, lc[:, s]]
                    adc[lm] = part
                kk = min(shortlist, len(sel_ids))
                top = np.lexsort((sel_ids, adc))[:kk]
                yield pd.DataFrame(
                    {
                        query_id_col: np.full(kk, qids[qi]),
                        id_col: sel_ids[top],
                        "_adc": adc[top],
                    }
                )

    # the isin filter is what partition-prunes a list_id-partitioned
    # index at scale; the per-query masks refine inside the scan
    pruned = index.filter(F.col("list_id").isin(all_lists))
    partial = pruned.mapInPandas(
        _scan, f"{query_id_col} long, {id_col} long, _adc double"
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("_adc"), F.asc(id_col)
    )
    short = (
        partial.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= shortlist)
        .select(query_id_col, id_col)
    )
    return _exact_rerank(
        short, corpus, queries, k, id_col, vec_col, query_id_col
    )
