"""Corpus sampling for training-mix construction.

Deterministic (seeded) so mixes are reproducible run-to-run — at
100 TB a re-run that samples different rows invalidates every
downstream cache. Stratified sampling is ``sampleBy`` (per-stratum
Bernoulli, no shuffle); weighted sampling keeps a row when a seeded
uniform hash falls under its weight (one projection, no RNG state)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (e.g. {'en': 1.0, 'de': 0.25}).
    Strata missing from ``fractions`` are dropped — the usual
    language-mix contract."""
    return df.sampleBy(strata_col, fractions, seed)


def hash_uniform(cols: list[str], seed: int = 42) -> Column:
    """Deterministic per-row uniform in [0,1): xxhash64 of the key
    columns, scaled. Same row + same seed -> same draw, on any
    cluster, in any partition order."""
    h = F.xxhash64(*[F.col(c) for c in cols], F.lit(seed))
    # map signed 64-bit to [0,1)
    return (h.cast("double") / F.lit(float(1 << 64))) + F.lit(0.5)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_cols: list[str],
    seed: int = 42,
) -> DataFrame:
    """Keep each row with probability = its weight column (clamped to
    [0,1]), decided by the row's own hash — reproducible without RNG
    state, resumable, and independent of partitioning."""
    keep = hash_uniform(key_cols, seed) < F.least(
        F.greatest(F.col(weight_col), F.lit(0.0)), F.lit(1.0)
    )
    return df.filter(keep)


def token_budget_select(
    df: DataFrame,
    budget: int,
    score_col: str = "quality",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    partitions: int = 32,
) -> DataFrame:
    """Select the best documents that fit a token budget — the
    data-mixing primitive ("take the top-quality docs until N tokens"):
    keep every document whose running token total, in (score DESC,
    id ASC) order, stays within ``budget``.

    The naive form is a global-ordering window — ONE partition doing
    all the work, the classic 100 TB anti-pattern. Here the prefix sum
    is distributed instead: ``repartitionByRange`` on the sort key
    gives range-partitioned data whose partition ids follow the global
    order, each partition computes its LOCAL running total with an
    ordinary per-partition window, and the per-partition totals (one
    tiny row each) are prefix-summed and broadcast back as offsets.
    Work per partition is uniform; no stage sees more than its slice.
    """
    w_key = [F.col(score_col).desc(), F.col(id_col).asc()]
    out = (
        distributed_cumsum(df, w_key, token_col, partitions)
        .filter(F.col("_cum") <= budget)
    )
    return out.withColumnRenamed("_cum", "cum_tokens")


def distributed_cumsum(
    df: DataFrame,
    order_key: list[Column],
    token_col: str,
    partitions: int = 32,
    group_cols: tuple[str, ...] = (),
    materialize_input: bool = False,
) -> DataFrame:
    """Running total of ``token_col`` in ``order_key`` order as a
    ``_cum`` column (inclusive), computed WITHOUT a global-ordering
    window: range partitions → per-partition local windows →
    per-partition totals prefix-summed and broadcast back as offsets
    (see `token_budget_select`, whose oracle proves the decomposition
    exact). With ``group_cols`` the running total restarts per group
    — the range partitioning keys on (group, order), so one giant
    group still spreads over many partitions instead of pinning a
    single window partition (the per-domain skew case).

    ``materialize_input`` localCheckpoints the input first: the plan
    evaluates its child once for range-boundary SAMPLING and once for
    the exchange, so an input with expensive derived columns (lang
    scoring, quality heuristics) pays ~3x without it (measured 2.5x
    end-to-end win on mixture_select at sf0.1). The checkpoint is
    executor-local storage — on a cluster with aggressive
    decommissioning, materialize to a table instead."""
    if materialize_input:
        df = df.localCheckpoint()
    grp = [F.col(c) for c in group_cols]
    ranged = df.repartitionByRange(partitions, *grp, *order_key)
    part = ranged.withColumn("_pid", F.spark_partition_id())
    local_w = (
        Window.partitionBy(*group_cols, "_pid")
        .orderBy(*order_key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn("_local_cum", F.sum(token_col).over(local_w))
    # per-(group,)partition totals: `partitions` tiny rows per group —
    # the prefix-sum over them is driver-trivial but stays in-plan as
    # a broadcast join. Aggregated from the PRE-window frame (r15):
    # AQE does not reuse exchanges across branches, so this branch
    # re-executes the range exchange either way — but summing `part`
    # instead of `local` drops the per-partition SORT + running-window
    # pass from the totals branch (a plain map-side-combinable hash
    # aggregate needs no order). Order-safe because every caller's
    # token column is integral (unit weights / token counts) — a
    # float token column would make the sum order-sensitive and must
    # keep the windowed form.
    totals = part.groupBy(*group_cols, "_pid").agg(
        F.sum(token_col).alias("_ptot")
    )
    offset_w = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.withColumn(
        "_offset", F.sum("_ptot").over(offset_w) - F.col("_ptot")
    ).select(*group_cols, "_pid", "_offset")
    return (
        local.join(F.broadcast(offsets), [*group_cols, "_pid"])
        .withColumn("_cum", F.col("_local_cum") + F.col("_offset"))
        .drop("_pid", "_local_cum", "_offset")
    )


def mixture_select(
    df: DataFrame,
    budgets: dict[str, int],
    domain_col: str,
    score_col: str = "quality",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    partitions: int = 32,
    materialize_input: bool = True,
) -> DataFrame:
    """Domain-weighted corpus mixing: within each domain keep the
    best-scoring documents until THAT domain's token budget — the
    "x% code, y% web, z% books" training-mix primitive. Domains
    absent from ``budgets`` are dropped.

    Per-domain running totals use the grouped distributed prefix sum,
    so a dominant domain (80% English is the norm) spreads across
    range partitions instead of serializing one window partition —
    the failure mode of the naive ``Window.partitionBy(domain)``
    form at 100 TB."""
    base = df.filter(F.col(domain_col).isin(list(budgets)))
    order = [F.col(score_col).desc(), F.col(id_col).asc()]
    # mixture inputs are typically scored/derived frames, so the
    # one-shot materialization is on by default (see
    # distributed_cumsum on why the plan re-evaluates its child)
    c = distributed_cumsum(
        base, order, token_col, partitions, group_cols=(domain_col,),
        materialize_input=materialize_input,
    )
    budget = F.lit(None).cast("long")
    for dom, b in budgets.items():
        budget = F.when(F.col(domain_col) == dom, F.lit(b)).otherwise(budget)
    return (
        c.filter(F.col("_cum") <= budget)
        .withColumnRenamed("_cum", "cum_tokens")
    )


def sample_per_stratum(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: keep the k rows
    with the smallest portable hash of the id in each stratum (ties
    broken by the id itself). Unlike ``stratified_sample`` (Bernoulli
    via sampleBy — approximate counts, Spark-RNG-specific), this is
    count-exact AND engine-portable: the md5-prefix hash
    (conv(substr(md5(id),1,8),16,10), the pipeline/dsir.py bucket
    hash) computes identically in DuckDB, so the draw is verifiable
    row-for-row by the SQL oracle.

    Shape: one shuffle on the strata key + a per-stratum top-k
    window. Stratum count grows with the key cardinality (lang x
    source x ...), so partitions stay balanced at corpus scale; a
    single global stratum would funnel to one partition — callers
    with no strata should use weighted_sample instead."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    w = Window.partitionBy(*strata_cols).orderBy(
        h.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def group_cap(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    k: int,
) -> DataFrame:
    """Keep the best ``k`` rows per group in ``order`` — the
    domain-cap curation pass (CommonCrawl-style: no single domain may
    dominate the mix; keep its k best documents, drop the tail).

    Unlike sample_per_stratum's per-stratum window, the rank comes
    from the GROUPED distributed prefix sum: range partitions over
    (group, order) + broadcast offsets, so ONE huge group (the
    monster domain — exactly the row this operator exists for)
    spreads across many partitions instead of pinning a single
    window partition. ``order`` must be a total order (add the id as
    the last key) or the boundary rows are arbitrary."""
    ranked = distributed_cumsum(
        df.withColumn("_one", F.lit(1)),
        order,
        "_one",
        group_cols=tuple(group_cols),
    )
    return ranked.filter(F.col("_cum") <= k).drop("_one", "_cum")


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    comps: DataFrame | None = None,
) -> DataFrame:
    """Cluster-aware train/val/test assignment — the Lee et al. 2022
    leakage guard: near-duplicate documents MUST land in the same
    split, or the eval set leaks into training through surviving
    near-copies. A per-document hash split (the naive approach)
    violates this for every duplicate family it straddles.

    Assignment: connected components of the candidate pair graph
    (``dup_clusters`` — pass MinHash/SimHash candidates at scale,
    exact pairs for verification), then every document draws its
    split from the portable md5 bucket of its CLUSTER id (singletons
    use their own id). Family-atomic by construction, deterministic,
    engine-portable (the sample_per_stratum hash), and re-runnable:
    adding documents never reshuffles existing families across
    splits unless the new docs merge two families.

    Scale: one left join against the component frame (itself the
    O(log n) star algorithm) + pure column expressions.

    Pass ``comps`` (a materialized ``dup_clusters`` result — like
    PQ's ``books=``/``codes=``) when the pipeline already ran
    component discovery: corpus-prep chains that dedup AND split
    should compute the component frame once, not per consumer.
    Exactly one of ``pairs``/``comps`` is required.
    Output: (doc_id, cluster_id, split)."""
    from openset_spark.pipeline.dedup import dup_clusters

    if fractions is None:
        fractions = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    if comps is None:
        if pairs is None:
            raise ValueError("leakage_safe_split needs pairs= or comps=")
        comps = dup_clusters(pairs)
    labeled = (
        docs.select(id_col)
        .join(comps, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias(
                "cluster_id"
            ),
        )
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.col("cluster_id").cast("string")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    names = list(fractions)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += fractions[name]
        cond = bucket < int(round(cum * 1000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    if expr is None:  # single split name
        split = F.lit(names[-1])
    else:
        split = expr.otherwise(names[-1])
    return labeled.select(id_col, "cluster_id", split.alias("split"))


def temperature_weights(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Multilingual-LM mixture smoothing (the XLM/mT5 alpha recipe):
    per-source sampling weights w_s proportional to p_s^alpha with
    alpha = 0.5 — large sources are damped toward, small sources
    boosted from, their natural share. Alpha is FIXED at 0.5 so the
    power is `sqrt`, which IEEE-754 requires to be correctly rounded:
    every value in the frame is bit-portable across engines (an
    arbitrary-alpha `pow` would ride libm and isn't; callers needing
    other alphas get floats, not oracle rows).

    The weights are reported RELATIVE TO THE LARGEST SOURCE rather
    than normalized — w_rel = sqrt(n_s)/sqrt(n_max) and the
    oversampling factor boost = sqrt(n_max)/sqrt(n_s) — because a
    normalizing sum over float weights is partition-order-dependent;
    ratios of two exact sqrts are single IEEE divisions. p_ppm is the
    exact integer natural share.

    Output: (source, n_docs, n_tokens, p_ppm, w_rel, boost).

    Scale shape: one map-side-combinable aggregate over the corpus
    (token counts are `size(split(..))` — no explode), then the
    grand totals as a GLOBAL window over the |sources|-row result —
    bounded, one task, and crucially a single reference to the
    corpus aggregate (r16; see the in-code note)."""
    from openset_spark.functions.text import token_count

    # r16: the per-source frame used to be referenced twice (a
    # totals-aggregate broadcast + the main select), and AQE does not
    # reuse exchanges across plan branches — the corpus aggregate ran
    # once per reference (audit: documents x2). The totals now come
    # from a GLOBAL WINDOW over the |sources|-bounded frame instead:
    # one reference, one plan, no checkpoint job, 2 corpus scans -> 1.
    per = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).alias("n_tokens"),
    )
    w = Window.partitionBy()
    totaled = per.select(
        group_col,
        "n_docs",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("_total"),
        F.max("n_tokens").over(w).alias("_max"),
    )
    return totaled.select(
        group_col,
        "n_docs",
        "n_tokens",
        F.expr("n_tokens * 1000000 div _total").alias("p_ppm"),
        F.round(
            F.sqrt(F.col("n_tokens").cast("double"))
            / F.sqrt(F.col("_max").cast("double")),
            6,
        ).alias("w_rel"),
        F.round(
            F.sqrt(F.col("_max").cast("double"))
            / F.sqrt(F.col("n_tokens").cast("double")),
            6,
        ).alias("boost"),
    )


def temperature_budgets(
    docs: DataFrame,
    total_budget: int,
    group_col: str = "source",
    text_col: str = "text",
) -> dict[str, int]:
    """Driver-side companion to :func:`temperature_weights`: turn the
    alpha=0.5 smoothed weights into per-source TOKEN BUDGETS summing
    to <= ``total_budget``, ready for :func:`mixture_select` /
    ``stream_mixture_admit``. Allocation is floor(total * w_s / sum w)
    capped at the source's own supply (a budget above supply is
    unfillable and silently distorts the realized mixture toward the
    big sources — the exact skew the temperature was meant to undo).

    The weights frame is |sources| rows — collecting it is the
    intended scale shape (same contract as every centroid/codebook
    collect in this repo)."""
    rows = temperature_weights(docs, group_col, text_col).collect()
    import math

    w = {r[group_col]: math.sqrt(float(r["n_tokens"])) for r in rows}
    supply = {r[group_col]: int(r["n_tokens"]) for r in rows}
    tot = sum(w.values()) or 1.0
    return {
        s: min(int(total_budget * w[s] / tot), supply[s]) for s in w
    }
