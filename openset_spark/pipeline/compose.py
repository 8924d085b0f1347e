"""End-to-end training-corpus preparation: the pipeline operators
composed into the standard pretraining-data recipe.

    clean -> language filter -> quality filter -> exact dedup
          -> MinHash near-dup drop -> reproducible sample

Every stage is a declarative DataFrame transform from this package, so
the whole recipe is ONE lazily-planned query per materialization:
filters and projections reach the scan, the only shuffles are the two
dedup aggregates (content hash; LSH band buckets), and the sample is a
deterministic per-row hash draw — re-running the recipe on the same
input yields byte-identical output on any cluster at any partitioning
(the resumability property a 100 TB ingest needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openset_spark.pipeline.cleaning import clean_documents
from openset_spark.pipeline.dedup import exact_dedup, minhash_candidates
from openset_spark.pipeline.sampling import hash_uniform
from openset_spark.pipeline.textstats import lang_id, quality_score


def preprocess_crawl(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 3,
    max_link_permille: int = 500,
) -> DataFrame:
    """Raw crawl HTML -> model-ready text, the front-end step BEFORE
    prepare_corpus's recipe (which starts from already-textual
    documents): main-content extraction (block split + link-density
    keep), encoding repair (mojibake), PII redaction — fused so the
    raw corpus is read ONCE and the only shuffle is main-content's
    per-doc reassembly groupBy; repair and redaction are projections
    riding the same stage. Every published crawl recipe (CCNet /
    Gopher / DCLM shape) runs exactly this chain between WARC text
    and quality filtering.

    Output: (id, n_blocks, n_kept, n_mojibake, clean_text) — docs
    whose every block is pure markup emit nothing (the
    extract_main_content convention); all-boilerplate docs emit
    n_kept = 0 with empty clean_text."""
    from openset_spark.pipeline.cleaning import (
        extract_main_content,
        mojibake_repair,
    )
    from openset_spark.pipeline.pii import scrub_pii

    main = extract_main_content(
        df, text_col, id_col, min_tokens, max_link_permille
    )
    # n_blocks/n_kept ride mojibake_repair's carry hook — joining the
    # repaired frame back against `main` would reference the
    # reassembly groupBy from two subtrees and plan it twice
    fixed = mojibake_repair(
        main, text_col="main_text", id_col=id_col,
        carry=("n_blocks", "n_kept"),
    )
    return scrub_pii(fixed, text_col="repaired").select(
        id_col,
        "n_blocks",
        "n_kept",
        "n_mojibake",
        F.col("repaired").alias("clean_text"),
    )


def prepare_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    languages: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    sample_rate: float = 1.0,
    seed: int = 42,
    near_dup: bool = True,
    transitive: bool = False,
    split_fractions: dict[str, float] | None = None,
    lang_seed: DataFrame | None = None,
    lang_label_col: str = "lang",
) -> DataFrame:
    """The filtered, deduplicated, sampled corpus with per-doc
    metadata (clean_text, lang_guess, quality, n_tokens).

    Language routing: by default the cheap stopword heuristic
    (lang_id). Pass ``lang_seed`` (a labeled corpus; ``lang_label_col``
    names its label column) to route on the char-n-gram NB classifier
    instead (nb_lang_scores — the fastText-class identifier; VERDICT
    r12: the stopword heuristic is the one component that would not
    survive a production multilingual corpus, and every per-language
    mixture downstream keys on this signal).

    Near-dup handling keeps the LOWEST doc id of each candidate pair
    (the usual "first writer wins" policy); pair generation is the
    banded MinHash join — never all-pairs. ``transitive=True``
    switches to CLUSTER-keeper semantics (Lee et al.): connected
    components over the candidate pairs keep one doc per family, so
    A~B, B~C drops both B and C even though A and C never paired —
    stricter than the pairwise policy, which keeps every doc smaller
    than all of its own neighbors.

    ``split_fractions`` (e.g. ``{"train": .9, "val": .05, "test":
    .05}``) appends a leakage-safe ``split`` column. The connected
    components are computed ONCE and shared between the
    transitive-dedup keeper pass and the split assignment
    (``leakage_safe_split(comps=...)``) — the iterative CC job never
    runs twice in one chain."""
    cleaned = clean_documents(docs, text_col=text_col)

    if lang_seed is not None:
        from openset_spark.pipeline.classify import nb_lang_scores

        # the seed trains on the SAME cleaned representation the
        # corpus is scored in — markup grams in raw seed text would
        # shift every weight off the scoring domain
        langs = nb_lang_scores(
            cleaned,
            clean_documents(lang_seed, text_col=text_col),
            text_col="clean_text",
            label_col=lang_label_col,
            id_col=id_col,
        ).select(id_col, F.col("lang_nb").alias("lang_guess"))
    else:
        langs = lang_id(
            cleaned, text_col="clean_text", id_col=id_col
        ).select(id_col, "lang_guess")
    quality = quality_score(cleaned, text_col="clean_text", id_col=id_col).select(
        id_col, "quality", "n_tokens"
    )
    out = (
        cleaned.join(langs, id_col)
        .join(quality, id_col)
        .filter(F.col("lang_guess").isin(list(languages)))
        .filter(F.col("quality") >= min_quality)
    )

    # exact dedup on the cleaned content (normalized-hash groupBy)
    out = exact_dedup(out, text_col="clean_text", id_col=id_col)

    clusters = None
    if near_dup:
        pairs = minhash_candidates(out, text_col="clean_text", id_col=id_col)
        if transitive or split_fractions:
            from openset_spark.pipeline.dedup import dup_clusters

            clusters = dup_clusters(pairs)
        if transitive:
            losers = clusters.filter(
                F.col("doc_id") != F.col("cluster_id")
            ).select(F.col("doc_id").alias(id_col))
        else:
            # drop the higher id of every near-dup candidate pair
            losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        out = out.join(losers, id_col, "left_anti")

    if sample_rate < 1.0:
        out = out.filter(hash_uniform([id_col], seed) < sample_rate)

    if split_fractions:
        from openset_spark.pipeline.sampling import leakage_safe_split

        if clusters is None:
            # no near-dup pass ran: every doc is its own family, the
            # split degrades to the same portable per-doc hash bucket
            assigned = leakage_safe_split(
                out, pairs=out.limit(0).select(
                    F.col(id_col).alias("id_a"),
                    F.col(id_col).alias("id_b"),
                ),
                fractions=split_fractions, id_col=id_col,
            )
        else:
            assigned = leakage_safe_split(
                out, fractions=split_fractions, id_col=id_col,
                comps=clusters,
            )
        out = out.join(assigned.select(id_col, "split"), id_col)
    return out


def corpus_report(prepared: DataFrame) -> DataFrame:
    """One-row summary of the prepared corpus: docs, tokens, mean
    quality — the numbers a data card wants."""
    return prepared.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(F.avg("quality"), 4).alias("mean_quality"),
    )


def write_corpus(
    prepared: DataFrame,
    path: str,
    fmt: str = "parquet",
    shard_records: int = 100_000,
    manifest: bool = True,
) -> dict | None:
    """Materialize a prepared corpus as training shards + a data-card
    manifest.

    Shards are bounded by ``shard_records`` via maxRecordsPerFile —
    the writer keeps Spark's partitioning (no extra shuffle) and the
    format is parquet (columnar, splittable — the default) or json
    (JSONL shards for loaders that stream text). The manifest is the
    data card: document/token counts, mean quality, a per-language
    histogram, and a content fingerprint (order-insensitive XOR of
    per-doc hashes — equal corpora produce equal fingerprints on any
    partitioning, so a re-run is verifiable byte-independently).
    Returns the manifest dict (None with ``manifest=False``)."""
    import json
    import os

    writer = prepared.write.mode("overwrite").option(
        "maxRecordsPerFile", str(shard_records)
    )
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unknown corpus shard format {fmt!r}")
    if not manifest:
        return None
    back = (
        prepared.sparkSession.read.parquet(path)
        if fmt == "parquet"
        else prepared.sparkSession.read.json(path)
    )
    stats = back.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(F.avg("quality"), 4).alias("mean_quality"),
        # XOR of per-doc content hashes: associative+commutative (a
        # real partial-aggregating bit_xor, no collect), so the
        # fingerprint is partitioning/order independent at any scale
        F.expr("bit_xor(xxhash64(clean_text))").alias("fingerprint"),
    ).first()
    langs = {
        r.lang_guess: r.n
        for r in back.groupBy("lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    card = {
        "format": fmt,
        "shard_records": shard_records,
        "n_docs": int(stats.n_docs),
        "n_tokens": int(stats.n_tokens) if stats.n_tokens is not None else 0,
        "mean_quality": float(stats.mean_quality or 0.0),
        "languages": langs,
        "fingerprint": int(stats.fingerprint or 0),
        "schema": [f.name for f in back.schema.fields],
    }
    with open(os.path.join(path, "_MANIFEST.json"), "w") as f:
        json.dump(card, f, indent=1, sort_keys=True)
    return card


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot-to-snapshot corpus diff — the dataset-versioning
    primitive (what changed between crawl N and crawl N+1, what a
    retraining run actually sees as new): per-doc status over the
    NORMALIZED content hash.

    Output: (id, status in added|removed|changed|unchanged,
    old_hash, new_hash). One full-outer hash join on the id — the
    hashes are computed in the same projection as the scan, so each
    side is one pass; at 100 TB both sides are id-bucketed snapshot
    tables and the join is zero-exchange."""
    from openset_spark.functions.text import normalize

    oh = old.select(
        F.col(id_col), F.md5(normalize(F.col(text_col))).alias("old_hash")
    )
    nh = new.select(
        F.col(id_col), F.md5(normalize(F.col(text_col))).alias("new_hash")
    )
    j = oh.join(nh, id_col, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        F.col(id_col), status.alias("status"), "old_hash", "new_hash"
    )


def incremental_apply(
    old: DataFrame,
    new: DataFrame,
    old_out,
    fn,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental view maintenance for PER-DOCUMENT operators: given
    snapshot N (``old``), snapshot N+1 (``new``), the operator's
    cached output over snapshot N (``old_out``) and the operator
    itself (``fn: DataFrame -> DataFrame``, one output row keyed by
    ``id_col`` per input doc, each row a function of that doc alone
    — quality signals, token counts, fingerprints, NB scores, PII
    audits...), produce ``fn(new)`` WITHOUT re-running ``fn`` over
    the unchanged majority:

    * ``corpus_diff`` classifies every id in one (bucketed:
      zero-exchange) hash join;
    * ``fn`` runs only over the added+changed docs;
    * unchanged docs carry their cached rows forward (semi-join);
    * removed docs simply drop out.

    Exact by construction for per-document fn — asserted against the
    full recompute in tests. The crawl-over-crawl economics: a 1%
    churn re-tokenizes 1% of the corpus."""
    d = corpus_diff(old, new, id_col, text_col)
    fresh_ids = d.filter(
        F.col("status").isin("added", "changed")
    ).select(id_col)
    unchanged_ids = d.filter(F.col("status") == "unchanged").select(
        id_col
    )
    fresh = fn(new.join(fresh_ids, id_col, "left_semi"))
    carried = old_out.join(unchanged_ids, id_col, "left_semi")
    return carried.unionByName(fresh)
