"""r16: the Arrow MinHash slot pass (_arrow_minhash_slots — a
measured negative result, deliberately NOT wired into
minhash_signature; see its docstring) must stay BIT-identical to the
JVM ``min(xxhash64(_h, i))`` aggregate — candidate sets (and
therefore every minhash-derived query result) would change with any
slot drift if a future round wires it in. Locks the NumPy XXH64
replication against the SQL expression on randomized and edge-case
inputs, the partial-min composition, and the end-to-end signature
equality."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from openset_spark.pipeline.dedup import (
    _arrow_minhash_slots,
    minhash_bands,
    minhash_signature,
)

_EDGES = [0, 1, -1, 2**63 - 1, -(2**63), 42, -42, 2**32, -(2**32)]


def _jvm_signature(df, text_col, id_col, num_hashes, shingle_n):
    """The pre-r16 pure-JVM signature aggregate, verbatim."""
    from openset_spark.functions.text import shingles_from_tokens, tokens

    exploded = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(
                    shingles_from_tokens(F.col("_toks"), shingle_n)
                )
            ).alias("shingle"),
        )
        .select(F.col(id_col), F.xxhash64("shingle").alias("_h"))
    )
    slots = ",".join(f"min(xxhash64(_h, {i}))" for i in range(num_hashes))
    return exploded.groupBy(id_col).agg(F.expr(f"array({slots})").alias("mh"))


def test_slot_hashes_bit_identical_to_sql(spark):
    rng = random.Random(11)
    vals = [rng.randint(-(2**63), 2**63 - 1) for _ in range(500)] + _EDGES
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, _h long"
    )
    got = _arrow_minhash_slots(df, "doc_id", 64)
    assert got is not None
    grows = {r["doc_id"]: [r[f"s{i}"] for i in range(64)]
             for r in got.collect()}
    exp_cols = [F.expr(f"xxhash64(_h, {i})").alias(f"s{i}")
                for i in range(64)]
    erows = {r["doc_id"]: [r[f"s{i}"] for i in range(64)]
             for r in df.select("doc_id", *exp_cols).collect()}
    assert grows == erows


def test_partial_min_composes_across_batches(spark):
    # many rows per doc forced through tiny Arrow batches: partial
    # mins must combine to the same per-doc minimum
    rng = random.Random(5)
    rows = [(i % 7, rng.randint(-(2**63), 2**63 - 1)) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, _h long")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "97")
    try:
        part = _arrow_minhash_slots(df, "doc_id", 16)
        mins = ",".join(f"min(s{i})" for i in range(16))
        got = {
            r["doc_id"]: r["mh"]
            for r in part.groupBy("doc_id")
            .agg(F.expr(f"array({mins})").alias("mh"))
            .collect()
        }
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    slots = ",".join(f"min(xxhash64(_h, {i}))" for i in range(16))
    exp = {
        r["doc_id"]: r["mh"]
        for r in df.groupBy("doc_id")
        .agg(F.expr(f"array({slots})").alias("mh"))
        .collect()
    }
    assert got == exp


def test_arrow_composed_signature_equals_jvm_path(spark):
    """The Arrow pass composed with the final JVM min aggregate must
    reproduce minhash_signature exactly on real tokenized docs."""
    from openset_spark.functions.text import shingles_from_tokens, tokens

    rng = random.Random(3)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(1, 30))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    exploded = (
        df.select(F.col("doc_id"), tokens(F.col("text")).alias("_toks"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(shingles_from_tokens(F.col("_toks"), 3))
            ).alias("shingle"),
        )
        .select("doc_id", F.xxhash64("shingle").alias("_h"))
    )
    part = _arrow_minhash_slots(exploded, "doc_id", 64)
    mins = ",".join(f"min(s{i})" for i in range(64))
    got = {
        r.doc_id: r.mh
        for r in part.groupBy("doc_id")
        .agg(F.expr(f"array({mins})").alias("mh"))
        .collect()
    }
    exp = {r.doc_id: r.mh for r in minhash_signature(df).collect()}
    assert got == exp
    # the production JVM signature path agrees with its own verbatim
    # copy (regression fence for the expression string)
    exp2 = {r.doc_id: r.mh
            for r in _jvm_signature(df, "text", "doc_id", 64, 3).collect()}
    assert exp == exp2
    gb = sorted(map(tuple, minhash_bands(df).collect()))
    assert len(gb) == 16 * len(exp)


def test_exotic_id_type_falls_back_to_jvm(spark):
    df = spark.createDataFrame(
        [((1, 2), 99)], "doc_id struct<a:int,b:int>, _h long"
    )
    assert _arrow_minhash_slots(df, "doc_id", 8) is None
