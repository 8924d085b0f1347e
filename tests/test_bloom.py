"""Deterministic portable Bloom filter (pipeline/bloom.py): exact
semijoin results (no false negatives, ever), scan-side prune power,
bit_or fold composability, hex packing contract, and validation."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from openset_spark.pipeline.bloom import (
    bloom_contains,
    bloom_filter,
    bloom_fold,
    bloom_pack,
    bloom_semijoin,
    bloom_words,
)


def test_semijoin_is_exact(spark):
    build = spark.range(300).selectExpr("concat('k', id * 3) AS key")
    probe = spark.range(8000).selectExpr("concat('k', id) AS key", "id AS v")
    got = sorted(
        map(tuple, bloom_semijoin(probe, build, "key").collect())
    )
    want = sorted(
        map(tuple, probe.join(build, "key", "left_semi").collect())
    )
    assert got == want and len(want) == 300


def test_no_false_negatives_and_low_fp(spark):
    build = spark.range(1000).selectExpr("concat('m', id) AS key")
    probe = spark.range(20000).selectExpr(
        "CASE WHEN id < 1000 THEN concat('m', id) "
        "ELSE concat('x', id) END AS key"
    )
    packed = bloom_pack(bloom_words(build, "key").collect())
    survivors = probe.filter(
        bloom_contains(F.col("key"), packed)
    ).count()
    # every member survives (Bloom guarantee) ...
    assert survivors >= 1000
    # ... and at m=2^17, k=3, n=1000 the fp rate is ~1e-5: allow 1%
    assert survivors - 1000 <= 190


def test_fold_equals_direct_bit_for_bit(spark):
    df = spark.range(800).selectExpr(
        "concat('k', id) AS key", "id % 5 AS shard"
    )
    shards = [
        bloom_words(df.filter(F.col("shard") == i), "key")
        for i in range(5)
    ]
    u = shards[0]
    for s in shards[1:]:
        u = u.unionByName(s)
    folded = sorted(map(tuple, bloom_fold(u).collect()))
    direct = sorted(map(tuple, bloom_words(df, "key").collect()))
    assert folded == direct


def test_null_keys_never_match(spark):
    build = spark.createDataFrame([("a",), (None,)], ["key"])
    probe = spark.createDataFrame(
        [("a", 1), (None, 2), ("b", 3)], ["key", "v"]
    )
    got = bloom_semijoin(probe, build, "key").collect()
    assert [(r.key, r.v) for r in got] == [("a", 1)]


def test_build_col_rename_and_validation(spark):
    build = spark.range(50).selectExpr("concat('k', id) AS o_key")
    probe = spark.range(200).selectExpr("concat('k', id) AS key")
    n = bloom_semijoin(probe, build, "key", build_col="o_key").count()
    assert n == 50
    with pytest.raises(ValueError, match="multiple of 32"):
        bloom_words(build, "o_key", m_bits=100)
    with pytest.raises(ValueError, match="k must be"):
        bloom_words(build, "o_key", k=0)


def test_pack_contract(spark):
    """Entry j of the packed list = word_idx j; absent words are
    zero — the layout bloom_contains element_at's back."""
    rows = [
        {"word_idx": 0, "word": 0x0000_0001},
        {"word_idx": 2, "word": 0x8000_0000},
    ]
    packed = bloom_pack(rows, m_bits=128)
    assert packed == [1, 0, 0x8000_0000, 0]
    import pytest as _pt

    with _pt.raises(ValueError, match="packed length"):
        bloom_contains(F.lit("x"), packed, m_bits=256)


SETTINGS = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    members=st.sets(st.integers(min_value=0, max_value=400), min_size=1, max_size=40),
    probes=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60),
)
@SETTINGS
def test_law_semijoin_exactness(spark, members, probes):
    build = spark.createDataFrame([(f"k{m}",) for m in members], ["key"])
    probe = spark.createDataFrame([(f"k{p}", i) for i, p in enumerate(probes)], ["key", "v"])
    got = sorted(map(tuple, bloom_semijoin(probe, build, "key", m_bits=1 << 12).collect()))
    want = sorted((f"k{p}", i) for i, p in enumerate(probes) if p in members)
    assert got == want


def test_md5_family_bitmap_replays_in_duckdb(spark):
    """The portable family's bitmap is engine-portable: DuckDB
    computes the identical (word_idx, word) rows from the same
    Kirsch-Mitzenmacher derivation over the 60-bit md5 prefix."""
    import duckdb

    build = spark.range(400).selectExpr("concat('k', id * 3) AS key")
    direct = sorted(
        map(tuple, bloom_words(build, "key", hash="md5").collect())
    )
    con = duckdb.connect()
    con.register("b", build.toPandas())
    duck = con.execute(
        """
        WITH h AS (
          SELECT CAST(CAST(concat('0x', substr(md5(key), 1, 15))
            AS UBIGINT) AS BIGINT) AS hv FROM b
        ),
        km AS (
          SELECT hv % 1073741824 AS h1,
            ((hv // 1073741824) % 536870912) * 2 + 1 AS h2 FROM h
        ),
        pos AS (
          SELECT CAST((h1 + d * h2) % 131072 AS INTEGER) AS pos
          FROM km, (SELECT unnest(range(3)) AS d) ds
        )
        SELECT pos // 32 AS word_idx,
          bit_or(1::BIGINT << (pos % 32)) AS word
        FROM pos GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert [(int(a), int(b)) for a, b in duck] == direct


def test_xx64_and_md5_families_agree_on_semijoin(spark):
    build = spark.range(100).selectExpr("concat('k', id * 5) AS key")
    probe = spark.range(3000).selectExpr("concat('k', id) AS key")
    a = sorted(
        r.key for r in bloom_semijoin(probe, build, "key", hash="xx64").collect()
    )
    b = sorted(
        r.key for r in bloom_semijoin(probe, build, "key", hash="md5").collect()
    )
    assert a == b and len(a) == 100
    with pytest.raises(ValueError, match="hash must be"):
        bloom_semijoin(probe, build, "key", hash="sha9")


def test_big_build_shuffles_only_survivors(spark):
    """broadcast_keys=False: the residual semijoin may shuffle, but
    only bloom SURVIVORS reach it — the filter sits below the
    exchange on the probe side."""
    build = spark.range(5000).selectExpr("concat('k', id * 2) AS key")
    probe = spark.range(40000).selectExpr("concat('k', id) AS key")
    out = bloom_semijoin(
        probe, build, "key", broadcast_keys=False
    )
    assert out.count() == 5000


def test_internal_name_collision_raises(spark):
    """ADVICE r11: a probe frame already carrying _h60/_bm/_bmk would
    be silently clobbered (withColumn replaces) and dropped — the
    bloom path must refuse, like cms_estimate does."""
    build = spark.range(10).selectExpr("concat('k', id) AS key")
    for bad in ("_h60", "_bm", "_bmk"):
        probe = spark.range(10).selectExpr(
            "concat('k', id) AS key", f"id AS {bad}"
        )
        with pytest.raises(ValueError, match="collide with internals"):
            bloom_filter(probe, "key", build)
        with pytest.raises(ValueError, match="collide with internals"):
            bloom_semijoin(probe, build, "key")
