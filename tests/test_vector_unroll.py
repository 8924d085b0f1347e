"""r15: the unrolled (dim-aware) vector forms must be BIT-identical
to the higher-order-function forms — same left fold, same promotion
— on float and double arrays, including negative zeros and nulls.

This is the safety fence for the r15 optimization that moved the ANN
scoring paths off interpreted ``aggregate``/``zip_with`` onto
codegen'd ``element_at`` sums: any reassociation or type-promotion
drift would surface here as a bit mismatch before it could reach an
oracle hash.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from openset_spark.functions.vector import (
    cosine,
    cosine_fixed,
    dot,
    dot_fixed,
    norm,
    norm_fixed,
)


def _rand_rows(n: int, dim: int, seed: int, cast: str) -> list:
    rng = random.Random(seed)

    def vec():
        v = [rng.uniform(-2, 2) for _ in range(dim)]
        # sprinkle exact zeros (negative too) to probe the 0-sign fold
        for i in rng.sample(range(dim), 3):
            v[i] = -0.0 if rng.random() < 0.5 else 0.0
        return v

    return [(i, vec(), vec()) for i in range(n)]


@pytest.mark.parametrize("cast", ["array<double>", "array<float>"])
@pytest.mark.parametrize("dim", [7, 64])
def test_unrolled_bit_identical(spark, cast, dim):
    rows = _rand_rows(50, dim, seed=dim, cast=cast)
    df = (
        spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
        .select(
            "id",
            F.col("a").cast(cast).alias("a"),
            F.col("b").cast(cast).alias("b"),
        )
    )
    out = df.select(
        dot(F.col("a"), F.col("b")).alias("d_hof"),
        dot_fixed("`a`", "`b`", dim).alias("d_unr"),
        norm(F.col("a")).alias("n_hof"),
        norm_fixed("`a`", dim).alias("n_unr"),
        cosine(F.col("a"), F.col("b")).alias("c_hof"),
        cosine_fixed("`a`", "`b`", dim).alias("c_unr"),
    ).collect()
    for r in out:
        # exact bit equality, including the sign of zero
        assert math.copysign(1, r.d_hof) == math.copysign(1, r.d_unr)
        assert r.d_hof == r.d_unr
        assert r.n_hof == r.n_unr
        assert r.c_hof == r.c_unr


def test_unrolled_null_array(spark):
    df = spark.createDataFrame(
        [(1, None, [1.0, 2.0])], "id long, a array<double>, b array<double>"
    )
    r = df.select(
        dot(F.col("a"), F.col("b")).alias("d_hof"),
        dot_fixed("`a`", "`b`", 2).alias("d_unr"),
        norm(F.col("a")).alias("n_hof"),
        norm_fixed("`a`", 2).alias("n_unr"),
    ).collect()[0]
    assert r.d_hof is None and r.d_unr is None
    assert r.n_hof is None and r.n_unr is None
