"""Sketches are ingest-time ARTIFACTS: they must round-trip through
parquet bit-for-bit and keep folding/estimating identically after a
write/read cycle (schema stability is part of the contract)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_all_four_sketches_round_trip_parquet(spark, tmp_path_factory):
    from openset_spark.pipeline.cms import cms_estimate, cms_partials
    from openset_spark.pipeline.hdrhist import hdr_partials, hdr_quantiles
    from openset_spark.pipeline.hll import hll_estimate, hll_partials
    from openset_spark.pipeline.kmv import (
        kmv_distinct_estimate,
        kmv_partials,
    )

    d = str(tmp_path_factory.mktemp("sketches"))
    df = spark.range(20000).selectExpr(
        "concat('u', id % 3000) AS u", "id % 4 AS g"
    )

    hll = hll_partials(df, "u", ("g",))
    cms = cms_partials(df, "u", ("g",))
    hdr = hdr_partials(
        spark.range(20000).selectExpr(
            "id % 4 AS g", "CAST(id % 9999 AS LONG) AS x"
        ),
        "x",
        ("g",),
    )
    kmv = kmv_partials(df, "u", ("g",), 128)
    frames = {"hll": hll, "cms": cms, "hdr": hdr, "kmv": kmv}
    back = {}
    for name, fr in frames.items():
        p = os.path.join(d, name)
        fr.write.parquet(p)
        back[name] = spark.read.parquet(p)
        assert sorted(map(tuple, back[name].collect())) == sorted(
            map(tuple, fr.collect())
        ), name
        # parquet reads mark everything nullable; names + types are
        # the stable contract
        assert [(f.name, f.dataType) for f in back[name].schema] == [
            (f.name, f.dataType) for f in fr.schema
        ], name

    # and the estimates read off the reloaded artifacts are identical
    assert sorted(
        map(tuple, hll_estimate(back["hll"], ("g",)).collect())
    ) == sorted(map(tuple, hll_estimate(hll, ("g",)).collect()))
    probes = df.select("g", "u").distinct().limit(50).localCheckpoint()
    assert sorted(
        map(
            tuple,
            cms_estimate(back["cms"], probes, "u", ("g",)).collect(),
        )
    ) == sorted(
        map(tuple, cms_estimate(cms, probes, "u", ("g",)).collect())
    )
    assert sorted(
        map(tuple, hdr_quantiles(back["hdr"], (0.5,), ("g",)).collect())
    ) == sorted(map(tuple, hdr_quantiles(hdr, (0.5,), ("g",)).collect()))
    assert sorted(
        map(
            tuple,
            kmv_distinct_estimate(back["kmv"], ("g",), 128).collect(),
        )
    ) == sorted(
        map(tuple, kmv_distinct_estimate(kmv, ("g",), 128).collect())
    )
