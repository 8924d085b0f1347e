#!/usr/bin/env python
"""Capture explain('formatted') for named registry queries into
plans/r15/<q>_<tag>.txt (plan-only companion to measure_r15.py —
no execution, usable while another job owns the cores)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from openset_spark import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    tag = sys.argv[2]
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "plans/r15"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("openset-spark-plans-r15")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        df = qs[n](spark, sf_dir)
        p = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )
        with open(os.path.join(out_dir, f"{n}_{tag}.txt"), "w") as f:
            f.write(p)
        print(n, "->", f"{n}_{tag}.txt")


if __name__ == "__main__":
    main()
