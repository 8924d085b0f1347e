#!/usr/bin/env python
"""r15 audit: for every registry query, count how many times each
parquet table is scanned in the physical plan. Multiple scans of one
table are either deliberate (self-joins, train/score splits) or the
AQE-doesn't-reuse-branch-exchanges trap dsir hit (fixed r15) — this
lists the candidates so each can be judged by hand."""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from openset_spark import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("scan-audit-r15")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    names = sys.argv[1:] or sorted(qs)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            tables = Counter(
                re.findall(r"FileScan parquet .*?([a-z_]+)\.parquet", plan)
            ) + Counter(re.findall(r"Scan parquet[^\[]*\[file:[^\]]*?([a-z_]+)\.parquet", plan))
            multi = {t: c for t, c in tables.items() if c > 1}
            if multi:
                print(f"{name}: {dict(sorted(multi.items()))}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
