"""Dump .explain('formatted') for bench queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
e.g.   python tools/dump_plans.py r13 before            # all bench queries
       python tools/dump_plans.py r13 after q5_region_revenue
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
import bench
from iceberg_rust_spark.session import get_spark


def main():
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or bench.BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join("/root/repo/plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plans")
    entry._warehouse(spark, sf_dir)
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(name, flush=True)


if __name__ == "__main__":
    main()
