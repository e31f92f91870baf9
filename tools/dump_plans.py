"""Dump df.explain("formatted") for bench-headline queries to files.

Usage: python tools/dump_plans.py <outdir> <suffix> [name ...]

Writes <outdir>/<query>_<suffix>.txt for each bench HEADLINE query (or
the given subset). Plans are built at $SPARK_GRAFT_SF_DIR (default
sf0.1 — the bench scale, so eager-statistics jobs see bench-shaped
inputs). The judge reads these against OPTIMIZATION_r{N}.md claims.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    os.makedirs(outdir, exist_ok=True)

    from polars_mas_spark.plans import formatted_plan
    from polars_mas_spark.session import get_spark
    import __spark_entry__ as entry_mod
    from polars_mas_spark.queries_ext import BENCH_ONLY
    import bench

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**entry_mod.queries(), **BENCH_ONLY}
    names = [n for n in bench.HEADLINE if not only or n in only]
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"skip  {name}: not registered")
            continue
        try:
            plan = formatted_plan(fn(spark, SF_DIR))
        except Exception as e:
            print(f"FAIL  {name}: {e}")
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"ok    {name} -> {path}")


if __name__ == "__main__":
    main()
