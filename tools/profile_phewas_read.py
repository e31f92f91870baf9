"""Decompose the columnar fan-out's per-task parquet read cost (r13).

The fixture is 8 files x 1806 columns; each fan-out task reads
pred+covs+its deps via pyarrow.dataset. Separates: dataset discovery,
footer/metadata parse, and the actual column decode, plus per-file
pq.ParquetFile alternatives.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("phewas-read-profile")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from polars_mas_spark.queries_ext import _phewas_wide_parquet

    path = _phewas_wide_parquet(spark, "/root/testdata/sf0.1")
    spark.stop()

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    files = sorted(
        f"{path}/{f}" for f in os.listdir(path) if f.endswith(".parquet")
    )
    read_cols = ["exposure"] + [f"cov_{c}" for c in range(5)] + [
        f"phecode_{i:04d}" for i in range(112)
    ]

    def t(label, fn, n=3):
        best = min(timeit(fn) for _ in range(n))
        print(f"  {label:55s} {best * 1000:8.1f} ms")
        return best

    def timeit(fn):
        t0 = time.time()
        fn()
        return time.time() - t0

    print(f"files: {len(files)}")

    t("pads.dataset(files) [discovery only]", lambda: pads.dataset(files))

    ds = pads.dataset(files)
    t("ds.to_table(118 cols, no threads)",
      lambda: ds.to_table(columns=read_cols, use_threads=False))
    t("ds.to_table(118 cols, threads)",
      lambda: ds.to_table(columns=read_cols, use_threads=True))
    t("fresh dataset + to_table(118 cols)",
      lambda: pads.dataset(files).to_table(
          columns=read_cols, use_threads=False))
    t("ds.to_table(6 design cols only)",
      lambda: ds.to_table(columns=read_cols[:6], use_threads=False))

    t("pq.ParquetFile(f) x8 [footer parse only]",
      lambda: [pq.ParquetFile(f) for f in files])

    pfs = [pq.ParquetFile(f) for f in files]
    t("pf.read(118 cols) x8 [pre-parsed footers]",
      lambda: [pf.read(columns=read_cols, use_threads=False) for pf in pfs])

    t("pq.read_table(f, 118 cols) x8",
      lambda: [pq.read_table(f, columns=read_cols, use_threads=False)
               for f in files])

    md = pq.ParquetFile(files[0]).metadata
    print(f"row groups/file: {md.num_row_groups}, "
          f"rows/file: {md.num_rows}, cols: {md.num_columns}")


if __name__ == "__main__":
    main()
