"""Result writers: parquet / csv / tsv / txt.

Reference surface: /root/reference/src/polars_mas/postprocessing.py:33-40.
The reference's tsv/txt branch passes the wrong keyword to polars and
raises; we implement the *intended* behavior (tab-separated output), as
noted in SURVEY.md §2.1 S9.

``single_file=True`` (the default for text formats) writes ONE real file
at ``path`` — reference parity: its users read the output with plain
pandas/polars/R, which expect a file, not a Spark part-file directory.
The results table is P x D rows (tiny), so the single-partition write is
free. At scale (a 100 TB result set) pass ``single_file=False`` for a
partition-parallel directory write.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame

_TEXT_SEPS = {"csv": ",", "tsv": "\t", "txt": "\t"}


def write_output(
    df: DataFrame,
    path: str,
    output_type: str = "parquet",
    single_file: bool | None = None,
    mode: str = "overwrite",
) -> None:
    if output_type == "parquet":
        out = df.coalesce(1) if single_file else df
        out.write.mode(mode).parquet(path)
        return
    if output_type == "orc":
        out = df.coalesce(1) if single_file else df
        out.write.mode(mode).orc(path)
        return
    if output_type in ("json", "jsonl", "ndjson"):
        out = df.coalesce(1) if single_file else df
        out.write.mode(mode).json(path)
        return
    if output_type in _TEXT_SEPS:
        if single_file is None:
            single_file = True
        if not single_file:
            (
                df.write.mode(mode)
                .option("header", True)
                .option("sep", _TEXT_SEPS[output_type])
                .csv(path)
            )
            return
        # Single-file parity: write the one-partition directory next to
        # the target, then promote the part file to the target path.
        tmp = f"{path}.__spark_tmp__"
        (
            df.coalesce(1)
            .write.mode("overwrite")
            .option("header", True)
            .option("sep", _TEXT_SEPS[output_type])
            .csv(tmp)
        )
        parts = sorted(glob.glob(f"{tmp}/part-*"))
        if not parts:
            raise RuntimeError(f"no part file produced under {tmp}")
        if os.path.isdir(path):
            shutil.rmtree(path)
        shutil.move(parts[0], path)
        shutil.rmtree(tmp, ignore_errors=True)
        return
    raise ValueError(f"Unsupported output type: {output_type}")
