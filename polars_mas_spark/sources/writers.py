"""Result writers: parquet / csv / tsv / txt.

Reference surface: /root/reference/src/polars_mas/postprocessing.py:33-40.
The reference's tsv/txt branch passes the wrong keyword to polars and
raises; we implement the *intended* behavior (tab-separated output), as
noted in SURVEY.md §2.1 S9.

``single_file=True`` coalesces to one partition for byte-for-byte parity
with the reference's single-file outputs. At scale leave it False — a
100 TB result set must be written partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TEXT_SEPS = {"csv": ",", "tsv": "\t", "txt": "\t"}


def write_output(
    df: DataFrame,
    path: str,
    output_type: str = "parquet",
    single_file: bool = False,
    mode: str = "overwrite",
) -> None:
    out = df.coalesce(1) if single_file else df
    if output_type == "parquet":
        out.write.mode(mode).parquet(path)
        return
    if output_type in _TEXT_SEPS:
        (
            out.write.mode(mode)
            .option("header", True)
            .option("sep", _TEXT_SEPS[output_type])
            .csv(path)
        )
        return
    raise ValueError(f"Unsupported output type: {output_type}")
