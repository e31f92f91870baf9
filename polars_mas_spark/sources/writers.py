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


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    sort_within: list[str] | None = None,
) -> None:
    """Hive-partitioned parquet layout (``path/col=value/...``): THE
    storage-side contract that makes 100 TB scans cheap. A filter or
    join key on a partition column becomes directory pruning — the scan
    never opens non-matching files (static PartitionFilters for literal
    predicates; dynamic partition pruning when the value set comes from
    a joined dimension — both plan-asserted in tests/test_plans.py).

    ``sort_within`` additionally sorts rows inside each output file so
    min/max row-group statistics turn range predicates on those columns
    into row-group skips (poor man's clustering; parquet writes the
    stats automatically).

    Partition columns should be LOW cardinality (day, source, lang —
    not doc_id): each distinct combination is a directory, and millions
    of tiny files kill the driver's file listing before any query runs.
    """
    out = df
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def compact_parquet(
    spark,
    path: str,
    target_files: int,
    partition_cols: list[str] | None = None,
) -> None:
    """Rewrite a parquet dataset into fewer files. Streaming ingestion
    and fine-grained writes leave thousands of small files; at cluster
    scale the fix is periodic compaction, not bigger drivers.

    Plain layouts coalesce (no shuffle) to ``target_files`` total.
    Partitioned layouts repartition on the partition columns, which
    co-locates each partition value in one task and therefore yields
    ONE file per partition directory — the usual compaction target;
    ``target_files`` only bounds the number of concurrent write tasks.

    Swap is crash-safe: the compacted copy is written beside the
    dataset, the original is renamed aside, the copy moved into place,
    and only then is the original deleted — at no point between
    filesystem operations is the data unrecoverable (a crash leaves
    either the original or both copies on disk, never neither)."""
    df = spark.read.parquet(path)
    base = path.rstrip("/")
    tmp = f"{base}__compact_tmp__"
    if partition_cols:
        (
            df.repartition(target_files, *[df[c] for c in partition_cols])
            .write.mode("overwrite").partitionBy(*partition_cols).parquet(tmp)
        )
    else:
        df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    old = f"{base}__compact_old__"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except BaseException:
        os.rename(old, path)  # roll back; the compacted tmp stays for retry
        raise
    shutil.rmtree(old)
