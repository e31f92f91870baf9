"""Sequence packing: assign documents to fixed token-budget context
windows ("packs") for LLM pretraining batches.

Semantics = concat-and-cut, the standard pretraining packing: within a
shard, documents are laid end-to-end in key order and the stream is cut
every ``budget`` tokens; a document belongs to the pack where it
*starts* (``pack_id = floor(exclusive_prefix_tokens / budget)``). This
is deterministic, engine-portable (the DuckDB oracle is one window
sum), and — unlike first-fit bin packing — needs no sequential scan
with data-dependent state, so it stays a single partitioned window.

Scale story: the only shuffle is the hash partition on ``shard``.
Shard count bounds the window partition size — at 100 TB pick
``n_shards`` so one shard's documents fit a task (e.g. 100k shards ⇒
~1 GB/shard); packing quality is unaffected because packs never span
shards by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_mas_spark.colutils import qcol
from polars_mas_spark.operators.sampling import hash_bucket


def pack_sequences(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Add ``shard``, ``pack_id``, ``pack_offset`` (token position of the
    document's first token inside its pack) for every row.

    Documents longer than ``budget`` simply span packs — exactly what
    concat-and-cut training does (the tail continues in the next
    window); their start position is still well-defined.
    """
    shard = hash_bucket(qcol(key_col), n_shards, salt)
    w = (
        Window.partitionBy("shard")
        .orderBy(qcol(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(qcol(tokens_col)).over(w), F.lit(0))
    return (
        df.withColumn("shard", shard)
        .withColumn("pack_id", F.floor(start / F.lit(budget)))
        .withColumn("pack_offset", start % F.lit(budget))
    )


def pack_utilization(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Per-(shard, pack) fill report: documents started, tokens landing
    IN the pack, and the fill fraction against the budget — the metric
    a data engineer watches to size ``budget`` against the corpus's
    document-length distribution.

    Spanning documents are apportioned to every pack they cross (a doc
    of 3.5x budget contributes a full budget to each pack it covers and
    the remainder to the last): attributing all tokens to the start
    pack — the naive groupBy — reports fill_fraction > 1 there and
    omits the fully-covered middle packs from the report entirely,
    making a near-perfectly-packed stream look wildly mis-sized. The
    span explode is map-side (sequence over pack indices, bounded by
    doc_len/budget); the only shuffle is the final (shard, pack)
    aggregate, so fill_fraction is exact and always <= 1."""
    packed = pack_sequences(df, key_col, tokens_col, budget, n_shards, salt)
    B = F.lit(budget)
    start = F.col("pack_id") * B + F.col("pack_offset")
    n = qcol(tokens_col)
    end = start + n
    last = F.greatest(F.col("pack_id"), F.floor((end - 1) / B))
    spans = packed.select(
        "shard",
        start.alias("__start__"),
        end.alias("__end__"),
        F.col("pack_id").alias("__first__"),
        F.explode(F.sequence(F.col("pack_id"), last)).alias("pack_id"),
    )
    tok_in = F.least(F.col("__end__"), (F.col("pack_id") + 1) * B) - F.greatest(
        F.col("__start__"), F.col("pack_id") * B
    )
    return (
        spans.withColumn("__tok__", tok_in)
        .groupBy("shard", "pack_id")
        .agg(
            F.sum(
                F.when(F.col("pack_id") == F.col("__first__"), 1).otherwise(0)
            ).alias("docs_started"),
            F.sum("__tok__").alias("tokens_in_pack"),
            F.round(F.sum("__tok__") / F.lit(float(budget)), 6).alias(
                "fill_fraction"
            ),
        )
    )
