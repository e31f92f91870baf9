"""Slowly-changing-dimension type-2 merge (the warehouse upsert
staple): apply a batch of timestamped attribute updates to a versioned
dimension, closing the open version at each real change and inserting
the new one, so every key carries its full validity-interval history.

Beyond-reference surface. Entirely relational — two windows over the
update batch (consecutive-duplicate removal, next-change lookup) plus
one key join against the open rows; no iteration, no driver loops, so
a billion-row update batch is three linear key-partitioned shuffles.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_mas_spark.colutils import qcol


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    ts_col: str,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
) -> DataFrame:
    """Return the merged dimension: ``(key, *tracked, from, to)`` with
    ``to`` NULL on each key's open version.

    Semantics (deterministic, order-defined):
    - ``updates`` must be unique per (key, ts) — pre-aggregate if not.
    - Consecutive updates with identical tracked attributes (null-safe)
      collapse to the first; an initial update identical to the key's
      OPEN current version is ignored entirely (no zero-width flap).
    - A key's open row closes at its first surviving update's ts; each
      surviving update opens a version closed by the next one's ts.
    - New keys (no current row) just build their chain; untouched keys
      pass through unchanged.
    - Update timestamps must be >= the open version's ``from``
      (out-of-order catch-up belongs upstream, not in a merge that
      cannot rewrite closed history). Violations RAISE at execution
      time rather than silently producing an inverted open-row
      interval (``to`` < ``from``) that no point-in-time lookup would
      ever match — i.e. silently erasing the key's pre-update history.
    """
    if not tracked_cols:
        raise ValueError("scd2_merge needs at least one tracked column")
    key = qcol(key_col)
    tracked = [qcol(c).alias(c) for c in tracked_cols]
    u = updates.select(
        key.alias(key_col), qcol(ts_col).alias("__ts__"), *tracked
    )
    w = Window.partitionBy(key_col).orderBy("__ts__")

    # 1. Collapse consecutive duplicates within the batch (null-safe).
    #    The first row of a key is NEVER a duplicate — detected via
    #    lag(ts) IS NULL, because eqNullSafe(NULL attr, NULL lag) would
    #    otherwise read "equal to the (nonexistent) previous row".
    same_prev = reduce(
        lambda a, b: a & b,
        [
            qcol(c).eqNullSafe(F.lag(qcol(c)).over(w))
            for c in tracked_cols
        ],
    )
    is_first = F.lag(F.col("__ts__")).over(w).isNull()
    u = (
        u.withColumn("__dup__", (~is_first) & same_prev)
        .filter(~F.col("__dup__"))
        .drop("__dup__")
    )

    cur_open = current.filter(qcol(to_col).isNull())
    cur_rest = current.filter(qcol(to_col).isNotNull())

    # 2. Drop a key's FIRST surviving update when it matches the open
    #    version's attributes (nothing changed). Later updates were kept
    #    only if different from that first one, so the chain stays valid.
    open_attrs = cur_open.select(
        key.alias(key_col),
        F.lit(True).alias("__has_open__"),
        *[qcol(c).alias(f"__open_{c}__") for c in tracked_cols],
    )
    # The presence flag matters: for a NEW key the left join yields
    # NULL __open_* columns, and a NULL-attr first update would
    # null-safe-"equal" that nonexistent row and vanish.
    same_open = reduce(
        lambda a, b: a & b,
        [
            qcol(c).eqNullSafe(F.col(f"__open_{c}__"))
            for c in tracked_cols
        ],
    )
    u = (
        u.withColumn("__rn__", F.row_number().over(w))
        .join(open_attrs, on=key_col, how="left")
        .filter(
            ~(
                (F.col("__rn__") == 1)
                & F.coalesce(F.col("__has_open__"), F.lit(False))
                & same_open
            )
        )
        .drop(
            "__rn__", "__has_open__",
            *[f"__open_{c}__" for c in tracked_cols],
        )
    )

    # 3. Version intervals: each surviving update runs until the next.
    versions = u.select(
        key_col, *[qcol(c).alias(c) for c in tracked_cols],
        F.col("__ts__").alias(from_col),
        F.lead("__ts__").over(w).alias(to_col),
    )

    # 4. Close open rows of keys that changed. A close timestamp
    #    BEFORE the open row's effective_from would produce an inverted
    #    interval that matches no lookup ts (silently erasing the key's
    #    pre-update history) — fail the job instead; the error carries
    #    the offending key.
    firsts = u.groupBy(key_col).agg(F.min("__ts__").alias("__close__"))
    out_cols = [key_col, *tracked_cols, from_col, to_col]
    stale = F.col("__close__").isNotNull() & (
        F.col("__close__") < qcol(from_col)
    )
    close_ts = F.when(
        stale,
        F.raise_error(
            F.concat(
                F.lit(
                    "scd2_merge: update ts precedes the open version's "
                    f"{from_col} for key "
                ),
                key.cast("string"),
                F.lit(" — updates may not rewrite closed history"),
            )
        ),
    ).otherwise(F.coalesce(F.col("__close__"), qcol(to_col)))
    closed_open = cur_open.join(firsts, on=key_col, how="left").select(
        key_col, *tracked_cols, from_col, close_ts.alias(to_col)
    )
    return (
        cur_rest.select(*out_cols)
        .unionByName(closed_open.select(*out_cols))
        .unionByName(versions.select(*out_cols))
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
) -> DataFrame:
    """Point-in-time dimension join: attach to each fact row the
    dimension version valid at the fact's timestamp
    (``from <= ts < to``, open version = NULL ``to``). Facts whose key
    has no valid version at ts keep NULL attributes (left join) —
    facts predating a key's first version surface as unmatched instead
    of silently borrowing a later version.

    Plan shape: a plain key equi-join plus a range filter — each fact
    matches at most ONE version by the SCD2 interval-partition
    invariant, so the join output is |facts| rows, the shuffle is
    key-partitioned, and no interval/cross machinery is needed. For
    heavily versioned keys the per-key version count bounds the
    pre-filter fan-out."""
    from polars_mas_spark.colutils import qname

    ts = F.col(f"__f__.{qname(ts_col)}")
    valid = (F.col(f"__d__.{qname(from_col)}") <= ts) & (
        F.col(f"__d__.{qname(to_col)}").isNull()
        | (ts < F.col(f"__d__.{qname(to_col)}"))
    )
    d = dim.alias("__d__")
    f_ = facts.alias("__f__")
    return f_.join(
        d,
        (F.col(f"__f__.{qname(key_col)}") == F.col(f"__d__.{qname(key_col)}"))
        & valid,
        "left",
    ).drop(F.col(f"__d__.{qname(key_col)}"))
