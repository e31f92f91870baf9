"""Join utilities for hostile key distributions at cluster scale.

Beyond-reference surface. AQE's skew-join split (enabled in
session.get_spark) handles moderate skew at runtime; ``salted_join`` is
the explicit tool for the pathological case — one key carrying a double
digit percent of a 100 TB fact table, where a single post-shuffle
partition would spill or straggle for hours. ``bucketed_table`` writes
a table pre-partitioned AND pre-sorted by join key so repeated joins on
that key are exchange-free (the classic warehouse trick: pay the
shuffle once at write time, amortize it over every subsequent join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_mas_spark.colutils import qcol


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Equi-join with the fact side's hot keys SPREAD over ``salts``
    sub-partitions and the dim side replicated ``salts`` times.

    The fact side's salt is derived by hashing the whole row
    (xxhash64 of all columns), so a key that hashes 500M rows to one
    shuffle partition in a plain join lands in ``salts`` roughly equal
    partitions instead. For ``inner``/``left`` (fact-preserving) joins
    the RESULT is identical to the unsalted join whatever the salt
    assignment — salting only moves rows between partitions — which is
    what makes the plain join a valid oracle. Dim-preserving hows are
    REJECTED: under ``right``/``full_outer`` every dim (key, salt)
    replica with no fact row of that exact salt would survive
    null-extended, so unmatched dim keys would appear ``salts`` times
    (review r9) — and a dim-preserving skew join wants the salt on the
    dim side anyway.
    Cost: the dim side is materialized ``salts`` x (use for big-fact /
    small-ish-dim skew; for dims small enough to broadcast, broadcast
    instead — no salt needed)."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports fact-preserving joins only "
            f"(inner/left/left_semi), got how={how!r}: dim-side replicas "
            "would survive null-extended under a dim-preserving join"
        )
    salt = F.pmod(F.xxhash64(*[qcol(c) for c in fact.columns]), F.lit(salts))
    fact_s = fact.withColumn("__salt__", salt)
    dim_s = dim.withColumn(
        "__salt__",
        F.explode(F.array(*[F.lit(i) for i in range(salts)])),
    )
    return fact_s.join(dim_s, on=[on, "__salt__"], how=how).drop("__salt__")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join (``points.ts BETWEEN intervals.start AND
    intervals.end`` with an equi-key) WITHOUT the cartesian blowup a
    naive theta-join plans: both sides are bucketed onto a time grid of
    ``bin_seconds`` — a point lands in exactly one bin, an interval is
    exploded into every bin it covers — and the join becomes an
    equi-join on ``(key, bin)`` with a residual BETWEEN filter.

    Correct by construction: ``start <= ts <= end`` implies the point's
    bin lies inside the interval's bin range, so no true match is lost;
    each surviving pair appears exactly once because the point owns one
    bin. Scale: shuffle is hash-partitioned on (key, bin) — time-local
    instead of key-global, so one hot key spread over a month of bins no
    longer lands on one reducer. Cost knob: the interval side inflates
    by span/bin_seconds rows; pick the bin near the median interval
    span. Spark's own range-join planning would produce a broadcast
    nested loop here — fine for a broadcastable side, quadratic when
    both sides are big, which is exactly when this operator is the
    right physical plan.

    Only inner joins are supported: with an outer ``how`` the residual
    BETWEEN would have to ride inside the join condition (a post-join
    filter silently re-inners the join by dropping the null-extended
    rows) and, because an unmatched point meets every exploded bin row
    it fails to match, the null-extension semantics of the binned plan
    do not compose — refuse rather than return wrong rows.
    """
    if how != "inner":
        raise ValueError(
            "interval_join supports only how='inner'; for left semantics "
            "anti-join the inner result against the points side"
        )
    pt_bin = F.floor(qcol(ts_col).cast("long") / F.lit(bin_seconds))
    lo = F.floor(qcol(start_col).cast("long") / F.lit(bin_seconds))
    hi = F.floor(qcol(end_col).cast("long") / F.lit(bin_seconds))
    pts = points.withColumn("__bin__", pt_bin)
    ivs = intervals.withColumn("__bin__", F.explode(F.sequence(lo, hi)))
    joined = pts.join(ivs, on=[on, "__bin__"], how="inner").filter(
        qcol(ts_col).between(qcol(start_col), qcol(end_col))
    )
    return joined.drop("__bin__")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table: rows are hash-partitioned into ``num_buckets`` files per
    partition by ``bucket_col`` at WRITE time. Two tables bucketed the
    same way join with NO Exchange and (if sorted) no Sort — the
    pay-once-shuffle-forever layout for fact tables that are joined on
    the same key daily. Requires a session with a warehouse dir (any
    default local session has one)."""
    spark = df.sparkSession
    if mode == "overwrite":
        # saveAsTable(overwrite) still fails on an ORPHANED location (a
        # warehouse dir left by a crashed writer with no catalog entry);
        # clear both the catalog entry and, for local-filesystem
        # warehouses, the stale directory.
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        if wh.startswith("file:") or wh.startswith("/"):
            import shutil
            from urllib.parse import urlparse

            loc = urlparse(wh).path if wh.startswith("file:") else wh
            shutil.rmtree(f"{loc.rstrip('/')}/{table.lower()}", ignore_errors=True)
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)
