"""Approximate-membership EPOCH ARTIFACTS (Bloom filters) for the
incremental dedup/decontamination family.

Beyond-reference surface (the reference engine at /root/reference has
no membership structures; reference semantics end at its join
operators). The 100 TB motivation is the rolling-crawl shape every
``incremental_*`` operator in [[dedup]] serves: each ingestion batch
must be checked against an accepted corpus whose reduced-key side
(digests / band buckets / span fingerprints) is itself billions of
rows. The exact anti-join re-scans and re-shuffles that seen side on
EVERY batch. Spark's own runtime Bloom injection
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) cannot help:
it prunes probe rows that NEED matches (inner/semi joins), while an
anti-join keeps the non-matching rows — the optimizer has no sound
probe-side prune for that shape. But user-level semantics do: a
Bloom NEGATIVE is a definite non-member, so bloom-negative batch rows
can bypass the join entirely and only bloom-positive candidates (true
dups + fpp-rate false positives) reach the exact confirmation join.
The output is EXACTLY the anti-join's output — the filter only
routes rows, it never decides them — so every existing oracle holds
verbatim with the filter on.

Scale shape:
- BUILD (once per epoch, amortized over all batches): k positions per
  key map-side (JVM ``xxhash64`` per seed), one hash aggregate
  ``groupBy(word).agg(bit_or(mask))`` with map-side partial combine —
  the shuffle carries at most ``min(n*k, m/64)`` (word, mask) rows,
  never the keys. The packed bitmap collects to the driver
  (``m/64 * 8`` bytes; 64 MiB at m=2^32) and broadcasts once.
- APPLY (every batch): map-only. Positions are JVM expressions; the
  membership test is one vectorized numpy gather per Arrow batch
  against the broadcast bitmap (the [[similarity]] centroid-matrix
  idiom — this module is a documented vectorized-pandas-UDF exception,
  same class as centroid assignment; there is no public Column-level
  ``might_contain`` in PySpark).
- Sizing: fpp ~= (1 - exp(-k*n/m))^k; for the canonical k=7,
  m = 10*n bits gives ~1% — i.e. ~1.25 GB of bitmap per 10^9 seen
  keys. Past broadcast comfort, shard by key-hash prefix into multiple
  epoch filters and route batches by the same prefix.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from polars_mas_spark.colutils import qcol

__all__ = ["KeyBloom", "build_key_bloom"]


def _positions(col: Column, n_hashes: int, n_bits: int) -> Column:
    """array<long> of the key's ``n_hashes`` bit positions: seeded JVM
    xxhash64 (the seed rides as an extra hashed column), pmod to the
    bitmap size. NULL keys hash on the seed alone (xxhash64 skips NULL
    operands), so all NULLs share one position set — conservative: a
    NULL key can only ever become a candidate, and the confirmation
    join's NULL-never-equals semantics still decide it exactly."""
    return F.array(
        *[
            F.pmod(F.xxhash64(col, F.lit(s)), F.lit(n_bits))
            for s in range(n_hashes)
        ]
    )


class KeyBloom:
    """Driver-held epoch Bloom filter over a key column: a packed
    uint64 bitmap + its sizing, broadcast once per session. DATA, not
    plan (the centroid-matrix rule, [[similarity]]): the bitmap is
    severed from the seen corpus's lineage at build time, so later
    appends to the corpus path can never silently retrain it (the
    cache()-vs-recacheByPath trap, CLAUDE.md)."""

    def __init__(
        self,
        words: np.ndarray,
        n_bits: int,
        n_hashes: int,
        n_keys: int | None,
        key_tag: str | None = None,
    ):
        self.words = words
        self.n_bits = int(n_bits)
        self.n_hashes = int(n_hashes)
        self.n_keys = None if n_keys is None else int(n_keys)
        # Provenance: WHAT this filter was built over, checked by the
        # routed operators — a build/probe key mismatch (wrong column,
        # wrong banding params) would otherwise silently LEAK
        # duplicates, since mismatched probes read as definite
        # non-members.
        self.key_tag = key_tag
        self._bc = None

    def check_tag(self, expected: str, caller: str) -> None:
        """Raise if this filter carries a provenance tag that is not
        ``expected``. An untagged filter (key_tag None) passes — the
        caller opted out of provenance."""
        if self.key_tag is not None and self.key_tag != expected:
            raise ValueError(
                f"{caller}: seen_bloom was built over {self.key_tag!r}, "
                f"but this operator probes {expected!r} keys — a "
                "mismatched filter silently leaks duplicates (every "
                "probe reads as a definite non-member)"
            )

    def fpp_estimate(self) -> float | None:
        """(1 - e^(-k n / m))^k — the classic Bloom false-positive rate
        for the built key count; candidates beyond true dups arrive at
        roughly this rate. None when the build skipped the sizing count
        (explicit n_bits)."""
        if self.n_keys is None:
            return None
        k, n, m = self.n_hashes, self.n_keys, self.n_bits
        return float((1.0 - np.exp(-k * n / m)) ** k)

    def might_contain(self, col: Column) -> Column:
        """Boolean membership column, map-only: JVM computes the k
        seeded positions, a vectorized pandas UDF gathers the broadcast
        bitmap bits per Arrow batch. False = definitely not built-in;
        True = member or false positive (confirm exactly downstream)."""
        if self._bc is None:
            from polars_mas_spark.session import get_spark

            self._bc = get_spark().sparkContext.broadcast(self.words)
        bc = self._bc

        @pandas_udf(BooleanType())
        def _mc(pos: pd.Series) -> pd.Series:
            P = np.vstack(pos.to_numpy()).astype(np.int64)
            w = bc.value[P >> 6]
            bits = (w >> (P & 63).astype(np.uint64)) & np.uint64(1)
            return pd.Series(bits.all(axis=1))

        return _mc(_positions(col, self.n_hashes, self.n_bits))


def build_key_bloom(
    df: DataFrame,
    key_col: str,
    n_bits: int | None = None,
    n_hashes: int = 7,
    bits_per_key: int = 10,
    key_tag: str | None = None,
) -> KeyBloom:
    """Build the epoch [[KeyBloom]] over ``df[key_col]`` (digests, band
    buckets, span fingerprints — any reduced key an ``incremental_*``
    seen side exposes). ONE distributed pass: k seeded positions per
    key map-side, ``groupBy(pos >> 6).agg(bit_or(1 << (pos & 63)))``
    packs the bitmap with map-side partial aggregation (the shuffle
    carries (word, mask) partials, bounded by the bitmap's word count —
    never keys), then the sparse nonzero words fill a driver numpy
    array. ``n_bits`` defaults to ``bits_per_key`` (10) x the row count
    — ~1% fpp at the default 7 hashes (module docstring has the
    formula); pass it explicitly to avoid the sizing count job (then
    ``n_keys``/``fpp_estimate()`` stay None — no hidden extra scan).
    ``key_tag`` records provenance (what kind of key this was built
    over); the routed operators check it via [[KeyBloom.check_tag]]."""
    n_keys = None
    if n_bits is None:
        n_keys = df.count()
        n_bits = max(64, bits_per_key * n_keys)
    if n_bits < 64:
        raise ValueError(f"n_bits must be >= 64, got {n_bits}")
    pos = F.explode(_positions(qcol(key_col), n_hashes, n_bits)).alias("__pos__")
    packed = (
        df.select(pos)
        .select(
            F.shiftright("__pos__", 6).alias("__word__"),
            # F.shiftleft only takes a literal shift count; the SQL
            # form accepts the per-row bit index.
            F.expr("shiftleft(1L, CAST(__pos__ & 63 AS INT))").alias("__mask__"),
        )
        .groupBy("__word__")
        .agg(F.bit_or("__mask__").alias("__bits__"))
    )
    n_words = (n_bits + 63) // 64
    words = np.zeros(n_words, dtype=np.uint64)
    for r in packed.collect():
        words[r["__word__"]] = np.uint64(r["__bits__"] & 0xFFFFFFFFFFFFFFFF)
    bloom = KeyBloom(words, n_bits, n_hashes, n_keys, key_tag=key_tag)
    bloom._bc = df.sparkSession.sparkContext.broadcast(words)
    return bloom
