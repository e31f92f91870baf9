"""IEEE signed-zero tripwire over every registered oracle.

The round driver hashes query results via ``repr`` after a
``round(v, 6)`` canonicalization, and ``repr(-0.0) != repr(0.0)``.
DuckDB's ``round()`` is sign-preserving (a tiny negative rounds to
-0.0) while Spark's ``F.round`` goes through BigDecimal HALF_UP which
has no signed zero (always +0.0) — so any oracle that can emit -0.0
hash-mismatches the Spark side on exactly the row whose value rounds
to zero from below. r6 hit this live: ``standard_scale`` failed the
sf0.1 cross-SF gate deterministically on ONE -0.0 row (sf0.01 happened
to miss the boundary). The fix is ``+ 0.0`` after the round on BOTH
engines (maps -0.0 -> +0.0, exact for every other value).

This test runs the DuckDB side of every registered oracle at the
driver's compare SF and fails on any -0.0 anywhere in a float column
(lists included), so a data regeneration that pushes a new query onto
the boundary trips HERE instead of in the driver's correctness gate.

No Spark session needed — pure DuckDB, runs in seconds.
"""

import math
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _neg_zero_count(arr: pa.ChunkedArray) -> int:
    """Count -0.0 values in a float column, flattening nested lists."""
    while pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        arr = pc.list_flatten(arr)
    if not pa.types.is_floating(arr.type):
        return 0
    vals = arr.combine_chunks().to_numpy(zero_copy_only=False)
    with np.errstate(invalid="ignore"):
        return int(np.sum(np.signbit(vals) & (vals == 0.0)))


def test_no_negative_zero_in_any_oracle():
    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    offenders = []
    for name, sql in sorted(entry.oracle_sql().items()):
        tbl = con.execute(sql).fetch_arrow_table()
        for col in tbl.column_names:
            n = _neg_zero_count(tbl.column(col))
            if n:
                offenders.append(f"{name}.{col}: {n} x -0.0")
    assert not offenders, (
        "oracle output contains IEEE -0.0 (will hash-mismatch Spark's "
        "+0.0 in the driver gate); normalize with `+ 0.0` after the "
        "round on BOTH engines:\n  " + "\n  ".join(offenders)
    )


def test_negative_zero_detector_works():
    """Self-check: the scan actually sees -0.0 in plain and list cols."""
    tbl = pa.table(
        {
            "x": pa.array([0.0, -0.0, 1.5], type=pa.float64()),
            "l": pa.array([[0.0], [-0.0, -0.0], None], type=pa.list_(pa.float64())),
        }
    )
    assert _neg_zero_count(tbl.column("x")) == 1
    assert _neg_zero_count(tbl.column("l")) == 2
    assert math.copysign(1.0, -0.0) < 0  # sanity: the platform has -0.0
