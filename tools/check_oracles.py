"""Local replica of the driver's correctness gate: run every
``queries()`` entry at sf=0.01 and compare against ``oracle_sql()`` via
DuckDB (row count + column names + order-insensitive value hash).

Usage: python tools/check_oracles.py [--jobs N] [--arrow] [name ...]

``--jobs N`` runs N queries concurrently: Spark schedules concurrent
jobs from one session fine, each worker thread gets its own DuckDB
cursor, and most gate time is per-query driver latency rather than
compute — measured ~4x faster at --jobs 4 on the full registry.

By default the gate DISABLES spark.sql.execution.arrow.pyspark.enabled
to replicate the driver's session (OSS Spark default): r4's only red,
``mas_firth_sex2_golden``, passed locally but failed under the driver
because ``createDataFrame(pandas)`` NaN->NULL conversion depends on
that flag. Registered queries must be session-config independent; the
gate now runs them under the stricter config. ``--arrow`` restores the
builder default for A/B comparison.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def value_hash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        (tuple(_canon(row[i]) for i in order) for row in rows), key=repr
    )
    h = hashlib.sha256()
    for row in canon:
        h.update(repr(row).encode())
    return h.hexdigest()[:16]


def _canon(v):
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, decimal.Decimal):
        # Deliberately NOT collapsed to int/float: DuckDB HUGEINT (any
        # integer sum) arrives through Arrow as decimal128, and the
        # driver's hasher keeps that distinct from Spark's BIGINT. An
        # oracle missing a ::BIGINT cast must FAIL here like it fails
        # in the driver (VERDICT r3 "What's wrong" #1).
        return ("decimal", str(v))
    if isinstance(v, float):
        if v != v:
            return "nan"
        return round(v, 6)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    return v


# A DuckDB oracle that wedges must FAIL loudly, not stall the sweep:
# r6's sf0.1 cross-SF run sat for an hour inside the clique-closure
# recursive CTE (O(k^3) on a degenerate 2,300-doc LSH bucket) before
# anyone knew which query was the culprit. The watchdog interrupts the
# connection after this many seconds and reports a normal FAIL row.
ORACLE_TIMEOUT_S = float(os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "600"))


def _fetch_arrow_watchdogged(con, sql):
    import threading

    done = threading.Event()

    def kill():
        if not done.wait(ORACLE_TIMEOUT_S):
            con.interrupt()

    threading.Thread(target=kill, daemon=True).start()
    try:
        return con.execute(sql).fetch_arrow_table()
    finally:
        done.set()


def _check_one(spark, con, name, fn, oracles, hashes=None):
    """Run one query + oracle compare; returns (line, failed).

    ``hashes`` (dict) collects name -> [spark_hash, oracle_hash] for
    run-to-run stability diffing (--hash-out): two gate runs whose OK
    lines match can still hide a NON-TOTAL window ordering that both
    engines happen to re-roll identically per run — diffing the per-
    engine hashes across independent processes catches it (the r6
    flap class) before the driver does."""
    t0 = time.time()
    try:
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as e:
        return f"FAIL  {name}: spark error: {e}", True
    if name not in oracles:
        return (
            f"ROWS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s) [no oracle]",
            False,
        )
    try:
        # Arrow fetch, not fetchall(): fetchall() converts HUGEINT to
        # Python int (masking missing ::BIGINT casts) while the driver
        # fetches through Arrow where HUGEINT is decimal128. Same for
        # list columns: Arrow keeps them as Python lists, which the
        # driver's pandas-based hasher cannot hash at all.
        tbl = _fetch_arrow_watchdogged(con, oracles[name])
        ocols = tbl.column_names
        orows = list(zip(*(c.to_pylist() for c in tbl.columns)))
        if not tbl.columns:
            orows = []
    except Exception as e:
        return f"FAIL  {name}: duckdb error: {e}", True
    # ALL rows, not just the first: a nullable array column whose first
    # row is NULL would otherwise slip past and crash the driver hasher.
    if any(isinstance(v, list) for row in orows for v in row):
        return (
            f"FAIL  {name}: oracle exposes a list column (driver hasher "
            "crashes on lists; stringify with array_to_string)",
            True,
        )
    if any(isinstance(v, list) for row in srows for v in row):
        return (
            f"FAIL  {name}: spark result exposes an array column (driver "
            "hasher crashes on lists; stringify with array_join)",
            True,
        )
    status = []
    if len(srows) != len(orows):
        status.append(f"rowcount {len(srows)}!={len(orows)}")
    if sorted(scols) != sorted(ocols):
        status.append(f"schema {sorted(scols)}!={sorted(ocols)}")
    if not status:
        sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
        if hashes is not None:
            hashes[name] = [sh, oh]
        if sh != oh:
            status.append(f"hash {sh}!={oh}")
    if status:
        return f"FAIL  {name}: {'; '.join(status)} ({time.time()-t0:.1f}s)", True
    return f"OK    {name}: {len(srows)} rows ({time.time()-t0:.1f}s)", False


def main():
    from polars_mas_spark.session import get_spark
    import __spark_entry__ as entry_mod

    args = sys.argv[1:]
    jobs = 1
    if "--jobs" in args:
        i = args.index("--jobs")
        jobs = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    arrow = "--arrow" in args
    if arrow:
        args.remove("--arrow")
    hash_out = None
    if "--hash-out" in args:
        i = args.index("--hash-out")
        if i + 1 >= len(args) or args[i + 1].startswith("--"):
            sys.exit("usage: --hash-out <path> (missing output path)")
        hash_out = args[i + 1]
        args = args[:i] + args[i + 2 :]

    spark = get_spark()
    if not arrow:
        # Replicate the driver's session config (see module docstring).
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # Shadow rows (pre-written PLANNED registrations) get the exact same
    # gate as registered queries, without a driver-window slot.
    from polars_mas_spark.queries import SHADOW_ORACLES, SHADOW_QUERIES

    qs = {**qs, **SHADOW_QUERIES}
    oracles = {**oracles, **SHADOW_ORACLES}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    # Vacuous-green guard: a mistyped query name (or a stray --flag
    # falling through to the name list) must be an ERROR, not a 0-query
    # run that prints "0 failures" and reads as a passing gate.
    only = set(args)
    bad = sorted(n for n in only if n.startswith("--") or n not in qs)
    if bad:
        sys.exit(f"unknown query names/flags: {bad} (registry has {len(qs)})")
    todo = [(n, f) for n, f in qs.items() if not only or n in only]
    failures = []
    hashes: dict[str, list[str]] = {}

    if jobs <= 1:
        for name, fn in todo:
            line, failed = _check_one(spark, con, name, fn, oracles, hashes)
            print(line)
            if failed:
                failures.append(name)
    else:
        import threading
        from concurrent.futures import ThreadPoolExecutor

        local = threading.local()

        def run(item):
            name, fn = item
            # duckdb connections are not thread-safe; one per worker.
            if not hasattr(local, "con"):
                local.con = con.cursor()
            return name, _check_one(spark, local.con, name, fn, oracles, hashes)

        with ThreadPoolExecutor(max_workers=jobs) as ex:
            for name, (line, failed) in ex.map(run, todo):
                print(line)
                if failed:
                    failures.append(name)

    if hash_out:
        import json

        with open(hash_out, "w") as f:
            json.dump(hashes, f, indent=0, sort_keys=True)
        print(f"hashes written: {hash_out} ({len(hashes)} queries)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
