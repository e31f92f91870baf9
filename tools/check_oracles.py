"""Local replica of the driver's correctness gate: run every
``queries()`` entry at sf=0.01 and compare against ``oracle_sql()`` via
DuckDB (row count + column names + order-insensitive value hash).

Usage: python tools/check_oracles.py [name ...]
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
        v = float(v)
    if isinstance(v, float):
        if v != v:
            return "nan"
        return round(v, 6)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    return v


def main():
    from polars_mas_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark()
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    only = set(sys.argv[1:])
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = [tuple(r) for r in cur.fetchall()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        status = []
        if len(srows) != len(orows):
            status.append(f"rowcount {len(srows)}!={len(orows)}")
        if sorted(scols) != sorted(ocols):
            status.append(f"schema {sorted(scols)}!={sorted(ocols)}")
        if not status:
            sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
            if sh != oh:
                status.append(f"hash {sh}!={oh}")
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)} ({time.time()-t0:.1f}s)")
        else:
            print(f"OK    {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
