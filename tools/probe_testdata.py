"""Round-start testdata drift probe.

The round driver REGENERATES /root/testdata between rounds and physical
parquet types can drift (round 2: events.ts went TIMESTAMP(NANOS) ->
TIMESTAMP(MICROS) and silently broke 17 queries until queries._t grew a
dtype branch). Run this first thing each round: it prints every table's
physical schema and exits non-zero if anything departs from the
expectations the query registry assumes.

Usage: python tools/probe_testdata.py [sf_dir ...]
"""

from __future__ import annotations

import sys

import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# What the registry's queries assume. Values are sets of acceptable
# pyarrow type strings; a column absent here is unchecked (only listed).
EXPECT: dict[str, dict[str, set[str]]] = {
    "events": {
        # queries._t handles exactly these two encodings.
        "ts": {"timestamp[ns]", "timestamp[us]", "int64"},
        "event_id": {"int64"},
        "user_id": {"int64"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_totalprice": {"double"},
        # Spark reads either as a date-comparable column; queries cast
        # literals, so both encodings hash-match the DuckDB oracle.
        "o_orderdate": {"date32[day]", "timestamp[us]"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_shipdate": {"date32[day]", "timestamp[us]"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "source": {"string", "large_string"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {
            "list<element: float>", "list<item: float>",
            "list<element: double>", "list<item: double>",
        },
    },
}

# Uniqueness invariants the window-oracle orderings depend on: every
# (PARTITION BY ... ORDER BY ...) in the registry is total only because
# these keys are duplicate-free in the generated data (fills/rolling/
# topk order by event_id; CDC/SCD synthesize from o_orderkey; dedup and
# ANN oracles key doc_id/vec_id). lineitem is deliberately ABSENT — the
# generator emits duplicate (orderkey, shipdate, linenumber) rows and
# every lineitem oracle is already totalized for it. A regression here
# is the flap class CLAUDE.md documents; catching it at round start
# beats diagnosing a green/red gate flap later.
UNIQUE_KEYS: dict[str, list[list[str]]] = {
    "events": [["event_id"]],
    "orders": [["o_orderkey"]],
    "documents": [["doc_id"]],
    "embeddings": [["vec_id"]],
}
# Warn-only: duplicate (user_id, ts) would make asof_join's
# latest-right-row tie engine-dependent; sessionize/session_paths are
# already tie-proof, so this is a heads-up, not drift.
WARN_KEYS: dict[str, list[list[str]]] = {
    "events": [["user_id", "ts"]],
}


def check_unique(d: str, bad: list[str]) -> None:
    import duckdb

    con = duckdb.connect()
    # Iterate the hard and warn sets SEPARATELY — a dict merge would
    # shadow a table's hard keysets when it also appears in WARN_KEYS.
    for keymap, hard in ((UNIQUE_KEYS, True), (WARN_KEYS, False)):
        for table, keysets in keymap.items():
            path = f"{d}/{table}.parquet"
            for keys in keysets:
                cols = ", ".join(keys)
                try:
                    n = con.execute(
                        f"SELECT count(*) FROM (SELECT {cols} FROM "
                        f"read_parquet('{path}') GROUP BY {cols} "
                        "HAVING count(*) > 1)"
                    ).fetchone()[0]
                except Exception as e:
                    bad.append(f"{d}/{table} uniqueness probe failed: {e}")
                    continue
                if n == 0:
                    continue
                msg = f"{d}/{table} ({cols}): {n} duplicated key groups"
                if hard:
                    bad.append(msg + " — window-oracle orderings assume unique")
                else:
                    # Over-approximate on purpose: the registered asof
                    # right side is only the purchase subset, so a
                    # click/purchase collision here may still be benign.
                    print(
                        f"WARN {msg} — asof-join tie resolution may be "
                        "engine-dependent (check the purchase subset)"
                    )
    # The totalizing event_type ordering keys (event_transitions /
    # session_paths) assume non-NULL types: Spark asc_nulls_last
    # matches DuckDB's default NULLS LAST, but path-string building
    # still diverges on NULLs, so surface them early.
    try:
        n_null = con.execute(
            f"SELECT count(*) FROM read_parquet('{d}/events.parquet') "
            "WHERE event_type IS NULL"
        ).fetchone()[0]
        if n_null:
            print(
                f"WARN {d}/events: {n_null} NULL event_type rows — "
                "session-path strings become engine-dependent"
            )
    except Exception as e:
        bad.append(f"{d}/events NULL probe failed: {e}")
    # The media-feature oracles (_MEDIA_BYTES_CTE / _AHASH_ORACLE in
    # queries_ext.py) equate DuckDB character codepoints + char-length
    # with the engine's UTF-8 bytes + byte-length — true ONLY for
    # pure-ASCII text. A regenerated documents table with one
    # non-ASCII character would turn five media queries
    # deterministically red; fail loudly here instead.
    try:
        n_na = con.execute(
            f"SELECT count(*) FROM read_parquet('{d}/documents.parquet') "
            "WHERE regexp_matches(text, '[^\\x00-\\x7F]')"
        ).fetchone()[0]
        if n_na:
            bad.append(
                f"{d}/documents: {n_na} rows contain non-ASCII text — "
                "media oracles (image/audio features, image near-dup) "
                "assume codepoint == UTF-8 byte; re-derive or sanitize "
                "before trusting the gate"
            )
    except Exception as e:
        bad.append(f"{d}/documents ASCII probe failed: {e}")
    # NULL text is handled (every media/dedup query coalesces to '' on
    # BOTH engines as of r8 — ADVICE r7 #1), but the generator has never
    # emitted any; surface a first appearance so the coalesce paths get
    # a deliberate re-check rather than silent first exercise.
    try:
        n_nt = con.execute(
            f"SELECT count(*) FROM read_parquet('{d}/documents.parquet') "
            "WHERE text IS NULL"
        ).fetchone()[0]
        if n_nt:
            print(
                f"WARN {d}/documents: {n_nt} NULL-text rows (first time; "
                "media/dedup oracles coalesce to '' — spot-check "
                "image_neardup_pairs/media_metadata before trusting)"
            )
    except Exception as e:
        bad.append(f"{d}/documents NULL-text probe failed: {e}")
    # Quotient-rounding tripwire (CLAUDE.md r7 rule, scoped in r9): the
    # REMAINING round(avg, 6) oracles after the r9 integer-cents
    # rebindings are tpch_q1's per-(returnflag, linestatus) averages
    # and profile_table's whole-table means of 2-decimal lineitem
    # measures. A group mean sits EXACTLY on a 6dp .5 boundary iff
    # sum(cents) * 20000 / n is an odd integer — detectable exactly in
    # integer arithmetic; such a group flips the round whenever the two
    # engines' sum doubles land on opposite sides (1-ulp order noise).
    # The hardened queries (bonferroni/bh_fdr proxy, event_rollup/cube)
    # no longer round quotients at all.
    try:
        n_mid = con.execute(
            f"""WITH g AS (
                  SELECT l_returnflag, l_linestatus, col.c AS which,
                         sum(col.v) AS S, count(*) AS n
                  FROM (
                    SELECT l_returnflag, l_linestatus,
                           unnest([
                             struct_pack(c := 'qty',
                               v := CAST(round(l_quantity * 100) AS BIGINT)),
                             struct_pack(c := 'price',
                               v := CAST(round(l_extendedprice * 100) AS BIGINT)),
                             struct_pack(c := 'disc',
                               v := CAST(round(l_discount * 100) AS BIGINT))
                           ]) AS col
                    FROM read_parquet('{d}/lineitem.parquet')
                    WHERE l_shipdate <= DATE '1998-09-02')
                  GROUP BY 1, 2, 3)
                SELECT count(*) FROM g
                WHERE (S * 20000) % n = 0 AND ((S * 20000) // n) % 2 = 1"""
        ).fetchone()[0]
        if n_mid:
            bad.append(
                f"{d}/lineitem: {n_mid} tpch_q1 group average(s) sit "
                "EXACTLY on a 6dp rounding midpoint — the round(avg,6) "
                "projections in tpch_q1 / profile_table can flip "
                "cross-engine on 1-ulp sum noise; rebind those "
                "averages on integer cents (bonferroni-proxy pattern) "
                "before trusting the gate"
            )
    except Exception as e:
        bad.append(f"{d} quotient-midpoint probe failed: {e}")


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    bad = []
    for d in dirs:
        for t in TABLES:
            try:
                schema = pq.read_schema(f"{d}/{t}.parquet")
            except Exception as e:
                bad.append(f"{d}/{t}: unreadable: {e}")
                continue
            cols = {f.name: str(f.type) for f in schema}
            print(f"{d}/{t}: " + ", ".join(f"{k}:{v}" for k, v in cols.items()))
            for col, ok in EXPECT.get(t, {}).items():
                if col not in cols:
                    bad.append(f"{d}/{t}.{col}: MISSING (expected one of {sorted(ok)})")
                elif cols[col] not in ok:
                    bad.append(
                        f"{d}/{t}.{col}: {cols[col]} not in expected {sorted(ok)}"
                    )
    # partsupp probe: since r8 the q2/q11/q20 shapes DERIVE partsupp
    # from lineitem (queries._PS_DERIVED_CTE) and register at every SF
    # — a physical partsupp.parquet is ignored by the registered
    # queries. If the generator ever ships one, flag it loudly so the
    # wave can be switched to read the real table (and its oracle to
    # the real file) deliberately rather than silently diverging.
    for d in dirs:
        try:
            schema = pq.read_schema(f"{d}/partsupp.parquet")
            cols = {f.name: str(f.type) for f in schema}
            print(
                f"WARN {d}/partsupp: PRESENT ("
                + ", ".join(f"{k}:{v}" for k, v in cols.items())
                + ") — tpch_q2ish/q11ish/q20ish still use the DERIVED "
                "view; switch them to the real table deliberately"
            )
        except Exception:
            print(f"{d}/partsupp: absent (derived view in use — expected)")

    for d in dirs:
        check_unique(d, bad)

    if bad:
        print("\nDRIFT DETECTED:")
        for b in bad:
            print(" ", b)
        sys.exit(1)
    print("\nno drift against registry expectations")


if __name__ == "__main__":
    main()
