"""Driver-evidence age report: which registered queries have a green
row in which CORRECTNESS_r*.json, which have never been checked, and
whose evidence is oldest — the input to each round's _PRIORITY rotation
(the driver only checks the first 50 of the registry, so evidence ages
unless rotated deliberately; VERDICT r5 "What's wrong" #1).

Usage: python tools/evidence_age.py
Prints one line per query (latest green round, or NEVER) plus a
summary; exits 0 always (informational).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SKIP_SESSION", "1")


def load_rounds() -> dict[int, dict]:
    rounds = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as fh:
            rounds[int(m.group(1))] = json.load(fh)
    return rounds


def green(entry: dict) -> bool:
    # Weaker rows-only check: the driver records err='no_oracle' with a
    # spark_rows count for queries without an oracle_sql entry.
    if entry.get("err") == "no_oracle":
        return (entry.get("spark_rows") or 0) > 0
    if entry.get("err"):
        return False
    return bool(
        entry.get("rows_match")
        and entry.get("schema_match")
        and entry.get("hash_match")
    )


def latest_green() -> tuple[dict[str, int], int]:
    """(latest green round per query, current round) from the
    CORRECTNESS history — shared with tools/plan_rotation.py so the
    age report and the rotation planner can't disagree on blob shape."""
    rounds = load_rounds()
    latest: dict[str, int] = {}
    for rnum, blob in rounds.items():
        items = blob.get("queries", blob) if isinstance(blob, dict) else {}
        for name, entry in items.items():
            if isinstance(entry, dict) and green(entry):
                latest[name] = max(latest.get(name, 0), rnum)
    return latest, max(rounds) if rounds else 0


def main() -> None:
    from polars_mas_spark import queries as q
    import polars_mas_spark.queries_ext  # noqa: F401  (registers)

    latest, cur = latest_green()
    never, by_age = [], {}
    for name in q.QUERIES:
        r = latest.get(name)
        if r is None:
            never.append(name)
        else:
            by_age.setdefault(cur - r, []).append(name)

    for age in sorted(by_age, reverse=True):
        for name in sorted(by_age[age]):
            print(f"r{cur - age:02d}  (age {age})  {name}")
    for name in sorted(never):
        print(f"NEVER           {name}")
    print(
        f"\n{len(q.QUERIES)} registered; {len(never)} never driver-checked; "
        + "; ".join(
            f"{len(by_age[a])} at age {a}" for a in sorted(by_age)
        )
    )


if __name__ == "__main__":
    main()
