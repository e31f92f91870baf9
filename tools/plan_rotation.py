"""Propose the next round's ``__spark_entry__._PRIORITY`` window.

The round driver hash-checks only the FIRST 50 of ``queries()``, so
with a ~160-query registry, driver evidence ages unless the window is
rotated deliberately each round (VERDICT r5 "What's wrong" #1). This
tool turns that rotation from archaeology into one command: it ranks
every registered query by evidence age (never-checked first, then
oldest green round), always keeps the pinned always-in-window set
(kernel goldens + lifecycle composites, whose driver rows are the
round-over-round regression canary for the numerics), fills the rest
of the 50 by age, and prints a paste-ready ``_PRIORITY`` block.

Usage:
    python tools/plan_rotation.py            # print the proposed block
    python tools/plan_rotation.py --check    # exit 1 if the CURRENT
        window omits ANY never-checked query — strict on purpose:
        never-checked debt always outranks aging evidence, so a window
        that leaves one out is treated as a forgotten rotation

Membership is what matters, not order within the window; the block is
grouped by reason (pinned / never / age) for the human diff.
"""

from __future__ import annotations

import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SKIP_SESSION", "1")

from evidence_age import latest_green  # noqa: E402

WINDOW = 50
# Oldest tolerable driver evidence, in rounds. --check fails when an
# out-of-window query's evidence would age past this after the round.
MAX_AGE = 3

# Always in-window: the value-bound numerics goldens (any solver or
# correction regression flips them red immediately) and the two
# composites that bind every pipeline stage end-to-end.
PINNED = [
    "mas_firth_sex2_golden",
    "mas_logistic_mtcars_golden",
    "mas_poisson_rate_golden",
    "mas_firth_2x2_haldane",
    "mas_firth_fanout_golden",
    "mas_pipeline_e2e",
    "curation_pipeline",
]


def evidence(registry: list[str]) -> tuple[list[str], dict[str, int], int]:
    """(never-checked names, latest-green-round per name, current round)."""
    latest, cur = latest_green()
    never = [n for n in registry if n not in latest]
    return never, latest, cur


def propose(registry: list[str]) -> tuple[list[str], list[str], list[str]]:
    """(pinned, never, aged) partitions of the proposed window."""
    never, latest, _cur = evidence(registry)
    pinned = [n for n in PINNED if n in registry]
    never = [n for n in never if n not in pinned]
    rest = sorted(
        (n for n in registry if n not in pinned and n not in set(never)),
        key=lambda n: (latest.get(n, -1), n),
    )
    room = WINDOW - len(pinned) - len(never)
    if room < 0:
        # More debt than window: oldest-registered never-checked first
        # (registry order ~ registration order), truncate, warn.
        print(
            f"# WARNING: {len(pinned) + len(never)} pinned+never exceeds "
            f"the {WINDOW}-slot window; {-room} never-checked queries "
            "must wait a round",
            file=sys.stderr,
        )
        never, room = never[: WINDOW - len(pinned)], 0
    return pinned, never, rest[:room]


def emit(pinned: list[str], never: list[str], aged: list[str]) -> str:
    def block(title: str, names: list[str]) -> str:
        if not names:
            return f"    # --- {title} (0) ---\n"
        body = ", ".join(f'"{n}"' for n in names)
        wrapped = textwrap.fill(
            body, width=72, initial_indent="    ", subsequent_indent="    "
        )
        return f"    # --- {title} ({len(names)}) ---\n{wrapped},\n"

    return (
        "_PRIORITY = [\n"
        + block("never driver-checked", never)
        + block("oldest driver evidence", aged)
        + block("pinned goldens + composites", pinned)
        + "]"
    )


def main() -> None:
    from polars_mas_spark import queries as q
    import polars_mas_spark.queries_ext  # noqa: F401  (registers)

    registry = list(q.QUERIES)
    pinned, never, aged = propose(registry)
    total = len(pinned) + len(never) + len(aged)

    if "--check" in sys.argv:
        import __spark_entry__ as e

        window = set(list(e.queries())[:WINDOW])
        missed = [n for n in never if n not in window]
        if missed:
            print(
                "ROTATION STALE: never-driver-checked queries outside the "
                f"current window: {missed}"
            )
            sys.exit(1)
        # Max-age bound (VERDICT r7 next-steps #6): a query whose
        # evidence is already MAX_AGE rounds old and NOT in the current
        # window would exceed the bound after this round — fail so the
        # r4-era tail class can't regrow silently.
        _, latest, cur = evidence(registry)
        overage = sorted(
            n
            for n in registry
            if n in latest and cur - latest[n] >= MAX_AGE and n not in window
        )
        if overage:
            print(
                f"ROTATION STALE: evidence would exceed age {MAX_AGE} "
                f"after this round for {len(overage)} out-of-window "
                f"queries: {overage}"
            )
            sys.exit(1)
        print(
            f"rotation ok: all {len(never)} never-checked queries "
            f"in-window; no out-of-window query at age >= {MAX_AGE}"
        )
        return

    print(emit(pinned, never, aged))
    print(
        f"\n# {total} names ({len(never)} never, {len(aged)} by age, "
        f"{len(pinned)} pinned) of {len(registry)} registered",
    )


if __name__ == "__main__":
    main()
