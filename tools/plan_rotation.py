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

# Queries owed a driver re-pin because their OUTPUT SEMANTICS changed
# (evidence age cannot see semantic drift — ADVICE r9 #2): name ->
# (shipping round the re-pin is due, reason). --check fails when the
# due round has arrived, the query is out of the current window, and no
# CORRECTNESS round >= the due round has gone green for it. Prune an
# entry once satisfied.
MUST_PIN: dict[str, tuple[int, str]] = {
    # (r10 satisfied and pruned: bonferroni / bh_fdr / event_cube /
    # mas_firth_fanout_golden / mas_logistic_fanout_golden /
    # mas_firth_columnar_golden — all driver-green r10 on the r9
    # integer-cents projections.)
    # (r11 satisfied and pruned: mas_poisson_rate_golden /
    # mas_logistic_mtcars_golden (pinned goldens that sat out r9+r10)
    # and jaccard_pairs (r10 symmetric length-band value change) — all
    # driver-green r11.)
}

# Never-driver-checked queries explicitly granted ONE round out of the
# window: name -> (shipping round the deferral covers, reason). In the
# following round the name becomes mandatory (enforced below: an
# expired deferral is treated exactly like a forgotten never-checked
# query).
DEFERRED: dict[str, tuple[int, str]] = {
    # (r10 grants expired and honored: paragraph_neardup_dedup /
    # incremental_dedup_cascade / unicode_normalize_docs are in the
    # r11 window.)
    # r11 window is exactly saturated by obligations (3 expired
    # deferrals + 40 age-3 rows + 7 pinned/must-pin). The r11-new
    # names — 4 registry-consolidation composites whose every column
    # is a projection of a long-green retired query, plus the 3 new
    # semantic-family operators — sit out r11 with local evidence
    # (3-SF gate, flap hunt, plan audit, unit tests). r12 planning
    # note: 44 age-3 rows + these 7 = 51 > 50; re-defer
    # scale_extremes (the lowest-risk composite: byte-identical
    # expressions to two queries green since r6) to r13, where the
    # aged bucket is 49.
    # (r11 grants expired and honored: prep_stats / fill_strategies /
    # bidirectional_fill / classifier_eval / semantic_decontaminate /
    # incremental_semantic_dedup are in the r12 window.)
    # r12 is over-subscribed by exactly one slot (44 age-3 rows + 7
    # expired r11 grants = 51 > 50); the documented resolution
    # (VERDICT r11 #2, ADVICE r11 #3) is the second and final deferral
    # of scale_extremes — the lowest-risk composite: byte-identical
    # expressions to two queries green since r6 — to r13, where the
    # aged bucket is 49 and it fits.
    "scale_extremes": (12, "r12 over-subscribed by one; lowest-risk composite"),
}

# Operators shipped WITHOUT a registry entry (BENCH_ONLY / unit-bound)
# that OWE a future @query registration: name -> (shipping round the
# registration is due, reason). --check fails once the due round
# arrives and the name is still not in the registry — the prose-only
# obligation class review r11 flagged.
PLANNED: dict[str, tuple[int, str]] = {
    # r11: the three-channel decontamination composite; every channel's
    # operator is separately oracle-bound, the composite verdict isn't.
    # r14 is the first window with free slots (the r10-retired bucket).
    "decontaminate_cascade": (14, "BENCH_ONLY r11; register when r14 frees slots"),
    "ann_quantized_topk": (14, "BENCH_ONLY r11; register when r14 frees slots"),
    # r12: CCNet per-language perplexity thirds — shipped shadow-oracled
    # (gate-green at 3 SFs) + BENCH_ONLY; promotion is a decorator swap.
    "perplexity_thirds": (14, "shadow-oracled r12; register when r14 frees slots"),
    # r12: bloom-routed incremental dedup — shadow-oracled (identical
    # replay to incremental_dedup; the filter routes, the join decides).
    # Due r15: r14's free slots are spoken for by the three names above.
    "incremental_dedup_bloom": (15, "shadow-oracled r12; register r15"),
    # r12: heavy-hitter n-grams (Misra-Gries sketch + exact confirm) —
    # shadow-oracled. Due r16; NOTE registry will reach 188 once all
    # PLANNED names land — schedule a consolidation (policy lever (a))
    # alongside the r15/r16 promotions.
    "heavy_hitter_ngrams": (16, "shadow-oracled r12; register r16"),
}


def evidence(registry: list[str]) -> tuple[list[str], dict[str, int], int]:
    """(never-checked names, latest-green-round per name, current round)."""
    latest, cur = latest_green()
    never = [n for n in registry if n not in latest]
    return never, latest, cur


def _due_must_pins(registry: list[str], latest: dict[str, int], cur: int) -> list[str]:
    """MUST_PIN entries whose due round has arrived (shipping round =
    cur + 1) and that no post-obligation driver green has satisfied."""
    ship = cur + 1
    return [
        n
        for n, (due, _reason) in MUST_PIN.items()
        if n in registry and ship >= due and latest.get(n, -1) < due
    ]


def propose(registry: list[str]) -> tuple[list[str], list[str], list[str]]:
    """(pinned, never, aged) partitions of the proposed window.

    Fill order is MANDATORY-first: due must-pins and undeferred
    never-checked queries, then every query whose evidence would breach
    MAX_AGE if left out, THEN the standing PINNED set (best-effort —
    r9/r10 showed mandatory classes can crowd it out; displaced pins
    should get a MUST_PIN obligation for the following round), then the
    remainder by evidence age."""
    never, latest, cur = evidence(registry)
    must = [n for n in _due_must_pins(registry, latest, cur)]
    never = [
        n
        for n in never
        if n not in must and DEFERRED.get(n, (0,))[0] != cur + 1
    ]
    aged_mandatory = sorted(
        n
        for n in registry
        if n in latest and cur - latest[n] >= MAX_AGE
        and n not in must and n not in set(never)
    )
    mandatory = must + never + aged_mandatory
    if len(mandatory) > WINDOW:
        # Hard error, not a warning (ADVICE r10 #2): an emitted block
        # longer than WINDOW reads as covered while the driver silently
        # never checks its tail. Force an explicit DEFERRED / MUST_PIN
        # decision before a block can be produced at all.
        raise SystemExit(
            f"OVERFLOW: {len(mandatory)} mandatory rows (must-pin + "
            f"never + age>={MAX_AGE}) exceed the {WINDOW}-slot window; "
            "add explicit DEFERRED / MUST_PIN entries before emitting"
        )
    taken = set(mandatory)
    standing = [
        n for n in PINNED if n in registry and n not in taken
    ][: max(0, WINDOW - len(mandatory))]
    pinned = must + standing
    taken |= set(standing)
    deferred_now = {n for n in DEFERRED if DEFERRED[n][0] == cur + 1}
    rest = sorted(
        (n for n in registry if n not in taken and n not in deferred_now),
        key=lambda n: (latest.get(n, -1), n),
    )
    room = max(0, WINDOW - len(taken))
    return pinned, never, aged_mandatory + rest[:room]


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
        # Semantic-drift obligations (ADVICE r9 #2): a MUST_PIN entry
        # whose due round has arrived must be in-window until a driver
        # green at >= the due round satisfies it.
        unmet = [
            n for n in _due_must_pins(registry, latest, cur) if n not in window
        ]
        if unmet:
            print(
                "ROTATION STALE: must-pin obligations (changed semantics "
                f"or promised returns) outside the current window: "
                f"{[(n, MUST_PIN[n]) for n in unmet]}"
            )
            sys.exit(1)
        satisfied = [
            n
            for n, (due, _r) in MUST_PIN.items()
            if latest.get(n, -1) >= due
        ]
        if satisfied:
            print(f"note: prune satisfied MUST_PIN entries: {satisfied}")
        # Promised registrations (review r11): an operator shipped
        # BENCH_ONLY with a due round must be in the registry by then.
        overdue_planned = sorted(
            n
            for n, (due, _r) in PLANNED.items()
            if cur + 1 >= due and n not in registry
        )
        if overdue_planned:
            print(
                "ROTATION STALE: promised @query registrations overdue: "
                f"{[(n, PLANNED[n]) for n in overdue_planned]}"
            )
            sys.exit(1)
        planned_done = [n for n in PLANNED if n in registry]
        if planned_done:
            print(f"note: prune satisfied PLANNED entries: {planned_done}")
        deferred_now = sorted(
            n for n in DEFERRED if DEFERRED[n][0] == cur + 1 and n not in window
        )
        if deferred_now:
            print(
                f"note: {len(deferred_now)} never-checked queries sit out "
                f"this round under an explicit deferral (mandatory next "
                f"round): {deferred_now}"
            )
        print(
            f"rotation ok: all {len(never)} undeferred never-checked "
            f"queries in-window; no out-of-window query at age >= "
            f"{MAX_AGE}; all due must-pins in-window"
        )
        return

    print(emit(pinned, never, aged))
    print(
        f"\n# {total} names ({len(never)} never, {len(aged)} by age, "
        f"{len(pinned)} pinned) of {len(registry)} registered",
    )


if __name__ == "__main__":
    main()
