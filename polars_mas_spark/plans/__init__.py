"""Physical-plan inspection utilities.

The engine's scale properties (pushdown, broadcast joins, two-phase
aggregation, single-exchange fan-out) are asserted, not assumed — both
in tests/test_plans.py and by users auditing their own pipelines before
a 100 TB run: ``assert_broadcasts(df)`` in a notebook is cheaper than a
shuffled dimension join in production.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (what ``df.explain('formatted')``
    prints), as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def op_count(plan: str, op: str) -> int:
    """Count operator DETAIL headers ('(N) OpName') — formatted plans
    list each operator twice (tree line + detail section)."""
    return len(re.findall(rf"\(\d+\) {re.escape(op)}\b", plan))


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lines of every scan in the plan."""
    return [
        ln.strip()
        for ln in formatted_plan(df).splitlines()
        if "PushedFilters" in ln
    ]


def read_schemas(df: DataFrame) -> list[str]:
    """The ReadSchema lines of every scan in the plan (column pruning)."""
    return [
        ln.strip()
        for ln in formatted_plan(df).splitlines()
        if "ReadSchema" in ln
    ]


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan."""
    return op_count(formatted_plan(df), "Exchange")


def assert_broadcasts(df: DataFrame, expected: int) -> None:
    """Assert the plan contains exactly ``expected`` broadcast hash
    joins and NO sort-merge join — i.e. no dimension accidentally fell
    off the broadcast path and started shuffling the fact side."""
    plan = formatted_plan(df)
    found = op_count(plan, "BroadcastHashJoin")
    if found != expected or "SortMergeJoin" in plan:
        raise AssertionError(
            f"expected {expected} broadcast joins and no SortMergeJoin; "
            f"got {found} broadcasts, "
            f"SortMergeJoin={'SortMergeJoin' in plan}\n{plan}"
        )
