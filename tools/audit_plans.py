"""Global physical-plan audit: scan every registered query's plan for
scale red flags.

Checked per query (plan built at sf0.01; queries with eager statistics
run their small stat jobs during construction):

- ``BatchEvalPython`` / ``PythonUDF`` — row-at-a-time Python in the
  plan. The engine's contract is Arrow-vectorized boundaries ONLY
  (ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas / MapInArrow /
  FlatMapGroupsInPandasWithState), so any hit is a bug.
- ``CartesianProduct`` — an unbroadcast cross join; at 100 TB this is
  always a mistake. (BroadcastNestedLoopJoin over a LocalRelation pair
  list is fine and expected for the MAS fan-out.)
- ``Exchange SinglePartition`` — a global funnel. Allowed only for
  queries whose RESULT is intentionally tiny/global (scalar aggregates
  without grouping and the results-table sort in _complete_pairs);
  flagged elsewhere.

Usage: python tools/audit_plans.py [name ...]
Exits non-zero if any un-allowlisted red flag appears.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Queries whose single final aggregate/sort legitimately lands on one
# partition because the data reaching it is a handful of rows.
SINGLE_PARTITION_OK = {
    # ungrouped scalar aggregates (1-row results; prep_stats is the r11
    # composite of the retired null_counts/distinct_counts/min_max_mean/
    # group_levels rows)
    "prep_stats", "tpch_q6",
    "tpch_q14ish", "tpch_q19ish", "tpch_q22ish", "drop_constant_diag",
    # per-step scalar conversion counts (k rows for a k-step funnel)
    "funnel_steps",
    # results-table sort in _complete_pairs (P x D rows, documented)
    "mas_linear_fanout", "mas_sex_specific_linear", "mas_logistic_fanout",
    "mas_firth_fanout", "mas_phewas_firth_180", "mas_linear_moments",
    # driver-bounded summaries (rows = columns/strata/centroids)
    "table_profile", "distinct_profile_orders", "source_stats",
    "token_histogram", "tfidf_top_terms",
}


def main() -> None:
    from polars_mas_spark.plans import formatted_plan
    from polars_mas_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    # Shadow rows (pre-written PLANNED registrations) are plan-audited
    # like registered queries.
    from polars_mas_spark.queries import SHADOW_QUERIES

    qs = {**qs, **SHADOW_QUERIES}
    only = set(sys.argv[1:])
    bad: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            plan = formatted_plan(fn(spark, SF_DIR))
        except Exception as e:
            bad.append(f"{name}: plan build failed: {e}")
            continue
        flags = []
        if "BatchEvalPython" in plan or "PythonUDF" in plan:
            flags.append("row-at-a-time Python (BatchEvalPython)")
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if (
            "Exchange SinglePartition" in plan
            and name not in SINGLE_PARTITION_OK
        ):
            flags.append("Exchange SinglePartition (unallowlisted)")
        if flags:
            bad.append(f"{name}: {'; '.join(flags)}")
            print(f"FLAG  {name}: {'; '.join(flags)}")
        else:
            print(f"ok    {name}")
    if bad:
        print(f"\n{len(bad)} flagged:")
        for b in bad:
            print(" ", b)
        sys.exit(1)
    print(f"\nall plans clean ({len([n for n in qs if not only or n in only])} queries)")


if __name__ == "__main__":
    main()
