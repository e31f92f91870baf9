"""The TPC-H third wave (q2/q11/q20-ish) over the DERIVED partsupp view.

The driver's generator has never emitted partsupp.parquet, so
queries._partsupp derives it deterministically from lineitem (distinct
(l_partkey, l_suppkey) + hash-keyed availqty/supplycost in integer
cents) with identical int64 arithmetic in the Spark builder and the
oracle CTE (queries._PS_DERIVED_CTE). These tests cross-check every
result against DuckDB running the registered oracle on the same
sf0.001 files, plus dedicated equivalence and exactness probes for the
derivation itself.
"""

import duckdb
import pytest

from polars_mas_spark import queries as q

SF_DIR_SMALL = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem".split()


def _oracle(sql: str, sf_dir: str = SF_DIR_SMALL):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    out = con.execute(sql).fetchall()
    con.close()
    return out


def _compare(spark_df, sql):
    got = sorted(tuple(r) for r in spark_df.collect())
    want = sorted(tuple(r) for r in _oracle(sql))
    assert len(got) > 0, "vacuous: query returned no rows"
    assert got == want


def test_partsupp_derivation_matches_oracle_cte(spark):
    """The Spark _partsupp builder and the SQL CTE must produce
    byte-identical rows — this is the invariant every q2/q11/q20
    oracle rests on."""
    got = sorted(
        tuple(r) for r in q._partsupp(spark, SF_DIR_SMALL).collect()
    )
    want = sorted(
        tuple(r)
        for r in _oracle(f"WITH {q._PS_DERIVED_CTE} SELECT * FROM ps")
    )
    assert len(got) > 1000
    assert got == want


def test_partsupp_cents_identity(spark):
    """ps_supplycost must be exactly ps_supplycost_cents/100.0 (same
    double both engines derive), and availqty in [1, 9999]."""
    rows = q._partsupp(spark, SF_DIR_SMALL).collect()
    for r in rows:
        assert r.ps_supplycost == r.ps_supplycost_cents / 100.0
        assert 1 <= r.ps_availqty <= 9999
        assert 100 <= r.ps_supplycost_cents < 100000


def test_q2ish_min_cost_supplier(spark):
    _compare(q.q_tpch_q2ish(spark, SF_DIR_SMALL), q._TPCH_Q2ISH_ORACLE)


def test_q11ish_group_share_having(spark):
    _compare(q.q_tpch_q11ish(spark, SF_DIR_SMALL), q._TPCH_Q11ISH_ORACLE)


def test_q20ish_availability_semijoin(spark):
    _compare(q.q_tpch_q20ish(spark, SF_DIR_SMALL), q._TPCH_Q20ISH_ORACLE)


def test_registration_is_unconditional():
    """r8: the wave derives partsupp from lineitem, so it registers at
    every SF with no file dependency (was dormant behind a file-exists
    gate through r7)."""
    assert "tpch_q2ish" in q.QUERIES
    assert "tpch_q11ish" in q.QUERIES
    assert "tpch_q20ish" in q.QUERIES


def test_third_wave_plans(spark):
    """Scale-shape assertions: every dimension join broadcasts, nothing
    cartesian, and q2's min-cost decorrelation is a partsupp-keyed
    window, not a self-join."""
    from polars_mas_spark.plans import formatted_plan, op_count

    p2 = formatted_plan(q.q_tpch_q2ish(spark, SF_DIR_SMALL))
    assert op_count(p2, "CartesianProduct") == 0
    assert op_count(p2, "BroadcastNestedLoopJoin") == 0
    # supplier, nation, region, part all broadcast; partsupp never does
    assert op_count(p2, "BroadcastHashJoin") >= 4
    assert "Window" in p2  # decorrelated min-cost, one keyed window

    # q11 localCheckpoints its aggregate (computed once, consumed by
    # the scalar-total job and the returned filter), so assert the
    # join/agg shape on the pre-checkpoint builder and the absence of
    # window/cartesian on the returned plan.
    pv = formatted_plan(q._q11_value_cents(spark, SF_DIR_SMALL))
    assert op_count(pv, "CartesianProduct") == 0
    assert op_count(pv, "BroadcastHashJoin") >= 2
    p11 = formatted_plan(q.q_tpch_q11ish(spark, SF_DIR_SMALL))
    assert op_count(p11, "CartesianProduct") == 0
    # the scalar total is a driver literal, not a single-partition window
    assert "Window" not in p11

    p20 = formatted_plan(q.q_tpch_q20ish(spark, SF_DIR_SMALL))
    assert op_count(p20, "CartesianProduct") == 0
    assert "LeftSemi" in p20
