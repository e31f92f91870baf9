"""Table-maintenance operators: snapshot diff, CDC apply, DQ checks."""

import pytest
from pyspark.sql import functions as F

from polars_mas_spark.operators.maintenance import (
    cdc_apply,
    dq_checks,
    snapshot_diff,
)


def test_snapshot_diff_classification_null_safe(spark):
    """added/removed/changed classified per key; NULL==NULL is NOT a
    change, NULL vs value IS; changed_cols sorted and comma-joined;
    unchanged rows excluded unless asked for."""
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (5, None, 1.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b2", None), (4, "d", 40.0), (5, "x", 2.0)],
        "k long, s string, v double",
    )
    rows = {
        r.k: (r.change_type, r.changed_cols)
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert rows == {
        2: ("changed", "s"),          # NULL v == NULL v: not a change
        3: ("removed", ""),
        4: ("added", ""),
        5: ("changed", "s,v"),        # NULL s vs 'x' IS a change; sorted
    }
    with_unchanged = snapshot_diff(old, new, ["k"], include_unchanged=True)
    assert with_unchanged.filter(
        F.col("change_type") == "unchanged"
    ).count() == 1


def test_cdc_apply_latest_wins_delete_insert(spark):
    """Latest (ts, seq) change wins; D deletes; unknown-key upsert
    inserts with NULL non-value columns; untouched keys pass through."""
    base = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 20.0, "y"), (3, 30.0, "z")],
        "k long, v double, tag string",
    )
    ch = spark.createDataFrame(
        [
            (1, 5, 1, "U", 11.0),
            (1, 5, 2, "U", 12.0),   # same ts: seq breaks the tie
            (2, 7, 1, "D", None),
            (9, 8, 1, "U", 90.0),
        ],
        "k long, ts long, seq long, op string, v double",
    )
    out = {
        r.k: (r.v, r.tag)
        for r in cdc_apply(base, ch, ["k"], "ts", "seq", "op", ["v"]).collect()
    }
    assert out == {1: (12.0, "x"), 3: (30.0, "z"), 9: (90.0, None)}


def test_cdc_apply_rejects_changelog_only_value_col(spark):
    """r5 advice: a value_cols entry absent from the base schema used to
    be silently dropped (output iterates base.columns); it must raise."""
    import pytest

    base = spark.createDataFrame([(1, 10.0)], "k long, v double")
    ch = spark.createDataFrame(
        [(1, 5, 1, "U", 11.0, "extra")],
        "k long, ts long, seq long, op string, v double, w string",
    )
    with pytest.raises(ValueError, match="value_cols not present"):
        cdc_apply(base, ch, ["k"], "ts", "seq", "op", ["v", "w"])


def test_dq_checks_rules_and_fusion(spark):
    """Each rule type counts its violations; unknown types raise."""
    df = spark.createDataFrame(
        [(1, "x", 5.0), (2, "y", -1.0), (2, "q", 50.0), (None, "x", 5.0)],
        "k long, tag string, v double",
    )
    dim = spark.createDataFrame([(1,), (2,)], "id long")
    rows = {
        r.rule: (r.violations, r.passed)
        for r in dq_checks(
            df,
            [
                {"type": "not_null", "col": "k"},
                {"type": "accepted_values", "col": "tag", "values": ["x", "y"]},
                {"type": "range", "col": "v", "min": 0.0, "max": 10.0},
                {"type": "unique", "cols": ["k"]},
                {"type": "foreign_key", "col": "k", "ref": dim, "ref_col": "id"},
            ],
        ).collect()
    }
    assert rows["not_null(k)"] == (1, False)
    assert rows["accepted_values(tag)"] == (1, False)
    assert rows["range(v)"] == (2, False)          # -1 and 50
    assert rows["unique(k)"] == (1, False)         # duplicate k=2
    assert rows["foreign_key(k->id)"] == (0, True)  # NULL k exempt
    with pytest.raises(ValueError, match="unknown rule type"):
        dq_checks(df, [{"type": "nope"}])


def test_drift_psi_buckets_nulls_and_total(spark):
    """Fractions per pinned bucket (NULL bucket included), PSI zero
    for identical snapshots, positive under a planted shift, and
    smoothing keeps empty buckets finite; bad edges raise."""
    from polars_mas_spark.operators.maintenance import drift_psi

    old = spark.createDataFrame(
        [(float(v),) for v in [1, 2, 3, 11, 12, 13]] + [(None,)],
        "v double",
    )
    same = {
        r.bucket: r.psi_term
        for r in drift_psi(old, old, "v", [10.0]).collect()
    }
    assert same["__total__"] == 0.0
    shifted = spark.createDataFrame(
        [(float(v),) for v in [1, 11, 12, 13, 14, 15]] + [(None,)],
        "v double",
    )
    rows = {
        r.bucket: (r.old_frac, r.new_frac, r.psi_term)
        for r in drift_psi(old, shifted, "v", [10.0]).collect()
    }
    of, nf, _ = rows["(-inf,10.0)"]
    assert (of, nf) == (round(3 / 7, 6), round(1 / 7, 6))
    assert rows["null"][0] == rows["null"][1] == round(1 / 7, 6)
    assert rows["__total__"][2] > 0.1
    # Empty-bucket smoothing: no inf/nan even when a bucket has no mass.
    sparse = drift_psi(old, shifted, "v", [10.0, 1e9]).collect()
    assert all(abs(r.psi_term) < 1e9 for r in sparse)
    import pytest as pt

    with pt.raises(ValueError, match="strictly increasing"):
        drift_psi(old, old, "v", [5.0, 5.0])


def test_snapshot_diff_self_is_empty_and_cdc_idempotent(spark):
    """Structural invariants: diff(x, x) reports nothing; applying the
    same changelog twice equals applying it once (latest-wins is a
    projection, not an accumulation)."""
    from polars_mas_spark.operators.maintenance import cdc_apply, snapshot_diff

    base = spark.createDataFrame(
        [(i, float(i), f"t{i % 3}") for i in range(50)],
        "k long, v double, tag string",
    )
    assert snapshot_diff(base, base, ["k"]).count() == 0
    ch = spark.createDataFrame(
        [(i, 1, 1, "D" if i % 7 == 0 else "U", float(i) * 2)
         for i in range(0, 60, 2)],
        "k long, ts long, seq long, op string, v double",
    )
    once = cdc_apply(base, ch, ["k"], "ts", "seq", "op", ["v"])
    twice = cdc_apply(once, ch, ["k"], "ts", "seq", "op", ["v"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    assert snapshot_diff(once, twice, ["k"]).count() == 0


def test_table_digest_order_independent_and_sensitive(spark):
    """Same content in any partitioning -> same digest; one changed
    row -> different digest; a duplicated row flips sum/count even
    though XOR alone cancels."""
    from polars_mas_spark.operators.maintenance import table_digest

    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(100)], "k long, s string"
    )
    d1 = table_digest(df).first()
    d2 = table_digest(df.repartition(7, "s")).first()
    assert tuple(d1) == tuple(d2)
    changed = df.withColumn(
        "s", F.when(F.col("k") == 42, "X").otherwise(F.col("s"))
    )
    assert tuple(table_digest(changed).first()) != tuple(d1)
    duped = df.unionAll(df.limit(1))
    d3 = table_digest(duped).first()
    assert d3.n_rows == d1.n_rows + 1  # count catches duplication...
    assert d3.xor_digest != d1.xor_digest or d3.sum_digest != d1.sum_digest


def test_new_operators_accept_dotted_column_names(spark):
    """qcol discipline (colutils): dotted user column names must work
    through every new operator — F.col('250.1') would parse as a
    struct access and fail or silently misresolve."""
    from polars_mas_spark.operators.maintenance import (
        dq_checks,
        drift_psi,
        snapshot_diff,
        table_digest,
    )
    from polars_mas_spark.operators.preprocessing import covariate_correlations
    from polars_mas_spark.operators.profile import quantile_profile
    from polars_mas_spark.operators.sampling import (
        temporal_split,
        weighted_sample_n,
    )

    df = spark.createDataFrame(
        [(i, float(i), float(i) * 2 + 1) for i in range(40)],
        ["id", "250.1", "008.5"],
    )
    corr = {
        (r.col_a, r.col_b): r.corr
        for r in covariate_correlations(df, ["250.1", "008.5"]).collect()
    }
    assert corr[("250.1", "008.5")] == 1.0
    assert quantile_profile(df, ["250.1"], [0.5], exact=True).count() == 1
    assert weighted_sample_n(df, "id", "008.5", 10).count() == 10
    assert table_digest(df, ["250.1"]).first().n_rows == 40
    assert snapshot_diff(df, df, ["id"]).count() == 0
    assert drift_psi(df, df, "250.1", [20.0]).count() == 4  # 3 buckets + total
    rules = dq_checks(df, [{"type": "not_null", "col": "250.1"}]).collect()
    assert rules[0].violations == 0
    import datetime as dt

    ts_df = df.withColumn("ts", F.lit(dt.datetime(2024, 1, 1)))
    assert temporal_split(ts_df, "ts", "2024-06-01").count() == 40


def test_table_digest_delimiter_injection_resistant(spark):
    """Length-prefixed fields: a delimiter inside a value cannot shift
    a boundary — ('a|b','c') and ('a','b|c') digest differently, as do
    NULL vs the literal sentinel strings."""
    from polars_mas_spark.operators.maintenance import table_digest

    d1 = table_digest(spark.createDataFrame([("a|b", "c")], "x string, y string")).first()
    d2 = table_digest(spark.createDataFrame([("a", "b|c")], "x string, y string")).first()
    assert (d1.xor_digest, d1.sum_digest) != (d2.xor_digest, d2.sum_digest)
    d3 = table_digest(spark.createDataFrame([(None, "c")], "x string, y string")).first()
    d4 = table_digest(spark.createDataFrame([("n", "c")], "x string, y string")).first()
    assert (d3.xor_digest, d3.sum_digest) != (d4.xor_digest, d4.sum_digest)


def test_derive_bin_edges_equidepth_and_dedup(spark):
    """Edges come back strictly increasing, roughly equi-depth on
    uniform data, collapsed on constant data; k<2 raises."""
    from pyspark.sql import functions as F2

    import pytest as pt

    from polars_mas_spark.operators.maintenance import derive_bin_edges, drift_psi

    df = spark.range(1000).select(F2.col("id").cast("double").alias("v"))
    edges = derive_bin_edges(df, "v", k=4)
    assert edges == sorted(edges) and len(edges) == 3
    assert 200 < edges[0] < 300 and 700 < edges[2] < 800
    # The derived edges feed drift_psi directly (zero drift on self).
    rows = {r.bucket: r.psi_term for r in drift_psi(df, df, "v", edges).collect()}
    assert rows["__total__"] == 0.0
    const = spark.range(100).select(F2.lit(5.0).alias("v"))
    assert derive_bin_edges(const, "v", k=5) == [5.0]
    with pt.raises(ValueError, match="k must be"):
        derive_bin_edges(df, "v", k=1)


def test_cdc_apply_defaulted_value_cols_skip_changelog_metadata(spark):
    """With value_cols=None, changelog-only metadata columns are simply
    not value columns (only the explicit-pass path raises)."""
    base = spark.createDataFrame([(1, 10.0)], "k long, v double")
    ch = spark.createDataFrame(
        [(1, 5, 1, "U", 11.0, "src-a")],
        "k long, ts long, seq long, op string, v double, origin string",
    )
    out = cdc_apply(base, ch, ["k"], "ts", "seq", "op").collect()
    assert [(r.k, r.v) for r in out] == [(1, 11.0)]


def test_profile_table_quotient_identity(spark):
    """Defense-in-depth for the rounded mean/stddev (CLAUDE.md quotient
    rule): mean must equal sum/count to fp tolerance — the identity the
    oracle binding relies on."""
    from polars_mas_spark.operators.profile import profile_table

    df = spark.range(0, 1000).select(
        (F.col("id") * 0.01 + 3.0).alias("v")
    )
    prof = {r.column: r for r in profile_table(df, ["v"]).collect()}
    agg = df.agg(F.sum("v").alias("s"), F.count("v").alias("n")).first()
    assert abs(prof["v"].mean - agg.s / agg.n) < 1e-9
    assert prof["v"].n == agg.n


def test_quantile_profile_keeps_all_null_groups(spark):
    """An all-NULL (group, column) must appear with NULL values for
    every requested quantile — never vanish from the report."""
    from polars_mas_spark.operators.profile import quantile_profile

    df = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, None)], "g int, v double"
    )
    out = quantile_profile(df, ["v"], quantiles=[0.25, 0.75], group_col="g")
    rows = [(r.g, r.q, r.value) for r in out.collect()]
    g2 = [(q, v) for g, q, v in rows if g == 2]
    assert sorted(q for q, _ in g2) == [0.25, 0.75]
    assert all(v is None for _, v in g2)


def test_dq_checks_keyed_rules_one_collect(spark):
    """unique + foreign_key rules still report correct counts after the
    union-and-collect-once refactor."""
    from polars_mas_spark.operators.maintenance import dq_checks

    df = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12), (3, 99)], "k int, fk int"
    )
    ref = spark.createDataFrame([(10,), (11,), (12,)], "r int")
    out = {r.rule: r.violations for r in dq_checks(df, [
        {"type": "unique", "cols": ["k"]},
        {"type": "foreign_key", "col": "fk", "ref": ref, "ref_col": "r"},
    ]).collect()}
    assert out["unique(k)"] == 1          # k=1 appears twice
    assert out["foreign_key(fk->r)"] == 1  # fk=99 unmatched
