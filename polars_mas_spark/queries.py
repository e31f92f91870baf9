"""The engine's query registry: every operator from SURVEY.md §2 (plus
the beyond-reference extension operators) expressed as a named query
over the driver's test tables, each with a DuckDB-runnable ANSI-SQL
oracle where SQL can express the semantics.

Contract (see /root/repo/__spark_entry__.py): each entry maps
``name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None)``.
Column names are aliased identically on both sides; floating-point
results are rounded on both sides so the driver's value-hash compare is
stable.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from polars_mas_spark.operators import dedup as dd
from polars_mas_spark.operators import multimodal as mm
from polars_mas_spark.operators import similarity as sim
from polars_mas_spark.operators import text as tx
from polars_mas_spark.operators import windows as wd
from polars_mas_spark.operators.fills import backward_fill, forward_fill
from polars_mas_spark.operators.postprocessing import benjamini_hochberg, bonferroni
from polars_mas_spark.operators.preprocessing import covariate_correlations
from polars_mas_spark.functions.transforms import rint

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}


# Scan-split memo for [[_rebalance]]: path -> number of scan splits
# Spark produces for it. Plan-shape metadata only (never results), so a
# per-process memo is safe — the testdata files are immutable within a
# run, and re-deriving the count costs a physical-plan build per call.
_SCAN_SPLITS: dict[str, int] = {}

# Files below this size stay un-rebalanced even when single-split:
# broadcast dimension tables (region/nation/supplier) would otherwise
# pay a pointless pre-broadcast shuffle in dozens of queries. 256 KiB
# (raised from 128 KiB, ADVICE r12): the floor must also sit ABOVE
# every _tr-opted table at the sf0.01 correctness SF — embeddings.parquet
# is 193 KiB there, so the old floor silently repartitioned q_knn_graph's
# oracle-gate read, resting the gate's green on no near-ties instead of
# on the documented no-op. test_rebalance pins both sides of the
# boundary (every opted sf0.01 file below, every opted sf0.1 file above).
_REBALANCE_MIN_BYTES = 256 * 1024


def _rebalance(df: DataFrame, spark: SparkSession, path: str) -> DataFrame:
    """Unstarve single-split scans (optimization guide §2.5 "input
    skew: one huge unsplittable file ... repartition immediately after
    the read"): when a scan yields fewer splits than the session has
    cores, EVERYTHING map-side downstream of it — explodes, minhash
    chains, regex filters, Arrow UDF batches — serializes on one task
    until the first exchange. The generated test tables are each ONE
    compact single-row-group parquet file (row groups are the split
    atom, so `maxPartitionBytes`/`minPartitionNum` cannot help), which
    starved every scan-rooted stage of the bench: knn_graph measured
    7.7 -> 2.8 s at sf0.1 from this alone (OPTIMIZATION_r12.md).

    Scale-adaptive by construction, not a tuned constant: the
    condition (splits < defaultParallelism) is FALSE on any production
    table (splits >> cores), making this a no-op there; locally it
    fires exactly on the fixture shape, and the target follows the
    session's core count (the driver re-benches at lower core counts).
    Round-robin repartition is result-invariant for every registered
    query: values are partitioning-independent and all oracle
    orderings are total (re-verified by the r12 flap hunt).

    OPT-IN per query (via [[_tr]]), never blanket: a full-bench A/B
    with this applied inside `_t` itself regressed the suite 105.8 ->
    187.1 s — the added exchange + lost single-pass scan locality
    costs more than it buys everywhere the per-row map-side CPU is
    small (relational joins/aggregates, broadcast dims, window
    queries). It pays exactly where a scan-rooted chain does heavy
    per-row compute with little data reduction before the first
    shuffle (vector scoring, trigram explodes) — those queries opt in
    individually, each with a measured win (OPTIMIZATION_r12.md)."""
    p = spark.sparkContext.defaultParallelism
    try:
        import os

        if os.path.getsize(path) < _REBALANCE_MIN_BYTES:
            return df
    except OSError:
        return df
    splits = _SCAN_SPLITS.get(path)
    if splits is None:
        splits = df.rdd.getNumPartitions()
        _SCAN_SPLITS[path] = splits
    return df.repartition(p) if splits < p else df


def _tr(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """[[_t]] + [[_rebalance]]: the opt-in unstarved read for queries
    whose scan-rooted chain is map-side-CPU-bound."""
    path = f"{sf_dir}/{name}.parquet"
    return _rebalance(_t(spark, sf_dir, name), spark, path)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # The generated events.parquet has shipped ts as either
        # TIMESTAMP(NANOS) or TIMESTAMP(MICROS) across driver versions;
        # normalize both to a session-tz (UTC) TimestampType so every
        # downstream query sees one stable type. NANOS: Spark's
        # vectorized reader refuses it unless read as a raw long, then
        # truncated with exact integer division (`div`, not `/`: a
        # double divide loses the last microsecond on epoch-scale
        # nanos) — DuckDB truncates NS->US identically. MICROS without
        # isAdjustedToUTC arrives as TIMESTAMP_NTZ; a cast under the
        # UTC session tz is epoch-identical.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(path)
        ts_type = dict(raw.dtypes)["ts"]
        if ts_type == "bigint":
            return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(path)


def query(name: str, oracle: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        assert (
            name not in SHADOW_QUERIES
        ), f"registering '{name}' while a shadow entry exists: remove the shadow"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Pre-written driver rows (VERDICT r11 #3): a query + oracle pair that
# the LOCAL gate (tools/check_oracles.py) and plan audit exercise like
# any registered query, but which is NOT exposed through
# ``__spark_entry__.queries()`` — it occupies zero driver-window slots
# and does not count against the registry-growth capacity (CLAUDE.md).
# Used to pre-write a PLANNED registration (tools/plan_rotation.py)
# during the obligation-saturated rounds, so promoting it when its due
# window arrives is a one-line decorator swap, not a project. A shadow
# name must not collide with a registered name.
SHADOW_QUERIES: dict[str, SparkQuery] = {}
SHADOW_ORACLES: dict[str, str] = {}


def shadow_query(name: str, oracle: str):
    def deco(fn: SparkQuery) -> SparkQuery:
        assert name not in QUERIES, f"shadow name collides with registry: {name}"
        SHADOW_QUERIES[name] = fn
        SHADOW_ORACLES[name] = oracle
        return fn

    return deco


# ===========================================================================
# §2.1/§2.2 — scans, projections, filters (S1, P1, P5)
# ===========================================================================


@query(
    "scan_project",
    "SELECT o_orderkey, o_totalprice, o_orderdate FROM orders",
)
def q_scan_project(spark, sf_dir):
    """S1+P1: parquet scan with projection pushdown (reference
    config.py:112-113, config.py:260)."""
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )


@query(
    "filter_predicate",
    """SELECT c_custkey, c_name, c_acctbal FROM customer
       WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 100""",
)
def q_filter_predicate(spark, sf_dir):
    """P5-style equality/range predicates pushed into the scan."""
    c = _t(spark, sf_dir, "customer")
    return c.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 100)
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "sex_restrict_filter",
    "SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey <> 3",
)
def q_sex_restrict(spark, sf_dir):
    """P5: the male_only filter shape (preprocessing.py:43-62) — keep
    rows where code column != the excluded code."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") != F.lit(3))
        .select("c_custkey", "c_nationkey")
    )


@query(
    "multi_token_nulls",
    """SELECT o_orderkey,
              CASE WHEN o_orderpriority IN ('URGENT','HIGH') THEN NULL
                   ELSE o_orderpriority END AS priority_clean
       FROM orders""",
)
def q_multi_token_nulls(spark, sf_dir):
    """S2: the multi-token null rewrite applied post-read
    (readers._rewrite_extra_null_tokens semantics)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").isin("URGENT", "HIGH"), F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("priority_clean"),
    )


# ===========================================================================
# §2.4 — aggregations (A1-A6)
# ===========================================================================


@query(
    "prep_stats",
    """SELECT
         (SELECT count(*) FROM orders) AS n_rows,
         (SELECT count(*) FILTER (WHERE o_orderpriority IN ('URGENT','HIGH'))
          FROM orders) AS n_null_priority,
         (SELECT count(DISTINCT l_returnflag) FROM lineitem) AS n_returnflag,
         (SELECT count(DISTINCT l_linestatus) FROM lineitem) AS n_linestatus,
         (SELECT count(DISTINCT l_suppkey) FROM lineitem) AS n_suppkey,
         (SELECT round(min(l_quantity), 6) FROM lineitem) AS min_qty,
         (SELECT round(max(l_quantity), 6) FROM lineitem) AS max_qty,
         (SELECT round(avg(l_quantity), 6) FROM lineitem) AS mean_qty,
         (SELECT round(avg(l_discount), 6) FROM lineitem) AS mean_disc,
         (SELECT string_agg(level, '|' ORDER BY level)
          FROM (SELECT DISTINCT o_orderpriority AS level FROM orders))
           AS priority_levels""",
)
def q_prep_stats(spark, sf_dir):
    """A1-A4 + A6 in ONE value-bound row (r11 registry consolidation,
    VERDICT r10 next-steps #2a — replaces the null_counts /
    distinct_counts / min_max_mean / group_levels registry rows, every
    column of which this composite still binds): row count + null count
    over the null-rewritten priority column (config.py:270,
    preprocessing.py:10-17), exact per-column distinct counts
    (preprocessing.py:68), fill-value statistics
    (preprocessing.py:32-34), and sorted categorical level discovery
    (preprocessing.py:87-97) folded to a '|'-joined string. Two 1-row
    aggregates (one per table, each a partial-agg tree) combined via
    broadcast nested-loop join — no CartesianProduct node, no
    data-sized shuffle."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cleaned = F.when(
        F.col("o_orderpriority").isin("URGENT", "HIGH"), F.lit(None)
    ).otherwise(F.col("o_orderpriority"))
    o_agg = o.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(cleaned.isNull(), 1)).alias("n_null_priority"),
        F.concat_ws(
            "|", F.sort_array(F.collect_set("o_orderpriority"))
        ).alias("priority_levels"),
    )
    li_agg = li.agg(
        F.countDistinct("l_returnflag").alias("n_returnflag"),
        F.countDistinct("l_linestatus").alias("n_linestatus"),
        F.countDistinct("l_suppkey").alias("n_suppkey"),
        F.round(F.min("l_quantity"), 6).alias("min_qty"),
        F.round(F.max("l_quantity"), 6).alias("max_qty"),
        F.round(F.avg("l_quantity"), 6).alias("mean_qty"),
        F.round(F.avg("l_discount"), 6).alias("mean_disc"),
    )
    return o_agg.crossJoin(F.broadcast(li_agg)).select(
        "n_rows", "n_null_priority", "n_returnflag", "n_linestatus",
        "n_suppkey", "min_qty", "max_qty", "mean_qty", "mean_disc",
        "priority_levels",
    )


# ===========================================================================
# §2.5 — fills (F2/F5/F6 + scalable F3)
# ===========================================================================

_NULLIFIED_DISC = "CASE WHEN l_discount < 0.03 THEN NULL ELSE l_discount END"


@query(
    "fill_strategies",
    f"""WITH base AS (
          SELECT l_orderkey, l_linenumber, {_NULLIFIED_DISC} AS disc FROM lineitem)
        SELECT l_orderkey, l_linenumber,
               round(coalesce(disc, (SELECT avg(disc) FROM base)), 6)
                 AS disc_mean_filled,
               round(coalesce(disc, (SELECT min(disc) FROM base)), 6)
                 AS disc_min_filled,
               round(coalesce(disc, 0.0), 6) AS disc_zero_filled
        FROM base""",
)
def q_fill_strategies(spark, sf_dir):
    """F5+F6 in ONE value-bound frame (r11 registry consolidation,
    VERDICT r10 next-steps #2a — replaces the fill_mean / fill_min /
    fill_zero registry rows; each former query's full projection is
    still a column here): mean / min imputation = one aggregate +
    column-scoped na.fill (preprocessing.py:32-34), zero fill scoped to
    the target column (preprocessing.py:35-36, whole-frame bug fixed
    per SURVEY.md §2.5). One scan, one 2-value aggregate, three fills."""
    li = _t(spark, sf_dir, "lineitem")
    nulled = F.when(F.col("l_discount") < 0.03, F.lit(None)).otherwise(
        F.col("l_discount")
    )
    base = li.select(
        "l_orderkey",
        "l_linenumber",
        nulled.alias("disc_mean_filled"),
        nulled.alias("disc_min_filled"),
        nulled.alias("disc_zero_filled"),
    )
    stats = base.agg(
        F.avg("disc_mean_filled").alias("m"),
        F.min("disc_min_filled").alias("mn"),
    ).first()
    # All-null guard: na.fill(None) raises; an all-null column passes
    # through unfilled like the oracle's coalesce (review r9).
    fills: dict = {"disc_zero_filled": 0.0}
    if stats["m"] is not None:
        fills["disc_mean_filled"] = stats["m"]
    if stats["mn"] is not None:
        fills["disc_min_filled"] = stats["mn"]
    return base.na.fill(fills).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("disc_mean_filled"), 6).alias("disc_mean_filled"),
        F.round(F.col("disc_min_filled"), 6).alias("disc_min_filled"),
        F.round(F.col("disc_zero_filled"), 6).alias("disc_zero_filled"),
    )


@query(
    "bidirectional_fill",
    """SELECT event_id,
              round(last_value(CASE WHEN value < 10 THEN NULL ELSE value END IGNORE NULLS)
                    OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                AS value_ffilled,
              round(first_value(CASE WHEN value < 10 THEN NULL ELSE value END IGNORE NULLS)
                    OVER (ORDER BY event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 6)
                AS value_bfilled
       FROM events""",
)
def q_bidirectional_fill(spark, sf_dir):
    """F3+F4 in ONE value-bound frame (r11 registry consolidation,
    VERDICT r10 next-steps #2a — replaces the forward_fill /
    backward_fill registry rows; each former query's full projection is
    still a column here): ordered forward AND backward fill via the
    distributed block-prefix algorithm (operators/fills.py), oracle =
    the sequential IGNORE NULLS windows. Both directions run over the
    same range-partitioned layout."""
    ev = _t(spark, sf_dir, "events")
    nulled = F.when(F.col("value") < 10, F.lit(None)).otherwise(F.col("value"))
    base = ev.select(
        "event_id", nulled.alias("vf"), nulled.alias("vb")
    )
    filled = backward_fill(forward_fill(base, ["vf"], "event_id"), ["vb"], "event_id")
    return filled.select(
        "event_id",
        F.round(F.col("vf"), 6).alias("value_ffilled"),
        F.round(F.col("vb"), 6).alias("value_bfilled"),
    )


@query(
    "drop_null_covariates",
    f"""SELECT l_orderkey, l_linenumber, round(disc, 6) AS disc
        FROM (SELECT l_orderkey, l_linenumber, {_NULLIFIED_DISC} AS disc FROM lineitem)
        WHERE disc IS NOT NULL""",
)
def q_drop_null_covariates(spark, sf_dir):
    """P6/F2: drop rows with null covariates (preprocessing.py:19-27)."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_discount") < 0.03, F.lit(None))
        .otherwise(F.col("l_discount"))
        .alias("disc"),
    )
    return base.na.drop(subset=["disc"]).select(
        "l_orderkey", "l_linenumber", F.round(F.col("disc"), 6).alias("disc")
    )


# ===========================================================================
# §2.6 — encoding / reshaping (E1, U1)
# ===========================================================================


@query(
    "one_hot",
    """SELECT o_orderkey,
              CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS "prio_2-HIGH",
              CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END AS "prio_3-MEDIUM",
              CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END
                AS "prio_4-NOT SPECIFIED",
              CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS "prio_5-LOW"
       FROM orders""",
)
def q_one_hot(spark, sf_dir):
    """E1: drop-first one-hot over sorted levels (preprocessing.py:
    82-108; first sorted level is the reference level)."""
    o = _t(spark, sf_dir, "orders")
    # NULL is not a one-hot level (reference parity) — and a None in
    # sorted() would raise TypeError on regenerated data (review r9).
    levels = sorted(
        r[0]
        for r in o.select("o_orderpriority").distinct().collect()
        if r[0] is not None
    )
    return o.select(
        "o_orderkey",
        *[
            F.when(F.col("o_orderpriority") == lv, 1).otherwise(0).alias(f"prio_{lv}")
            for lv in levels[1:]
        ],
    )


@query(
    "unpivot_long",
    """SELECT l_orderkey, l_linenumber, measure, round(value, 6) AS value
       FROM (UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                             l_discount, l_tax FROM lineitem)
             ON l_quantity, l_extendedprice, l_discount, l_tax
             INTO NAME measure VALUE value)""",
)
def q_unpivot_long(spark, sf_dir):
    """U1: the central wide->long unpivot that replaces the reference's
    task loop (SURVEY.md §2.6)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax",
    ).unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value_raw",
    ).select(
        "l_orderkey", "l_linenumber", "measure",
        F.round(F.col("value_raw"), 6).alias("value"),
    )


@query(
    "drop_constant_diag",
    """SELECT 'l_returnflag' AS column_name, count(DISTINCT l_returnflag) AS n_distinct,
              count(DISTINCT l_returnflag) <= 1 AS is_constant FROM lineitem
       UNION ALL
       SELECT 'l_linestatus', count(DISTINCT l_linestatus),
              count(DISTINCT l_linestatus) <= 1 FROM lineitem
       UNION ALL
       SELECT 'l_tax', count(DISTINCT l_tax), count(DISTINCT l_tax) <= 1 FROM lineitem""",
)
def q_drop_constant_diag(spark, sf_dir):
    """P3/A3: the constant-column diagnostic that drives
    drop_constant_covariates (preprocessing.py:65-79)."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.agg(
        *[
            F.countDistinct(c).alias(c)
            for c in ["l_returnflag", "l_linestatus", "l_tax"]
        ]
    )
    rows = [
        agg.select(
            F.lit(c).alias("column_name"),
            F.col(c).alias("n_distinct"),
            (F.col(c) <= 1).alias("is_constant"),
        )
        for c in ["l_returnflag", "l_linestatus", "l_tax"]
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


_CORR_PAIR = """SELECT '{a}' AS col_a, '{b}' AS col_b,
       round(corr({a}, {b}), 6) + 0.0 AS corr FROM lineitem"""

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "covariate_corr",
    " UNION ALL ".join(
        _CORR_PAIR.format(a=a, b=b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ),
)
def q_covariate_corr(spark, sf_dir):
    """Pairwise Pearson correlations of the design columns — the
    pre-flight collinearity diagnostic behind drop_correlated_covariates
    (a preprocessing step the reference lacks; its per-fit validation
    only discovers a singular design pair by pair, association.py-side).
    One aggregation job computes all C*(C-1)/2 stable moment triples;
    the oracle is DuckDB's closed-form corr() over the same pairs."""
    li = _t(spark, sf_dir, "lineitem").select(*_CORR_COLS)
    out = covariate_correlations(li, _CORR_COLS)
    # + 0.0: near-independent pairs have corr ~ 0; a tiny negative
    # rounds to -0.0 in DuckDB vs +0.0 in Spark (signed-zero trap).
    return out.select(
        "col_a", "col_b", (F.round("corr", 6) + F.lit(0.0)).alias("corr")
    )


# ===========================================================================
# §2.3 — joins (J1)
# ===========================================================================


@query(
    "annotation_join",
    """SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
       FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey""",
)
def q_annotation_join(spark, sf_dir):
    """J1: broadcast left equi-join (postprocessing.py:23-29 shape —
    results annotated from a small dimension table)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(
        F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left"
    ).select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


# ===========================================================================
# §2.7/§2.9/postprocessing — bonferroni, BH, scaling, transforms
# ===========================================================================

# Integer-cents proxy (the q11 pattern, hardened in review r9): the
# old round(avg(l_discount), 6) was the exact CLAUDE.md r7 quotient
# trap LIVE — l_discount is 2-decimal data and 57 part groups at
# sf0.01 have their true mean EXACTLY on a 6dp .5 boundary (measured),
# so one cross-engine 1-ulp sum disagreement flips the round. Summing
# exact cents (integers, order-independent in doubles up to 2^53) and
# dividing by 100.0 * n gives BIT-IDENTICAL pval doubles on both
# engines with no rounding step at all.
_PVAL_PROXY = """SELECT p_partkey AS test_id,
                        CAST(sum(CAST(round(l_discount * 100) AS BIGINT))
                             AS DOUBLE) / (100.0 * count(*)) AS pval
                 FROM lineitem JOIN part ON l_partkey = p_partkey
                 GROUP BY p_partkey"""


def _pval_proxy_tests(spark, sf_dir):
    """ONE Spark-side mirror of _PVAL_PROXY for both correction
    queries — a fix to the proxy can no longer be applied to one and
    missed in the other (review r9)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("p_partkey").alias("test_id"))
        .agg(
            (
                F.sum(F.round(F.col("l_discount") * 100, 0).cast("long"))
                .cast("double")
                / (F.lit(100.0) * F.count(F.lit(1)))
            ).alias("pval")
        )
    )


@query(
    "bonferroni",
    f"""WITH tests AS ({_PVAL_PROXY})
        SELECT test_id, pval,
               pval < 0.05 / (SELECT count(*) FROM tests WHERE pval IS NOT NULL)
                 AS bonferroni_significant
        FROM tests""",
)
def q_bonferroni(spark, sf_dir):
    """X2+P8+P10: bonferroni over a per-test p-value table
    (postprocessing.py:14-20). The 'p-values' are a deterministic proxy
    built from the test tables."""
    return bonferroni(_pval_proxy_tests(spark, sf_dir))


@query(
    "bh_fdr",
    f"""WITH tests AS ({_PVAL_PROXY}),
        ranked AS (
          SELECT test_id, pval,
                 count(*) OVER (ORDER BY pval ASC
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rk,
                 count(*) OVER () AS n
          FROM tests WHERE pval IS NOT NULL)
        SELECT test_id, pval,
               round(min(least(pval * n / rk, 1.0))
                 OVER (ORDER BY pval DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                 AS pval_bh
        FROM ranked""",
)
def q_bh_fdr(spark, sf_dir):
    """Benjamini-Hochberg step-up FDR — the reference's declared-but-
    unimplemented roadmap feature (README.md:159), as windows."""
    out = benjamini_hochberg(_pval_proxy_tests(spark, sf_dir))
    return out.select(
        "test_id", "pval", F.round(F.col("pval_bh"), 6).alias("pval_bh")
    )


@query(
    "scale_extremes",
    """SELECT l_orderkey, l_linenumber,
              round((l_extendedprice
                     - round((SELECT avg(l_extendedprice) FROM lineitem), 6))
                    / round((SELECT stddev_samp(l_extendedprice) FROM lineitem), 6),
                    6) + 0.0 AS price_std,
              round((l_extendedprice - (SELECT min(l_extendedprice) FROM lineitem))
                    / ((SELECT max(l_extendedprice) FROM lineitem)
                       - (SELECT min(l_extendedprice) FROM lineitem)), 6)
                AS price_minmax
       FROM lineitem""",
)
def q_scale_extremes(spark, sf_dir):
    """Standard + min-max covariate scaling in ONE value-bound frame
    (r11 registry consolidation, VERDICT r10 next-steps #2a — replaces
    the standard_scale / min_max_scale registry rows; each former
    query's full projection is still a column here; reference roadmap
    README.md:161). The expressions are byte-identical to the retired
    queries', preserving the two r6 cross-engine hash hazards' fixes:

    - The mean/std are pinned to 6 decimals on BOTH engines before the
      per-row scale, so a last-ulp disagreement between Spark's partial
      aggregation and DuckDB's (potentially multi-threaded) summation
      can never push a scaled value across a round(..., 6) boundary.
    - ``+ 0.0`` on both sides normalizes IEEE signed zero: a price just
      below the mean rounds to -0.0 in DuckDB (sign-preserving
      std::round) but +0.0 in Spark (BigDecimal HALF_UP drops the
      sign), and the driver's hasher reprs them differently. Adding
      positive zero maps -0.0 -> +0.0 and is exact for every other
      value.

    The min-max column goes through functions.transforms.min_max_scale
    (the engine path the retired query bound); the standard column uses
    the pinned-6dp literal shape (transforms.standard_scale doesn't pin,
    deliberately — pinning is an oracle-parity device, not semantics)."""
    from polars_mas_spark.functions.transforms import min_max_scale

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice",
        F.col("l_extendedprice").alias("price_minmax"),
    )
    stats = li.agg(
        F.round(F.avg("l_extendedprice"), 6).alias("m"),
        F.round(F.stddev_samp("l_extendedprice"), 6).alias("s"),
    ).first()
    out = min_max_scale(li, ["price_minmax"])
    return out.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.round((F.col("l_extendedprice") - stats["m"]) / stats["s"], 6)
            + F.lit(0.0)
        ).alias("price_std"),
        F.round(F.col("price_minmax"), 6).alias("price_minmax"),
    )


@query(
    "log_transform",
    "SELECT o_orderkey, round(ln(o_totalprice), 6) AS log_price FROM orders",
)
def q_log_transform(spark, sf_dir):
    """--logt transform (cli.py:99-103, declared surface)."""
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.round(F.log("o_totalprice"), 6).alias("log_price")
    )


@query(
    "rint_blom",
    """WITH v AS (SELECT p_partkey, p_retailprice FROM part),
       r AS (SELECT p_partkey,
                    avg(rn) OVER (PARTITION BY p_retailprice) AS avg_rank,
                    (SELECT count(*) FROM v) AS n
             FROM (SELECT p_partkey, p_retailprice,
                          row_number() OVER (ORDER BY p_retailprice ASC) AS rn
                   FROM v))
       SELECT p_partkey, round((avg_rank - 0.375) / (n + 0.25), 6) AS blom_frac
       FROM r""",
)
def q_rint_blom(spark, sf_dir):
    """--rint rank step (cli.py:93-98): the Blom rank fraction, which is
    SQL-expressible (the probit on top is value-bound in q_rint_full's
    generated-SQL replay oracle and unit tests). Runs through the distributed
    two-phase rank (functions.transforms.blom_fractions) — no
    single-partition global sort."""
    from polars_mas_spark.functions.transforms import blom_fractions

    p = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    out = blom_fractions(p, "p_retailprice", "blom_frac")
    return out.select(
        "p_partkey", F.round(F.col("blom_frac"), 6).alias("blom_frac")
    )


def _sql_horner(coeffs, v: str) -> str:
    """DuckDB Horner ``((c0*v + c1)*v + c2)...`` mirroring numpy's
    elementwise evaluation order exactly (same IEEE doubles out)."""
    e = coeffs[0] if isinstance(coeffs[0], str) else repr(coeffs[0])
    for c in coeffs[1:]:
        cc = c if isinstance(c, str) else repr(c)
        e = f"({e} * {v} + {cc})"
    return e


def _sql_horner_monic(coeffs, v: str) -> str:
    """Horner with an implicit leading coefficient of 1:
    ``(((v + c0)*v + c1)...)*v + c_last``."""
    e = f"({v} + {repr(coeffs[0])})"
    for c in coeffs[1:-1]:
        e = f"({e} * {v} + {repr(c)})"
    return f"({e} * {v} + {repr(coeffs[-1])})"


def _probit_x0_sql(p: str) -> str:
    """Acklam 3-branch inverse-normal start value, generated from the
    SAME coefficient tuples functions/distributions.norm_ppf_vec uses
    (imported, not copied — they cannot drift)."""
    from polars_mas_spark.functions.distributions import (
        _ACKLAM_A, _ACKLAM_B, _ACKLAM_C, _ACKLAM_D,
    )

    ql = f"sqrt(-2.0 * ln({p}))"
    low = f"({_sql_horner(_ACKLAM_C, ql)} / {_sql_horner(list(_ACKLAM_D) + ['1.0'], ql)})"
    qm = f"({p} - 0.5)"
    rm = f"({qm} * {qm})"
    mid = (
        f"({_sql_horner(_ACKLAM_A, rm)} * {qm} / "
        f"{_sql_horner(list(_ACKLAM_B) + ['1.0'], rm)})"
    )
    qh = f"sqrt(-2.0 * ln(1.0 - {p}))"
    high = f"(-({_sql_horner(_ACKLAM_C, qh)} / {_sql_horner(list(_ACKLAM_D) + ['1.0'], qh)}))"
    return (
        f"CASE WHEN {p} < 0.02425 THEN {low} "
        f"WHEN {p} <= (1.0 - 0.02425) THEN {mid} "
        f"ELSE {high} END"
    )


def _erfc_pos_sql(ax: str) -> str:
    """Cody/CALERF erfc for a non-negative argument string, replaying
    functions/distributions.erfc_vec branch by branch."""
    from polars_mas_spark.functions.distributions import (
        _CODY_A, _CODY_B, _CODY_C, _CODY_D, _CODY_P, _CODY_Q,
    )

    z1 = f"({ax} * {ax})"
    num1 = (
        f"({_sql_horner((_CODY_A[4], _CODY_A[0], _CODY_A[1], _CODY_A[2], _CODY_A[3]), z1)}"
        f" * {ax})"
    )
    b1 = f"(1.0 - {num1} / {_sql_horner_monic(_CODY_B, z1)})"
    num2 = _sql_horner(
        (_CODY_C[8], _CODY_C[0], _CODY_C[1], _CODY_C[2], _CODY_C[3],
         _CODY_C[4], _CODY_C[5], _CODY_C[6], _CODY_C[7]),
        ax,
    )
    b2 = f"(exp(-{ax} * {ax}) * {num2} / {_sql_horner_monic(_CODY_D, ax)})"
    z3 = f"(1.0 / ({ax} * {ax}))"
    num3 = _sql_horner(
        (_CODY_P[5], _CODY_P[0], _CODY_P[1], _CODY_P[2], _CODY_P[3], _CODY_P[4]),
        z3,
    )
    r3 = f"({z3} * {num3} / {_sql_horner_monic(_CODY_Q, z3)})"
    b3 = (
        f"(CASE WHEN {ax} > 26.5 THEN 0.0 "
        f"ELSE exp(-{ax} * {ax}) * (1.0 / sqrt(pi()) - {r3}) / {ax} END)"
    )
    return (
        f"CASE WHEN {ax} <= 0.46875 THEN {b1} "
        f"WHEN {ax} <= 4.0 THEN {b2} "
        f"ELSE {b3} END"
    )


def _rint_full_oracle() -> str:
    """Oracle for the full RINT: the rint_blom Blom-fraction CTE
    (unrounded — ranks, tie averages, and the (r - 0.375)/(n + 0.25)
    division are bit-identical across engines) through a DuckDB replay
    of the engine's own probit (Acklam start + one Halley polish via
    Cody erfc, coefficients imported from functions/distributions).
    Validated against norm_ppf_vec on 24k probes spanning all branch
    boundaries and 1e-12 tails: max |diff| 1e-13, zero mismatches after
    round(6) — the ulp gap from ln/exp/sqrt libm differences is
    contracted by the Halley step on both sides."""
    x0 = _probit_x0_sql("p")
    erfc = _erfc_pos_sql("a")
    return f"""WITH v AS (SELECT p_partkey, p_retailprice FROM part),
       r AS (SELECT p_partkey,
                    avg(rn) OVER (PARTITION BY p_retailprice) AS avg_rank,
                    (SELECT count(*) FROM v) AS n
             FROM (SELECT p_partkey, p_retailprice,
                          row_number() OVER (ORDER BY p_retailprice ASC) AS rn
                   FROM v)),
       fr AS (SELECT p_partkey,
                     (avg_rank - 0.375) / (n + 0.25) AS p
              FROM r),
       ack AS (SELECT p_partkey, p, {x0} AS x0 FROM fr),
       az AS (SELECT p_partkey, p, x0,
                     (-x0) / sqrt(2.0) AS z,
                     abs((-x0) / sqrt(2.0)) AS a
              FROM ack),
       ec AS (SELECT p_partkey, p, x0,
                     CASE WHEN z < 0 THEN 2.0 - ({erfc})
                          ELSE ({erfc}) END AS e
              FROM az),
       u AS (SELECT p_partkey, x0,
                    (0.5 * e - p) * sqrt(2.0 * pi()) * exp(0.5 * x0 * x0)
                        AS uu
             FROM ec)
    SELECT p_partkey,
           round(x0 - uu / (1.0 + 0.5 * x0 * uu), 6) + 0.0 AS price_rint
    FROM u"""


@query("rint_full", _rint_full_oracle())
def q_rint_full(spark, sf_dir):
    """Full rank-based inverse-normal transform (--rint): Blom rank
    fractions through the probit. DuckDB has no inverse-normal builtin,
    so the oracle REPLAYS the engine's probit in SQL, generated from
    the same Acklam/Cody coefficient constants the Pandas-UDF kernel
    imports (see _rint_full_oracle) — upgrading this query from the
    registry's last rows-only check to a full value hash."""
    p = _t(spark, sf_dir, "part")
    out = rint(p.select("p_partkey", "p_retailprice"), "p_retailprice", "price_rint")
    # + 0.0: the probit spans zero (median ranks map to ~0); normalize
    # IEEE signed zero across engines (see q_standard_scale).
    return out.select(
        "p_partkey",
        (F.round(F.col("price_rint"), 6) + F.lit(0.0)).alias("price_rint"),
    )


@query(
    "json_extract",
    """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k
       FROM events""",
)
def q_json_extract(spark, sf_dir):
    """Scalar JSON extraction from the events props column."""
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


# ===========================================================================
# TPC-H-style relational composites (joins + aggregates at bench scale)
# ===========================================================================


@query(
    "tpch_q1",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 4) AS sum_qty,
              round(sum(l_extendedprice), 4) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
              round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
              round(avg(l_quantity), 6) AS avg_qty,
              round(avg(l_extendedprice), 6) AS avg_price,
              round(avg(l_discount), 6) AS avg_disc,
              count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= DATE '1998-09-02'
       GROUP BY l_returnflag, l_linestatus""",
)
def q_tpch_q1(spark, sf_dir):
    """Pricing-summary aggregate: the map-side-combine shape every MAS
    preprocessing statistic reduces to."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "tpch_q3",
    """SELECT o.o_orderkey, round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
              o.o_orderdate
       FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < DATE '1998-03-15'
       GROUP BY o.o_orderkey, o.o_orderdate""",
)
def q_tpch_q3(spark, sf_dir):
    """Join + filtered aggregate; customer dimension broadcasts."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("date")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate")
    )


@query(
    "tpch_q5ish",
    """SELECT n.n_name AS nation, round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
       FROM lineitem l
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       WHERE r.r_name IN ('ASIA', 'EUROPE')
       GROUP BY n.n_name""",
)
def q_tpch_q5ish(spark, sf_dir):
    """Multi-dimension star join: all three dims broadcast — zero
    shuffles on the fact side before the final aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "tpch_q6",
    """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
       FROM lineitem
       WHERE l_shipdate >= DATE '1996-01-01'
         AND l_shipdate < DATE '1997-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
)
def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 (forecast revenue change): pure filter+aggregate; every
    predicate reaches the parquet scan (PushedFilters) and the aggregate
    is map-side partial — the minimal full-scan pattern."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4)
            .alias("revenue")
        )
    )


@query(
    "tpch_q4ish",
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders
       WHERE EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate > o_orderdate + INTERVAL 80 DAY)
       GROUP BY o_orderpriority""",
)
def q_tpch_q4ish(spark, sf_dir):
    """TPC-H Q4 shape adapted to the trimmed schema (no commit/receipt
    dates): orders with at least one line shipped >80 days after the
    order date, counted by priority. The EXISTS compiles to a LEFT SEMI
    join — no row amplification however many lines match — followed by
    a map-side-combined count."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > F.date_add(o["o_orderdate"], 80)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "tpch_q13ish",
    """WITH per_cust AS (
         SELECT c_custkey, count(o_orderkey) AS c_count
         FROM customer LEFT JOIN orders
           ON c_custkey = o_custkey AND o_orderstatus <> 'F'
         GROUP BY c_custkey)
       SELECT c_count, count(*) AS custdist
       FROM per_cust GROUP BY c_count""",
)
def q_tpch_q13ish(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution): LEFT OUTER join
    keeping order-less customers, then two cascaded aggregations. The
    outer join shuffles on custkey; the second aggregate's keys are the
    tiny count domain, so its shuffle is negligible."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q16ish",
    """SELECT p_brand, count(DISTINCT l_suppkey) AS supplier_cnt
       FROM part JOIN lineitem ON p_partkey = l_partkey
       WHERE p_size >= 20
         AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                               WHERE s_acctbal < 0)
       GROUP BY p_brand""",
)
def q_tpch_q16ish(spark, sf_dir):
    """TPC-H Q16 shape with lineitem as the part-supplier bridge (the
    trimmed schema has no partsupp): distinct suppliers per brand,
    excluding negative-balance suppliers. The NOT IN compiles to a LEFT
    ANTI join (broadcast — the exclusion list is tiny), the part
    dimension is broadcast, and count(DISTINCT) runs as Spark's
    two-phase Expand aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(bad), on="l_suppkey", how="left_anti")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q18ish",
    """SELECT c_name, o_orderkey,
              round(o_totalprice, 4) AS o_totalprice,
              round(sum_qty, 4) AS sum_qty
       FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
             FROM lineitem GROUP BY l_orderkey
             HAVING sum(l_quantity) > 250) big
       JOIN orders ON o_orderkey = l_orderkey
       JOIN customer ON c_custkey = o_custkey""",
)
def q_tpch_q18ish(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): groupBy-HAVING over lineitem
    first — the aggregation shrinks the fact table to the handful of
    qualifying orders BEFORE any join, so both joins broadcast the
    aggregated side instead of shuffling orders/customer."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        o.join(F.broadcast(big), o["o_orderkey"] == big["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("o_totalprice"),
            F.round("sum_qty", 4).alias("sum_qty"),
        )
    )


@query(
    "tpch_q7ish",
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
              year(l.l_shipdate) AS l_year,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
       FROM lineitem l
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       WHERE sn.n_name <> cn.n_name
         AND l.l_shipdate >= DATE '1996-01-01'
         AND l.l_shipdate < DATE '1998-01-01'
       GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)""",
)
def q_tpch_q7ish(spark, sf_dir):
    """TPC-H Q7 (volume shipping): cross-border revenue by nation pair
    and year. One fact-fact shuffle (lineitem⋈orders on orderkey); every
    dimension (supplier, customer, nation x2) broadcasts, and the
    cross-border inequality is a cheap post-broadcast filter — never a
    join condition that would force a nested loop."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "tpch_q10ish",
    """SELECT c.c_custkey, c.c_name,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
              round(c.c_acctbal, 4) AS c_acctbal, n.n_name
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       WHERE o.o_orderdate >= DATE '1997-01-01'
         AND o.o_orderdate < DATE '1997-04-01'
         AND l.l_returnflag = 'R'
       GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name""",
)
def q_tpch_q10ish(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): per-customer lost revenue in
    one quarter. The date filter prunes orders BEFORE the fact join; the
    returnflag filter reaches the lineitem scan (PushedFilters); nation
    broadcasts. No LIMIT (ranking ties would make the row set
    nondeterministic across engines) — top-k per group is covered by
    topk_per_group."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            "c_custkey", "c_name", "revenue",
            F.round("c_acctbal", 4).alias("c_acctbal"), "n_name",
        )
    )


@query(
    "tpch_q14ish",
    """SELECT round(100.00 * sum(CASE WHEN p.p_type = 'PROMO'
                                      THEN l.l_extendedprice * (1 - l.l_discount)
                                      ELSE 0 END)
                    / sum(l.l_extendedprice * (1 - l.l_discount)), 6)
              AS promo_revenue
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       WHERE l.l_shipdate >= DATE '1997-06-01'
         AND l.l_shipdate < DATE '1997-07-01'""",
)
def q_tpch_q14ish(spark, sf_dir):
    """TPC-H Q14 (promotion effect): conditional-aggregate ratio in ONE
    pass — both sums come out of a single broadcast-join + aggregate,
    not two scans."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("date"))
    )
    p = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                6,
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q19ish",
    """SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
              AND l.l_quantity BETWEEN 1 AND 21)
          OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 30
              AND l.l_quantity BETWEEN 10 AND 30)
          OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 50
              AND l.l_quantity BETWEEN 20 AND 40)""",
)
def q_tpch_q19ish(spark, sf_dir):
    """TPC-H Q19 (discounted revenue, disjunctive predicates): the
    classic OR-of-ANDs. Expressed as a broadcast equi-join + one
    composite filter so Catalyst keeps the equi-join (a naive translation
    putting the OR into the join condition degrades to a nested loop);
    the quantity bounds common to all branches (1..40) are pushable."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(branch)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "tpch_q22ish",
    """SELECT substring(c_name, 10, 2) AS cntrycode,
              count(*) AS numcust,
              round(sum(c_acctbal), 4) AS totacctbal
       FROM customer
       WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                          WHERE c_acctbal > 0.0)
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderdate >= DATE '1998-10-01')
       GROUP BY substring(c_name, 10, 2)""",
)
def q_tpch_q22ish(spark, sf_dir):
    """TPC-H Q22 (global-sales opportunity): scalar subquery + anti-join
    — above-average-balance customers with no RECENT order (every
    customer in this dataset has SOME order, so the date restriction is
    what gives the anti-join a non-empty result to prove). The global
    average is a 1-row aggregate broadcast-crossJoined onto customer (no
    eager .first() action, stays one job); recent purchasers are removed
    by a LEFT ANTI join that shuffles only custkeys."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-10-01").cast("date"))
        .select("o_custkey")
        .distinct()
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal__")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal__"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy(F.substring("c_name", 10, 2).alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


@query(
    "tpch_q21ish",
    """WITH late AS (
         SELECT DISTINCT l.l_orderkey, l.l_suppkey
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE l.l_shipdate > o.o_orderdate + INTERVAL 80 DAY),
       sups AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT lt.l_suppkey AS suppkey, count(*) AS numwait
    FROM late lt
    WHERE EXISTS (SELECT 1 FROM sups s
                  WHERE s.l_orderkey = lt.l_orderkey
                    AND s.l_suppkey <> lt.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l2
                      WHERE l2.l_orderkey = lt.l_orderkey
                        AND l2.l_suppkey <> lt.l_suppkey)
    GROUP BY lt.l_suppkey
    ORDER BY numwait DESC, suppkey
    LIMIT 50""",
)
def q_tpch_q21ish(spark, sf_dir):
    """TPC-H Q21 shape (suppliers-who-kept-orders-waiting) adapted to
    the trimmed schema (no receipt/commit dates — "late" = shipped >80
    days after the order date): per supplier, count multi-supplier
    orders where it is the ONLY late shipper. Exercises the one
    relational shape the other tpch_* queries don't: EXISTS + NOT
    EXISTS against the SAME fact table — a left-semi join (another
    supplier participates) composed with a left-anti join (no other
    supplier is late), both shuffling only distinct (order, supplier)
    pairs, never raw lineitems."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem")
    late = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 80))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sups = li.select("l_orderkey", "l_suppkey").distinct()
    lt, s2, l2 = late.alias("lt"), sups.alias("s2"), late.alias("l2")
    others_exist = lt.join(
        s2,
        (F.col("lt.l_orderkey") == F.col("s2.l_orderkey"))
        & (F.col("lt.l_suppkey") != F.col("s2.l_suppkey")),
        "left_semi",
    )
    sole_late = others_exist.alias("lt").join(
        l2,
        (F.col("lt.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("lt.l_suppkey") != F.col("l2.l_suppkey")),
        "left_anti",
    )
    return (
        sole_late.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("suppkey").asc())
        .limit(50)
    )


# ===========================================================================
# TPC-H shapes, second wave (q8/q9/q12/q15/q17-ish). q2/q11/q20 need the
# partsupp table, which the generated testdata does not include.
# ===========================================================================


@query(
    "tpch_q12ish",
    """SELECT l.l_returnflag,
              sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
              sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END)::BIGINT AS low_line_count
       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       WHERE l.l_returnflag IN ('A', 'R')
         AND l.l_shipdate >= DATE '1996-01-01'
         AND l.l_shipdate < DATE '1997-01-01'
       GROUP BY l.l_returnflag""",
)
def q_tpch_q12ish(spark, sf_dir):
    """Q12 shape (shipping-priority split; l_returnflag standing in for
    the absent l_shipmode): fact-fact equi-join + conditional counts."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q15ish",
    """WITH revenue AS (
           SELECT l_suppkey AS supplier_no,
                  sum(l_extendedprice * (1 - l_discount)) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= DATE '1996-01-01'
             AND l_shipdate < DATE '1996-04-01'
           GROUP BY l_suppkey)
       SELECT s.s_suppkey, s.s_name,
              round(r.total_revenue, 2) AS total_revenue
       FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
       WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)""",
)
def q_tpch_q15ish(spark, sf_dir):
    """Q15 shape (top-revenue supplier): aggregate view + scalar-max
    subquery join-back. The max enters as a broadcast 1-row crossJoin
    (no single-partition window over the supplier aggregate).

    The supplier aggregate is MATERIALIZED once (localCheckpoint —
    supplier-cardinality rows, tiny) before being referenced by both
    the max branch and the equality filter: two live evaluations of a
    double sum can differ in the last ulp (shuffle-fetch merge order),
    and `total_revenue == max(total_revenue)` would then match NOTHING
    — the CLAUDE.md flap class, invisible at sf0.01 where every group
    fits one partition (review r9)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    ).localCheckpoint(eager=True)
    mx = rev.agg(F.max("total_revenue").alias("__mx__"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx__"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            F.round("total_revenue", 2).alias("total_revenue"),
        )
    )


@query(
    "tpch_q17ish",
    """SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
       FROM lineitem l
       JOIN part p ON p.p_partkey = l.l_partkey
       JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_thresh
             FROM lineitem GROUP BY l_partkey) t
         ON t.l_partkey = l.l_partkey
       WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.qty_thresh""",
)
def q_tpch_q17ish(spark, sf_dir):
    """Q17 shape (small-quantity-order revenue): correlated per-part
    average decorrelated into an aggregate + join-back — the classic
    rewrite Catalyst would otherwise need a subquery for; part
    dimension broadcasts, the per-part threshold joins on the fact
    key."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    thresh = li.groupBy(F.col("l_partkey").alias("__tk__")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(thresh, li["l_partkey"] == F.col("__tk__"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "tpch_q9ish",
    """SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS profit
       FROM lineitem l
       JOIN part p ON p.p_partkey = l.l_partkey
       JOIN supplier s ON s.s_suppkey = l.l_suppkey
       JOIN nation n ON n.n_nationkey = s.s_nationkey
       JOIN orders o ON o.o_orderkey = l.l_orderkey
       WHERE p.p_name LIKE '%red%'
       GROUP BY n.n_name, year(o.o_orderdate)""",
)
def q_tpch_q9ish(spark, sf_dir):
    """Q9 shape (product-line profit by nation and year, sans the
    partsupp supply-cost term the testdata lacks): a 5-table star —
    three broadcast dims + one fact-fact join + two-key aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("profit")
        )
    )


@query(
    "tpch_q8ish",
    """WITH vol AS (
           SELECT year(o.o_orderdate) AS o_year,
                  l.l_extendedprice * (1 - l.l_discount) AS volume,
                  sn.n_name AS supp_nation
           FROM lineitem l
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN nation cn ON cn.n_nationkey = c.c_nationkey
           JOIN region r ON r.r_regionkey = cn.n_regionkey
           JOIN supplier s ON s.s_suppkey = l.l_suppkey
           JOIN nation sn ON sn.n_nationkey = s.s_nationkey
           WHERE r.r_name = 'AMERICA'
             AND o.o_orderdate >= DATE '1995-01-01'
             AND o.o_orderdate < DATE '1997-01-01')
       SELECT o_year,
              round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                             ELSE 0 END) / sum(volume), 6) AS mkt_share
       FROM vol GROUP BY o_year""",
)
def q_tpch_q8ish(spark, sf_dir):
    """Q8 shape (national market share): a 7-table snowflake — nation
    joined TWICE under different roles (customer's vs supplier's), all
    dimensions broadcast, share = conditional-sum ratio per year."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA").select(
        "r_regionkey"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn_key"))
        .join(F.broadcast(r), F.col("n_regionkey") == r["r_regionkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                .otherwise(0.0)
            )
            / F.sum("volume"),
            6,
        ).alias("mkt_share")
    )


# ===========================================================================
# TPC-H shapes, third wave (q2/q11/q20-ish). These need the partsupp
# table, which the driver's generator has never emitted (VERDICT r5
# "What's missing" #2; still absent in r8 per tools/probe_testdata.py).
# Rather than stay dormant, partsupp is DERIVED deterministically from
# lineitem — distinct (l_partkey, l_suppkey) with hash-keyed
# availqty/supplycost — with the SAME pure-int64 arithmetic in the Spark
# builder (_partsupp) and the oracle CTE (_PS_DERIVED_CTE), so both
# engines see byte-identical data at every SF with no file, no absolute
# path in the oracle, and no import-time env-var resolution (ADVICE r7
# #2: the old file-gated design froze SPARK_GRAFT_SF_DIR at import).
# Supply costs are carried as integer CENTS (ps_supplycost_cents) so
# aggregates can stay in exact int64 and never depend on double
# summation order; ps_supplycost = cents/100.0 is the same double on
# both engines because it is derived from the same integer.
# ===========================================================================

# Shared derivation, quoted verbatim into every oracle. Hash constants
# are Knuth's 2654435761 and 40503; all operands stay far below 2^63
# even at sf100 (partkey ~2e7 x 2.65e9 ~ 5.3e16).
_PS_DERIVED_CTE = """ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         ((l_partkey * 2654435761 + l_suppkey * 40503) % 2147483647)
           % 9999 + 1 AS ps_availqty,
         (l_partkey * 40503 + l_suppkey * 2654435761) % 99900 + 100
           AS ps_supplycost_cents,
         ((l_partkey * 40503 + l_suppkey * 2654435761) % 99900 + 100)
           / 100.0 AS ps_supplycost
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp view — the Spark twin of _PS_DERIVED_CTE.

    One keyed shuffle (the DISTINCT) and two hash projections; at 100 TB
    this is a map-side-combined distinct over the already-partitioned
    lineitem scan reading exactly two columns.
    """
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    h1 = (
        F.col("l_partkey") * F.lit(2654435761)
        + F.col("l_suppkey") * F.lit(40503)
    ) % F.lit(2147483647)
    cents = (
        F.col("l_partkey") * F.lit(40503)
        + F.col("l_suppkey") * F.lit(2654435761)
    ) % F.lit(99900) + F.lit(100)
    return li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
        (h1 % 9999 + 1).cast("long").alias("ps_availqty"),
        cents.cast("long").alias("ps_supplycost_cents"),
        (cents / F.lit(100.0)).alias("ps_supplycost"),
    )


_TPCH_Q2ISH_ORACLE = (
    f"""WITH {_PS_DERIVED_CTE},
       costs AS (
           SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost
           FROM ps
           JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
           JOIN nation n ON n.n_nationkey = s.s_nationkey
           JOIN region r ON r.r_regionkey = n.n_regionkey
           WHERE r.r_name = 'EUROPE'),
       mins AS (
           SELECT ps_partkey, min(ps_supplycost) AS min_cost
           FROM costs GROUP BY ps_partkey)
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS supp_nation,
           round(c.ps_supplycost, 6) AS supplycost
    FROM costs c
    JOIN mins m ON m.ps_partkey = c.ps_partkey
               AND c.ps_supplycost = m.min_cost
    JOIN part p ON p.p_partkey = c.ps_partkey
    JOIN supplier s ON s.s_suppkey = c.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size < 20"""
)
def q_tpch_q2ish(spark, sf_dir):
    """Q2 shape (min-cost supplier): the correlated
    min-supplycost-per-part subquery decorrelated into a per-part
    window min over the region-filtered partsupp — supplier/nation/
    region dims broadcast, one keyed shuffle on ps_partkey."""
    ps = _partsupp(spark, sf_dir).select(
        "ps_partkey", "ps_suppkey", "ps_supplycost"
    )
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = (
        _t(spark, sf_dir, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select("r_regionkey")
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") < 20)
        .select("p_partkey", "p_name")
    )
    costs = (
        ps.join(F.broadcast(s), ps["ps_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    w = Window.partitionBy("ps_partkey")
    return (
        costs.withColumn(
            "__min_cost__", F.min("ps_supplycost").over(w)
        )
        .filter(F.col("ps_supplycost") == F.col("__min_cost__"))
        .join(F.broadcast(p), F.col("ps_partkey") == p["p_partkey"])
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("n_name").alias("supp_nation"),
            F.round("ps_supplycost", 6).alias("supplycost"),
        )
    )

_TPCH_Q11ISH_ORACLE = (
    f"""WITH {_PS_DERIVED_CTE},
       val AS (
           SELECT ps.ps_partkey,
                  sum(ps.ps_supplycost_cents * ps.ps_availqty)::BIGINT
                    AS value_cents
           FROM ps
           JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
           JOIN nation n ON n.n_nationkey = s.s_nationkey
           WHERE n.n_name = 'NATION_3'
           GROUP BY ps.ps_partkey)
    SELECT ps_partkey, value_cents / 100.0 AS value
    FROM val
    WHERE value_cents * (SELECT count(*) FROM val)
          > 2 * (SELECT sum(value_cents)::BIGINT FROM val)"""
)
def _q11_value_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11's per-part integer-cents aggregate, pre-checkpoint — split
    out so plan tests can assert the join/agg shape (the registered
    query localCheckpoints this, which hides the joins behind a Scan
    ExistingRDD in the returned plan)."""
    ps = _partsupp(spark, sf_dir).select(
        "ps_partkey", "ps_suppkey", "ps_availqty", "ps_supplycost_cents"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    return (
        ps.join(F.broadcast(s), ps["ps_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost_cents") * F.col("ps_availqty")
            ).alias("value_cents")
        )
    )


def q_tpch_q11ish(spark, sf_dir):
    """Q11 shape (group-share HAVING): per-part inventory value for
    one nation, kept when above a fraction of the nation total. The
    scalar total is computed once and pushed back as a literal (a
    driver-bounded single-row collect) — no single-partition window,
    no cross join. The aggregate runs entirely in integer CENTS
    (value_cents = sum of cents x qty, exact int64 at any SF and any
    summation order), and the threshold — keep parts above 2x the
    MEAN per-part share, the scale-invariant analog of TPC-H's
    fraction/SF so the result is non-vacuous at every SF — is the
    integer identity value_cents * n_parts > 2 * total_cents, so no
    engine can straddle the cut by an ulp of double-summation-order
    noise. The double `value` is only a final projection of the same
    integer on both sides."""
    val = _q11_value_cents(spark, sf_dir)
    # Materialize the per-part aggregate ONCE (one row per part, tiny):
    # it feeds both the scalar-total job and the returned filter, and
    # without truncation the join+agg over partsupp would run twice.
    val = val.localCheckpoint(eager=True)
    tot_row = val.agg(
        F.sum("value_cents").alias("t"), F.count(F.lit(1)).alias("n")
    ).first()
    total, n_parts = tot_row[0] or 0, tot_row[1] or 0
    return val.filter(
        F.col("value_cents") * F.lit(n_parts) > F.lit(2 * total)
    ).select(
        "ps_partkey", (F.col("value_cents") / F.lit(100.0)).alias("value")
    )

_TPCH_Q20ISH_ORACLE = (
    f"""WITH {_PS_DERIVED_CTE},
       shipped AS (
           SELECT l_partkey, l_suppkey,
                  sum(l_quantity) AS qty
           FROM lineitem
           WHERE l_shipdate >= DATE '1995-01-01'
             AND l_shipdate < DATE '1996-01-01'
           GROUP BY l_partkey, l_suppkey),
       excess AS (
           SELECT DISTINCT ps.ps_suppkey
           FROM ps
           JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                          AND sh.l_suppkey = ps.ps_suppkey
           WHERE ps.ps_availqty > 0.5 * sh.qty)
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT ps_suppkey FROM excess)"""
)
def q_tpch_q20ish(spark, sf_dir):
    """Q20 shape (availability semi-join): suppliers whose stock
    exceeds half of what they shipped in 1995 — lineitem aggregated
    once on (part, supp), equi-joined with partsupp on the same
    key, then a left-semi join into supplier. The availqty > 0.5*qty
    cut is exact on both engines: l_quantity is integral in the
    generated data (probe-checked), so sum(l_quantity) is an exact
    integer-valued double at any summation order and 0.5*qty is an
    exact dyadic rational."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    ps = _partsupp(spark, sf_dir).select(
        "ps_partkey", "ps_suppkey", "ps_availqty"
    )
    excess = (
        ps.join(
            shipped,
            (ps["ps_partkey"] == shipped["l_partkey"])
            & (ps["ps_suppkey"] == shipped["l_suppkey"]),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(excess, s["s_suppkey"] == excess["ps_suppkey"], "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .select("s_name", F.col("n_name").alias("nation"))
    )


query("tpch_q2ish", _TPCH_Q2ISH_ORACLE)(q_tpch_q2ish)
query("tpch_q11ish", _TPCH_Q11ISH_ORACLE)(q_tpch_q11ish)
query("tpch_q20ish", _TPCH_Q20ISH_ORACLE)(q_tpch_q20ish)
