"""Window-family operators: sessionization, rolling aggregates, grouped
top-k, and a distributed as-of join.

Beyond-reference surface (the reference has no window functions at all,
SURVEY.md §2.10). Every window here is PARTITIONED (by user/key) — no
global single-partition windows — so each scales with the key
cardinality.

The as-of join uses the classic union-sentinel algorithm instead of a
range join: tag both sides, union, sort within key, and carry the last
right-side payload forward. One shuffle on (key, ts); no quadratic
candidate explosion, no interval join. DuckDB's native ASOF JOIN is the
test oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_mas_spark.colutils import qcol


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign per-user session ids: a new session starts when the gap
    from the previous event exceeds `gap_seconds`. Adds ``session_id``
    (1-based per user)."""
    w = Window.partitionBy(qcol(user_col)).orderBy(qcol(ts_col))
    prev_ts = F.lag(qcol(ts_col)).over(w)
    gap = qcol(ts_col).cast("long") - prev_ts.cast("long")
    is_new = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_summary(
    df: DataFrame, user_col: str, ts_col: str, gap_seconds: int = 1800
) -> DataFrame:
    """(user, session_id, n_events, session_start, session_end)."""
    s = sessionize(df, user_col, ts_col, gap_seconds)
    return s.groupBy(qcol(user_col), F.col("session_id")).agg(
        F.count("*").alias("n_events"),
        F.min(qcol(ts_col)).alias("session_start"),
        F.max(qcol(ts_col)).alias("session_end"),
    )


def rolling_agg(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    value_col: str,
    window_rows: int = 5,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Rolling mean/sum over the last `window_rows` rows per partition.

    ``order_col`` must be a TOTAL order within each partition — a ROWS
    frame over tied rows makes the boundary a shuffle-order lottery
    (the CLAUDE.md gate-flap class). Pass ``tiebreak_col`` (a unique
    id) when the order column can tie; the registered query's event_id
    uniqueness is probe-enforced, so its default stays bare."""
    order = [qcol(order_col)]
    if tiebreak_col is not None:
        order.append(qcol(tiebreak_col))
    w = (
        Window.partitionBy(qcol(partition_col))
        .orderBy(*order)
        .rowsBetween(-(window_rows - 1), 0)
    )
    return df.select(
        *df.columns,
        F.avg(qcol(value_col)).over(w).alias("rolling_avg"),
        F.sum(qcol(value_col)).over(w).alias("rolling_sum"),
    )


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int = 3,
    tiebreak_col: str | None = None,
    out_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group by descending order_col.

    ``tiebreak_col`` is REQUIRED (same contract as
    cap_tokens_per_source's order_col): with ties at the k boundary and
    no tiebreak, row_number() depends on physical row order, so a
    partition recomputation or rerun returns a DIFFERENT top-k set —
    nondeterminism that silently poisons any downstream join."""
    if tiebreak_col is None:
        raise ValueError(
            "topk_per_group requires tiebreak_col (a unique per-row "
            "column): without it the returned row set under ties is "
            "nondeterministic across reruns and partition recomputation."
        )
    if out_col in df.columns:
        raise ValueError(
            f"topk_per_group: output column {out_col!r} already exists "
            "in the input; pass out_col= to rename it."
        )
    w = Window.partitionBy(qcol(group_col)).orderBy(
        qcol(order_col).desc(), qcol(tiebreak_col).asc()
    )
    return (
        df.withColumn(out_col, F.row_number().over(w))
        .filter(F.col(out_col) <= k)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the right row with the
    largest right_ts <= left_ts (backward) or smallest right_ts >=
    left_ts (forward), per key. ``tolerance_seconds`` bounds the match
    gap (pandas ``merge_asof`` semantics): a match farther than the
    tolerance is nulled out, turning "the most recent price" into "the
    most recent price no older than N" — the stale-data guard every
    production as-of consumer eventually needs.

    Union-sentinel implementation: one shuffle on (key, ts); scales with
    key cardinality, never materializes candidate pairs. The tolerance
    is a map-side post-filter on the carried match — no extra shuffle.

    Tie semantics: when several RIGHT rows share the matched (key, ts),
    which one is carried is unspecified — the same contract as pandas
    ``merge_asof`` and DuckDB ``ASOF JOIN`` (both order-dependent), so
    no cross-engine oracle can pin it. Feed a right side that is unique
    per (key, ts) — pre-aggregate if it isn't;
    ``tools/probe_testdata.py`` warns when the generated events table
    violates this for the registered query."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]
    lcols = left.columns

    l_tag = left.select(
        qcol(on).alias("__key__"),
        qcol(left_ts).alias("__ts__"),
        F.lit(1).alias("__is_left__"),
        F.struct(*[qcol(c) for c in lcols]).alias("__lrow__"),
        F.lit(None).cast(
            right.select(F.struct(*[qcol(c) for c in [right_ts, *value_cols]]).alias("s"))
            .schema["s"].dataType
        ).alias("__rrow__"),
    )
    # NULL timestamps never participate in an as-of match (pandas
    # merge_asof / DuckDB ASOF contract): a NULL-ts right row would
    # otherwise sort NULLS-FIRST in backward mode and be carried as a
    # spurious "match" into every early left row (review r9).
    r_tag = right.filter(qcol(right_ts).isNotNull()).select(
        qcol(on).alias("__key__"),
        qcol(right_ts).alias("__ts__"),
        F.lit(0).alias("__is_left__"),
        F.lit(None).cast(
            left.select(F.struct(*[qcol(c) for c in lcols]).alias("s")).schema["s"].dataType
        ).alias("__lrow__"),
        F.struct(*[qcol(c) for c in [right_ts, *value_cols]]).alias("__rrow__"),
    )
    unioned = l_tag.unionByName(r_tag)
    if direction == "backward":
        # Right rows sort before left rows at equal ts so ties match.
        w = Window.partitionBy("__key__").orderBy(
            F.col("__ts__").asc(), F.col("__is_left__").asc()
        ).rowsBetween(Window.unboundedPreceding, 0)
    elif direction == "forward":
        w = Window.partitionBy("__key__").orderBy(
            F.col("__ts__").desc(), F.col("__is_left__").asc()
        ).rowsBetween(Window.unboundedPreceding, 0)
    else:
        raise ValueError(f"Unknown direction: {direction}")
    carried = unioned.withColumn(
        "__match__", F.last("__rrow__", ignorenulls=True).over(w)
    ).filter(F.col("__is_left__") == 1)
    # A NULL-ts LEFT row has no as-of position: in forward mode it
    # sorts NULLS-LAST and would otherwise see every right row and
    # "match" the earliest one (review r9) — null it on both paths.
    carried = carried.withColumn(
        "__match__",
        F.when(F.col("__ts__").isNotNull(), F.col("__match__")),
    )
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("__ts__").cast("long")
            - F.col("__match__")[right_ts].cast("long")
        )
        carried = carried.withColumn(
            "__match__",
            F.when(gap <= F.lit(tolerance_seconds), F.col("__match__")),
        )
    out_cols = [F.col("__lrow__")[c].alias(c) for c in lcols]
    out_cols.append(F.col("__match__")[right_ts].alias(f"asof_{right_ts}"))
    # A right value column sharing a name with any left column gets a
    # _right suffix (pandas merge_asof's suffix behavior) — otherwise
    # the output has two identically-named columns and every downstream
    # by-name reference raises AMBIGUOUS_REFERENCE.
    out_cols.extend(
        F.col("__match__")[c].alias(c if c not in lcols else f"{c}_right")
        for c in value_cols
    )
    return carried.select(*out_cols)


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort-retention matrix (the standard product-analytics
    rollup): each user joins the cohort of their FIRST event's ISO week;
    for every (cohort_week, week_age) cell, count the distinct cohort
    users active in that week. Returns
    ``(cohort_week, week_age, n_users)``.

    Scale shape: first-event per user is one hash aggregate on the user
    key; active weeks reduce to distinct (user, week) — k× smaller than
    events — before the user-keyed join; the final cell count is one
    more hash aggregate. Three linear shuffles, no windows over the raw
    event stream, no per-event state."""
    user = qcol(user_col)
    ts = qcol(ts_col)
    firsts = df.groupBy(user.alias("user")).agg(
        F.date_trunc("week", F.min(ts)).cast("date").alias("cohort_week")
    )
    active = (
        df.select(
            user.alias("user"),
            F.date_trunc("week", ts).cast("date").alias("active_week"),
        )
        .distinct()
    )
    joined = active.join(firsts, on="user")
    return (
        joined.groupBy(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week"))
                / F.lit(7)
            ).cast("int").alias("week_age"),
        )
        # Plain count: `joined` is already distinct per (user, week) and
        # each user has one cohort, so every (cell, user) appears once —
        # count_distinct would pay the two-phase distinct machinery for
        # nothing.
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def funnel_analysis(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    window_seconds: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion counts (the product-analytics funnel:
    how many users did step1, then step2 AFTER it, then step3 after
    that...). First-occurrence semantics per step; ``window_seconds``
    optionally bounds the whole funnel relative to step1's time.
    Returns one row per step: ``(step, event_type, n_users)`` where
    n_users is the number of users who reached at least that step.

    Scale shape: step i is one filtered min-aggregate on the user key
    joined to the survivors of step i-1 — k linear hash shuffles for a
    k-step funnel, never a per-user event-sequence sort or UDF. The
    whole result is ONE lazy plan; each survivor frame feeds both its
    count branch and the next step, a shared prefix Spark collapses at
    runtime via ReusedExchange."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    user = qcol(user_col)
    ts = qcol(ts_col)
    etype = qcol(type_col)
    out = None
    cur = None
    for i, s in enumerate(steps):
        ev = df.filter(etype == s).select(
            user.alias("user"), ts.alias("__ts__")
        )
        if cur is None:
            cur = ev.groupBy("user").agg(F.min("__ts__").alias("__t__"))
            cur = cur.withColumn("__t0__", F.col("__t__"))
        else:
            chained = ev.join(cur, on="user").filter(
                F.col("__ts__") > F.col("__t__")
            )
            if window_seconds is not None:
                chained = chained.filter(
                    F.col("__ts__").cast("long")
                    <= F.col("__t0__").cast("long") + window_seconds
                )
            cur = chained.groupBy("user", "__t0__").agg(
                F.min("__ts__").alias("__t__")
            )
        cnt = cur.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i + 1).alias("step"),
            F.lit(s).alias("event_type"),
            F.col("n_users"),
        )
        out = cnt if out is None else out.unionByName(cnt)
    # One LAZY plan (auditable end-to-end, no eager jobs, nothing to
    # unpersist): count branch i and the step-(i+1) chain share their
    # aggregate prefix, which Spark's ReusedExchange collapses at
    # runtime — no manual caching needed to avoid re-reading events
    # k times.
    return out


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Regularize an irregular time series onto a fixed grid and
    linearly interpolate the gaps — the resample step every metrics /
    sensor / training-telemetry pipeline needs before joining series
    recorded at different cadences (beyond-reference; the reference has
    no time-series surface at all).

    Three stages, all key-partitioned (nothing global, scales with key
    cardinality like the rest of this module):

    1. **Downsample**: bucket ``ts`` to ``floor(epoch/step)*step`` and
       average ``value`` per (key, bucket) — one hash aggregate with
       map-side combine.
    2. **Spine**: per key, ``explode(sequence(min_bucket, max_bucket,
       step))`` generates the complete grid between the key's first and
       last observation; a left join against the downsampled points
       marks the gaps. The spine never leaves the key's own time range,
       so total output is bounded by sum over keys of range/step —
       predictable, and skew lives where the data does.
    3. **Interpolate**: two window passes per key (prev non-null
       value+bucket looking back, next looking forward), then the pure
       arithmetic ``pv + (nv-pv)*(b-pb)/(nb-pb)`` for interior gaps;
       leading/trailing gaps clamp to the nearest observed value. No
       UDFs anywhere — the whole plan is whole-stage codegen around two
       sorts within the same key partitioning.

    Returns (key, bucket_ts timestamp, value double, interpolated bool).
    """
    key, ts, val = qcol(key_col), qcol(ts_col), qcol(value_col)
    step = F.lit(int(step_seconds)).cast("long")
    bucket = (F.floor(ts.cast("double") / step) * step).cast("long")
    sampled = (
        df.where(ts.isNotNull())
        .groupBy(key.alias("__key__"), bucket.alias("__b__"))
        .agg(F.avg(val).alias("__v__"))
    )
    spine = (
        sampled.groupBy("__key__")
        .agg(F.min("__b__").alias("__lo__"), F.max("__b__").alias("__hi__"))
        .select(
            "__key__",
            F.explode(
                F.sequence(F.col("__lo__"), F.col("__hi__"), step)
            ).alias("__b__"),
        )
    )
    grid = spine.join(sampled, ["__key__", "__b__"], "left")
    back = (
        Window.partitionBy("__key__")
        .orderBy(F.col("__b__").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("__key__")
        .orderBy(F.col("__b__").asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col("__v__")
    known_b = F.when(v.isNotNull(), F.col("__b__"))
    out = (
        grid.withColumn("__pv__", F.last(v, ignorenulls=True).over(back))
        .withColumn("__pb__", F.last(known_b, ignorenulls=True).over(back))
        .withColumn("__nv__", F.first(v, ignorenulls=True).over(fwd))
        .withColumn("__nb__", F.first(known_b, ignorenulls=True).over(fwd))
    )
    pv, pb, nv, nb = (F.col(c) for c in ("__pv__", "__pb__", "__nv__", "__nb__"))
    b = F.col("__b__").cast("double")
    interp = (
        F.when(v.isNotNull(), v)
        .when(pv.isNull(), nv)  # leading gap: clamp forward
        .when(nv.isNull(), pv)  # trailing gap: clamp backward
        .otherwise(
            pv + (nv - pv) * (b - pb.cast("double"))
            / (nb.cast("double") - pb.cast("double"))
        )
    )
    return out.select(
        F.col("__key__").alias(key_col),
        F.timestamp_seconds(F.col("__b__")).alias("bucket_ts"),
        interp.alias("value"),
        v.isNull().alias("interpolated"),
    )


def event_transitions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """First-order transition matrix over each user's event stream:
    (from_type, to_type, n, prob) where prob is row-normalized over
    from_type — the Markov-chain summary behind "what do users do
    next" analyses. One user-partitioned lag window + one hash
    aggregate; ``tiebreak_col`` plus ``type_col`` as a final key make
    the lag order total even if (ts, tiebreak) ever carries duplicates
    (the lineitem dup-row lesson — rows tied on all three keys are
    interchangeable in every transition pair, so the counts stay
    deterministic regardless)."""
    w = Window.partitionBy(qcol(user_col)).orderBy(
        qcol(ts_col).asc(),
        qcol(tiebreak_col).asc(),
        # nulls LAST: Spark asc() defaults to NULLS FIRST but DuckDB
        # ORDER BY defaults to NULLS LAST — the oracle must agree on
        # the one case the key exists for (duplicate (ts, tiebreak)).
        qcol(type_col).cast("string").asc_nulls_last(),
    )
    pairs = (
        df.withColumn("__prev__", F.lag(qcol(type_col)).over(w))
        .filter(F.col("__prev__").isNotNull())
        .groupBy(
            F.col("__prev__").alias("from_type"),
            qcol(type_col).alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("from_type")
    return pairs.withColumn(
        "prob", F.col("n") / F.sum("n").over(tot)
    )


def session_paths(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str,
    gap_seconds: int = 1800,
    max_steps: int = 5,
    top_n: int = 20,
) -> DataFrame:
    """Top-N session paths: sessionize, take each session's first
    ``max_steps`` event types in (ts, tiebreak) order, join them with
    '>' into a path string, and count sessions per path — the classic
    "how do journeys start" report. Deterministic by construction:
    the path is built from sort_array over (ts, tiebreak, type)
    structs, NEVER collect_list's arrival order (which varies run to
    run). Shape: the sessionize window + a (user, session) rank filter
    that keeps only the first ``max_steps`` events per session BEFORE
    any collection (so a degenerate bot session with millions of
    events inside the gap window cannot inflate one aggregate row —
    per-session state is bounded at max_steps structs) + one
    (user, session) aggregate + one path aggregate + a TakeOrdered
    top-N — everything keyed, nothing global except the final N-row
    merge. The rank window and the aggregate share the
    (user, session) partitioning, so the filter adds no shuffle."""
    s = sessionize(df, user_col, ts_col, gap_seconds)
    # The rank order includes type_col as the last key so the KEPT set
    # is total even if (ts, tiebreak) ever ties (generated data has
    # produced duplicate "unique" keys before — the lineitem dup-row
    # lesson); same-type ties beyond that are interchangeable in the
    # path string, so the output stays deterministic regardless.
    w_step = Window.partitionBy(
        qcol(user_col), F.col("session_id")
    ).orderBy(
        qcol(ts_col).asc(),
        qcol(tiebreak_col).asc(),
        # asc_nulls_last matches DuckDB's ORDER BY default (NULLS
        # LAST); with NULLS FIRST the two engines would keep different
        # events at the max_steps cut when a NULL type ties.
        qcol(type_col).cast("string").asc_nulls_last(),
    )
    per_session = (
        s.withColumn("__step__", F.row_number().over(w_step))
        .filter(F.col("__step__") <= max_steps)
        .groupBy(qcol(user_col).alias("__u__"), F.col("session_id"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        qcol(ts_col).alias("t"),
                        qcol(tiebreak_col).alias("k"),
                        # Spark struct comparison puts a NULL field
                        # FIRST, DuckDB's array_agg(... ORDER BY ...)
                        # defaults NULLS LAST — so the in-array order
                        # would diverge from the max_steps cut order
                        # above on a NULL type tied at (ts, tiebreak).
                        # A null flag before the value gives exact
                        # NULLS LAST with no sentinel-collision risk.
                        F.when(qcol(type_col).isNull(), F.lit(1))
                        .otherwise(F.lit(0))
                        .alias("en"),
                        qcol(type_col).cast("string").alias("e"),
                    )
                )
            ).alias("__evs__")
        )
        .select(
            F.array_join(
                F.transform("__evs__", lambda x: x["e"]), ">"
            ).alias("path")
        )
    )
    return (
        per_session.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(top_n)
    )
