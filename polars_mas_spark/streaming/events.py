"""Structured Streaming operators over an events stream.

Beyond-reference surface (the reference is batch-only, SURVEY.md §2.10).
These transformations are source-agnostic: they take any streaming
DataFrame with (ts, user_id, event_type, value) columns — file source,
Kafka, rate — and return streaming DataFrames ready for writeStream.
Watermarks bound state for late data; all aggregations are keyed so
state partitions across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_mas_spark.colutils import qcol


def _with_watermark(df: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """Watermarks only apply to streaming plans; in batch mode the same
    transformation runs watermark-free so one definition serves both the
    stream and its batch/backfill (and DuckDB-oracle) form."""
    return df.withWatermark(ts_col, watermark) if df.isStreaming else df


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-event-type tumbling/sliding window counts with a watermark
    for late-data state eviction."""
    win = (
        F.window(qcol(ts_col), window_duration, slide)
        if slide
        else F.window(qcol(ts_col), window_duration)
    )
    return (
        _with_watermark(stream, ts_col, watermark)
        .groupBy(win.alias("window"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windows(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user session windows via the built-in session_window — the
    streaming analog of operators.windows.sessionize."""
    return (
        _with_watermark(stream, ts_col, watermark)
        .groupBy(F.session_window(qcol(ts_col), gap).alias("session"), qcol(user_col))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            qcol(user_col),
            "n_events",
            "total_value",
        )
    )


def stream_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    id_col: str | None = None,
) -> DataFrame:
    """Exactly-once-per-key event dedup within the watermark horizon.

    On a BATCH frame (the backfill/oracle form), pass ``id_col`` to get
    a DETERMINISTIC survivor — the id-minimal row per (key_cols, ts) —
    instead of dropDuplicates' shuffle-order lottery among payload
    variants of the same key (the stream_normalized_dedup precedent;
    without id_col the batch form keeps the legacy arbitrary-survivor
    behaviour, fine when only key columns are consumed downstream)."""
    marked = _with_watermark(stream, ts_col, watermark)
    if marked.isStreaming or id_col is None:
        return marked.dropDuplicates([*key_cols, ts_col])
    w = Window.partitionBy(
        *[qcol(c) for c in key_cols], qcol(ts_col)
    ).orderBy(qcol(id_col).asc())
    return (
        marked.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def stream_normalized_dedup(
    stream: DataFrame,
    text_col: str,
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    id_col: str | None = None,
    unicode_form: str | None = None,
) -> DataFrame:
    """Streaming near-duplicate suppression on the CCNet normalization
    digest (operators.dedup.normalized_digest): the first arrival of
    each normalized content wins; case/punctuation/digit variants
    arriving later inside the watermark horizon are dropped. State is
    one digest per distinct content bounded by the watermark —
    dropDuplicatesWithinWatermark evicts expired digests, so state
    never grows with stream lifetime.

    On a BATCH frame (the backfill/parity form) ``id_col`` is required
    and the survivor is the (ts, id)-minimal row per digest — a
    deterministic stand-in for "first arrival" (plain dropDuplicates
    keeps whichever row a shuffle happens to deliver first). The two
    forms agree whenever the stream is replayed in timestamp order,
    which is what the stream==batch parity test does.

    NULL-text rows PASS THROUGH undeduplicated in both forms — the
    same contract as batch normalized_dedup (md5(NULL) = NULL would
    otherwise become one shared dedup key and silently collapse every
    text-less event after the first). The null split happens BEFORE
    normalization, so ``unicode_form`` can't collapse text-less events
    into one ''-keyed group.

    ``unicode_form`` (r11, VERDICT r10 next-steps #8): CCNet's §3.1
    order is normalize BEFORE dedup — pass 'NFC' (or NFKC/NFD/NFKD) to
    run text.unicode_normalize_col at the head of the stream, so a
    decomposed-accent variant ('cafe'+U+0301) dedups against its
    composed twin (U+00E9) and downstream consumers see NORMALIZED
    text. Applies identically to the batch/backfill form, preserving
    stream == batch parity (tests/test_streaming.py)."""
    from polars_mas_spark.operators.dedup import normalized_digest

    marked = _with_watermark(stream, ts_col, watermark)
    nulls = marked.filter(qcol(text_col).isNull())
    nonnull = marked.filter(qcol(text_col).isNotNull())
    if unicode_form is not None:
        from polars_mas_spark.operators.text import unicode_normalize_col

        nonnull = nonnull.withColumn(
            text_col, unicode_normalize_col(qcol(text_col), unicode_form)
        )
    with_digest = nonnull.withColumn(
        "__norm_digest__", normalized_digest(qcol(text_col))
    )
    if with_digest.isStreaming:
        deduped = with_digest.dropDuplicatesWithinWatermark(
            ["__norm_digest__"]
        ).drop("__norm_digest__")
        return deduped.unionByName(nulls)
    if id_col is None:
        raise ValueError(
            "batch stream_normalized_dedup needs id_col: without a "
            "tiebreak the surviving duplicate is shuffle-order lottery"
        )
    w = Window.partitionBy("__norm_digest__").orderBy(
        qcol(ts_col).asc(), qcol(id_col).asc()
    )
    deduped = (
        with_digest.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__", "__norm_digest__")
    )
    return deduped.unionByName(nulls)


def enrich_events(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
    dim_cols: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to
    each event. The static side is explicitly broadcast — in streaming,
    a stream-static join re-evaluates the static side per micro-batch,
    and broadcasting keeps it a map-side hash join with NO state store
    and no shuffle of the (unbounded) stream side; the same plan shape
    is exactly what a 100 TB batch wants for a small dimension. Works
    identically on batch frames (the backfill/oracle form)."""
    # Default columns exclude BOTH keys: a dimension that already has a
    # column named stream_key would otherwise ride along and duplicate
    # the aliased join key — ambiguous-reference errors downstream
    # (review r9).
    cols = dim_cols or [
        c for c in dim.columns if c != dim_key and c != stream_key
    ]
    right = dim.select(
        qcol(dim_key).alias(stream_key), *[qcol(c) for c in cols]
    )
    return stream.join(F.broadcast(right), on=stream_key, how=how)


def purchase_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    lookback_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM inner join: each purchase matched to every click by
    the same user within the preceding ``lookback_seconds`` — the
    classic attribution join. Both sides carry a watermark and the join
    condition bounds the event-time range, which is what lets Spark
    EVICT click state (clicks older than watermark + lookback can never
    match a future purchase) instead of buffering the stream forever —
    the difference between bounded state and an OOM at day three of a
    production stream. State partitions by the join key, so scale-out
    follows the user-hash shuffle. Works identically on batch frames
    (the oracle form: a plain BETWEEN theta join)."""
    return _attribution_join(
        purchases, clicks, user_col, ts_col, lookback_seconds, watermark,
        how="inner",
    )


def _attribution_join(
    purchases, clicks, user_col, ts_col, lookback_seconds, watermark, how
) -> DataFrame:
    """Shared body of the inner/outer attribution joins — one place for
    the watermarking and the time-range condition, so a fix to either
    can't silently diverge the two variants."""
    # qcol everywhere a user-supplied name is resolved (CLAUDE.md
    # dotted-name rule — this helper was the module's one bare-F.col
    # outlier, review r9); fixed internal aliases from there on.
    c = clicks.select(
        qcol(user_col).alias("__c_user__"),
        qcol(ts_col).alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        qcol(user_col).alias("__p_user__"),
        qcol(ts_col).alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    if p.isStreaming:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (p["__p_user__"] == c["__c_user__"])
        & (c["click_ts"] <= p["purchase_ts"])
        & (
            c["click_ts"]
            >= p["purchase_ts"] - F.expr(f"INTERVAL {lookback_seconds} SECONDS")
        )
    )
    return p.join(c, cond, how).select(
        "purchase_id",
        F.col("__p_user__").alias(user_col),
        "purchase_ts", "click_id", "click_ts",
    )


def unattributed_purchases(
    purchases: DataFrame,
    clicks: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    lookback_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM left-outer attribution: every purchase, with NULL
    click columns when no same-user click preceded it within the
    lookback — the organic/paid split every attribution pipeline needs
    alongside the inner join.

    Outer stream-stream joins are where watermarks become SEMANTICS,
    not just state hygiene: Spark can only emit the NULL-padded side of
    an unmatched purchase once the click watermark has passed the end
    of its match window (no future click can change the verdict), so
    the watermark bounds both state size AND result latency. Same code
    runs batch backfill (the oracle form: LEFT JOIN with the BETWEEN
    condition)."""
    return _attribution_join(
        purchases, clicks, user_col, ts_col, lookback_seconds, watermark,
        how="left_outer",
    )


def _duration_ms(spec: str) -> int:
    """'2 hours' / '30 minutes' / '90 seconds' -> milliseconds."""
    qty, unit = spec.strip().split()
    mult = {
        "millisecond": 1, "second": 1_000, "minute": 60_000,
        "hour": 3_600_000, "day": 86_400_000,
    }[unit.rstrip("s").lower()]
    return int(float(qty) * mult)


def running_user_stats(
    stream: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Custom STATEFUL operator via applyInPandasWithState: per-user
    running (count, sum, mean, max) maintained in explicit group state
    across micro-batches — the mechanism for operators Spark's built-in
    streaming aggregations can't express (SURVEY.md §2.10 note; at scale
    the state store partitions by user across executors).

    State lifetime: the watermark alone does NOT evict
    applyInPandasWithState state — only a timeout or an explicit
    ``state.remove()`` does. For unbounded key cardinality pass
    ``idle_timeout`` (e.g. ``"2 hours"``): keys idle past that
    event-time horizon are evicted (a key that reappears later restarts
    its running stats from zero). The default ``None`` keeps state
    forever and is only safe for bounded key sets.

    Emits one row per user per micro-batch in which that user appeared,
    carrying the lifetime-so-far statistics (update semantics)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = dict(stream.dtypes).get(user_col, "bigint")
    out_schema = (
        f"`{user_col}` {key_type}, n_events long, total double, "
        "mean double, max_value double"
    )
    state_schema = "n long, total double, max_value double"
    idle_ms = _duration_ms(idle_timeout) if idle_timeout else None

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            v = pdf[value_col]
            n += int(v.count())
            total += float(v.sum())
            if len(v):
                mx = max(mx, float(v.max()))
        state.update((n, total, mx))
        if idle_ms is not None:
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + idle_ms)
        yield pd.DataFrame(
            {
                user_col: [key[0]],
                "n_events": [n],
                "total": [total],
                "mean": [total / n if n else None],
                "max_value": [mx if n else None],
            }
        )

    return (
        _with_watermark(stream, ts_col, watermark)
        .groupBy(qcol(user_col))
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.EventTimeTimeout
                if idle_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def stream_table_digest(
    stream: DataFrame, cols: list[str] | None = None, salt: str = ""
) -> DataFrame:
    """Streaming twin of maintenance.table_digest: the same commutative
    (count, XOR, modular-sum) content fingerprint maintained
    incrementally over a stream — commutativity is exactly what makes
    the digest a legal streaming aggregate (each micro-batch folds in
    map-side, no ordering or watermark needed; state is ONE tiny row).
    Run with outputMode("complete") (or "update"); the same call on a
    batch frame returns the batch digest, so stream-vs-batch parity is
    a direct equality check.

    Implementation IS maintenance.table_digest — pure DataFrame API
    works on a streaming frame as-is, and one body means a digest
    encoding fix can never diverge the stream/batch parity this
    docstring advertises (review r9 deduplicated the verbatim copy)."""
    from polars_mas_spark.operators.maintenance import table_digest

    return table_digest(stream, cols, salt)
