"""Structured Streaming operators over an events stream.

Beyond-reference surface (the reference is batch-only, SURVEY.md §2.10).
These transformations are source-agnostic: they take any streaming
DataFrame with (ts, user_id, event_type, value) columns — file source,
Kafka, rate — and return streaming DataFrames ready for writeStream.
Watermarks bound state for late data; all aggregations are keyed so
state partitions across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
) -> DataFrame:
    """Exactly-once-per-key event dedup within the watermark horizon."""
    return _with_watermark(stream, ts_col, watermark).dropDuplicates(
        [*key_cols, ts_col]
    )


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
    cols = dim_cols or [c for c in dim.columns if c != dim_key]
    right = dim.select(
        qcol(dim_key).alias(stream_key), *[qcol(c) for c in cols]
    )
    return stream.join(F.broadcast(right), on=stream_key, how=how)


def running_user_stats(
    stream: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Custom STATEFUL operator via applyInPandasWithState: per-user
    running (count, sum, mean, max) maintained in explicit group state
    across micro-batches — the mechanism for operators Spark's built-in
    streaming aggregations can't express (SURVEY.md §2.10 note; at scale
    the state store partitions by user across executors and the
    watermark bounds it for idle keys).

    Emits one row per user per micro-batch in which that user appeared,
    carrying the lifetime-so-far statistics (update semantics)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{user_col} long, n_events long, total double, "
        "mean double, max_value double"
    )
    state_schema = "n long, total double, max_value double"

    def update(key, pdfs, state: GroupState):
        n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            v = pdf[value_col]
            n += int(v.count())
            total += float(v.sum())
            if len(v):
                mx = max(mx, float(v.max()))
        state.update((n, total, mx))
        import pandas as pd

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
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
