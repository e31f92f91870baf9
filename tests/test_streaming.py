"""Structured Streaming tests: the transformations in streaming/events.py
must run as REAL streams (readStream file source → memory sink), not just
in their batch form, and the streaming results must agree with batch.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from polars_mas_spark.streaming.events import (
    session_windows,
    stream_dedup,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark):
    """A small static events table written as parquet for the file source."""
    tmp = tempfile.mkdtemp(prefix="pms_stream_")
    df = spark.createDataFrame(
        [
            (i, f"2024-01-01 00:{i % 60:02d}:{(i * 7) % 60:02d}", i % 5,
             ["click", "view", "purchase"][i % 3], float(i))
            for i in range(300)
        ],
        "event_id long, ts_str string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")
    df.coalesce(2).write.mode("overwrite").parquet(tmp)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def _run_stream(spark, events_dir, transform, name):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = transform(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name != "dedup_sink" else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_counts_stream_matches_batch(spark, events_dir):
    result = _run_stream(
        spark, events_dir,
        lambda s: windowed_event_counts(s, window_duration="10 minutes"),
        "windowed_sink",
    )
    batch = windowed_event_counts(
        spark.read.parquet(events_dir), window_duration="10 minutes"
    )
    got = {tuple(r) for r in result.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_session_windows_stream_runs(spark, events_dir):
    result = _run_stream(
        spark, events_dir,
        lambda s: session_windows(s, gap="5 minutes"),
        "session_sink",
    )
    rows = result.collect()
    assert len(rows) > 0
    # session invariant: end - start >= gap and n_events >= 1
    for r in rows:
        assert r["n_events"] >= 1
        assert (r["session_end"] - r["session_start"]).total_seconds() >= 300


def test_stream_dedup_append(spark, events_dir):
    result = _run_stream(
        spark, events_dir,
        lambda s: stream_dedup(s, key_cols=["user_id", "event_type"]),
        "dedup_sink",
    )
    n = result.count()
    batch_n = (
        spark.read.parquet(events_dir)
        .dropDuplicates(["user_id", "event_type", "ts"])
        .count()
    )
    assert n == batch_n > 0


def test_running_user_stats_stateful(spark, events_dir):
    # applyInPandasWithState: lifetime per-user stats must match a batch
    # groupBy over the same data once the stream drains.
    from polars_mas_spark.streaming.events import running_user_stats

    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = running_user_stats(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("user_stats_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # Last emitted row per user = lifetime totals.
    got = spark.sql(
        """SELECT user_id, n_events, total, mean, max_value FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id
                       ORDER BY n_events DESC) AS rk FROM user_stats_sink)
           WHERE rk = 1"""
    ).toPandas().set_index("user_id").sort_index()
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count("value").alias("n_events"),
            F.sum("value").alias("total"),
            F.avg("value").alias("mean"),
            F.max("value").alias("max_value"),
        )
        .toPandas().set_index("user_id").sort_index()
    )
    assert (got["n_events"] == batch["n_events"]).all()
    assert abs(got["total"] - batch["total"]).max() < 1e-9
    assert abs(got["mean"] - batch["mean"]).max() < 1e-9
    assert abs(got["max_value"] - batch["max_value"]).max() < 1e-9
    # The emission contract the gate query relies on (its oracle
    # compares only n_events/total/max: rounding the mean quotient is
    # engine-unstable on true decimal halfway points): mean is EXACTLY
    # total/n in fp, so binding (n_events, total) binds mean.
    assert (got["mean"] == got["total"] / got["n_events"]).all()


def test_running_user_stats_multi_batch_state(spark, events_dir):
    """VERDICT r3 next-steps #6 (oracle hardening): the availableNow
    single-pass test above never exercises state persistence ACROSS
    micro-batches — the whole point of applyInPandasWithState. Force one
    file per trigger (the fixture writes 2 parquet files) so the same
    users appear in multiple micro-batches: the update-mode emissions
    must be strictly accumulating per user, and the last emission must
    equal the batch lifetime aggregate."""
    from polars_mas_spark.streaming.events import running_user_stats

    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    out = running_user_stats(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("user_stats_mb")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql(
        "SELECT user_id, n_events, total, max_value FROM user_stats_mb"
    ).toPandas()
    # Every user appears in both files -> one emission per micro-batch.
    per_user = emitted.groupby("user_id").size()
    assert per_user.min() >= 2, "stream collapsed into a single micro-batch"
    # State accumulates: per-user emissions carry strictly growing
    # counts and non-decreasing maxima.
    for uid, g in emitted.groupby("user_id"):
        ns = sorted(g["n_events"])
        assert len(set(ns)) == len(ns), f"user {uid}: non-accumulating counts"
        g2 = g.sort_values("n_events")
        assert g2["max_value"].is_monotonic_increasing or (
            g2["max_value"].diff().fillna(0) >= 0
        ).all()
    final = (
        emitted.loc[emitted.groupby("user_id")["n_events"].idxmax()]
        .set_index("user_id").sort_index()
    )
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count("value").alias("n_events"),
            F.sum("value").alias("total"),
            F.max("value").alias("max_value"),
        )
        .toPandas().set_index("user_id").sort_index()
    )
    assert (final["n_events"] == batch["n_events"]).all()
    assert abs(final["total"] - batch["total"]).max() < 1e-9
    assert abs(final["max_value"] - batch["max_value"]).max() < 1e-9


def test_enrich_events_stream_matches_batch(spark, events_dir):
    """Stream-static broadcast join: streaming result must equal the
    batch join, and the plan must not shuffle the stream side."""
    from polars_mas_spark.streaming.events import enrich_events

    dim = spark.createDataFrame(
        [(i, f"name{i}", "SEG" + str(i % 2)) for i in range(5)],
        "c_custkey long, c_name string, c_mktsegment string",
    )
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = enrich_events(stream, dim, dim_cols=["c_name", "c_mktsegment"])
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("enrich_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql(
        "SELECT event_id, c_name, c_mktsegment FROM enrich_sink").collect()}
    batch = enrich_events(
        spark.read.parquet(events_dir), dim, dim_cols=["c_name", "c_mktsegment"]
    )
    want = {tuple(r) for r in batch.select(
        "event_id", "c_name", "c_mktsegment").collect()}
    assert got == want and len(want) == 300


def test_purchase_attribution_stream_matches_batch(spark, events_dir):
    """The stream-stream interval join must run as a REAL stream (both
    sides watermarked file sources) and, with every event in one
    availableNow pass, agree exactly with its batch form."""
    from polars_mas_spark.streaming.events import purchase_attribution

    schema = spark.read.parquet(events_dir).schema

    def split(df):
        return (
            df.filter(F.col("event_type") == "purchase"),
            df.filter(F.col("event_type") == "click"),
        )

    sp, sc = split(spark.readStream.schema(schema).parquet(events_dir))
    out = purchase_attribution(sp, sc, lookback_seconds=600)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("attr_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    stream_rows = {
        tuple(r) for r in spark.sql("SELECT * FROM attr_sink").collect()
    }

    bp, bc = split(spark.read.parquet(events_dir))
    batch_rows = {
        tuple(r)
        for r in purchase_attribution(bp, bc, lookback_seconds=600).collect()
    }
    assert stream_rows == batch_rows
    assert stream_rows  # join must actually match something


def test_running_user_stats_string_key_with_timeout(spark, events_dir):
    """Review r4: the output schema hardcoded the key as long (string
    user ids crashed), and NoTimeout state was never evicted. A
    string-keyed stream with idle_timeout must run the EventTimeTimeout
    path and still converge to the batch aggregate."""
    from polars_mas_spark.streaming.events import running_user_stats

    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema).parquet(events_dir)
        .withColumn("uid", F.concat(F.lit("u"), F.col("user_id")))
    )
    out = running_user_stats(stream, user_col="uid", idle_timeout="6 hours")
    q = (
        out.writeStream.format("memory").queryName("user_stats_str")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        """SELECT uid, n_events, total FROM (
             SELECT *, row_number() OVER (PARTITION BY uid
                       ORDER BY n_events DESC) AS rk FROM user_stats_str)
           WHERE rk = 1"""
    ).toPandas().set_index("uid").sort_index()
    batch = (
        spark.read.parquet(events_dir)
        .withColumn("uid", F.concat(F.lit("u"), F.col("user_id")))
        .groupBy("uid")
        .agg(F.count("value").alias("n_events"), F.sum("value").alias("total"))
        .toPandas().set_index("uid").sort_index()
    )
    assert (got["n_events"] == batch["n_events"]).all()
    assert abs(got["total"] - batch["total"]).max() < 1e-9


def test_unattributed_purchases_stream_matches_batch(spark, events_dir):
    """Left-outer stream-stream attribution as a REAL stream. Outer
    emission semantics: matched rows stream out immediately and must
    equal the batch inner results exactly; NULL-padded rows are only
    authorized once the click watermark passes the purchase's match
    window, so purchases near stream end legitimately stay PENDING —
    the stream result is the batch LEFT JOIN restricted to
    watermark-resolved purchases, never a wrong row."""
    import datetime

    from polars_mas_spark.streaming.events import unattributed_purchases

    schema = spark.read.parquet(events_dir).schema

    def split(df):
        return (
            df.filter(F.col("event_type") == "purchase"),
            df.filter(F.col("event_type") == "click"),
        )

    sp, sc = split(spark.readStream.schema(schema).parquet(events_dir))
    out = unattributed_purchases(
        sp, sc, lookback_seconds=600, watermark="2 minutes"
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("unattr_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    stream_rows = {
        tuple(r) for r in spark.sql("SELECT * FROM unattr_sink").collect()
    }

    bp, bc = split(spark.read.parquet(events_dir))
    batch_rows = {
        tuple(r)
        for r in unattributed_purchases(
            bp, bc, lookback_seconds=600, watermark="2 minutes"
        ).collect()
    }
    # Never a wrong row, and every matched (inner) result present.
    assert stream_rows <= batch_rows
    matched = {r for r in batch_rows if r[3] is not None}
    assert {r for r in stream_rows if r[3] is not None} == matched
    # NULL verdicts: all resolved purchases emitted. A purchase is
    # safely resolved once the final watermark (max event time - delay)
    # has passed its whole match window; 120s extra margin for engine
    # internals.
    max_ts = max(r[2] for r in batch_rows)
    cutoff = max_ts - datetime.timedelta(seconds=120 + 600 + 120)
    expected_nulls = {
        r for r in batch_rows if r[3] is None and r[2] <= cutoff
    }
    stream_nulls = {r for r in stream_rows if r[3] is None}
    assert expected_nulls <= stream_nulls, (
        sorted(expected_nulls - stream_nulls)[:5]
    )
    assert stream_nulls  # outer semantics actually exercised


def test_stream_normalized_dedup_matches_batch(spark):
    """Normalized near-dup suppression as a REAL stream: the surviving
    normalized-digest SET (arrival-order independent, unlike the
    surviving ids) must equal the batch form's, and the batch form must
    deterministically keep the (ts, id)-minimal variant."""
    import shutil
    import tempfile

    from polars_mas_spark.operators.dedup import normalized_digest
    from polars_mas_spark.streaming.events import stream_normalized_dedup

    tmp = tempfile.mkdtemp(prefix="pms_normdedup_")
    try:
        rows = []
        for i in range(60):
            # letters, not digits: digit-to-'0' normalization would
            # (correctly) collapse numbered docs into one group
            base = f"doc {chr(97 + i % 20)} body words here"
            variant = [base, base.upper() + "!!!", "  " + base + ".. "][i % 3]
            rows.append((i, f"2024-01-01 00:{i:02d}:00", variant))
        df = (
            spark.createDataFrame(rows, "doc_id long, ts_str string, text string")
            .withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")
        )
        df.coalesce(1).write.mode("overwrite").parquet(tmp)

        batch = stream_normalized_dedup(
            spark.read.parquet(tmp), "text", id_col="doc_id"
        )
        got = batch.select("doc_id").toPandas()["doc_id"].tolist()
        # 20 distinct normalized contents; (ts, id)-minimal = ids 0..19.
        assert sorted(got) == list(range(20))

        schema = spark.read.parquet(tmp).schema
        stream = spark.readStream.schema(schema).parquet(tmp)
        out = stream_normalized_dedup(stream, "text")
        assert out.isStreaming
        q = (
            out.writeStream.format("memory").queryName("norm_dedup_sink")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        sdf = spark.sql("SELECT * FROM norm_dedup_sink")
        s_digests = {
            r[0]
            for r in sdf.select(normalized_digest(F.col("text"))).collect()
        }
        b_digests = {
            r[0]
            for r in batch.select(normalized_digest(F.col("text"))).collect()
        }
        assert sdf.count() == 20 and s_digests == b_digests
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_normalized_dedup_null_text_passthrough(spark):
    """Review r5: NULL-text rows must pass through BOTH forms
    undeduplicated (md5(NULL)=NULL would otherwise become one shared
    dedup key and collapse every text-less event after the first)."""
    import shutil
    import tempfile

    from polars_mas_spark.streaming.events import stream_normalized_dedup

    tmp = tempfile.mkdtemp(prefix="pms_normnull_")
    try:
        rows = [
            (0, "2024-01-01 00:00:00", "same text"),
            (1, "2024-01-01 00:01:00", None),
            (2, "2024-01-01 00:02:00", None),
            (3, "2024-01-01 00:03:00", "SAME TEXT!"),
        ]
        df = (
            spark.createDataFrame(rows, "doc_id long, ts_str string, text string")
            .withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")
        )
        df.coalesce(1).write.mode("overwrite").parquet(tmp)

        batch_ids = sorted(
            r.doc_id
            for r in stream_normalized_dedup(
                spark.read.parquet(tmp), "text", id_col="doc_id"
            ).collect()
        )
        assert batch_ids == [0, 1, 2]  # both NULLs kept, variant dropped

        schema = spark.read.parquet(tmp).schema
        stream = spark.readStream.schema(schema).parquet(tmp)
        q = (
            stream_normalized_dedup(stream, "text")
            .writeStream.format("memory").queryName("normnull_sink")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = sorted(
            r.doc_id for r in spark.sql("SELECT * FROM normnull_sink").collect()
        )
        assert got == [0, 1, 2]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_digest_matches_batch(spark, events_dir):
    """The commutative content digest folded incrementally over a real
    readStream equals the one-shot batch digest — micro-batch order
    cannot matter by construction."""
    from polars_mas_spark.streaming.events import stream_table_digest

    result = _run_stream(
        spark, events_dir,
        lambda s: stream_table_digest(s, ["event_id", "event_type"]),
        "digest_sink",
    ).collect()
    batch = stream_table_digest(
        spark.read.parquet(events_dir), ["event_id", "event_type"]
    ).collect()
    assert len(result) == 1 and len(batch) == 1
    assert tuple(result[0]) == tuple(batch[0])
    # And the streaming twin agrees with the batch operator itself.
    from polars_mas_spark.operators.maintenance import table_digest

    direct = table_digest(
        spark.read.parquet(events_dir), ["event_id", "event_type"]
    ).collect()
    assert tuple(direct[0]) == tuple(batch[0])


def test_stream_dedup_batch_survivor_deterministic(spark):
    """Batch form with id_col keeps the id-minimal payload per
    (key, ts) — not whichever row the shuffle delivers first."""
    import datetime

    from polars_mas_spark.streaming.events import stream_dedup

    t = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(9, 1, "click", t, 99.0), (3, 1, "click", t, 1.0),
            (5, 2, "view", t, 2.0)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp, value double")
    out = stream_dedup(df, ["user_id", "event_type"], id_col="event_id")
    got = {(r.user_id, r.event_type): r.event_id for r in out.collect()}
    assert got == {(1, "click"): 3, (2, "view"): 5}


def test_enrich_events_dim_key_collision(spark):
    """A dimension that already carries a column named stream_key must
    not produce a duplicate join column."""
    from polars_mas_spark.streaming.events import enrich_events

    stream = spark.createDataFrame([(1, 10.0)], "user_id long, value double")
    dim = spark.createDataFrame(
        [(1, 999, "gold")], "c_custkey long, user_id long, tier string")
    out = enrich_events(stream, dim)
    assert out.columns.count("user_id") == 1
    assert out.collect()[0].tier == "gold"


def test_stream_unicode_normalized_dedup_matches_batch(spark):
    """r11 (VERDICT r10 #8): unicode_form threads normalization in
    FRONT of the streaming dedup (CCNet §3.1 order) — a decomposed
    accent variant dedups against its composed twin, the emitted text
    is normalized, and stream == batch on the surviving digest set.
    Without unicode_form the variants survive separately."""
    import shutil
    import tempfile

    from polars_mas_spark.operators.dedup import normalized_digest
    from polars_mas_spark.streaming.events import stream_normalized_dedup

    tmp = tempfile.mkdtemp(prefix="pms_unormdedup_")
    try:
        composed = "café menu du jour"
        decomposed = "café menu du jour"
        zwsp = "plain​ doc body"
        rows = [
            (0, "2024-01-01 00:00:00", composed),
            (1, "2024-01-01 00:01:00", decomposed),   # NFC twin of 0
            (2, "2024-01-01 00:02:00", zwsp),
            (3, "2024-01-01 00:03:00", "plain doc body"),  # strip twin of 2
            (4, "2024-01-01 00:04:00", None),
            (5, "2024-01-01 00:05:00", None),
            (6, "2024-01-01 00:06:00", "unrelated text"),
        ]
        df = (
            spark.createDataFrame(rows, "doc_id long, ts_str string, text string")
            .withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")
        )
        df.coalesce(1).write.mode("overwrite").parquet(tmp)

        plain = stream_normalized_dedup(
            spark.read.parquet(tmp), "text", id_col="doc_id"
        )
        # normalized_digest alone does NOT see through the DECOMPOSED
        # accent (doc 1 survives) — the ZWSP twin it already collapses
        # via its own punctuation strip (doc 3 drops).
        assert sorted(
            r.doc_id for r in plain.collect()
        ) == [0, 1, 2, 4, 5, 6]

        batch = stream_normalized_dedup(
            spark.read.parquet(tmp), "text", id_col="doc_id",
            unicode_form="NFC",
        )
        brows = batch.collect()
        assert sorted(r.doc_id for r in brows) == [0, 2, 4, 5, 6]
        by_id = {r.doc_id: r.text for r in brows}
        assert by_id[0] == composed          # emitted text is normalized
        assert by_id[2] == "plain doc body"  # ZWSP stripped
        assert by_id[4] is None and by_id[5] is None  # nulls pass through

        schema = spark.read.parquet(tmp).schema
        stream = stream_normalized_dedup(
            spark.readStream.schema(schema).parquet(tmp), "text",
            unicode_form="NFC",
        )
        assert stream.isStreaming
        q = (
            stream.writeStream.format("memory").queryName("unorm_sink")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        sdf = spark.sql("SELECT * FROM unorm_sink")
        s_digests = {
            r[0]
            for r in sdf.select(normalized_digest(F.col("text"))).collect()
        }
        b_digests = {
            r[0]
            for r in batch.select(normalized_digest(F.col("text"))).collect()
        }
        assert sdf.count() == 5 and s_digests == b_digests
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
