"""Streaming binding for the rolling-crawl span scrub: a micro-batched
crawl ingestion (readStream file source, availableNow) scrubbed per
batch against the PERSISTED fingerprint table via foreachBatch must
produce exactly the batch operator's output — the production shape for
incremental_span_decontaminate (the operator reassembles documents with
a groupBy, so foreachBatch is the supported streaming execution, same
as Structured Streaming's own guidance for batch-only sinks/ops)."""

from __future__ import annotations

import shutil
import tempfile


def test_stream_span_decontaminate_foreachbatch_matches_batch(spark):
    from polars_mas_spark.operators.dedup import (
        incremental_span_decontaminate,
        span_fingerprints,
    )

    tmp = tempfile.mkdtemp(prefix="pms_sdecon_stream_")
    try:
        seen = spark.createDataFrame(
            [(100, "u v s0 s1 s2 s3 s4 s5 s6 s7")],
            "doc_id long, text string",
        )
        # persisted fingerprint side table — computed ONCE, reused by
        # every micro-batch (accepted text never re-read)
        fps = span_fingerprints(seen, "text", k=4).cache()
        fps.count()

        rows = [
            (1, "s0 s1 s2 s3 s4 s5 s6 s7 tail words"),  # misaligned hit
            (2, "n0 n1 n2 n3 n4 lead"),                  # clean
            (3, "p q r s t u"),                          # clean
            (4, "u v s0 s1 s2 s3 s4 s5 s6 s7"),          # full benchmark text
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.coalesce(2).write.mode("overwrite").parquet(tmp)

        batch_out = {
            r.doc_id: (r.clean_text, r.n_removed)
            for r in incremental_span_decontaminate(
                spark.read.parquet(tmp), fps, "doc_id", "text",
                k=4, seen_is_fingerprints=True,
            ).collect()
        }
        assert batch_out[1] == ("tail words", 8)
        assert batch_out[4][0] == "" and batch_out[4][1] == 10

        schema = spark.read.parquet(tmp).schema
        stream = spark.readStream.schema(schema).parquet(tmp)
        assert stream.isStreaming
        got: dict[int, tuple[str, int]] = {}

        def scrub(batch_df, _epoch):
            for r in incremental_span_decontaminate(
                batch_df, fps, "doc_id", "text",
                k=4, seen_is_fingerprints=True,
            ).collect():
                got[r.doc_id] = (r.clean_text, r.n_removed)

        q = (
            stream.writeStream.foreachBatch(scrub)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert got == batch_out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
